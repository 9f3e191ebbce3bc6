"""Multimodal-column queries (BASELINE.json north star): binary blobs +
typed metadata synthesized deterministically from ``documents``, so the
manifest and frame-sampling paths are oracle-checkable in pure SQL.
The decode/resize/feature UDF paths (not SQL-expressible) are covered
by tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal
from .base import QuerySpec, t

_KIND_SQL = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_NBYTES_SQL = "octet_length(encode(text))"


def mm1_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.synthesize_media(t(spark, sf_dir, "documents"))
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("data")).alias("total_bytes"),
        F.round(F.avg(F.col("meta.width")), 6).alias("avg_width"),
        F.round(F.avg(F.col("meta.n_frames")), 6).alias("avg_frames"),
    )


MM1_SQL = f"""
SELECT {_KIND_SQL} AS kind,
       count(*) AS n_media,
       CAST(sum({_NBYTES_SQL}) AS BIGINT) AS total_bytes,
       round(avg({_NBYTES_SQL} % 32 + 1), 6) AS avg_width,
       round(avg({_NBYTES_SQL} % 50 + 10), 6) AS avg_frames
FROM documents GROUP BY 1
"""


def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.synthesize_media(t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media, every=7).select(
        "media_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


MM2_SQL = f"""
SELECT doc_id AS media_id,
       unnest(generate_series(0, {_NBYTES_SQL} % 50 + 10 - 1, 7)) AS frame_idx
FROM documents
WHERE doc_id % 3 = 2
"""


MEDIA_QUERIES: list[QuerySpec] = [
    QuerySpec("mm1_media_manifest", mm1_media_manifest, MM1_SQL,
              "binary media manifest: per-kind blob/meta statistics"),
    QuerySpec("mm2_frame_sample", mm2_frame_sample, MM2_SQL,
              "video frame sampling as JVM sequence/explode"),
]
