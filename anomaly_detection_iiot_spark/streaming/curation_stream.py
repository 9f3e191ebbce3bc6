"""Streaming document curation (the LLM-pipeline extension of SURVEY
§2.9): the c1/c2 text cascade running on a document STREAM.

Why this shape holds at 100 TB/day of crawl output:

- Every text filter (language ID, quality scores, token counts, the o6
  hash-quota sampler) is a PURE PROJECTION — stateless on a stream,
  whole-stage-codegen JVM expressions, embarrassingly shardable. They
  run identically in batch and streaming (asserted in
  tests/test_streaming_curation.py), so a corpus can be curated
  incrementally as it lands instead of in a nightly batch.
- The only stateful operator is content dedup:
  ``dropDuplicatesWithinWatermark`` on the md5 content hash keeps
  first-arrival per hash with state BOUNDED by the ingest watermark —
  the streaming analogue of d1's keeper (batch picks min doc_id;
  a stream cannot know a smaller id arrives later, so the contract is
  first-arrival-wins and the state table is the only memory cost).
- Semantic dedup (d9) intentionally stays batch: centroid assignment
  is stream-safe (broadcast projection) but the within-cluster pair
  stage needs the cluster's accumulated population, which is what the
  periodic compaction run is for. The streaming stage emits the
  survivors the batch stage then refines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import textstats
from ..queries.extras import _O6_CUTOFFS


def curation_verdict_columns(docs: DataFrame) -> DataFrame:
    """Stateless cascade: lang + quality + o6 sampling flag, usable on
    a batch frame or a stream unchanged. Both textstats helpers are
    withColumn chains, so the whole cascade composes into ONE
    projection over the source — no join, no shuffle, no state (a
    stream-stream self-join here would need watermarks and state; this
    deliberately never forks the stream)."""
    df = textstats.quality_scores(textstats.language_scores(docs))
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    cutoff = F.lit("00")
    for lg, c in _O6_CUTOFFS.items():
        cutoff = F.when(F.col("lang") == lg, c).otherwise(cutoff)
    verdict = (
        F.when(F.col("pred_lang") == "und", "lang")
        .when(F.col("n_tokens") < 5, "short")
        .when(F.col("stopword_ratio") < 0.02, "lowq")
        .when(h >= cutoff, "unsampled")
        .otherwise("keep")
    )
    return df.select(
        "doc_id", "lang", "pred_lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.md5("text").alias("content_hash"),
        verdict.alias("verdict"),
    )


def curated_document_stream(
    stream_docs: DataFrame,
    dedup_watermark: str = "10 minutes",
) -> DataFrame:
    """Full streaming curation: stateless verdict columns, then
    first-arrival content dedup (bounded state) over the keepers.

    Non-keepers pass through with their verdict so the stream's output
    is a full audit log; only rows that would enter the corpus pay the
    dedup state. ``current_timestamp()`` is the ingest time — the
    standard watermark clock for sources (like this corpus drop
    directory) whose files carry no event time.
    """
    verdicts = curation_verdict_columns(stream_docs).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    keepers = (
        verdicts.filter(F.col("verdict") == "keep")
        .withWatermark("ingest_ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    audit = verdicts.filter(F.col("verdict") != "keep")
    return keepers.unionByName(audit).drop("ingest_ts")
