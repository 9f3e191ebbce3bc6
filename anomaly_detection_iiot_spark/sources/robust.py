"""Corrupt-record quarantine for semi-structured ingest.

Crawl/ingest reality: a 100 TB JSONL drop always contains some
malformed lines, and a single bad record must neither kill the job nor
silently vanish. Pattern: scan as TEXT, parse with ``from_json`` — a
corrupt line yields a NULL struct, splitting the stream into a typed
good frame and a quarantine frame of raw lines for reprocessing.

This deliberately avoids ``spark.read.json`` + ``_corrupt_record``:
filtering on the internal corrupt column requires caching the frame
(Spark disallows queries referencing only that column on the direct
scan), and the text+from_json form runs unchanged on a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(good, quarantine)``: good is typed rows parsed with
    the explicit schema; quarantine is the raw text of lines that
    failed to parse (or parsed to all-null, e.g. a JSON scalar)."""
    parsed = spark.read.text(path).select(
        "value", F.from_json("value", schema).alias("r")
    )
    # from_json gives a NULL struct for malformed JSON, and a struct of
    # all-NULL fields for valid-but-wrong-shape JSON; both quarantine.
    field_names = parsed.select("r.*").columns
    all_null = F.lit(True)
    for f in field_names:
        all_null = all_null & F.col(f"r.{f}").isNull()
    bad_cond = F.col("r").isNull() | all_null
    good = parsed.filter(~bad_cond).select("r.*")
    quarantine = parsed.filter(bad_cond).select(
        F.col("value").alias("raw_line")
    )
    return good, quarantine
