"""Merge-on-read upsert table — the lakehouse CDC-apply primitive.

A table is a directory of immutable parquet version partitions
(`_v=<n>/`): `_v=0` is the base, each later `_v` is a delta batch of
upserted rows plus tombstones (`_deleted = true`). Readers resolve
LAST-WRITER-WINS per key at scan time (merge-on-read); a compaction
pass rewrites the resolved view as a new base so read cost stays flat.

Why this shape at 100 TB:
- Writers never rewrite the base: a CDC batch lands as one append-only
  directory partition, so ingestion cost is O(|delta|) regardless of
  table size (the same per-batch-directory idea as the streaming
  ingest sinks in ann_ingest.py, where it also buys exactly-once on
  replay).
- The merge is ONE hash shuffle on the key and a per-key
  row_number() — no join, no broadcast; per-key work is O(#versions
  of that key), bounded by compaction cadence. Reading through the
  bucketed layout (sources/bucketed.py) would eliminate even that
  shuffle for repeated reads.
- Compaction is the standard read/write-amplification trade: the
  resolved view is rewritten as `_v=0` and delta partitions drop.

Semantics (pinned by tests + the s14 round-trip oracle):
- Within the directory, higher `_v` wins per key; a tombstone row
  deletes the key (until a later version re-inserts it).
- `_v` and `_deleted` are system columns; `read_merged` returns the
  user schema only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

V_COL = "_v"
DEL_COL = "_deleted"


def write_base(df: DataFrame, path: str) -> None:
    """Write the initial version (`_v=0`), no tombstones."""
    df.withColumn(DEL_COL, F.lit(False)).write.mode("overwrite").parquet(
        os.path.join(path, f"{V_COL}=0")
    )


def append_delta(
    df: DataFrame, path: str, version: int, deletes: DataFrame | None = None
) -> None:
    """Append one CDC batch as an immutable version partition: ``df``
    rows upsert their keys, ``deletes`` rows (key columns only)
    tombstone theirs. O(|delta|) — the base is never touched."""
    if version <= 0:
        raise ValueError(f"delta versions start at 1: {version}")
    batch = df.withColumn(DEL_COL, F.lit(False))
    if deletes is not None:
        # tombstones carry the key columns; remaining user columns are
        # NULL and never surface (the reader drops deleted winners)
        missing = [c for c in df.columns if c not in deletes.columns]
        tomb = deletes.select(
            "*",
            *[F.lit(None).cast(dict(df.dtypes)[c]).alias(c) for c in missing],
        ).select(df.columns)
        batch = batch.unionByName(tomb.withColumn(DEL_COL, F.lit(True)))
    batch.write.mode("overwrite").parquet(
        os.path.join(path, f"{V_COL}={version}")
    )


def read_merged(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    as_of_version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Merge-on-read: resolve last-writer-wins per key across all
    version partitions, drop tombstoned keys, return the user schema.
    One key shuffle + per-key row_number; partition discovery surfaces
    `_v` from the directory names.

    ``as_of_version`` is TIME TRAVEL: resolve the table as it stood
    after that version landed. Because `_v` is a directory partition
    column, the filter prunes whole version directories at the file
    listing — the scan never reads later deltas (the same
    PartitionFilters mechanics pinned for sources/partitioned.py).

    ``merge_schema`` turns on additive SCHEMA EVOLUTION: a delta may
    carry new columns (parquet mergeSchema unions the footers); rows
    from older versions surface NULL there, the lakehouse-standard
    semantics. Off by default — schema union costs a footer read per
    file and steady-state tables don't need it."""
    raw = (
        spark.read.option("basePath", path)
        .option("mergeSchema", "true")
        .parquet(path)
        if merge_schema
        else spark.read.option("basePath", path).parquet(path)
    )
    if as_of_version is not None:
        raw = raw.filter(F.col(V_COL) <= as_of_version)
    # deterministic within-version tie-break: if one batch carries both
    # an upsert and a tombstone for a key (a CDC batch folding several
    # source changes), the upsert wins — asc(_deleted) ranks it first
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(V_COL), F.asc(DEL_COL)
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col(DEL_COL)))
        .drop("_rn", V_COL, DEL_COL)
    )


def read_changes(
    spark: SparkSession, path: str, since_version: int
) -> DataFrame:
    """Incremental consumption — the downstream half of CDC: every
    change row strictly AFTER ``since_version``, with `_v` and
    `_deleted` exposed so a consumer can apply upserts and deletes in
    version order. The `_v >` filter prunes at directory listing, so
    a caught-up consumer reads only the new deltas, never the table.
    (Compaction resets versions; consumers checkpoint against the
    pre-compaction table like any log-compacted source.)"""
    raw = spark.read.option("basePath", path).parquet(path)
    return raw.filter(F.col(V_COL) > since_version)


def compact(spark: SparkSession, path: str, key_cols: list[str]) -> None:
    """Rewrite the resolved view as a fresh `_v=0` base and drop the
    delta partitions — bounds future merge-on-read cost. Writes the
    new base to a sibling temp dir first, then swaps, so a crashed
    compaction never leaves a half-table."""
    import shutil

    merged = read_merged(spark, path, key_cols)
    tmp = path + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.withColumn(DEL_COL, F.lit(False)).write.mode("overwrite").parquet(
        os.path.join(tmp, f"{V_COL}=0")
    )
    old = path + ".compact.old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
