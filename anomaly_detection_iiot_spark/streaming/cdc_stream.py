"""Streaming CDC apply into the merge-on-read upsert table
(sources/upsert.py) — the live half of the lakehouse pattern.

Each micro-batch of change rows lands as ONE immutable version
partition `_v=<batch_id + 1>` (batch ids start at 0; version 0 is the
base). That single choice buys the whole correctness story:

- **Exactly-once at rest**: foreachBatch is at-least-once — a replay
  after a crash re-runs the SAME batch_id, which rewrites the SAME
  `_v` directory (mode overwrite) instead of duplicating rows. The
  ann_ingest/sketch_stream layout, reused.
- **Orderedness**: Structured Streaming assigns batch ids
  monotonically, so arrival order IS version order and merge-on-read's
  last-writer-wins resolves concurrent updates to a key exactly as the
  stream delivered them.
- **O(delta) ingestion**: the base is never touched; a 100 TB table
  absorbs a CDC firehose at the cost of the firehose, and compaction
  (upsert.compact) amortizes read cost on whatever cadence the reader
  wants.

Change rows carry the user schema plus an `_op` column: 'upsert' or
'delete' (deletes need only the key columns populated).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import upsert

OP_COL = "_op"


def apply_cdc_stream(
    changes: DataFrame, table_path: str, checkpoint: str, key_cols: list[str]
):
    """Apply a stream of change rows (user columns + `_op`) to the
    upsert table at ``table_path``. Returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ups = batch_df.filter(F.col(OP_COL) != "delete").drop(OP_COL)
        dels = (
            batch_df.filter(F.col(OP_COL) == "delete")
            .select(*key_cols)
        )
        upsert.append_delta(
            ups, table_path, int(batch_id) + 1, deletes=dels
        )

    return (
        changes.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def apply_cdc_with_ivm(
    changes: DataFrame,
    table_path: str,
    agg_path: str,
    checkpoint: str,
    key_cols: list[str],
    group_col: str,
    sum_col: str,
):
    """CDC apply + ONLINE incremental view maintenance: each
    micro-batch (a) lands as a version partition exactly like
    ``apply_cdc_stream`` and (b) folds its delta into a materialized
    per-``group_col`` (n, total) aggregate — the s16 IVM rule
    (+new − old, old resolved from the merged view BEFORE the batch
    applies) executed per batch instead of per rebuild. The aggregate
    table is overwritten atomically per batch (tmp + rename), sized
    |groups| — the dashboard never rescans the fact table.

    Restriction shared with every IVM system: ``sum_col`` must be an
    exact type (DECIMAL/int) so +/− round-trips; the test uses
    DECIMAL(18,2)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    spark = changes.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        ups = batch_df.filter(F.col(OP_COL) != "delete").drop(OP_COL)
        dels = batch_df.filter(F.col(OP_COL) == "delete").select(*key_cols)
        changed_keys = (
            batch_df.select(*key_cols).distinct().localCheckpoint(eager=True)
        )
        # old state of every touched key, BEFORE this batch applies
        old = upsert.read_merged(spark, table_path, key_cols).join(
            changed_keys, key_cols, "left_semi"
        )
        minus = old.groupBy(group_col).agg(
            (-F.count(F.lit(1))).alias("dn"),
            (-F.sum(sum_col)).alias("dt"),
        )
        plus = ups.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("dn"), F.sum(sum_col).alias("dt")
        )
        cur = spark.read.parquet(agg_path).select(
            group_col, F.col("n").alias("dn"), F.col("total").alias("dt")
        )
        new_agg = (
            cur.unionByName(minus.unionByName(plus))
            .groupBy(group_col)
            .agg(F.sum("dn").alias("n"), F.sum("dt").alias("total"))
            .filter(F.col("n") > 0)
        )
        tmp = agg_path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        new_agg.write.mode("overwrite").parquet(tmp)
        upsert.append_delta(ups, table_path, int(batch_id) + 1, deletes=dels)
        old_dir = agg_path + ".old"
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(agg_path, old_dir)
        os.rename(tmp, agg_path)
        shutil.rmtree(old_dir, ignore_errors=True)

    return (
        changes.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
