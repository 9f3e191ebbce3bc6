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
