"""Explicit row-order contract (SURVEY §7.4).

The reference leans on pandas' implicit positional index for windows,
splits and first-crossing. Spark has no row order, so every ordered
operator here keys on an explicit ``sample_idx`` (bigint, contiguous per
series). Ingestion derives it deterministically; for the driver corpus
``events.event_id`` already is one.

Scale note: ``with_sample_idx`` uses a window over the full series which
is a global sort per series — acceptable because it runs ONCE at
ingestion and the result is persisted partitioned by series, bucketed by
``floor(sample_idx / bucket)`` so downstream window ops never re-sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_sample_idx(
    df: DataFrame,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
    out: str = "sample_idx",
) -> DataFrame:
    """0-based dense row index per series partition, by explicit sort keys.

    Mirrors the pandas positional index the reference relies on
    (e.g. /root/reference/src/training/trainer.py:75-78 windows by
    position). ``order_by`` must be a deterministic total order (include a
    unique tie-breaker column).
    """
    w = Window.partitionBy(*(partition_by or [])).orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w) - F.lit(1))
