"""Bucketed-table support: shuffle-free co-located joins.

No reference equivalent (single-process). At 100 TB the orders⋈lineitem
style join is THE dominant shuffle; pre-bucketing both fact tables on
the join key at ingestion removes the exchange from every subsequent
join/aggregation on that key (SURVEY §4: "co-locate joins via
bucketing"). Spark requires ``saveAsTable`` (catalog-managed) for
bucket metadata — plain ``parquet(path)`` drops it.

``assert_no_shuffle_join`` is used by tests to prove the property from
the physical plan rather than trusting documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a catalog table bucketed (and optionally sorted)
    by the join key. Sorting inside buckets additionally removes the
    sort from sort-merge joins."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key —
    planned without any Exchange when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    plan = plan_string(df)
    return sum(
        line.strip().lstrip("+-* (0123456789)").startswith("Exchange")
        for line in plan.splitlines()
    )
