"""Hive-style partitioned layout: partition pruning at the scan.

No reference equivalent (the reference reads whole directories). At
100 TB the cheapest byte is the one never read: laying the corpus out
as ``path/lang=en/...`` turns every predicate on the partition column
into DIRECTORY pruning — the scan never lists, opens, or reads
non-matching partitions, before row-group stats or column pruning even
apply. This composes with bucketing (sources/bucketed.py): partition
by the coarse selector (language / source / date), bucket by the join
key inside each partition.

``partition_filters`` extracts the pruning evidence from the executed
plan so tests assert the property, not the documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Plain-path parquet with Hive-style partition dirs. Rows are
    pre-shuffled onto their partition values so each task writes at
    most its own partition's files instead of every task opening a
    writer per value (the small-files explosion at 1000 executors)."""
    (
        df.repartition(*[df[c] for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back typed from directory names; any
    filter on them prunes at planning/runtime, never touching data."""
    return spark.read.parquet(path)


def files_read(df: DataFrame) -> int:
    """Execute ``df`` and return the scan's ``numFiles`` SQL metric —
    the number of files the pruned scan actually listed for read, the
    ground truth behind the PartitionFilters string. Counts across all
    file scans in the plan (sum), so single-table frames get exactly
    their scan's value."""
    df.collect()
    ep = df._jdf.queryExecution().executedPlan()
    if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        ep = ep.executedPlan()
    leaves = ep.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        metrics = leaves.apply(i).metrics()
        if metrics.contains("numFiles"):
            total += metrics.apply("numFiles").value()
    return total


def partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` clause of the scan node in the
    executed plan (empty string if the scan has none)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters:" in line:
            start = line.index("PartitionFilters:")
            return line[start:].split("]", 1)[0] + "]"
    return ""
