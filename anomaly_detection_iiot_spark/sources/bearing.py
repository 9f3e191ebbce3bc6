"""Bearing / NASA-IMS-style snapshot-directory source (SURVEY §2.1
S1-S4, §1.1).

Reference semantics (/root/reference/src/data/bearing.py:27-33): one
tab-separated headerless CSV per ~1 s recording; the FILENAME is the
event timestamp ('%Y.%m.%d.%H.%M.%S', bearing.py:29); 20,480 rows per
file at 20,480 Hz (resampler.py:11); 4 or 8 float columns, one
accelerometer channel per bearing (config.yaml:43-46). The reference
appends every file into one CSV in a Python loop; here the whole
directory is ONE distributed scan — no loop, no append sink.

Ordering contract: ``sample_idx`` (position within its snapshot file)
is materialized at read time via a per-file row_number over
monotonically_increasing_id, which preserves within-partition file
order. Snapshot files (~1-2 MB) are far below
spark.sql.files.maxPartitionBytes, so each file is a single split and
the ordering is exact. ``global_idx`` = file rank × rows-per-file +
sample_idx gives the cross-file positional index the reference's
windowing relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

FILENAME_TS_RE = r"(\d{4}\.\d{2}\.\d{2}\.\d{2}\.\d{2}\.\d{2})"
FILENAME_TS_FMT = "yyyy.MM.dd.HH.mm.ss"


def snapshot_schema(n_cols: int) -> StructType:
    return StructType(
        [StructField(f"c{i}", DoubleType()) for i in range(n_cols)]
    )


def read_snapshot_dir(
    spark: SparkSession,
    path: str,
    n_cols: int,
    channel_positions: list[int] | None = None,
    experiment: str = "experiment",
) -> DataFrame:
    """S1+S2+P2: one distributed TSV scan of every snapshot file, with
    the filename timestamp attached to each row and positional channel
    projection (config.yaml:42-47 uses cols [0,2,4,6] or [0,1,2,3])."""
    raw = (
        spark.read.option("sep", "\t")
        .schema(snapshot_schema(n_cols))
        .csv(path)
        .withColumn("_file", F.input_file_name())
    )
    positions = channel_positions or list(range(n_cols))
    kept = raw.select(
        "_file",
        *[F.col(f"c{p}").alias(f"vibration_{i}") for i, p in enumerate(positions)],
    )
    file_ts = F.to_timestamp(
        F.regexp_extract(F.col("_file"), FILENAME_TS_RE, 1), FILENAME_TS_FMT
    )
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    return (
        kept.withColumn("file_ts", file_ts)
        .withColumn("sample_idx", F.row_number().over(w) - F.lit(1))
        .withColumn("experiment", F.lit(experiment))
        .drop("_file")
    )


def to_canonical_long(
    df: DataFrame,
    n_channels: int,
    rows_per_file: int = 20480,
) -> DataFrame:
    """S3/S4 + P11: the canonical long table
    (experiment, channel, file_ts, sample_idx, global_idx, value).

    Replaces the reference's append-CSV + restructure stacking
    (bearing.py:30-33, restructure.py:12-14) with one unpivot; the
    cross-file ``global_idx`` uses dense_rank over file_ts so windows
    can span file boundaries exactly like the reference's concatenated
    series."""
    # stack(n, '0', vibration_0, '1', vibration_1, ...) — the unpivot
    pairs = ", ".join(f"'{i}', vibration_{i}" for i in range(n_channels))
    long = df.select(
        "experiment",
        "file_ts",
        "sample_idx",
        F.expr(f"stack({n_channels}, {pairs}) AS (channel, value)"),
    )
    # File rank via a tiny distinct + broadcast join, NOT a dense_rank
    # window over (experiment, channel): that window would pull an
    # entire channel's samples into ONE task's sort — the ingestion
    # bottleneck at 100 TB. The distinct is #files rows (map-side
    # partial agg), its window sort is trivial, and the join back is a
    # broadcast — the big table never shuffles.
    files = long.select("experiment", "file_ts").distinct()
    w = Window.partitionBy("experiment").orderBy("file_ts")
    ranks = files.withColumn(
        "__file_rank", (F.dense_rank().over(w) - 1).cast("long")
    )
    return long.join(F.broadcast(ranks), ["experiment", "file_ts"]).withColumn(
        "global_idx",
        F.col("__file_rank") * rows_per_file + F.col("sample_idx"),
    ).drop("__file_rank")


def write_canonical(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ("experiment", "channel")
) -> None:
    """Partitioned parquet sink — partition pruning on (experiment,
    channel) replaces the reference's per-file suffix filters
    (resampler.py:23, restructure.py:7)."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
