"""KBM pump/industrial-machine sensor source (SURVEY §2.1/§1.1).

Reference semantics (/root/reference/src/data/pipeline.py:12-34): CSV
with ``vibration-x/y/z``, a ``tags`` string embedding
``"...temperature=<v> ..."`` (pipeline.py:30-31), a fractional ``time``
column truncated to seconds (pipeline.py:33), rows sorted by time
(pipeline.py:32); per-machine anomaly timestamps are hardcoded literals
(pipeline.py:7-11). Two timestamp formats occur in the wild
(calculations.py:14-17) — handled with a coalesce of parsers (P5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FORMATS = ("yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy HH:mm:ss")


def parse_ts_multi(col: Column, formats: tuple[str, ...] = TS_FORMATS) -> Column:
    """P5: first format that parses wins (calculations.py:14-17).
    try_to_timestamp, not to_timestamp: ANSI mode (Spark 4 default)
    makes the latter THROW on the first non-matching format."""
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])


def read_kbm_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5+P3+P4+O1: scan, extract temperature from the tags map-string,
    truncate time to seconds, order by time."""
    raw = spark.read.option("header", "true").csv(path)
    temp = F.regexp_extract(
        F.col("tags"), r"temperature=([0-9.eE+\-]+)", 1
    ).cast("double")
    time_sec = F.substring_index(F.col("time"), ".", 1)
    return (
        raw.withColumn("temperature", temp)
        .withColumn("time_sec", time_sec)
        .withColumn("ts", parse_ts_multi(F.col("time_sec")))
        .select(
            F.col("vibration-x").cast("double").alias("vibration_x"),
            F.col("vibration-y").cast("double").alias("vibration_y"),
            F.col("vibration-z").cast("double").alias("vibration_z"),
            "temperature",
            "time_sec",
            "ts",
        )
        .orderBy("ts")
    )


def with_anomaly_labels(
    df: DataFrame, anomaly_ts: list[str], ts_col: str = "ts"
) -> DataFrame:
    """Label rows at/after any hardcoded anomaly timestamp within a
    1-hour episode window (pipeline.py:7-11's literals generalized to a
    broadcast range join)."""
    spark = df.sparkSession
    anoms = spark.createDataFrame(
        [(t,) for t in anomaly_ts], "anom_ts_str string"
    ).select(parse_ts_multi(F.col("anom_ts_str")).alias("anom_ts"))
    joined = df.join(
        F.broadcast(anoms),
        (F.col(ts_col) >= F.col("anom_ts"))
        & (F.col(ts_col) < F.col("anom_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy(*df.columns)
        .agg(F.max(F.col("anom_ts").isNotNull().cast("int")).alias("is_anomaly"))
    )
