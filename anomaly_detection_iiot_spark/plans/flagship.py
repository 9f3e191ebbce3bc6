"""Flagship end-to-end anomaly pipeline (SURVEY §7.2) on the driver
corpus: the reference's scoring path re-expressed on ``events``.

events (ts, user_id≈channel, value≈vibration)
  → A2 per-period mean-square over chunks of the per-user sample index
  → A3/M11 threshold = mean + 4·std over the validation prefix (first
    10 % of periods, visualization.py:80)
  → W5 rolling min of 3 (visualization.py:82)
  → W8 first crossing with 0 sentinel (visualization.py:89-94)

All stages are DataFrame-native: two hash aggregates, one broadcast
join, one bounded window — no UDFs, no collect until the driver sinks
the (per-user) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import crossing, rolling, threshold
from ..queries.base import t


def flagship_anomaly_report(
    spark: SparkSession,
    sf_dir: str,
    period: int = 20,
    n_std: float = 4.0,
    validation_fraction: float = 0.1,
) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # per-user positional index (ingestion contract: explicit order key)
    idx = Window.partitionBy("user_id").orderBy("ts", "event_id")
    indexed = ev.withColumn("sample_idx", F.row_number().over(idx) - F.lit(1))
    # A2: per-period mean square
    periods = indexed.groupBy(
        "user_id", (F.col("sample_idx") / period).cast("long").alias("period_idx")
    ).agg(
        F.avg(F.col("value") * F.col("value")).alias("mse"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    # validation slice: first 10% of periods per user
    maxp = periods.groupBy("user_id").agg(F.max("period_idx").alias("__maxp"))
    periods = periods.join(F.broadcast(maxp), "user_id")
    # at least 2 validation periods so stddev_samp is defined at tiny SFs
    val_filter = F.col("period_idx") <= F.greatest(
        F.lit(1), F.col("__maxp") * validation_fraction
    )
    thr = threshold.fit_threshold(
        periods.filter(val_filter), "mse", n_std=n_std, keys=["user_id"]
    )
    flagged = threshold.flag_anomalies(
        periods.drop("__maxp"), thr, "mse", keys=["user_id"]
    )
    # W5: rolling min smoothing before crossing detection
    smoothed = rolling.rolling_min(
        flagged, "mse", window=3, partition_by=["user_id"], idx_col="period_idx",
        out="mse_smooth",
    )
    # W8: first period whose smoothed MSE crosses the threshold
    first = crossing.first_crossing(
        smoothed.withColumn("crossed", F.col("mse_smooth")),
        "crossed",
        F.col("threshold"),
        idx_col="period_idx",
        keys=["user_id", "threshold"],
        out="first_anomaly_period",
    )
    return first.select(
        "user_id",
        F.round("threshold", 6).alias("threshold"),
        "first_anomaly_period",
    )
