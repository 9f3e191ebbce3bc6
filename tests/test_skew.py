"""Salted two-phase aggregation must equal the plain groupBy exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators.skew import salted_aggregate


@pytest.fixture()
def skewed(spark):
    rng = np.random.default_rng(61)
    n = 5000
    # 90% of rows on one hot key
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    return spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": rng.normal(size=n), "w": rng.integers(0, 100, n)})
    )


def test_salted_equals_plain(spark, skewed):
    salted = salted_aggregate(
        skewed,
        ["k"],
        {
            "n": ("count", "v"),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "mean_w": ("avg", "w"),
        },
        salt_buckets=16,
    ).toPandas().set_index("k").sort_index()
    plain = (
        skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("w").alias("mean_w"),
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert list(salted.index) == list(plain.index)
    assert (salted["n"] == plain["n"]).all()
    for col in ["total", "lo", "hi", "mean_w"]:
        np.testing.assert_allclose(salted[col], plain[col], rtol=1e-9)


def test_salt_spreads_hot_key(spark, skewed):
    from anomaly_detection_iiot_spark.operators.skew import salt_column

    with_salt = skewed.withColumn("__salt", salt_column(skewed, 16, ["k"]))
    buckets = (
        with_salt.filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert buckets >= 12  # hot key spread over (almost) all buckets


def test_non_decomposable_rejected(skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(skewed, ["k"], {"x": ("median", "v")})
