"""eval_tail (the single-pass window formulation) must be value-
equivalent to the reference-shaped operator composition
fit_threshold → flag → rolling_min → first_crossing it replaced."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators import crossing, rolling, threshold
from anomaly_detection_iiot_spark.plans.eval_tail import evaluation_tail


def _random_periods(seed: int, n_keys: int = 5, periods: int = 40):
    rng = np.random.default_rng(seed)
    frames = []
    for k in range(n_keys):
        mse = np.abs(rng.normal(1, 0.2, periods))
        # half the keys get a late burst (crossing exists)
        if k % 2 == 0:
            mse[periods - 8 :] *= 8
        frames.append(
            pd.DataFrame(
                {"key": k, "period_idx": range(periods), "mse": mse}
            )
        )
    return pd.concat(frames, ignore_index=True)


def _composed(df, validation_fraction=0.1):
    maxp = df.groupBy("key").agg(F.max("period_idx").alias("__maxp"))
    joined = df.join(F.broadcast(maxp), "key")
    val = F.col("period_idx") < F.greatest(
        F.lit(2),
        F.floor((F.col("__maxp") + F.lit(1)) * validation_fraction),
    )
    thr = threshold.fit_threshold(
        joined.filter(val), "mse", n_std=4.0, keys=["key"]
    )
    flagged = threshold.flag_anomalies(
        joined.drop("__maxp"), thr, "mse", keys=["key"]
    )
    smoothed = rolling.rolling_min(
        flagged, "mse", window=3, partition_by=["key"],
        idx_col="period_idx", out="mse_smooth",
    )
    return crossing.first_crossing(
        smoothed, "mse_smooth", F.col("threshold"),
        idx_col="period_idx", keys=["key", "threshold"],
        out="first_anomaly_period",
    )


def test_eval_tail_matches_reference_count_slice(spark):
    """Threshold must come from the count-based validation slice
    values[:int(n_periods*0.1)] (visualization.py:80) — not the
    index-based `idx <= max_idx*0.1` form, which includes one extra
    period whenever n*0.1 is fractional."""
    pdf = _random_periods(7, n_keys=3, periods=40)
    got = {
        r.key: r.threshold
        for r in evaluation_tail(
            spark.createDataFrame(pdf), ["key"]
        ).collect()
    }
    for k in range(3):
        s = pdf[pdf.key == k].sort_values("period_idx")["mse"].to_numpy()
        val = s[: int(len(s) * 0.1)]
        exp = val.mean() + 4.0 * val.std(ddof=1)
        np.testing.assert_allclose(got[k], exp, rtol=1e-9)


def test_eval_tail_equals_operator_composition(spark):
    for seed in (11, 23, 47):
        df = spark.createDataFrame(_random_periods(seed))
        fast = {
            r.key: (r.threshold, r.first_anomaly_period)
            for r in evaluation_tail(df, ["key"]).collect()
        }
        slow = {
            r.key: (r.threshold, r.first_anomaly_period)
            for r in _composed(df).collect()
        }
        assert fast.keys() == slow.keys()
        for k in fast:
            np.testing.assert_allclose(fast[k][0], slow[k][0], rtol=1e-12)
            assert fast[k][1] == slow[k][1]
