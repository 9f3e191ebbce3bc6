"""Golden-log replay (SURVEY §5.2): the reference's committed result
logs (/root/reference/logs/*, the only machine-checkable artifacts the
reference produces) are consumed with our S7 JSON scan and driven
through our evaluation operators. Asserts both the documented shapes
(SURVEY §6: 25 epochs; 35,320 / 3,936 / 103,612 centralized periods;
984 × 4 federated; 3,925 baseline) and that our threshold → rolling-min
→ first-crossing chain produces a sane evaluation table from the real
MSE series."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators import crossing, rolling, threshold

LOGS = "/root/reference/logs"
EXPECTED_MSE_LEN = {
    "bearing_experiment-1": 35320,
    "bearing_experiment-2": 3936,
    "bearing_experiment-3": 103612,
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LOGS), reason="reference logs not present"
)


def test_centralized_log_shapes():
    for exp, n_mse in EXPECTED_MSE_LEN.items():
        d = json.load(open(f"{LOGS}/{exp}/centralized.json"))
        assert len(d["lstm"]["loss"]) == 25
        assert len(d["lstm"]["mse"]) == n_mse


def test_federated_log_shapes():
    d = json.load(open(f"{LOGS}/bearing_experiment-2/federated.json"))
    assert set(d) == {"0", "1", "2", "3"}
    for client in d.values():
        assert len(client["lstm"]["mse"]) == 984
        assert len(client["lstm"]["loss"]) == 25


def test_losses_decrease_overall():
    d = json.load(open(f"{LOGS}/bearing_experiment-2/centralized.json"))
    losses = d["lstm"]["loss"]
    assert losses[-1] < losses[0]


def test_replay_golden_mse_through_evaluation_chain(spark):
    """Load the real per-period MSE series as a DataFrame, reshape to
    per-bearing columns (order='F' semantics: period-major over 4
    bearings, visualization.py:66-73), then threshold/rolling-min/
    first-crossing per bearing."""
    d = json.load(open(f"{LOGS}/bearing_experiment-2/centralized.json"))
    mse = d["lstm"]["mse"]
    n_bearings = 4
    periods = len(mse) // n_bearings
    # order='F' reshape: bearing b, period p -> mse[b * periods + p]
    pdf = pd.DataFrame(
        {
            "bearing": [b for b in range(n_bearings) for _ in range(periods)],
            "period_idx": list(range(periods)) * n_bearings,
            "mse": mse,
        }
    )
    df = spark.createDataFrame(pdf)
    val = df.filter(F.col("period_idx") < int(periods * 0.1))
    thr = threshold.fit_threshold(val, "mse", n_std=4.0, keys=["bearing"])
    flagged = threshold.flag_anomalies(df, thr, "mse", keys=["bearing"])
    smoothed = rolling.rolling_min(
        flagged, "mse", window=3, partition_by=["bearing"],
        idx_col="period_idx", out="mse_smooth",
    )
    first = crossing.first_crossing(
        smoothed, "mse_smooth", F.col("threshold"),
        idx_col="period_idx", keys=["bearing", "threshold"],
        out="first_anomaly",
    ).collect()
    got = {r.bearing: r.first_anomaly for r in first}
    assert set(got) == {0, 1, 2, 3}
    # experiment 2 is a run-to-failure experiment: at least one bearing
    # must degrade (non-zero crossing), and crossings land strictly
    # inside the series
    assert any(v > 0 for v in got.values())
    assert all(0 <= v < periods for v in got.values())
