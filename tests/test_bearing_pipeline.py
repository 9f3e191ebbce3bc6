"""End-to-end bearing pipeline test: synthesized snapshot files with an
injected late-file anomaly must be detected on the right channel at the
right period; the quiet channel must return the 0 sentinel."""

from __future__ import annotations

import numpy as np
import pytest

from anomaly_detection_iiot_spark.ml import autoencoder as ae
from anomaly_detection_iiot_spark.plans.bearing_pipeline import (
    bearing_anomaly_report,
)

ROWS_PER_FILE = 64
N_FILES = 8


@pytest.fixture()
def snapshot_dir(tmp_path):
    """8 snapshot files x 64 rows x 2 channels. Channel 0 is stationary
    noise; channel 1 goes wild in the last three files (the W5 rolling
    min of 3 only fires on >= 3 consecutive anomalous periods —
    exactly why the reference uses it as a debounce)."""
    rng = np.random.default_rng(41)
    for f in range(N_FILES):
        stamp = f"2004.02.12.10.{32 + f:02d}.00"
        c0 = rng.normal(0, 1, ROWS_PER_FILE)
        scale = 40.0 if f >= N_FILES - 3 else 1.0
        c1 = rng.normal(0, scale, ROWS_PER_FILE)
        lines = "\n".join(f"{a:.6f}\t{b:.6f}" for a, b in zip(c0, c1))
        (tmp_path / stamp).write_text(lines + "\n")
    return str(tmp_path)


def test_bearing_pipeline_detects_injected_anomaly(spark, snapshot_dir):
    weights = ae.init_weights([8, 4, 2, 4, 8], seed=55)
    report = bearing_anomaly_report(
        spark,
        snapshot_dir,
        weights,
        n_cols=2,
        rows_per_file=ROWS_PER_FILE,
        resample_factor=4,   # 512 samples/channel -> 128 chunks
        window_size=8,
        window_step=8,       # -> 16 windows
        period=2,            # -> 8 periods; anomaly in last 2 files = last 2 periods
        n_std=4.0,
    )
    rows = {r.channel: r for r in report.collect()}
    assert set(rows) == {"0", "1"}
    # quiet channel: sentinel 0 (never crosses)
    assert rows["0"].first_anomaly_period == 0
    # wild channel: crossing within the final quarter of periods
    assert rows["1"].first_anomaly_period >= 5
    assert rows["1"].threshold is not None


def test_bearing_pipeline_deterministic(spark, snapshot_dir):
    weights = ae.init_weights([8, 4, 2, 4, 8], seed=55)
    kw = dict(
        n_cols=2, rows_per_file=ROWS_PER_FILE, resample_factor=4,
        window_size=8, window_step=8, period=2,
    )
    a = sorted(
        map(tuple, bearing_anomaly_report(spark, snapshot_dir, weights, **kw).collect())
    )
    b = sorted(
        map(tuple, bearing_anomaly_report(spark, snapshot_dir, weights, **kw).collect())
    )
    assert a == b
