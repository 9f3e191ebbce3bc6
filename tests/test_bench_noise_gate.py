"""bench.py noise gate (r9 verdict item 1): suite-time outliers vs the
cross-round history are re-measured; only re-passes that come in
materially lower are reported as noise; confirmed-slow numbers stand
(a real regression is never masked). Pure-Python — Spark-free."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

bench = importlib.import_module("bench")


def _run(times, hist, repass_values, monkeypatch):
    calls = []

    def fake_measure(spark, name, sf_dir):
        calls.append(name)
        return repass_values[name], 0.01, 1

    monkeypatch.setattr(bench, "_measure_query", fake_measure)
    monkeypatch.setattr(bench, "_calibration", lambda spark: 0.2)
    compile_times = {k: 0.05 for k in times}
    flagged, cal2 = bench._noise_repass(
        None, "/nonexistent", times, compile_times, hist
    )
    return flagged, cal2, calls


def test_inflated_entry_is_remeasured_and_flagged(monkeypatch):
    times = {"q": 10.0, "ok": 1.0}
    hist = {"q": 2.0, "ok": 1.0}
    flagged, cal2, calls = _run(times, hist, {"q": 2.1}, monkeypatch)
    assert calls == ["q"]          # only the outlier re-measured
    assert flagged == ["q"]        # re-pass <0.75x first => noise
    assert times["q"] == 2.1       # final number is the better one
    assert cal2 == 0.2


def test_confirmed_slow_repass_is_not_masked(monkeypatch):
    times = {"q": 10.0}
    hist = {"q": 2.0}
    flagged, _, calls = _run(times, hist, {"q": 9.6}, monkeypatch)
    assert calls == ["q"]
    assert flagged == []           # slow confirmed => real signal
    assert times["q"] == 9.6       # min() still improves monotonically


def test_no_history_means_no_repass(monkeypatch):
    times = {"new_query": 50.0}
    flagged, cal2, calls = _run(times, {}, {}, monkeypatch)
    assert calls == [] and flagged == [] and cal2 is None


def test_small_absolute_deltas_below_floor_not_flagged(monkeypatch):
    # 2x of a tiny historical value is inside the +0.25s jitter floor
    times = {"q": 0.30}
    hist = {"q": 0.10}
    flagged, cal2, calls = _run(times, hist, {}, monkeypatch)
    assert calls == [] and flagged == []


def test_history_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_HISTORY_PATH", str(tmp_path / "h.json"))
    assert bench._load_history() == {}
    bench._save_history({"a": 1.5, "b": 0.25})
    assert bench._load_history() == {"a": 1.5, "b": 0.25}


def test_multi_second_25pct_regression_is_remeasured(monkeypatch):
    # r10 verdict item 6: 1.47 -> 1.86 (+27%) sat under the old pure-2x
    # bound; the 25%-band gate must re-measure it
    times = {"bp": 1.86}
    hist = {"bp": 1.47}
    flagged, _, calls = _run(times, hist, {"bp": 1.30}, monkeypatch)
    assert calls == ["bp"]
    assert flagged == ["bp"]
    assert times["bp"] == 1.30


def test_within_band_variation_not_remeasured(monkeypatch):
    times = {"q": 1.70}
    hist = {"q": 1.47}   # +16% and < +0.25s: inside the band
    flagged, _, calls = _run(times, hist, {}, monkeypatch)
    assert calls == [] and flagged == []
