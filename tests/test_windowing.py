"""Windowing invariants (SURVEY §5.3): Spark window builders vs the
reference's positional-slice semantics computed in plain Python."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators import windowing


def _series_df(spark, values, key="k0"):
    pdf = pd.DataFrame(
        {"series": key, "sample_idx": range(len(values)), "value": values}
    )
    return spark.createDataFrame(pdf)


def _reference_windows(values, size, step):
    """trainer.py:75-78 semantics: [v[i:i+size] for i in range(0, n, step)]
    keeping only complete windows."""
    return [
        values[i : i + size]
        for i in range(0, len(values), step)
        if len(values[i : i + size]) == size
    ]


@pytest.mark.parametrize("n,size,step", [(10, 4, 2), (10, 4, 4), (9, 3, 1), (4, 4, 2), (3, 4, 2)])
def test_window_arrays_match_reference_slices(spark, n, size, step):
    values = [float(i * i % 7) for i in range(n)]
    got = (
        windowing.window_arrays(
            _series_df(spark, values), size=size, step=step,
            keys=["series"],
        )
        .orderBy("window_idx")
        .collect()
    )
    expected = _reference_windows(values, size, step)
    assert [list(r.window) for r in got] == expected
    assert [r.window_idx for r in got] == list(range(len(expected)))


def test_window_arrays_never_cross_series(spark):
    df = _series_df(spark, [1.0] * 6, "a").unionByName(
        _series_df(spark, [2.0] * 6, "b")
    )
    got = windowing.window_arrays(df, size=4, step=2, keys=["series"]).collect()
    for r in got:
        assert len(set(r.window)) == 1  # values never mix across series


def test_assign_window_ids_matches_bruteforce(spark):
    size, step, n = 6, 3, 20
    df = _series_df(spark, [0.0] * n)
    got = (
        windowing.assign_window_ids(df, size=size, step=step)
        .groupBy("window_idx")
        .agg(F.sort_array(F.collect_list("sample_idx")).alias("members"))
        .orderBy("window_idx")
        .collect()
    )
    expected = {}
    for idx in range(n):
        for w in range(0, n):
            if w * step <= idx < w * step + size:
                expected.setdefault(w, []).append(idx)
    assert {r.window_idx: list(r.members) for r in got} == expected


def test_stride_filter_keeps_even_windows(spark):
    df = _series_df(spark, [0.0] * 20)
    wins = windowing.assign_window_ids(df, size=4, step=2)
    kept = windowing.stride_filter(wins, every=2)
    ids = {r.window_idx for r in kept.select("window_idx").distinct().collect()}
    assert ids == {w for w in range(10) if w % 2 == 0}


def test_lookback_arrays(spark):
    values = [float(i) for i in range(8)]
    got = (
        windowing.lookback_arrays(
            _series_df(spark, values), lookback=3, value_cols=["value"],
            keys=["series"],
        )
        .orderBy("sample_idx")
        .collect()
    )
    # rows 0,1 dropped (incomplete lookback); row i carries [i-2, i-1, i]
    assert [r.sample_idx for r in got] == list(range(2, 8))
    assert [list(r.lookback_value) for r in got] == [
        [float(i - 2), float(i - 1), float(i)] for i in range(2, 8)
    ]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=40),
    size_mult=st.integers(min_value=1, max_value=4),
    step=st.integers(min_value=1, max_value=8),
)
def test_window_count_invariant(n, size_mult, step):
    """Complete-window count == len(range slices) for any (n, size, step)
    with size a multiple of step — pure-python mirror of the Spark
    builder's filter arithmetic."""
    size = step * size_mult
    expected = len(_reference_windows(list(range(n)), size, step))
    # the builder keeps anchors idx%step==0 with idx+size <= n
    got = len([i for i in range(0, n, step) if i + size <= n])
    assert got == expected
