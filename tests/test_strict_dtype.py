"""Regression: the oracle mirror is dtype-exact like the driver's hash.

Round 3's only red row (mm1_media_manifest) was a pure dtype artifact:
Spark summed to bigint, DuckDB's HUGEINT sum reached pandas as float64,
every value matched, but the driver's value hash is dtype-sensitive.
The in-repo mirror missed it because its float comparison was tolerant.
These tests pin the fix (VERDICT r3 item 3): ``compare()`` must flag an
int64-vs-float64 column even when values agree, and a deliberately
un-cast DuckDB integer ``sum()`` must fail the mirror end-to-end.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import compare  # noqa: E402


def test_int_vs_float_same_values_flagged():
    a = pd.DataFrame({"k": ["x", "y"], "total": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "total": pd.array([1.0, 2.0], dtype="float64")})
    problems = compare(a, b)
    assert any("dtype col total" in p for p in problems), problems


def test_int_vs_float_tolerant_mode_passes():
    a = pd.DataFrame({"total": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"total": pd.array([1.0, 2.0], dtype="float64")})
    assert compare(a, b, strict_dtype=False) == []


def test_matching_dtypes_pass():
    a = pd.DataFrame({"n": pd.array([3, 4], dtype="int64"), "v": [0.5, 1.5]})
    b = pd.DataFrame({"n": pd.array([3, 4], dtype="int64"), "v": [0.5, 1.5]})
    assert compare(a, b) == []


def test_integer_width_mismatch_flagged():
    """ADVICE r4: same-kind but different-width numerics (int32 vs
    int64) are flagged too — a CAST in the oracle SQL is cheap
    insurance against a width-sensitive driver hash."""
    a = pd.DataFrame({"n": pd.array([3, 4], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([3, 4], dtype="int64")})
    problems = compare(a, b)
    assert any("dtype-width col n" in p for p in problems), problems
    assert compare(a, b, strict_dtype=False) == []


def test_datetime_resolution_not_flagged():
    """Spark converts timestamps to datetime64[ns], DuckDB to
    datetime64[us]; queries with exactly this difference (q3/p4/p5/
    w10/k1) have green driver rows, so resolution is canonicalized
    away rather than flagged."""
    ts = pd.to_datetime(["2024-01-01 00:00:01", "2024-01-02 03:04:05"])
    a = pd.DataFrame({"ts": ts.astype("datetime64[ns]")})
    b = pd.DataFrame({"ts": ts.astype("datetime64[us]")})
    assert compare(a, b) == []


def test_uncast_duckdb_sum_fails_mirror():
    """A DuckDB ``sum()`` over INT yields HUGEINT -> float64 in pandas;
    without a CAST the strict mirror must fail against Spark's bigint."""
    con = duckdb.connect()
    uncast = con.execute("SELECT sum(x) AS total FROM (VALUES (1), (2)) t(x)").fetchdf()
    cast = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS total FROM (VALUES (1), (2)) t(x)"
    ).fetchdf()
    con.close()
    spark_like = pd.DataFrame({"total": pd.array([3], dtype="int64")})
    assert any("dtype col total" in p for p in compare(spark_like, uncast))
    assert compare(spark_like, cast) == []
