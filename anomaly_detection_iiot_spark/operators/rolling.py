"""Rolling / cumulative window operators (SURVEY §2.4 W5, W6, W12, W13).

Reference semantics:
- rolling min of 3 before thresholding (/root/reference/src/evaluation/
  visualization.py:82, ROLLING_MIN=3 in config.yaml:37)
- rolling mean of 5 for smoothing (visualization.py:134,141)
- cumulative certainty sum ((mse-thr).clip(0)/thr).cumsum()
  (visualization.py:249-255)
- lookback alignment shift (visualization.py:67)

Spark mapping: window functions over ``partitionBy(series).orderBy(idx)``.
Scale note: each window is bounded (rowsBetween) and partitioned by the
series key, so state per task is O(window) and the only shuffle is the
hash partition by series — no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _w(partition_by: list[str], idx_col: str) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(idx_col)


def rolling_min(
    df: DataFrame, value_col: str, window: int = 3,
    partition_by: list[str] = (), idx_col: str = "sample_idx",
    out: str = "rolling_min",
) -> DataFrame:
    w = _w(list(partition_by), idx_col).rowsBetween(-(window - 1), 0)
    return df.withColumn(out, F.min(value_col).over(w))


def rolling_mean(
    df: DataFrame, value_col: str, window: int = 5,
    partition_by: list[str] = (), idx_col: str = "sample_idx",
    out: str = "rolling_mean",
) -> DataFrame:
    w = _w(list(partition_by), idx_col).rowsBetween(-(window - 1), 0)
    return df.withColumn(out, F.avg(value_col).over(w))


def cumulative_sum(
    df: DataFrame, expr: Column,
    partition_by: list[str] = (), idx_col: str = "sample_idx",
    out: str = "cumsum",
) -> DataFrame:
    w = _w(list(partition_by), idx_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(expr).over(w))


def certainty_accumulation(
    df: DataFrame, mse_col: str, threshold_col: str,
    partition_by: list[str] = (), idx_col: str = "sample_idx",
    out: str = "certainty",
) -> DataFrame:
    """((mse - thr).clip(0) / thr).cumsum() — visualization.py:249-255."""
    excess = F.greatest(F.lit(0.0), F.col(mse_col) - F.col(threshold_col)) / F.col(threshold_col)
    return cumulative_sum(df, excess, partition_by, idx_col, out)


def lag_shift(
    df: DataFrame, value_col: str, offset: int,
    partition_by: list[str] = (), idx_col: str = "sample_idx",
    out: str = "shifted",
) -> DataFrame:
    """Shift a series down by ``offset`` rows, head-filled with the row's
    own value (reference's lookback realignment, visualization.py:67 does
    concat([mse[:20], mse[:-20]]) — position i<20 keeps mse[i])."""
    w = _w(list(partition_by), idx_col)
    lagged = F.lag(value_col, offset).over(w)
    return df.withColumn(out, F.coalesce(lagged, F.col(value_col)))
