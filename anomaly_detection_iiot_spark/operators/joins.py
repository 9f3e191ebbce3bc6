"""As-of join (SURVEY §2.4 W9 generalized; no reference equivalent —
the reference does searchsorted lookups, calculations.py:19-26, which is
an as-of join with one probe row).

Spark has no ASOF JOIN operator; a naive theta-join
(``probe.ts >= build.ts`` + max) is O(n·m). We use the union-sort trick:
tag both sides, union, and take ``last(build_value, ignoreNulls)`` over
an ordered window per key — one shuffle by key, one partition-local sort,
linear in n+m. This is the standard scalable formulation (equivalent to
what Flink/QuestDB do with a merge join on time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    probe_ts: str,
    build_ts: str,
    value_cols: list[str],
    out_ts: str | None = None,
) -> DataFrame:
    """For each probe row, attach ``value_cols`` from the latest build row
    with build_ts <= probe_ts (per ``on`` key). Left-join semantics:
    probes with no earlier build row keep NULLs.
    """
    keys = [on] if isinstance(on, str) else list(on)
    probe_cols = [c for c in probe.columns if c not in keys]
    p = probe.select(
        *keys,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        *[F.col(c) for c in probe_cols],
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    b = build.select(
        *keys,
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    unioned = p.unionByName(b)
    # Build rows sort before probe rows at equal ts => "at or before" wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *keys,
        "__ts",
        "__is_probe",
        *probe_cols,
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    res = filled.filter(F.col("__is_probe") == 1).drop("__is_probe")
    if out_ts:
        res = res.withColumnRenamed("__ts", out_ts)
    else:
        res = res.drop("__ts")
    return res
