"""Skew-aware aggregation via key salting.

No reference equivalent (single-process pandas never skews); this is
100-TB hygiene (SURVEY §4 "shuffle/partitioning strategy: ours to
design"). AQE's skew-join splitting handles JOIN skew at runtime; a
skewed GROUP BY with non-decomposed high-cardinality state (e.g.
collect_list, exact distinct) still hot-spots one reducer. The classic
fix: two-phase aggregation over a deterministic salt.

Phase 1 groups by (keys, salt) — the hot key's rows spread over
``salt_buckets`` reducers; phase 2 re-combines partials per key. Only
algebraic measures (sum/count/min/max/avg) are offered: they decompose
exactly, so the result is bit-equal to the unsalted aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE1 = {
    # F.count(col) (null-ignoring), NOT count(lit(1)): groupBy().agg(
    # count(col)) skips NULLs, and the avg denominator must count only
    # non-null measure values for parity with the unsalted aggregate.
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


def salt_column(df: DataFrame, salt_buckets: int, keys: list[str]) -> Column:
    """Deterministic salt: hash of every column PLUS the input
    partition id. Hashing row values alone is a no-op for a hot key
    whose rows are duplicates (the common skew shape — identical
    non-key values all hash to one bucket); mixing in
    ``spark_partition_id()`` spreads such rows across as many buckets
    as there are upstream partitions while staying deterministic for a
    fixed input partitioning (task retries recompute the same salt,
    unlike a per-row counter)."""
    return F.pmod(
        F.hash(*df.columns, F.spark_partition_id()), F.lit(salt_buckets)
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """``measures``: out_name -> (fn, col) with fn in
    sum|count|min|max|avg. Exactly equivalent to
    ``df.groupBy(keys).agg(...)`` but immune to a single hot key."""
    plan: dict[str, tuple[str, str]] = {}
    needs_avg: dict[str, str] = {}
    for out, (fn, col) in measures.items():
        if fn == "avg":
            plan[f"__{out}_sum"] = ("sum", col)
            plan[f"__{out}_cnt"] = ("count", col)
            needs_avg[out] = col
        elif fn in _PHASE1:
            plan[out] = (fn, col)
        else:
            raise ValueError(f"non-decomposable measure: {fn}")

    salted = df.withColumn("__salt", salt_column(df, salt_buckets, keys))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PHASE1[fn](col).alias(out) for out, (fn, col) in plan.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[_PHASE2[fn](out).alias(out) for out, (fn, _) in plan.items()]
    )
    for out in needs_avg:
        final = final.withColumn(
            out, F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")
        ).drop(f"__{out}_sum", f"__{out}_cnt")
    return final
