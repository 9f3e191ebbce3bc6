"""Attribute per-query "compile" (construction) time: pure py4j plan
building vs construction-time EXECUTION.

r12's verdict flagged seven headline rows spending >0.5 s in
BENCH_DETAIL compile_sec and prescribed the expr-string / lazy-
checkpoint recipe. Probing (r13) showed the premise only half-holds:
under AQE, ``DataFrame.localCheckpoint(eager=False)`` calls ``toRdd``,
and ``AdaptiveSparkPlanExec`` materializes every shuffle map stage
eagerly at that point — i.e. a "lazy" checkpoint runs all-but-the-
final-stage of its subplan DURING fn() construction (measured: t17's
edge build = 3 jobs, ~0.85 s of its 0.96 s "compile"). Driver-round
loops (m9's FedAvg collects, s13/t16 argmax rounds) and multi-job
roundtrips (s14/s17 writes) likewise run real jobs inside fn().

This probe splits construction wall into:
  - ``jobs_sec``: time inside DataFrame actions triggered during
    fn()+schema (localCheckpoint, collect, count, toPandas, write)
  - ``pure_sec``: wall - jobs_sec = py4j plan building + analysis —
    the only part the compile-trim recipe can shrink.

Usage: python tools/compile_attribution.py [sf_dir] [query ...]
Prints one line per query; with no names, runs the seven r12-flagged
rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = [
    "t17_textrank",
    "s14_upsert_roundtrip",
    "s17_occ_committers",
    "d8_dup_clusters",
    "g1_triangle_count",
    "m9_fedavg_weights",
    "s6_ivfpq_ann",
]

_ACTION_TIME = {"t": 0.0}


def _patch_actions():
    """Wrap every DataFrame/writer entry point that can launch jobs so
    time spent inside them during fn() lands in the jobs bucket."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF
    from pyspark.sql.readwriter import DataFrameWriter

    patched = []

    def wrap(owner, name):
        orig = getattr(owner, name)

        def timed(self, *a, **kw):
            t0 = time.time()
            try:
                return orig(self, *a, **kw)
            finally:
                _ACTION_TIME["t"] += time.time() - t0

        setattr(owner, name, timed)
        patched.append((owner, name, orig))

    for m in ("localCheckpoint", "checkpoint", "collect", "count",
              "toPandas", "first", "head", "take"):
        if hasattr(CDF, m):
            wrap(CDF, m)
    for m in ("save", "saveAsTable", "parquet", "json", "csv", "orc"):
        if hasattr(DataFrameWriter, m):
            wrap(DataFrameWriter, m)
    return patched


def _unpatch(patched):
    for owner, name, orig in patched:
        setattr(owner, name, orig)


def main() -> None:
    from anomaly_detection_iiot_spark.queries import REGISTRY
    from anomaly_detection_iiot_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)] or DEFAULT_NAMES

    spark = get_spark("compile-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()
    # warm JVM/codegen so run-1 cold costs don't pollute attribution
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    print(f"{'query':28s} {'wall':>6s} {'jobs_sec':>8s} {'pure_sec':>8s} {'njobs':>5s}")
    for name in names:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            patched = _patch_actions()
            _ACTION_TIME["t"] = 0.0
            j0 = set(st.getJobIdsForGroup(None))
            t0 = time.time()
            try:
                df = REGISTRY[name].fn(spark, sf_dir)
                df.schema
            finally:
                _unpatch(patched)
            wall = time.time() - t0
            njobs = len(set(st.getJobIdsForGroup(None)) - j0)
            rec = (wall, _ACTION_TIME["t"], max(0.0, wall - _ACTION_TIME["t"]), njobs)
            if best is None or rec[0] < best[0]:
                best = rec
        print(
            f"{name:28s} {best[0]:6.3f} {best[1]:8.3f} {best[2]:8.3f} "
            f"{best[3]:5d}"
        )


if __name__ == "__main__":
    main()
