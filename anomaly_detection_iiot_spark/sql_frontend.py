"""SQL front-end: run ANSI SQL text directly against the engine.

The registry's DataFrame builders are one face of the engine; this is
the other — a user with existing SQL runs it verbatim through
``spark.sql`` over the same tables. ``register_views`` exposes the
testdata tables under their canonical names (the same names the DuckDB
oracle uses), so any oracle string that sticks to the ANSI subset both
engines share (no DuckDB list_*/QUALIFY/generate_subscripts) is ALSO a
valid engine query. tests/test_sql_frontend.py proves it: for every
TPC-H shape the literal oracle SQL and the DataFrame plan return
identical rows from the same SparkSession — same Catalyst planner,
two input surfaces.

At 100 TB the views would be catalog tables (saveAsTable / external
metastore) — temp views here only because the harness ships bare
parquet; the query text is unchanged either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .queries.base import t

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the corpus under canonical names for spark.sql text.

    Goes through ``queries.base.t`` so SQL sees the SAME normalized
    types (LTZ timestamps, micros events.ts) the DataFrame builders
    see — registering raw parquet paths instead would silently fork
    timestamp semantics between the two surfaces.
    """
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            t(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
