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


# Dialect-compat shims: pure SQL scalar functions (Spark 3.5+ SQL UDFs,
# inlined by Catalyst at analysis time — no Python, no serialization)
# that give Spark the handful of function NAMES the shared oracle
# dialect spells the DuckDB way. Each body is the exact Spark builtin;
# array params rely on Spark's implicit element coercion (size() is
# length-preserving under element cast, so array_length is type-safe
# for any element type). Lambda-taking functions (list_transform) can't
# be shimmed — oracle text uses the shared `filter`/arrow spelling for
# those instead.
COMPAT_SHIMS = [
    "CREATE OR REPLACE TEMPORARY FUNCTION string_split_regex(s STRING, p STRING) "
    "RETURNS ARRAY<STRING> RETURN split(s, p)",
    "CREATE OR REPLACE TEMPORARY FUNCTION array_length(a ARRAY<STRING>) "
    "RETURNS INT RETURN size(a)",
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch(t TIMESTAMP) "
    "RETURNS DOUBLE RETURN unix_micros(t) / 1e6",
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(t TIMESTAMP) "
    "RETURNS BIGINT RETURN unix_micros(t)",
    "CREATE OR REPLACE TEMPORARY FUNCTION json_extract_string(j STRING, p STRING) "
    "RETURNS STRING RETURN get_json_object(j, p)",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_contains(a ARRAY<STRING>, v STRING) "
    "RETURNS BOOLEAN RETURN array_contains(a, v)",
    "CREATE OR REPLACE TEMPORARY FUNCTION regexp_matches(s STRING, p STRING) "
    "RETURNS BOOLEAN RETURN regexp_like(s, p)",
    "CREATE OR REPLACE TEMPORARY FUNCTION array_to_string(a ARRAY<STRING>, d STRING) "
    "RETURNS STRING RETURN array_join(a, d)",
    # sort_array/array_distinct are element-type-generic after Spark's
    # implicit coercion; the string carrier preserves length and
    # equality for the token-array usages these shims serve
    "CREATE OR REPLACE TEMPORARY FUNCTION list_sort(a ARRAY<STRING>) "
    "RETURNS ARRAY<STRING> RETURN sort_array(a)",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_distinct(a ARRAY<STRING>) "
    "RETURNS ARRAY<STRING> RETURN array_distinct(a)",
    # DuckDB list_slice(a, s, e) is 1-based INCLUSIVE [s, e]; Spark
    # slice(a, start, length)
    "CREATE OR REPLACE TEMPORARY FUNCTION list_slice(a ARRAY<STRING>, s INT, e INT) "
    "RETURNS ARRAY<STRING> RETURN slice(a, s, e - s + 1)",
    "CREATE OR REPLACE TEMPORARY FUNCTION generate_series(a BIGINT, b BIGINT) "
    "RETURNS ARRAY<BIGINT> RETURN sequence(a, b)",
    # SQL UDFs cannot overload, so 1-based element access is typed by
    # NAME: list_extract = string arrays, list_element = numeric arrays
    # (both are the same function in DuckDB; both are 1-based, matching
    # Spark's element_at)
    "CREATE OR REPLACE TEMPORARY FUNCTION list_extract(a ARRAY<STRING>, i BIGINT) "
    "RETURNS STRING RETURN element_at(a, CAST(i AS INT))",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_element(a ARRAY<DOUBLE>, i BIGINT) "
    "RETURNS DOUBLE RETURN element_at(a, CAST(i AS INT))",
    # SQL-UDF bodies may contain lambdas (they are inlined at analysis
    # time) even though lambda-typed PARAMETERS are impossible — this
    # is what lets the whole embedding-cosine oracle family converge
    "CREATE OR REPLACE TEMPORARY FUNCTION list_dot_product(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
    "RETURNS DOUBLE RETURN aggregate(zip_with(a, b, (x, y) -> x * y), "
    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)",
]

# Name-level transpile for the ONE shared-dialect function that is a
# row GENERATOR and therefore cannot be a SQL-UDF shim: DuckDB's
# select-list `unnest(arr)` and Spark's `explode(arr)` have identical
# single-level semantics (one output row per element; empty/NULL array
# -> no rows). Word-boundary rename only — these oracle strings never
# contain 'unnest' inside a literal. Everything else is either native
# or a COMPAT_SHIMS function; constructs with genuinely divergent
# semantics (1-based `arr[i]`, `list(x ORDER BY y)`, IGNORE NULLS
# placement, ASOF JOIN, generate_subscripts) are NOT transpiled — those
# oracles are declared dialect-divergent in tests/test_sql_frontend.py.
_TRANSPILE = [
    # ordered: the fused rule must fire before the generic unnest one,
    # because Spark refuses SQL-UDFs (like the generate_series shim)
    # inside a generator — explode(sequence(...)) is native end to end
    (r"\bunnest\s*\(\s*generate_series\s*\(", "explode(sequence("),
    (r"\bunnest\s*\(", "explode("),
    # DuckDB bracket list literal + element-type cast -> Spark
    # array(...) constructor (flat numeric literals only — the pattern
    # requires the ::DOUBLE[] suffix and no nested brackets)
    (r"\[([^\[\]]+)\]::DOUBLE\[\]", r"array(\1)::ARRAY<DOUBLE>"),
    # DuckDB element-type array cast syntax
    (r"::DOUBLE\[\]", "::ARRAY<DOUBLE>"),
    # DuckDB regexp_replace is FIRST-match unless the 'g' options flag
    # is passed; Spark regexp_replace is always-global (its 4th arg is
    # a start position, so the flag would be a cast error). Dropping
    # the flag yields identical all-occurrence semantics.
    (r",\s*'g'\s*\)", ")"),
    # IGNORE NULLS placement: DuckDB puts it INSIDE the window-function
    # call (last_value(v IGNORE NULLS)), Spark AFTER it
    # (last_value(v) IGNORE NULLS). Same semantics, pure reposition.
    (r"\(([^()]*?)\s+IGNORE NULLS\)", r"(\1) IGNORE NULLS"),
]


def _normalize_dialect(sql: str) -> str:
    import re

    for pat, repl in _TRANSPILE:
        sql = re.sub(pat, repl, sql)
    return sql


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    for shim in COMPAT_SHIMS:
        spark.sql(shim)
    # Standard-SQL string literals for the PARSE of this query: DuckDB
    # (and the SQL standard) keep backslashes literal, while Spark's
    # default parser C-escapes them — '\s+' would silently become 's+'
    # and corrupt every regex in the text. Parser-level only, restored
    # immediately after parse; DataFrame-side expressions never pass
    # through the SQL parser and are unaffected.
    old = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        return spark.sql(_normalize_dialect(sql))
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", old)
