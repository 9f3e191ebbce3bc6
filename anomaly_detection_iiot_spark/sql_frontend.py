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
    # DuckDB CTE materialization hint (d8/t16's unrolled iteration
    # states are referenced by BOTH the next round and a side
    # computation — without the hint DuckDB re-inlines every reference
    # and the expansion compounds per round). Spark has no MATERIALIZED
    # keyword and decides materialization in its own planner, so the
    # hint is stripped — a pure optimizer-hint rewrite, zero semantics.
    (r"\bAS\s+MATERIALIZED\s*\(", "AS ("),
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
    # bracket literal immediately subscripted ([b0, b1, ...][u] — the
    # m6 forward pass's bias/weight vectors) -> array(...) + element_at
    (
        r"\[([^\[\]]+)\]\[([^\[\]]+)\]",
        r"element_at(array(\1), CAST(\2 AS INT))",
    ),
    # (regexp_replace's 'g' options flag is handled structurally by
    # _rewrite_regexp_flag below — a bare `, 'g')` suffix rule would
    # also corrupt e.g. array_contains(tokens, 'g'); ADVICE r9)
    # IGNORE NULLS placement: DuckDB puts it INSIDE the window-function
    # call (last_value(v IGNORE NULLS)), Spark AFTER it
    # (last_value(v) IGNORE NULLS). Same semantics, pure reposition.
    (r"\(([^()]*?)\s+IGNORE NULLS\)", r"(\1) IGNORE NULLS"),
    # lambda-taking list functions are PARSER-level names, so a rename
    # is legal where a SQL-UDF shim is not (lambda params can't be UDF
    # arguments): DuckDB list_transform == Spark transform exactly
    (r"\blist_transform\s*\(", "transform("),
    # aggregate-function rename (aggregates can't be SQL-UDF shims):
    # DuckDB quantile_cont == Spark percentile — both the continuous
    # interpolated quantile, lower + (upper-lower)*frac, same arg order
    (r"\bquantile_cont\s*\(", "percentile("),
    # ordered string aggregation: DuckDB takes the sort inline
    # (string_agg(x, sep ORDER BY k)), Spark takes it as an ordered-set
    # aggregate (string_agg(x, sep) WITHIN GROUP (ORDER BY k)) — pure
    # reposition, same fold. Paren-free args only (w20's shape).
    (
        r"\bstring_agg\(([^()]+?)\s+ORDER\s+BY\s+([^()]+)\)",
        r"string_agg(\1) WITHIN GROUP (ORDER BY \2)",
    ),
    # 1-arg encode: DuckDB's encode(s) is UTF-8 string->BLOB; Spark
    # spells the same conversion encode(s, 'UTF-8'). Identifier-only
    # operand; the comma in legitimate 2-arg encode calls keeps this
    # rule from touching them.
    (
        r"\bencode\(\s*([a-zA-Z_]\w*)\s*\)",
        r"encode(\1, 'UTF-8')",
    ),
    # hex-string -> integer: DuckDB casts a '0x'-prefixed string
    # directly; Spark's spelling is conv(hex, 16, 10). Identifier-only
    # operand (a25 hoists the hex expression into a named CTE column
    # precisely so this rewrite stays structural, not paren-balancing).
    (
        r"\(\s*'0x'\s*\|\|\s*([a-zA-Z_]\w*)\s*\)\s*::\s*BIGINT",
        r"CAST(conv(\1, 16, 10) AS BIGINT)",
    ),
    # 1-based bracket subscripts: DuckDB `v[i]` and Spark element_at
    # are BOTH 1-based (and both treat -1 as last-element), so the
    # rewrite is semantics-preserving; it must run AFTER the
    # bracket-literal/::DOUBLE[] rules, and requires an identifier
    # prefix so type suffixes (`)::DOUBLE[]`) never match. Needed
    # because subscripts inside lambda bodies cannot use the
    # list_element SQL-UDF shim (UDF args can't bind lambda vars).
    # Out-of-bounds differs (DuckDB NULL, Spark ANSI error) — every
    # converged oracle indexes in bounds by construction.
    (
        r"\b([a-zA-Z_]\w*(?:\.[a-zA-Z_]\w*)*)\[([^\[\]]+)\]",
        r"element_at(\1, CAST(\2 AS INT))",
    ),
]


def _split_top_level_args(s: str) -> list[str]:
    """Split a SQL argument string on TOP-LEVEL commas — paren-aware
    AND quote-aware: commas and parens inside single-quoted string
    literals (regex patterns like '[,;]+', with '' as the escaped
    quote) never count as separators."""
    parts, depth, cur = [], 0, []
    in_str = False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":  # escaped ''
                    cur.append("''")
                    i += 2
                    continue
                in_str = False
            cur.append(ch)
            i += 1
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _find_call_end(s: str, start: int) -> int:
    """Index just past the ')' matching the '(' that precedes
    ``start`` — quote-aware like _split_top_level_args, so parens
    inside string literals (regex patterns) never unbalance the scan."""
    depth, i, in_str = 1, start, False
    while depth and i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    return i


def _rewrite_list_reduce(sql: str) -> str:
    """DuckDB ``list_reduce(list_prepend(init, arr), f)`` (a 2-arg
    pairwise fold seeded by prepending the init element) is exactly
    Spark ``aggregate(arr, init, f)``. Structural, paren-balanced
    rewrite — only fires on the list_prepend-seeded shape; a bare
    list_reduce is left for Spark to reject loudly (its no-init fold
    has no Spark twin)."""
    import re

    out = sql
    while True:
        m = re.search(r"\blist_reduce\s*\(", out)
        if not m:
            return out
        start = m.end()  # index just past '('
        i = _find_call_end(out, start)
        args = _split_top_level_args(out[start : i - 1])
        if len(args) != 2 or not re.match(r"\s*list_prepend\s*\(", args[0]):
            return out  # unknown shape; leave verbatim
        inner = args[0].strip()
        inner_args = _split_top_level_args(
            inner[inner.index("(") + 1 : inner.rindex(")")]
        )
        if len(inner_args) != 2:
            return out
        init, arr = inner_args[0].strip(), inner_args[1].strip()
        repl = f"aggregate({arr}, {init}, {args[1].strip()})"
        out = out[: m.start()] + repl + out[i:]


def _rewrite_list_sum(sql: str) -> str:
    """DuckDB ``list_sum(X)`` -> Spark ``aggregate(X, 0D-fold)``.
    Paren-balanced; double accumulator (every converged usage sums
    doubles — squared distances, products)."""
    import re

    out = sql
    while True:
        m = re.search(r"\blist_sum\s*\(", out)
        if not m:
            return out
        start = m.end()
        i = _find_call_end(out, start)
        arg = out[start : i - 1].strip()
        repl = (
            f"aggregate({arg}, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        out = out[: m.start()] + repl + out[i:]


def _rewrite_regexp_flag(sql: str) -> str:
    """DuckDB ``regexp_replace(s, p, r, 'g')`` is global replacement;
    Spark's regexp_replace is ALWAYS global (its optional 4th arg is a
    start position, so the flag would be a cast error). Drop the flag
    STRUCTURALLY — paren-balanced, only as the 4th top-level argument
    of a regexp_replace call — so `, 'g')` appearing in any other call
    (array_contains(tokens, 'g'), split(s, 'g')) is never touched
    (ADVICE r9)."""
    import re

    out = sql
    pos = 0
    while True:
        m = re.search(r"\bregexp_replace\s*\(", out[pos:])
        if not m:
            return out
        start = pos + m.end()
        i = _find_call_end(out, start)
        args = _split_top_level_args(out[start : i - 1])
        if len(args) == 4 and args[3].strip() == "'g'":
            body = ",".join(args[:3])
            out = out[:start] + body + out[i - 1 :]
        pos = start  # scan forward; nested calls re-matched from here
    return out


def _normalize_dialect(sql: str) -> str:
    import re

    for pat, repl in _TRANSPILE:
        # iterate to fixpoint: chained subscripts (m[i][j]) need the
        # inner rewrite to expose the outer one
        prev = None
        while prev != sql:
            prev = sql
            sql = re.sub(pat, repl, sql)
    return _rewrite_list_sum(_rewrite_list_reduce(_rewrite_regexp_flag(sql)))


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
    # Deeply-unrolled iteration oracles (t16/t19: 8 merge rounds x ~5
    # CTEs each) legitimately need more Resolution fixpoint iterations
    # than the default 100 — scoped to this parse+analyze, like the
    # parser flag above.
    old_iter = spark.conf.get("spark.sql.analyzer.maxIterations", "100")
    spark.conf.set("spark.sql.analyzer.maxIterations", "400")
    try:
        return spark.sql(_normalize_dialect(sql))
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", old)
        spark.conf.set("spark.sql.analyzer.maxIterations", old_iter)
