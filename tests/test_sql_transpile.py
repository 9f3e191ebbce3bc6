"""Unit tests for the sql_frontend dialect normalizer — the name-level
transpile and the two structural (paren-balanced) rewrites. These are
pure string transforms; the end-to-end row-equality proof lives in
test_sql_frontend.py."""

from __future__ import annotations

from anomaly_detection_iiot_spark.sql_frontend import (
    _normalize_dialect,
    _rewrite_list_reduce,
    _rewrite_list_sum,
)


def test_unnest_generate_series_fuses_to_native_sequence():
    # the fused rule must win over the generic unnest rule, otherwise
    # explode() would wrap the generate_series SQL-UDF (banned in
    # generators)
    out = _normalize_dialect("SELECT unnest(generate_series(1, n)) AS i")
    assert "explode(sequence(1, n))" in out
    assert "generate_series" not in out


def test_plain_unnest_becomes_explode():
    assert _normalize_dialect("SELECT unnest(v) AS x") == (
        "SELECT explode(v) AS x"
    )


def test_bracket_literal_cast_and_subscripts():
    out = _normalize_dialect("[1.0, 2.0]::DOUBLE[]")
    assert out == "array(1.0, 2.0)::ARRAY<DOUBLE>"
    out = _normalize_dialect("SELECT a.v[i + 1] * b.v[i + 1]")
    assert (
        out
        == "SELECT element_at(a.v, CAST(i + 1 AS INT))"
        " * element_at(b.v, CAST(i + 1 AS INT))"
    )
    # literal-vector subscript (the m6 forward-pass shape)
    out = _normalize_dialect("[0.5, 1.5][u]")
    assert out == "element_at(array(0.5, 1.5), CAST(u AS INT))"


def test_ignore_nulls_reposition():
    out = _normalize_dialect("last_value(v IGNORE NULLS) OVER w")
    assert out == "last_value(v) IGNORE NULLS OVER w"


def test_regexp_replace_global_flag_dropped():
    out = _normalize_dialect("regexp_replace(s, 'x', 'y', 'g')")
    assert out == "regexp_replace(s, 'x', 'y')"


def test_list_reduce_seeded_fold_to_aggregate():
    out = _rewrite_list_reduce(
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "transform(t, x -> f(x))), (acc, x) -> acc * 31 + x)"
    )
    assert out == (
        "aggregate(transform(t, x -> f(x)), CAST(0 AS BIGINT), "
        "(acc, x) -> acc * 31 + x)"
    )
    # unseeded fold has no Spark twin: left verbatim for a loud failure
    bare = "list_reduce(t, (a, b) -> a + b)"
    assert _rewrite_list_reduce(bare) == bare


def test_list_sum_to_double_fold():
    out = _rewrite_list_sum("list_sum(transform(v, x -> x * x))")
    assert out == (
        "aggregate(transform(v, x -> x * x), CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x)"
    )
    # nested occurrences all rewritten
    out = _rewrite_list_sum("sqrt(list_sum(a)) + sqrt(list_sum(b))")
    assert "list_sum" not in out and out.count("aggregate(") == 2


def test_list_transform_rename_keeps_lambda():
    out = _normalize_dialect("list_transform(v, x -> x + 1)")
    assert out == "transform(v, x -> x + 1)"


def test_quantile_cont_renames_to_percentile():
    # aggregate-function rename: no SQL-UDF shim possible for
    # aggregates, and the two names share exact continuous semantics
    out = _normalize_dialect(
        "SELECT round(quantile_cont(x, 0.5), 6) FROM t GROUP BY g"
    )
    assert "percentile(x, 0.5)" in out and "quantile_cont" not in out


def test_hex_cast_rewrites_to_conv():
    # DuckDB ('0x'||h)::BIGINT vs Spark conv(h,16,10): identifier-only
    # operand by design (a25 hoists the hex expr into a CTE column)
    out = _normalize_dialect("SELECT ('0x' || hex15)::BIGINT AS h FROM t")
    assert "CAST(conv(hex15, 16, 10) AS BIGINT)" in out
    assert "0x" not in out


def test_string_agg_order_by_repositions_to_within_group():
    out = _normalize_dialect(
        "SELECT string_agg(event_type, ',' ORDER BY ts, event_id) FROM t"
    )
    assert (
        "string_agg(event_type, ',') WITHIN GROUP (ORDER BY ts, event_id)"
        in out
    )


def test_one_arg_encode_gains_utf8():
    out = _normalize_dialect("SELECT octet_length(encode(text)) FROM t")
    assert "encode(text, 'UTF-8')" in out
    # legitimate 2-arg encode is untouched
    out2 = _normalize_dialect("SELECT encode(text, 'UTF-8') FROM t")
    assert out2.count("UTF-8") == 1


def test_regexp_flag_strip_is_anchored_to_regexp_replace():
    """ADVICE r9: the 'g'-flag drop must be scoped to regexp_replace's
    4th argument — any other call ending in , 'g') is untouched, and
    nested/multiple calls all rewrite."""
    keep = "array_contains(tokens, 'g') AND split(s, 'g')[1] = 'x'"
    out = _normalize_dialect(keep)
    assert "array_contains(tokens, 'g')" in out
    assert "split(s, 'g')" in out
    out = _normalize_dialect(
        "regexp_replace(a, 'p', regexp_replace(b, 'q', 'r', 'g'), 'g')"
    )
    assert "'g'" not in out
    # 3-arg regexp_replace (no flag) passes through unchanged
    assert _normalize_dialect("regexp_replace(a, 'p', 'r')") == (
        "regexp_replace(a, 'p', 'r')"
    )


def test_materialized_hint_stripped():
    """DuckDB's CTE materialization hint (d8's unrolled rounds) is an
    optimizer directive with zero semantics — Spark gets the plain CTE."""
    out = _normalize_dialect("WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a")
    assert out == "WITH a AS (SELECT 1) SELECT * FROM a"
    # 'MATERIALIZED' as an identifier is untouched
    assert _normalize_dialect("SELECT materialized FROM t") == (
        "SELECT materialized FROM t"
    )
