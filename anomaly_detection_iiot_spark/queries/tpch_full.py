"""The remaining ten classic TPC-H plan shapes (Q6, Q8, Q9, Q10, Q11,
Q13, Q14, Q15, Q16, Q19), completing all 22 patterns over the
TPC-H-ish corpus.

These are plan-shape exercises, not spec-literal TPC-H: the testdata
schema (TESTDATA.md) has no partsupp / l_shipmode / l_commitdate /
c_phone, so each query documents its substitution inline. What matters
for the engine is the PLANNER pattern each one forces:

- Q6  — pure scan+filter+agg; every predicate must reach the parquet
        scan (pinned in tests/test_plans.py alongside the q1 family).
- Q8  — 7-table snowflake with TWO independent nation roles (customer
        side selects the market, supplier side labels the share); the
        share itself is a conditional-sum ratio, one shuffle.
- Q9  — profit decomposition joined through part/supplier/orders with
        a LIKE filter on the part dim; group by (nation, year).
- Q10 — returned-item revenue: fact-fact join + dim joins, top-20 by
        revenue with unique tie-breaker.
- Q11 — uncorrelated scalar-subquery threshold (broadcast one-row
        total) over a per-part value aggregate; HAVING > fraction.
- Q13 — LEFT OUTER fact join preserving zero-order customers, then a
        second aggregation over the first (count-of-counts).
- Q14 — conditional-sum ratio over a broadcast dim join (promo share).
- Q15 — per-supplier revenue view + scalar MAX subquery equi-filter.
- Q16 — multi-column distinct-count with NOT-IN dim exclusion and an
        anti-joined supplier blocklist.
- Q19 — three disjunctive multi-column predicate branches OR-ed into
        one scan-level filter over a broadcast part join (Catalyst
        folds the OR into the join condition + pushes the common
        bounds to both scans).

Scale notes: dims (part/supplier/customer/nation/region) are broadcast
explicitly where the spec's selectivity guarantees a small side;
lineitem/orders joins stay shuffle joins keyed on orderkey. All money
aggregates round(…, 2..6) on BOTH engines so cross-engine summation
order cannot flip the driver's value hash.

Reference surface anchor: the reference repo has no relational engine
(it is a pandas/Keras pipeline — see SURVEY §2.5); this family is the
"beyond the reference" OLAP surface the engine adds, mirrored 1:1 in
DuckDB oracle SQL below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import QuerySpec, t


# --- Q6: forecasting revenue change ---------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: one scan, three range predicates, one sum — the purest
    pushdown test in the suite. All three predicates (year, discount
    band, quantity cap) must appear in the parquet scan's
    PushedFilters; the aggregate is a single partial+final sum with no
    shuffle beyond the final single-row exchange."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""


# --- Q8: national market share --------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): among ECONOMY-type parts sold
    to ASIA customers in 1996-1997, NATION_2's share of supply volume
    per order year. Two independent nation joins — the customer side
    restricts the market (nation→region ASIA), the supplier side only
    LABELS each line's origin for the conditional numerator. The share
    is sum(CASE)/sum — one shuffle on the final year grouping; every
    dim side is broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cust_nation = c.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                "n_nationkey"
            )
        ),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = s.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(o.select("o_orderkey", "o_orderdate", "o_custkey"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_nation),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)
                      .otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_2'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


# --- Q9: product-type profit measure --------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): for parts whose name contains
    'widget', profit per (supplier nation, order year). The schema has
    no ps_supplycost, so cost substitutes p_retailprice * 0.6 *
    quantity (documented, mirrored in the oracle). The shape Q9
    exercises: a LIKE-filtered part dim pruning the fact early
    (broadcast), supplier→nation labeling, and a two-key
    (nation, year) rollup — one shuffle."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")

    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_suppkey", "n_name")),
            li.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * 0.6 * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Q10: returned-item reporting -----------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost
    revenue from returned lines (l_returnflag = 'R') on orders placed
    in 1997Q3. Orders quarter-filter pushes to its scan and shrinks
    the fact-fact join; customer/nation broadcast onto the per-customer
    aggregate; top-20 is rank-by-(revenue, custkey) so ties are
    deterministic across engines."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")

    rev = (
        li.join(o.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    ranked = (
        rev.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            ),
        )
    )
    return ranked.filter(F.col("rn") <= 20).drop("rn").orderBy(
        F.col("revenue").desc(), "c_custkey"
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal, revenue
FROM (
  SELECT c_custkey, c_name, n_name, c_acctbal, revenue,
         row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rn
  FROM (
    SELECT c_custkey, c_name, n_name, c_acctbal,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
  )
)
WHERE rn <= 20
ORDER BY revenue DESC, c_custkey
"""


# --- Q11: important stock identification ----------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose traded value through
    NATION_3 suppliers exceeds a fraction of that nation's total. No
    partsupp table, so "stock value" substitutes the lineitem traded
    value sum(l_extendedprice) per part over NATION_3-supplier lines
    (documented, mirrored). The shape: an UNCORRELATED scalar-subquery
    threshold — the same aggregate reduced twice, the one-row total
    broadcast into the HAVING filter — plus a broadcast semi on the
    supplier-nation dim."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)

    nation_lines = li.join(
        F.broadcast(s.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey")
    )
    per_part = nation_lines.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("part_value")
    )
    total = per_part.agg(
        (F.sum("part_value") * 0.001).alias("value_floor")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("value_floor"))
        .select(
            "l_partkey",
            F.round("part_value", 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
SELECT l_partkey, round(sum(l_extendedprice), 2) AS part_value
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_nationkey = 3
GROUP BY l_partkey
HAVING sum(l_extendedprice) > (
  SELECT sum(l_extendedprice) * 0.001
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 3
)
ORDER BY part_value DESC, l_partkey
"""


# --- Q13: customer order-count distribution -------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by
    their order count, INCLUDING zero-order customers — which forces
    the left-outer join Q13 exists to exercise (an inner join silently
    drops the c_count=0 bucket). The spec's NOT LIKE comment filter
    substitutes an o_orderpriority exclusion (no o_comment column).
    Two aggregations: per-customer count over the outer join, then
    count-of-counts — two shuffles, the second tiny."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey
   AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q14: promotion effect ------------------------------------------------

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of H1-1997 revenue from
    PROMO-type parts. Conditional-sum ratio over a broadcast part join;
    the month filter pushes to the lineitem scan. Single output row."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


# --- Q15: top supplier ----------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose Q1-1997 shipped
    revenue equals the maximum — the revenue "view" reduced twice,
    once per-supplier and once to the scalar max, the one-row max
    broadcast back as an equi-filter. Revenue is rounded to 6 on both
    engines BEFORE the max comparison so cross-engine summation noise
    cannot split the argmax."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q16: parts/supplier relationship -------------------------------------

def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers ship each surviving (brand, type, size) combination.
    No partsupp, so the part↔supplier relation comes from lineitem
    (documented). The shape: NOT-IN dim exclusions folded into the
    part scan, an anti-join against a supplier blocklist (the spec's
    complaints filter substitutes s_acctbal < 1000), and a distinct
    count grouped on three part columns."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45, 2, 7)
    )
    bad_supp = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45, 2, 7)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 1000.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q19: discounted revenue (disjunctive predicates) ---------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three OR-ed multi-column
    predicate branches, each constraining BOTH sides of the part join
    (brand+size on part, quantity band on lineitem). Catalyst keeps
    the disjunction as one join filter and pushes the derivable common
    bounds (quantity <= 36, size <= 15) to the scans; the join itself
    broadcasts part. The no-shipmode substitution drops the spec's
    shipmode/shipinstruct conjuncts (documented)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#1") & z.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & z.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & z.between(1, 15) & q.between(20, 36))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 36)
"""


TPCH_FULL_QUERIES: list[QuerySpec] = [
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              "TPC-H Q6 shape: pure scan pushdown + single sum"),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              "TPC-H Q8 shape: 7-table snowflake, dual nation roles, "
              "conditional-sum share"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
              "TPC-H Q9 shape: LIKE-pruned part dim, profit rollup by "
              "(nation, year)"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              "TPC-H Q10 shape: returned-line revenue, deterministic "
              "top-20"),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL,
              "TPC-H Q11 shape: scalar-subquery HAVING threshold over "
              "per-part value"),
    QuerySpec("q13_customer_distribution", q13_customer_distribution,
              Q13_SQL,
              "TPC-H Q13 shape: left-outer count-of-counts incl. "
              "zero-order bucket"),
    QuerySpec("q14_promo_effect", q14_promo_effect, Q14_SQL,
              "TPC-H Q14 shape: conditional-sum ratio over broadcast "
              "part join"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              "TPC-H Q15 shape: revenue view + scalar-max equi-filter"),
    QuerySpec("q16_parts_supplier", q16_parts_supplier, Q16_SQL,
              "TPC-H Q16 shape: NOT-IN exclusions + anti-joined "
              "blocklist + 3-key distinct count"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL,
              "TPC-H Q19 shape: 3-branch disjunctive join predicate"),
]
