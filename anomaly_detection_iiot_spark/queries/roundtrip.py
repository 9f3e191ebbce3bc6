"""Source/sink round-trip queries (SURVEY §2.1 S1-S7, S11; §2.2 P2,
P4, P5; §2.3 A7) — converts the ingestion layer from pytest-only to
driver-oracle-checked coverage.

Pattern: the Spark side runs the REAL source path (write files in the
reference's on-disk layout, scan them back through our readers), while
the DuckDB oracle recomputes the expected result straight from the
source parquet table. A value-hash match therefore proves the entire
file round-trip — formatting, filename-timestamp parsing, positional
naming, ordering contract — not just the arithmetic.

Determinism notes:
- File payloads are written at full double precision ('%.17g' /
  Java shortest-round-trip), so parse-back is bit-exact and only the
  final aggregate is rounded for cross-engine summation-order noise.
- The tiny driver-side writes (a few KB of snapshot/log files) happen
  eagerly at query-construction time, like m9's round-1 collect —
  deliberate: filenames carry semantics (S2) and Spark sinks cannot
  name individual output files.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import bearing, sinks
from ..sources.kbm import parse_ts_multi
from .base import QuerySpec, t

_SCRATCH_ROOT: str | None = None


def _scratch(prefix: str) -> str:
    """Session-scoped scratch dir (ADVICE r7): every sink round-trip
    writes under ONE temp root that is removed at interpreter exit, so
    repeated registry builds / plan dumps / bench runs no longer
    accumulate orphan mkdtemp directories."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="adiiot_roundtrip_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


# --- P2: projection by position (trainer.py:51 usecols=[0,2,4,6]) -------------

def p2_positional_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cols = [li.columns[p] for p in (0, 2, 4, 6)]
    return (
        li.select(*cols)
        .groupBy(cols[0])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cols[2]), 6).alias("sum_qty"),
            F.round(F.sum(cols[3]), 6).alias("sum_disc"),
            F.max(cols[1]).alias("max_supp"),
        )
    )


# positions [0,2,4,6] of lineitem = these names (FIXTURES.md schema)
P2_SQL = """
SELECT l_orderkey, count(*) AS n,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_discount), 6) AS sum_disc,
       max(l_suppkey) AS max_supp
FROM lineitem GROUP BY l_orderkey
"""


# --- P4: timestamp truncation to seconds (pipeline.py:33) ---------------------

def p4_ts_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("ts_sec"),
    )


P4_SQL = "SELECT event_id, date_trunc('second', ts) AS ts_sec FROM events"


# --- P5: multi-format timestamp parse (calculations.py:14-17) ----------------

def p5_multiformat_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each event's (second-truncated) timestamp in one of the
    reference's two wild formats by row parity, then recover it with
    the coalesce-of-parsers. Oracle = the expected recovery
    (date_trunc to seconds), so the check proves format round-trip."""
    ev = t(spark, sf_dir, "events")
    rendered = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % 2 == 0,
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        )
        .otherwise(F.date_format("ts", "dd/MM/yyyy HH:mm:ss"))
        .alias("ts_str"),
    )
    return rendered.select(
        "event_id", parse_ts_multi(F.col("ts_str")).alias("parsed_ts")
    )


P5_SQL = "SELECT event_id, date_trunc('second', ts) AS parsed_ts FROM events"


# --- A7: resource-style aggregates (logger.py:92-97) --------------------------

def a7_resource_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.avg("value"), 6).alias("avg_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.sum("value"), 6).alias("sum_v"),
    )


A7_SQL = """
SELECT user_id, count(*) AS n_samples, round(avg(value), 6) AS avg_v,
       round(max(value), 6) AS max_v, round(sum(value), 6) AS sum_v
FROM events GROUP BY user_id
"""


# --- S1-S4: bearing snapshot-directory round-trip -----------------------------

_S1_USERS = 4
_S1_SAMPLES = 16  # per user; every sf has >= 50 events/user
_S1_FILES = 2
_S1_ROWS_PER_FILE = _S1_SAMPLES // _S1_FILES
_S1_STAMPS = ["2004.02.12.10.32.39", "2004.02.12.10.33.39"]


def s1_snapshot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S2+S3+S4 proven end-to-end: the first 16 events of users 0-3
    (ordered by ts, event_id — the canonical ordering contract) are
    written as 2 headerless TSV snapshot files with timestamp filenames
    (full '%.17g' precision), scanned back through read_snapshot_dir →
    to_canonical_long, and aggregated per channel. The oracle recomputes
    the same numbers straight from ``events``, so a hash match proves
    the TSV scan, filename event-time, positional channel naming, and
    the cross-file global_idx stitching. The KB-scale file write is
    eager at construction time (see module docstring)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    head = (
        ev.filter(F.col("user_id") < _S1_USERS)
        .withColumn("rn", F.row_number().over(w) - 1)
        .filter(F.col("rn") < _S1_SAMPLES)
        .select("user_id", "rn", "value")
        .collect()
    )
    series = {u: [0.0] * _S1_SAMPLES for u in range(_S1_USERS)}
    for r in head:
        series[r.user_id][r.rn] = r.value
    out_dir = _scratch("s1_snap_")
    for f, stamp in enumerate(_S1_STAMPS):
        lines = []
        for i in range(_S1_ROWS_PER_FILE):
            idx = f * _S1_ROWS_PER_FILE + i
            lines.append(
                "\t".join("%.17g" % series[u][idx] for u in range(_S1_USERS))
            )
        with open(os.path.join(out_dir, stamp), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    raw = bearing.read_snapshot_dir(spark, out_dir, n_cols=_S1_USERS)
    long = bearing.to_canonical_long(
        raw, n_channels=_S1_USERS, rows_per_file=_S1_ROWS_PER_FILE
    )
    return long.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.sum("value"), 6).alias("sum_v"),
        F.max("global_idx").alias("max_idx"),
        F.countDistinct("file_ts").alias("n_files"),
    )


S1_SQL = f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events WHERE user_id < {_S1_USERS}
)
SELECT CAST(user_id AS STRING) AS channel,
       count(*) AS n_samples,
       round(sum(value), 6) AS sum_v,
       CAST({_S1_SAMPLES - 1} AS BIGINT) AS max_idx,
       CAST({_S1_FILES} AS BIGINT) AS n_files
FROM ranked WHERE rn < {_S1_SAMPLES}
GROUP BY user_id
"""


# --- S15: Python DataSource round-trip (Spark 4 plugin API) -------------------

def s15_pyds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same snapshot corpus as s1, read back through the Spark 4
    PYTHON DATASOURCE plugin (sources/pyds.py,
    ``format("bearing_snapshots")``) instead of the CSV scanner: one
    partition per snapshot file, filename event-time and per-file
    sample_idx emitted by the source itself (no window, no shuffle —
    plan pinned Exchange-free in tests/test_pyds.py). A hash match
    against the same events-derived oracle proves the plugin's parse,
    event-time, and ordering semantics equal the engine path's."""
    from ..sources.pyds import BearingSnapshotDataSource

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    head = (
        ev.filter(F.col("user_id") < _S1_USERS)
        .withColumn("rn", F.row_number().over(w) - 1)
        .filter(F.col("rn") < _S1_SAMPLES)
        .select("user_id", "rn", "value")
        .collect()
    )
    series = {u: [0.0] * _S1_SAMPLES for u in range(_S1_USERS)}
    for r in head:
        series[r.user_id][r.rn] = r.value
    out_dir = _scratch("s15_pyds_")
    for f, stamp in enumerate(_S1_STAMPS):
        lines = []
        for i in range(_S1_ROWS_PER_FILE):
            idx = f * _S1_ROWS_PER_FILE + i
            lines.append(
                "\t".join("%.17g" % series[u][idx] for u in range(_S1_USERS))
            )
        with open(os.path.join(out_dir, stamp), "w") as fh:
            fh.write("\n".join(lines) + "\n")
    spark.dataSource.register(BearingSnapshotDataSource)
    raw = (
        spark.read.format("bearing_snapshots")
        .option("path", out_dir)
        .option("n_cols", _S1_USERS)
        .load()
    )
    long = raw.selectExpr(
        "file_ts",
        "sample_idx",
        "stack({n}, {pairs}) AS (channel, value)".format(
            n=_S1_USERS,
            pairs=", ".join(
                f"'{u}', vibration_{u}" for u in range(_S1_USERS)
            ),
        ),
    )
    return long.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.sum("value"), 6).alias("sum_v"),
        F.max("sample_idx").cast("bigint").alias("max_sample_idx"),
        F.countDistinct("file_ts").alias("n_files"),
    )


S15_SQL = f"""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events WHERE user_id < {_S1_USERS}
)
SELECT CAST(user_id AS STRING) AS channel,
       count(*) AS n_samples,
       round(sum(value), 6) AS sum_v,
       CAST({_S1_ROWS_PER_FILE - 1} AS BIGINT) AS max_sample_idx,
       CAST({_S1_FILES} AS BIGINT) AS n_files
FROM ranked
WHERE rn < {_S1_SAMPLES}
GROUP BY user_id
ORDER BY channel
"""


# --- S16: incremental aggregate maintenance over the upsert table ------------

def s16_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance — the merge-not-rescan story for
    ALGEBRAIC aggregates (a24's sketch rollup is the distinct-count
    sibling): a per-priority revenue dashboard over the upsert table
    is maintained from ``read_changes`` alone. For each changed key
    the update is ``+new − old`` where old comes from the TIME-TRAVEL
    view at the previous version (the IVM delta rule; deletes are
    −old only). The query computes the dashboard BOTH ways — full
    merged-view rescan vs base-aggregate + delta application — and
    emits their agreement as ``ivm_match``; the oracle recomputes the
    rescan side with CASE/WHERE and pins TRUE (the a22/a25 contract
    pattern). Sums are exact at the cent level: prices enter as
    DECIMAL(18,2), so + and − round-trip without float residue — the
    precondition for NEVER-rescanned accumulators at 100 TB."""
    from ..sources import upsert

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    tbl = os.path.join(_scratch("s16_ivm_"), "tbl")
    upsert.write_base(o, tbl)
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "price", (F.col("price") * 2).cast("decimal(18,2)")
    )
    # deletes disjoint from the updated keys: an upsert and a tombstone
    # for one key in the SAME version resolves upsert-wins (pinned in
    # tests/test_upsert.py), which the rescan oracle's WHERE could not
    # express — mod-5-excluded keys keep the two sets disjoint
    dels = o.filter(
        (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 5 != 0)
    ).select("o_orderkey")
    upsert.append_delta(upd, tbl, 1, deletes=dels)

    def dash(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("decimal(18,2)").alias("revenue"),
        )

    full = dash(upsert.read_merged(spark, tbl, ["o_orderkey"]))

    # incremental side: base aggregate + (new − old) per changed key
    base_agg = dash(upsert.read_merged(spark, tbl, ["o_orderkey"], as_of_version=0))
    ch = upsert.read_changes(spark, tbl, since_version=0).select(
        "o_orderkey", "o_orderpriority", "price", "_deleted"
    )
    old = (
        upsert.read_merged(spark, tbl, ["o_orderkey"], as_of_version=0)
        .join(ch.select("o_orderkey").distinct(), "o_orderkey", "left_semi")
    )
    minus = old.groupBy("o_orderpriority").agg(
        (-F.count(F.lit(1))).alias("dn"),
        (-F.sum("price")).cast("decimal(18,2)").alias("dr"),
    )
    plus = (
        ch.filter(~F.col("_deleted"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("dn"),
            F.sum("price").cast("decimal(18,2)").alias("dr"),
        )
    )
    inc = (
        base_agg.select(
            "o_orderpriority", F.col("n").alias("dn"), F.col("revenue").alias("dr")
        )
        .unionByName(minus)
        .unionByName(plus)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("dn").alias("n_inc"),
            F.sum("dr").cast("decimal(18,2)").alias("rev_inc"),
        )
    )
    return (
        full.join(inc, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n",
            # exact decimal compare first, then a DOUBLE carrier for
            # the cross-engine hash (cent-exact values, no residue)
            F.col("revenue").cast("double").alias("revenue"),
            (
                (F.col("n") == F.col("n_inc"))
                & (F.col("revenue") == F.col("rev_inc"))
            ).alias("ivm_match"),
        )
        .orderBy("o_orderpriority")
    )


S16_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(CAST(sum(CASE WHEN o_orderkey % 5 = 0
                THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2
                          AS DECIMAL(18,2))
                ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
       TRUE AS ivm_match
FROM orders
WHERE o_orderkey % 11 <> 0 OR o_orderkey % 5 = 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- S5: CSV sink + scan round-trip (trainer.py:51 / bearing.py:30-33) --------

def s5_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed CSV write (Java shortest-round-trip doubles) → CSV
    scan with explicit schema + projection → aggregate; oracle reads
    the parquet directly."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    out_dir = os.path.join(_scratch("s5_csv_"), "li")
    li.select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_extendedprice"
    ).write.option("header", "true").mode("overwrite").csv(out_dir)
    back = (
        spark.read.option("header", "true")
        .schema(
            "l_orderkey bigint, l_linestatus string, l_quantity double, "
            "l_extendedprice double"
        )
        .csv(out_dir)
    )
    return back.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


S5_SQL = """
SELECT l_linestatus, count(*) AS n,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_price
FROM lineitem WHERE l_orderkey < 1000
GROUP BY l_linestatus
"""


# --- S6+S7: JSON results sink + scan round-trip -------------------------------

def s6_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user result rows written with the S6 JSON sink and re-read
    with the S7 schema-inferring scan; oracle recomputes from events.
    Aggregates are rounded BEFORE the sink so the JSON carries short
    exact decimals."""
    ev = t(spark, sf_dir, "events")
    results = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_v"),
    )
    out_dir = os.path.join(_scratch("s6_json_"), "res")
    sinks.write_results_json(results, out_dir)
    back = sinks.read_results_json(spark, out_dir)
    return back.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_v").cast("double").alias("sum_v"),
    )


S6_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_v
FROM events GROUP BY user_id
"""


# --- S12: ORC partitioned sink + pruned scan ---------------------------------

def s12_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip through a hive-partitioned layout: event detail
    rows written ``partitionBy(shard)`` to ORC, read back with a shard
    predicate, aggregated per user. The shard filter must resolve to
    directory-level PartitionFilters on the read (asserted in
    tests/test_plans.py) — at 100 TB the scan touches 1/8th of the
    files, not 1/8th of the rows. Doubles and timestamps ride ORC's
    native types, so parse-back is bit-exact and only the final sum is
    rounded. The oracle recomputes straight from the events parquet
    (user_id % 8 mirrors the shard derivation), so a value-hash match
    proves the sink layout + pruned scan, not just the agg. The tiny
    eager write at construction follows the module's sink contract
    (module docstring)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 64)
    detail = ev.select(
        "user_id",
        "ts",
        "value",
        F.pmod(F.col("user_id"), F.lit(8)).alias("shard"),
    )
    out_dir = os.path.join(_scratch("s12_orc_"), "detail")
    detail.write.mode("overwrite").partitionBy("shard").orc(out_dir)
    back = spark.read.orc(out_dir).filter(F.col("shard") == 3)
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_v"),
        F.max("ts").alias("last_ts"),
    )


S12_SQL = """
SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_v,
       max(ts) AS last_ts
FROM events
WHERE user_id < 64 AND user_id % 8 = 3
GROUP BY user_id
"""


# --- S5/P3/P4/P5 composite: KBM reader round-trip + anomaly labels ------------

def k1_kbm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KBM reader proven end-to-end: events re-rendered in the KBM
    on-disk shape (``vibration-x/y/z``, a ``tags`` string embedding
    ``temperature=<v>``, fractional ``time`` — pipeline.py:12-34),
    written as CSV, read back through ``read_kbm_csv`` (tag extraction
    P3, second-truncation P4, multi-format parse P5), then labeled with
    ``with_anomaly_labels`` (the hardcoded-timestamp range join,
    pipeline.py:7-11; one literal per timestamp format). The oracle
    recomputes the expected table from ``events`` directly. Doubles ride
    the CSV as shortest-round-trip strings, so the recovered values are
    bit-exact and only the output columns are rounded."""
    from ..sources.kbm import read_kbm_csv, with_anomaly_labels

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    kbm = ev.select(
        F.col("value").cast("double").alias("vibration-x"),
        (F.col("value") * 2).alias("vibration-y"),
        (-F.col("value")).alias("vibration-z"),
        F.concat(
            F.lit("host=h1 temperature="),
            F.col("value").cast("string"),
            F.lit(" unit=C"),
        ).alias("tags"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("time"),
    )
    out_dir = os.path.join(_scratch("k1_kbm_"), "kbm")
    kbm.write.option("header", "true").mode("overwrite").csv(out_dir)
    back = read_kbm_csv(spark, out_dir)
    labeled = with_anomaly_labels(
        back, ["2024-01-10 00:00:00", "15/01/2024 12:00:00"]
    )
    return labeled.select(
        "ts",
        F.round("vibration_x", 6).alias("vibration_x"),
        F.round("vibration_y", 6).alias("vibration_y"),
        F.round("vibration_z", 6).alias("vibration_z"),
        F.round("temperature", 6).alias("temperature"),
        F.col("is_anomaly").cast("int").alias("is_anomaly"),
    )


K1_SQL = """
WITH src AS (
  SELECT date_trunc('second', ts) AS ts_sec, value
  FROM events WHERE user_id < 20
)
SELECT ts_sec AS ts,
       round(value, 6) AS vibration_x,
       round(value * 2, 6) AS vibration_y,
       round(-value, 6) AS vibration_z,
       round(value, 6) AS temperature,
       CAST(CASE WHEN (ts_sec >= TIMESTAMP '2024-01-10 00:00:00'
                       AND ts_sec < TIMESTAMP '2024-01-10 01:00:00')
                   OR (ts_sec >= TIMESTAMP '2024-01-15 12:00:00'
                       AND ts_sec < TIMESTAMP '2024-01-15 13:00:00')
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM src
"""


# --- K2: quarantine split proven against events -------------------------------

def k2_kbm_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrupt-record quarantine path oracle-proven: events are
    re-rendered as KBM CSV with DETERMINISTIC corruption injected by
    event-id class (id % 13 == 1 → unparseable vibration-x, == 0 →
    unparseable time, everything else clean), read back through
    ``read_kbm_csv_quarantined``, and reduced to per-bucket counts plus
    the good bucket's recovered vibration-x sum. The oracle recomputes
    all three buckets straight from events — a match proves the
    PERMISSIVE scan routed every row to the right branch AND that
    clean values survive the trip bit-exact (doubles ride the CSV as
    shortest-round-trip strings; only the final sum is rounded).
    Structural corruption (malformed_row) can't be written through a
    schema'd CSV sink, so that branch stays pytest-covered
    (tests/test_sources.py)."""
    from ..sources.kbm import read_kbm_csv_quarantined

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    mod = F.pmod(F.col("event_id"), F.lit(13))
    kbm = ev.select(
        F.when(mod == 1, F.lit("vx_bad"))
        .otherwise(F.col("value").cast("string"))
        .alias("vibration-x"),
        (F.col("value") * 2).alias("vibration-y"),
        (-F.col("value")).alias("vibration-z"),
        F.concat(F.lit("temperature="), F.col("value").cast("string"))
        .alias("tags"),
        F.when(mod == 0, F.lit("BADTIME"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS"))
        .alias("time"),
    )
    out_dir = os.path.join(_scratch("k2_kbm_"), "kbm")
    kbm.write.option("header", "true").mode("overwrite").csv(out_dir)
    good, quar = read_kbm_csv_quarantined(spark, out_dir)
    good_agg = good.agg(
        F.lit("good").alias("bucket"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("vibration_x"), 6).alias("sum_vx"),
    )
    quar_agg = quar.groupBy(F.col("reason").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.lit(0.0).alias("sum_vx"),
    )
    return good_agg.unionByName(quar_agg).orderBy("bucket")


K2_SQL = """
WITH e AS (
  SELECT event_id, value FROM events WHERE user_id < 20
)
SELECT 'bad_number' AS bucket, count(*) AS n, 0.0 AS sum_vx
FROM e WHERE event_id % 13 = 1
UNION ALL
SELECT 'bad_timestamp', count(*), 0.0
FROM e WHERE event_id % 13 = 0
UNION ALL
SELECT 'good', count(*), round(sum(value), 6)
FROM e WHERE event_id % 13 NOT IN (0, 1)
ORDER BY bucket
"""


# --- S10: resource-log sink + scan round-trip ---------------------------------

def s10_resource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S10 resource log proven end-to-end: events re-rendered in
    the reference's exact line shape ``<iso_ts>,<cpu>,<mem_mb>``
    (logger.py:68) via a distributed text sink, scanned back through
    ``read_resource_log`` (explicit schema, no inference), then rolled
    up per minute the way logger.py:92-97 aggregates the series. Doubles
    ride the file as shortest-round-trip strings (Spark double→string
    cast), so the recovered values are bit-exact and only the final
    aggregates are rounded for summation-order noise."""
    from ..sources import resource_log

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    lines = ev.select(
        F.concat_ws(
            ",",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
            F.col("value").cast("string"),
            (F.col("value") * 2 + 100).cast("string"),
        ).alias("value")
    )
    out_dir = os.path.join(_scratch("s10_res_"), "log")
    lines.write.mode("overwrite").text(out_dir)
    back = resource_log.read_resource_log(spark, out_dir)
    return back.groupBy(
        F.date_trunc("minute", F.col("sampled_at")).alias("minute")
    ).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.round(F.avg("cpu_pct"), 6).alias("avg_cpu"),
        F.round(F.max("rss_mb"), 6).alias("max_rss"),
        F.round(F.sum("cpu_pct"), 6).alias("sum_cpu"),
    )


S10_SQL = """
SELECT date_trunc('minute', ts) AS minute,
       count(*) AS n_samples,
       round(avg(value), 6) AS avg_cpu,
       round(max(value * 2 + 100), 6) AS max_rss,
       round(sum(value), 6) AS sum_cpu
FROM events WHERE user_id < 20
GROUP BY 1
"""


# --- S11: training-log text scanner -------------------------------------------

_S11_EPOCHS = 25


def s11_log_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keras-style stdout generated from an exact-binary formula
    (i/64 — six decimals render it exactly), parsed back by the S11
    scanner (logger.py:106-161). Oracle = the same closed form."""
    out_dir = _scratch("s11_log_")
    path = os.path.join(out_dir, "training.log")
    lines = []
    for i in range(1, _S11_EPOCHS + 1):
        lines.append(f"Epoch {i}/{_S11_EPOCHS}")
        loss = i / 64.0
        val = (i + _S11_EPOCHS) / 64.0
        lines.append(
            f"10/10 [==============================] - 1s 2ms/step - "
            f"loss: {loss:.6f} - val_loss: {val:.6f}"
        )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return sinks.parse_training_log(spark, path).select(
        F.col("epoch").cast("bigint").alias("epoch"), "loss", "val_loss"
    )


S11_SQL = f"""
SELECT CAST(epoch AS BIGINT) AS epoch,
       epoch / 64.0 AS loss,
       (epoch + {_S11_EPOCHS}) / 64.0 AS val_loss
FROM (SELECT unnest(generate_series(1, {_S11_EPOCHS})) AS epoch)
"""


# --- S14: merge-on-read upsert table round-trip ------------------------------

def s14_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-apply through the REAL upsert table (sources/upsert.py):
    base = orders at `_v=0`; delta 1 upserts every key ≡ 0 (mod 7)
    with a doubled o_totalprice (×2 is FP-exact, so no rounding hazard
    enters before the final aggregate); delta 2 tombstones every key
    ≡ 0 (mod 13) — including the overlap keys delta 1 just updated,
    so the oracle match proves version ORDER, not just set union. The
    result is read back through merge-on-read (one key shuffle +
    per-key row_number) and aggregated per priority; the oracle
    recomputes last-writer-wins directly from the orders view with a
    CASE + WHERE. The small scratch writes happen eagerly at
    construction like every sink round-trip here."""
    from ..sources import upsert

    o = t(spark, sf_dir, "orders")
    tbl = os.path.join(_scratch("s14_upsert_"), "tbl")
    upsert.write_base(o, tbl)
    upd = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    upsert.append_delta(upd, tbl, 1)
    dels = o.filter(F.col("o_orderkey") % 13 == 0).select("o_orderkey")
    upsert.append_delta(o.limit(0), tbl, 2, deletes=dels)
    merged = upsert.read_merged(spark, tbl, ["o_orderkey"])
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


S14_SQL = """
SELECT o_orderpriority,
       count(*) AS n,
       round(sum(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END), 2) AS sum_price
FROM orders
WHERE o_orderkey % 13 <> 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def s17_occ_committers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency commit protocol (sources/upsert.py:
    commit_delta, r10): two writers upsert OVERLAPPING keys into one
    table with NO version coordination — writer A doubles every key
    ≡ 0 (mod 7), writer B triples every key ≡ 0 (mod 5), so keys
    ≡ 0 (mod 35) are contended. commit_delta stages each batch and
    claims the next version by atomic rename, so the committers
    serialize into _v=1 and _v=2 in call order and merge-on-read
    resolves the contended keys to the LAST committer (B). The oracle
    recomputes that resolution directly from orders — mod-35 keys must
    be tripled, not doubled, or the interleaving bug the OCC protocol
    exists to prevent shows up as a hash mismatch. Asserts the
    allocated versions as a hard protocol check at construction."""
    from ..sources import upsert

    o = t(spark, sf_dir, "orders")
    tbl = os.path.join(_scratch("s17_occ_"), "tbl")
    upsert.write_base(o, tbl)
    writer_a = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    writer_b = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 3
    )
    va = upsert.commit_delta(writer_a, tbl)
    vb = upsert.commit_delta(writer_b, tbl)
    assert (va, vb) == (1, 2), f"OCC allocation broke: {(va, vb)}"
    merged = upsert.read_merged(spark, tbl, ["o_orderkey"])
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


S17_SQL = """
SELECT o_orderpriority,
       count(*) AS n,
       round(sum(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 3
                      WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END), 2) AS sum_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


ROUNDTRIP_QUERIES: list[QuerySpec] = [
    QuerySpec("s17_occ_committers", s17_occ_committers, S17_SQL,
              "S17 optimistic-concurrency commits: two uncoordinated "
              "writers with overlapping keys serialize into distinct "
              "versions; merged view == oracle's LWW recomputation"),
    QuerySpec("s16_incremental_agg", s16_incremental_agg, S16_SQL,
              "S16 incremental view maintenance: base agg + (new-old) "
              "deltas == full rescan, exact decimal accumulators"),
    QuerySpec("s15_pyds_roundtrip", s15_pyds_roundtrip, S15_SQL,
              "S15 Spark 4 Python DataSource plugin round-trip: "
              "partition-per-file snapshot source, no shuffle"),
    QuerySpec("s14_upsert_roundtrip", s14_upsert_roundtrip, S14_SQL,
              "S14 merge-on-read upsert table: CDC base+delta+tombstone "
              "round-trip, last-writer-wins proven by value hash"),
    QuerySpec("p2_positional_select", p2_positional_select, P2_SQL,
              "P2 projection by position (trainer.py:51, config.yaml:42-47)"),
    QuerySpec("p4_ts_truncate", p4_ts_truncate, P4_SQL,
              "P4 timestamp truncation to seconds (pipeline.py:33)"),
    QuerySpec("p5_multiformat_parse", p5_multiformat_parse, P5_SQL,
              "P5 two-format timestamp parse round-trip "
              "(calculations.py:14-17)"),
    QuerySpec("a7_resource_aggs", a7_resource_aggs, A7_SQL,
              "A7 count/avg/max/sum resource aggregates (logger.py:92-97)"),
    QuerySpec("s1_snapshot_roundtrip", s1_snapshot_roundtrip, S1_SQL,
              "S1-S4 snapshot TSV scan + filename event time + canonical "
              "long round-trip (bearing.py:27-33)"),
    QuerySpec("s5_csv_roundtrip", s5_csv_roundtrip, S5_SQL,
              "S5 CSV sink+scan round-trip with projection "
              "(trainer.py:51)"),
    QuerySpec("s6_json_roundtrip", s6_json_roundtrip, S6_SQL,
              "S6/S7 JSON results sink + schema-inferred scan "
              "(trainer.py:204-211, visualization.py:41-43)"),
    QuerySpec("k1_kbm_roundtrip", k1_kbm_roundtrip, K1_SQL,
              "S5/P3/P4/P5 KBM reader round-trip + anomaly-label range "
              "join (pipeline.py:7-34)"),
    QuerySpec("s10_resource_roundtrip", s10_resource_roundtrip, S10_SQL,
              "S10 resource-log sink + scan round-trip + per-minute "
              "rollup (logger.py:49-97)"),
    QuerySpec("s11_log_scan", s11_log_scan, S11_SQL,
              "S11 Keras-stdout log scanner (logger.py:106-161)"),
    QuerySpec("k2_kbm_quarantine", k2_kbm_quarantine, K2_SQL,
              "corrupt-record quarantine round-trip: per-reason "
              "routing + bit-exact clean values vs events"),
    QuerySpec("s12_orc_roundtrip", s12_orc_roundtrip, S12_SQL,
              "ORC partitioned sink + pruned scan round-trip "
              "(hive-style shard layout, PartitionFilters-proven)"),
]
