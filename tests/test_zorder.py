"""Z-order layout: prove the 2-D skipping property from parquet footer
stats, not from documentation.

Layout A (linear): events sorted by user_id only — every file spans
the full ``value`` range, so a predicate on ``value`` overlaps ~all
files. Layout B (Morton): range-partitioned on the interleaved key —
files cover compact (user_id, value) boxes, so the same 2-D box
predicate overlaps only the files whose box intersects it.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.queries.base import t
from anomaly_detection_iiot_spark.sources import zorder

N_FILES = 16
V_LO, V_HI = 100.0, 150.0    # ~10% of the value range — 2nd dimension


def _files_overlapping(path: str) -> tuple[int, int]:
    """(files whose [min,max] value stats intersect the band, total)."""
    hits, total = 0, 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        vmin, vmax = float("inf"), float("-inf")
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            vs = md.row_group(rg).column(cols["value"]).statistics
            vmin, vmax = min(vmin, vs.min), max(vmax, vs.max)
        total += 1
        if vmax >= V_LO and vmin <= V_HI:
            hits += 1
    return hits, total


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = t(spark, str(sf_dir), "events").select("event_id", "user_id", "value")
    linear = str(base / "linear")
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zed = str(base / "zed")
    ub = F.col("user_id").cast("long")
    vb = zorder.bucketize(F.col("value"), 0.0, 512.0, 8)
    zorder.write_zordered(
        ev, zed, zorder.zorder_key([ub, vb]), n_files=N_FILES
    )
    return linear, zed


def test_zorder_layout_skips_files_linear_does_not(layouts):
    linear, zed = layouts
    # predicate on the SECOND dimension only: the user-sorted layout
    # cannot skip anything (each file spans the full value range), the
    # Morton layout skips most files
    lin_hits, lin_total = _files_overlapping(linear)
    z_hits, z_total = _files_overlapping(zed)
    assert lin_hits == lin_total > 1  # linear: zero skipping on dim 2
    assert z_total >= N_FILES // 2
    assert z_hits <= z_total // 2, (z_hits, z_total)


def test_zorder_layout_preserves_rows(spark, layouts):
    linear, zed = layouts
    a = spark.read.parquet(linear)
    b = spark.read.parquet(zed)
    assert a.count() == b.count()
    band = b.filter(F.col("value").between(V_LO, V_HI)).count()
    band_lin = a.filter(F.col("value").between(V_LO, V_HI)).count()
    assert band == band_lin > 0


def test_morton_key_bit_interleave_exact(spark):
    df = spark.createDataFrame(
        [(0b1010, 0b0101), (255, 0), (0, 255), (3, 3)], "x long, y long"
    )
    out = df.select(
        zorder.zorder_key([F.col("x"), F.col("y")]).alias("z")
    ).collect()

    def morton(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert [r["z"] for r in out] == [
        morton(0b1010, 0b0101),
        morton(255, 0),
        morton(0, 255),
        morton(3, 3),
    ]


def test_optimize_zordered_compacts_and_restores_skipping(
    spark, sf_dir, tmp_path
):
    """The nightly OPTIMIZE+ZORDER pass: a fragmented unclustered ingest
    dir becomes few files whose footer stats skip a value band again."""
    from anomaly_detection_iiot_spark.sources import compaction

    frag = str(tmp_path / "fragmented")
    ev = t(spark, str(sf_dir), "events").select("event_id", "user_id", "value")
    # simulate incremental ingest: many tiny files, no clustering
    ev.repartition(32).write.mode("overwrite").parquet(frag)
    n_in = len(glob.glob(os.path.join(frag, "*.parquet")))
    assert n_in >= 16
    f_hits, f_total = _files_overlapping(frag)
    # fragmented ingest: essentially zero skipping (a tiny random
    # fragment can miss the band by luck, so allow a couple)
    assert f_hits >= f_total - 2

    opt = str(tmp_path / "optimized")

    def zkey(df):
        ub = F.col("user_id").cast("long")
        vb = zorder.bucketize(F.col("value"), 0.0, 512.0, 8)
        return zorder.zorder_key([ub, vb])

    compaction.optimize_zordered(
        spark, frag, opt, zkey, target_file_bytes=16 * 1024
    )
    n_out = len(glob.glob(os.path.join(opt, "*.parquet")))
    assert n_out < n_in
    z_hits, z_total = _files_overlapping(opt)
    assert z_hits <= z_total // 2  # skipping restored
    assert spark.read.parquet(opt).count() == ev.count()
