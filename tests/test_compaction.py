"""Small-files compaction (sources/compaction.py): file count follows
the sizing rule, rows survive exactly, output sizes are balanced."""

from __future__ import annotations

import glob
import os

from anomaly_detection_iiot_spark.sources import compaction


def test_compact_dir_merges_small_files(spark, tmp_path, sf_dir):
    src = str(tmp_path / "shattered")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(50).write.parquet(src)  # simulate micro-batch litter
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 50

    dst = str(tmp_path / "compacted")
    # target sized so the whole corpus fits in ONE file
    n = compaction.compact_dir(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).count() == 0


def test_compact_dir_splits_by_target(spark, tmp_path, sf_dir):
    src = str(tmp_path / "src2")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(20).write.parquet(src)

    total = compaction.dir_bytes(src)
    target = total // 4 + 1  # expect ~4 output files
    dst = str(tmp_path / "dst2")
    n = compaction.compact_dir(spark, src, dst, target_file_bytes=target)
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert n == len(files) == 4
    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[-1] < 2 * sizes[0]  # round-robin keeps sizes balanced
    assert spark.read.parquet(dst).count() == docs.count()


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    from anomaly_detection_iiot_spark.sources import robust

    p = tmp_path / "drop.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "ok one"}',
                "this is not json at all {{{",
                '{"doc_id": 2, "text": "ok two"}',
                '{"wrong_shape": true}',
                '"just a scalar"',
                '{"doc_id": 3}',  # partial: typed field present -> good
            ]
        )
        + "\n"
    )
    good, bad = robust.read_json_with_quarantine(
        spark, str(p), "doc_id bigint, text string"
    )
    good_rows = {(r.doc_id, r.text) for r in good.collect()}
    assert good_rows == {(1, "ok one"), (2, "ok two"), (3, None)}
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 3
    assert "this is not json at all {{{" in bad_lines
