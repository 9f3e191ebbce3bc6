"""Partition pruning (sources/partitioned.py): a filter on the
partition column must reach the scan as a PartitionFilter and the scan
must touch only the matching partition's files."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.sources import partitioned


def test_partitioned_write_prunes_at_scan(spark, tmp_path, sf_dir):
    path = str(tmp_path / "docs_by_lang")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    partitioned.write_partitioned(docs, path, ["lang"])

    # hive layout on disk, one dir per language
    langs = sorted(
        os.path.basename(p).split("=")[1]
        for p in glob.glob(os.path.join(path, "lang=*"))
    )
    assert langs == ["de", "en", "es", "fr", "zh"]

    back = partitioned.read_partitioned(spark, path)
    q = back.filter(F.col("lang") == "en").select("doc_id", "n_chars")

    pf = partitioned.partition_filters(q)
    assert "lang" in pf and "en" in pf, f"no partition filter in scan: {pf!r}"

    # pruning is real: the scan reads only the en partition's rows,
    # and the row count matches the source predicate
    expected = docs.filter(F.col("lang") == "en").count()
    assert q.count() == expected

    # file-level pruning, not just a row-count coincidence: the scan's
    # numFiles metric counts only the pruned-in en-partition files
    en_files = len(glob.glob(os.path.join(path, "lang=en", "*.parquet")))
    all_files = len(glob.glob(os.path.join(path, "lang=*", "*.parquet")))
    assert all_files > en_files  # other partitions exist on disk
    n_read = partitioned.files_read(q)
    assert n_read == en_files, (
        f"scan read {n_read} files, expected only the {en_files} "
        f"en-partition files (of {all_files} on disk)"
    )


def test_partitioned_write_one_file_set_per_partition(spark, tmp_path, sf_dir):
    """The pre-shuffle keeps the file count bounded: each partition dir
    holds files from the one task that owned that value, not one file
    per (task x value)."""
    path = str(tmp_path / "docs_tight")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    partitioned.write_partitioned(docs, path, ["lang"])
    for d in glob.glob(os.path.join(path, "lang=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) <= 2, f"{d} exploded into {len(files)} files"


def test_ivf_corpus_at_rest_prunes_probed_cells(spark, tmp_path, sf_dir):
    """The similarity docstring's scale claim, proven: an IVF-assigned
    corpus written partitioned by bucket lets a probe read ONLY its
    cell's partition (PartitionFilters on bucket), so ANN candidate
    fetch is directory pruning, not a corpus scan."""
    from anomaly_detection_iiot_spark.operators import similarity

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    centroids = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    assigned = similarity.ivf_assign(e, centroids)
    path = str(tmp_path / "ivf_at_rest")
    partitioned.write_partitioned(assigned, path, ["bucket"])

    back = partitioned.read_partitioned(spark, path)
    probe = back.filter(F.col("bucket") == 3)
    pf = partitioned.partition_filters(probe)
    assert "bucket" in pf and "3" in pf, f"probe not pruned: {pf!r}"
    assert probe.count() == assigned.filter(F.col("bucket") == 3).count()
