"""Streaming ANN index ingest (streaming/ann_ingest.py): streamed cell
assignment must equal batch, appends must land in bucket partitions
that still PRUNE, and the load report must read the grown index."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators import similarity
from anomaly_detection_iiot_spark.streaming import ann_ingest


def _vecs(ids, seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [
                [float(x) for x in rng.randn(64)] for _ in ids
            ],
        }
    )


def test_stream_ingest_equals_batch_and_partitions_prune(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    chunk0, chunk1 = _vecs(range(0, 40), 11), _vecs(range(40, 80), 12)
    now = time.time()
    for i, pdf in enumerate([chunk0, chunk1]):
        f = os.path.join(src, f"c{i}.parquet")
        pdf.to_parquet(f)
        os.utime(f, (now + i, now + i))

    batch_all = spark.createDataFrame(pd.concat([chunk0, chunk1]))
    centroids = batch_all.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    expected = {
        r["vec_id"]: r["bucket"]
        for r in similarity.ivf_assign(batch_all, centroids).collect()
    }

    index = str(tmp_path / "index")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ann_ingest.ingest_to_partitioned_index(
        stream, centroids, index, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    at_rest = spark.read.parquet(index)
    got = {r["vec_id"]: r["bucket"] for r in at_rest.collect()}
    assert got == expected  # stream assignment == batch assignment

    # partition pruning still holds on the grown index
    one_cell = sorted({b for b in expected.values()})[0]
    probe = at_rest.filter(F.col("bucket") == one_cell)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert probe.count() == sum(1 for b in expected.values() if b == one_cell)

    load = {
        r["bucket"]: r for r in ann_ingest.cell_load(at_rest).collect()
    }
    assert sum(r["n"] for r in load.values()) == len(expected)
    assert all(r["load_factor"] > 0 for r in load.values())

    # Redelivery exactly-once: replay the SAME micro-batches (fresh
    # checkpoint → same deterministic batch ids 0,1 over the same
    # mtime-ordered files). Per-batch `ingest_batch=<id>` overwrite
    # must leave the at-rest index byte-identical in row terms — a
    # plain append sink would double every vector here.
    q2 = ann_ingest.ingest_to_partitioned_index(
        stream, centroids, index, str(tmp_path / "ckpt_replay")
    )
    q2.awaitTermination(120)
    replayed = spark.read.parquet(index)
    assert replayed.count() == len(expected)  # no duplicates on replay
    got2 = {r["vec_id"]: r["bucket"] for r in replayed.collect()}
    assert got2 == expected


def test_streamed_pq_index_serves_identical_adc_probe(spark, tmp_path):
    """Streaming IVF-PQ serving (r6 verdict item 8): ingest the corpus
    in two micro-batches through cell-assign + PQ-encode foreachBatch,
    then run the SAME ADC probe (similarity.ivfpq_probe — the exact
    implementation behind s6) over the at-rest index. Results must be
    IDENTICAL to probing a batch-built index over the same vectors —
    i.e. a streamed-in batch is queryable with no corpus re-encode."""
    import os
    import time

    from anomaly_detection_iiot_spark.operators import similarity

    src = str(tmp_path / "pq_arrivals")
    os.makedirs(src)
    chunk0, chunk1 = _vecs(range(0, 50), 21), _vecs(range(50, 90), 22)
    now = time.time()
    for i, pdf in enumerate([chunk0, chunk1]):
        f = os.path.join(src, f"c{i}.parquet")
        pdf.to_parquet(f)
        os.utime(f, (now + i, now + i))

    batch_all = spark.createDataFrame(pd.concat([chunk0, chunk1]))
    centroids = batch_all.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    codebook = batch_all.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("code_id"),
        F.col("embedding").alias("cvec"),
    )
    queries = batch_all.filter(F.col("vec_id").between(60, 64)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    # batch-built index
    b_index = similarity.ivf_assign(batch_all, centroids).select(
        "vec_id", "bucket"
    ).join(similarity.pq_widen(
        similarity.pq_encode(batch_all, codebook, m=8)
    ), "vec_id")
    expected = {
        (r.qid, r.rk): (r.cid, r.adc)
        for r in similarity.ivfpq_probe(
            b_index, queries, centroids, codebook, m=8, k=5
        ).collect()
    }
    assert expected  # probe actually returned candidates

    # streamed index: two micro-batches, then probe the at-rest table
    index = str(tmp_path / "pq_index")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ann_ingest.ingest_to_pq_index(
        stream, centroids, codebook, index, str(tmp_path / "pq_ckpt"), m=8
    )
    q.awaitTermination(120)
    at_rest = spark.read.parquet(index).select("vec_id", "bucket", "codes")
    assert at_rest.count() == 90
    got = {
        (r.qid, r.rk): (r.cid, r.adc)
        for r in similarity.ivfpq_probe(
            at_rest, queries, centroids, codebook, m=8, k=5
        ).collect()
    }
    assert got == expected
