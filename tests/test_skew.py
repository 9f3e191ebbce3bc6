"""Salted two-phase aggregation must equal the plain groupBy exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.operators.skew import salted_aggregate


@pytest.fixture()
def skewed(spark):
    rng = np.random.default_rng(61)
    n = 5000
    # 90% of rows on one hot key
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    return spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": rng.normal(size=n), "w": rng.integers(0, 100, n)})
    )


def test_salted_equals_plain(spark, skewed):
    salted = salted_aggregate(
        skewed,
        ["k"],
        {
            "n": ("count", "v"),
            "total": ("sum", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "mean_w": ("avg", "w"),
        },
        salt_buckets=16,
    ).toPandas().set_index("k").sort_index()
    plain = (
        skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("w").alias("mean_w"),
        )
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert list(salted.index) == list(plain.index)
    assert (salted["n"] == plain["n"]).all()
    for col in ["total", "lo", "hi", "mean_w"]:
        np.testing.assert_allclose(salted[col], plain[col], rtol=1e-9)


def test_salt_spreads_hot_key(spark, skewed):
    from anomaly_detection_iiot_spark.operators.skew import salt_column

    with_salt = skewed.withColumn("__salt", salt_column(skewed, 16, ["k"]))
    buckets = (
        with_salt.filter(F.col("k") == "hot")
        .select("__salt")
        .distinct()
        .count()
    )
    assert buckets >= 12  # hot key spread over (almost) all buckets


def test_non_decomposable_rejected(skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_aggregate(skewed, ["k"], {"x": ("median", "v")})


def test_salted_matches_plain_with_nulls(spark):
    # ADVICE r1: count/avg must ignore NULL measure values like the
    # unsalted aggregate does
    pdf = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 3,
            "v": [1.0, None, 3.0, None, 5.0, 7.0, None, 2.0, 4.0],
        }
    )
    df = spark.createDataFrame(pdf)
    salted = (
        salted_aggregate(
            df, ["k"], {"n": ("count", "v"), "mean_v": ("avg", "v")},
            salt_buckets=4,
        )
        .toPandas().set_index("k").sort_index()
    )
    plain = (
        df.groupBy("k")
        .agg(F.count("v").alias("n"), F.avg("v").alias("mean_v"))
        .toPandas().set_index("k").sort_index()
    )
    assert (salted["n"] == plain["n"]).all()
    np.testing.assert_allclose(salted["mean_v"], plain["mean_v"], rtol=1e-12)


def test_salt_spreads_duplicate_rows(spark):
    # ADVICE r1: a hot key whose rows are IDENTICAL (the exact-dedup
    # shape) must still spread across salt buckets
    from anomaly_detection_iiot_spark.operators.skew import salt_column

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["hot"] * 4000, "v": [1.0] * 4000})
    ).repartition(8)
    with_salt = df.withColumn("__salt", salt_column(df, 16, ["k"]))
    buckets = with_salt.select("__salt").distinct().count()
    assert buckets >= 6  # one bucket per upstream partition at minimum


# --- blocked_neardup_pairs tile guard (r2 verdict item 2) --------------------

def _block_vectors(seed=17):
    """One pathological 50-vector block, one small block, one singleton."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(50):
        base = rng.normal(size=8)
        # clusters of near-identical vectors so plenty of pairs pass
        if i % 5 == 0:
            base = np.ones(8) + rng.normal(scale=0.01, size=8)
        rows.append({"vec_id": i, "label": 1, "embedding": base.tolist()})
    for i in range(4):
        rows.append(
            {"vec_id": 100 + i, "label": 2,
             "embedding": rng.normal(size=8).tolist()}
        )
    rows.append({"vec_id": 200, "label": 3,
                 "embedding": rng.normal(size=8).tolist()})
    return pd.DataFrame(rows)


def test_blocked_neardup_guard_matches_unguarded(spark):
    """A block far larger than max_block_rows must produce EXACTLY the
    same pairs through the tiled path as through one gram matrix."""
    from anomaly_detection_iiot_spark.operators.similarity import (
        blocked_neardup_pairs,
    )

    df = spark.createDataFrame(_block_vectors())
    guarded = blocked_neardup_pairs(df, min_cosine=0.1, max_block_rows=8)
    unguarded = blocked_neardup_pairs(df, min_cosine=0.1, max_block_rows=10**9)
    a = sorted(map(tuple, guarded.collect()))
    b = sorted(map(tuple, unguarded.collect()))
    assert a == b
    assert len(a) > 50  # the pathological block actually generated pairs


def test_blocked_neardup_tile_boundaries(spark):
    """Pairs that straddle a chunk boundary (off-diagonal tiles) must
    appear exactly once with vec_a < vec_b."""
    from anomaly_detection_iiot_spark.operators.similarity import (
        blocked_neardup_pairs,
    )

    # 10 identical vectors -> all 45 pairs, chunk size 3 -> 4 chunks
    pdf = pd.DataFrame(
        {
            "vec_id": range(10),
            "label": [7] * 10,
            "embedding": [[1.0, 2.0, 3.0]] * 10,
        }
    )
    got = blocked_neardup_pairs(
        spark.createDataFrame(pdf), min_cosine=0.5, max_block_rows=3
    ).collect()
    pairs = {(r.vec_a, r.vec_b) for r in got}
    assert len(got) == 45 and len(pairs) == 45
    assert all(a < b for a, b in pairs)


def test_owned_caches_do_not_accumulate(spark):
    """Repeated invocations of cache-owning operators (bench's
    min-of-3 loop shape) must hold at most one live cache per site —
    not one per call (ADVICE r2)."""
    from anomaly_detection_iiot_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signature_arrays, shingle_array,
        tokenize,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(40), "text": [f"tok{i % 7} a b c d" for i in range(40)]}
        )
    )
    sigs = minhash_signature_arrays(shingle_array(tokenize(docs), n=2))

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    lsh_candidate_pairs(sigs).count()
    after_first = n_cached()
    for _ in range(3):
        lsh_candidate_pairs(sigs).count()
    assert n_cached() <= after_first


def test_owned_cache_same_plan_reused_different_plan_replaced(spark):
    from anomaly_detection_iiot_spark.operators.cache import (
        replace_owned_cache,
    )

    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    first = replace_owned_cache("test_site", a)
    first.count()
    # identical plan -> the SAME cached frame comes back
    again = replace_owned_cache(
        "test_site", spark.range(100).selectExpr("id", "id * 2 AS v")
    )
    assert again is first
    # different plan -> replaced (and old cache released)
    other = replace_owned_cache(
        "test_site", spark.range(50).selectExpr("id", "id * 3 AS v")
    )
    assert other is not first
    assert other.count() == 50


def test_owned_cache_adaptive_partitioning(spark):
    """adaptive_partitioning=True compiles the cached plan with AQE
    partition coalescing (r14: a KB-scale cached frame must not persist
    as shuffle.partitions near-empty partitions that every consumer
    rescans), and the session conf is restored afterwards."""
    from anomaly_detection_iiot_spark.operators.cache import (
        replace_owned_cache,
    )

    key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    assert spark.conf.get(key) == "false"  # Spark default
    shuffled = spark.range(0, 200, 1, 4).groupBy(
        (F.col("id") % 3).alias("k")
    ).count()
    cached = replace_owned_cache(
        "test_adaptive_site", shuffled, adaptive_partitioning=True
    )
    cached.count()
    # 3 tiny groups coalesce below the conftest shuffle.partitions (4)
    assert cached.rdd.getNumPartitions() == 1
    assert spark.conf.get(key) == "false"  # scoped set/restore
    cached.unpersist()
