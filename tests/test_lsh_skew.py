"""LSH band-bucket skew guard (VERDICT r1 item 7): a pathological band
key shared by hundreds of docs must expand through the two-phase
(posexplode + round-robin repartition) path with results identical to
the single-flatten path."""

from __future__ import annotations

import pandas as pd

from anomaly_detection_iiot_spark.operators.dedup import lsh_candidate_pairs

N_HOT = 150  # one band bucket of 150 docs -> 11,175 pairs


def _signatures(spark):
    rows = []
    # hot cluster: identical signature -> every band collides
    for i in range(N_HOT):
        rows.append({"doc_id": f"hot{i:04d}", **{f"h{j}": "aaaa0000" for j in range(8)}})
    # normal docs: unique signatures -> no collisions
    for i in range(50):
        rows.append(
            {"doc_id": f"doc{i:04d}", **{f"h{j}": f"{i:04x}{j:04x}" for j in range(8)}}
        )
    # one small pair cluster (stays on the small-bucket path)
    for i in range(2):
        rows.append({"doc_id": f"pair{i}", **{f"h{j}": "bbbb1111" for j in range(8)}})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_guarded_path_matches_unguarded(spark):
    sigs = _signatures(spark)
    guarded = lsh_candidate_pairs(sigs, max_bucket_expand=16)
    unguarded = lsh_candidate_pairs(sigs, max_bucket_expand=10**9)
    a = sorted(map(tuple, guarded.collect()))
    b = sorted(map(tuple, unguarded.collect()))
    assert a == b
    assert len(a) == N_HOT * (N_HOT - 1) // 2 + 1  # hot pairs + the pair cluster


def test_big_bucket_expansion_is_spread(spark):
    """The oversized bucket's pair generation must run after a
    round-robin repartition (many tasks), not inside one flatten."""
    sigs = _signatures(spark)
    plan = lsh_candidate_pairs(sigs, max_bucket_expand=16)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "RoundRobinPartitioning" in plan


def test_ordering_invariant(spark):
    sigs = _signatures(spark)
    pairs = lsh_candidate_pairs(sigs, max_bucket_expand=16).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
