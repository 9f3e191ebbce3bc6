"""The bench stdout contract line (VERDICT r13 item 1).

The driver parses the ONE JSON line out of a ~2000-char stdout tail and
marks any query present in the previous round's line but absent now as
"dropped_from_bench". r13's shed order (headline rows before b-side)
produced 17 phantom drops. These tests pin the fixed behavior:
b-side rows shed first, r13-printed headline rows NEVER shed, explicit
headline_complete marker, deterministic output. Pure-Python — no Spark.
"""

import json

from bench import _PINNED_PRINT, _contract_line

# the r13 judged line's batch rows (BENCH_r13.json) with realistic walls
_R13_PRINTED = {
    "d8_dup_clusters": 3.28, "s9_ivf_recall": 2.21, "s6_ivfpq_ann": 2.2,
    "d12_containment": 2.15, "d13_incremental_semdedup": 2.1,
    "c2_curation_with_semdedup": 1.95, "a26_sliding_distinct": 1.81,
    "mm8_frame_tensor_stats": 1.79, "m17_psi_drift": 1.77,
    "t12_bigram_lm": 1.76, "d10_incremental_lsh": 1.74,
    "q21_waiting_suppliers": 1.73, "t17_textrank": 1.72,
    "w25_binary_segmentation": 1.71, "m9_fedavg_weights": 1.63,
    "s18_mmr_rerank": 1.54, "d9_semdedup": 1.45, "s17_occ_committers": 1.43,
    "t15_gopher_repetition": 1.41, "s14_upsert_roundtrip": 1.38,
    "m2_lstm_train_loss": 1.38, "d4_lsh_candidates": 1.24,
    "s2_ivf_ann": 1.22, "s4_hyperplane_ann": 1.19,
    "a22_approx_distinct": 1.19, "s13_kmeans_codebook": 1.16,
    "bearing_pipeline": 1.16, "a25_partition_checksums": 1.09,
}


def _full_suite_times():
    # 91 headline rows: the 28 r13-printed plus 63 fast fillers with
    # realistically long registry names
    times = dict(_R13_PRINTED)
    for i in range(63):
        times[f"x{i:02d}_some_longish_registry_query_name"] = 0.3 + i * 0.01
    return times


def _call(times, **kw):
    kw.setdefault("noise_flagged", [f"n{i}_flagged_query_name" for i in range(9)])
    kw.setdefault("streaming_total", 8.5)
    kw.setdefault(
        "streaming_queries", {"bearing_stream": 4.0, "curation_stream": 4.5}
    )
    kw.setdefault("bside_total", 18.6)
    kw.setdefault(
        "bside_queries",
        {f"b{i:02d}_nonheadline_rotation_query": 0.2 + i * 0.03 for i in range(30)},
    )
    return _contract_line(
        round(sum(times.values()), 3), times, 0.1, 0.255, **kw
    )


def test_line_fits_budget_and_parses():
    line = _call(_full_suite_times())
    assert len(line) <= 1900
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_total"
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.1


def test_r13_printed_rows_never_shed():
    """Every row the r13 PERF comparison tracks must keep a printed
    number — even when it is now among the FASTEST rows."""
    times = _full_suite_times()
    # make every pinned row faster than every filler: worst case for a
    # slowest-first fill, the exact scenario that creates phantom drops
    for name in _R13_PRINTED:
        times[name] = 0.05
    doc = json.loads(_call(times))
    missing = set(_R13_PRINTED) - set(doc["queries"])
    assert missing == set(), f"pinned rows shed: {missing}"


def test_bside_sheds_before_headline():
    doc = json.loads(_call(_full_suite_times()))
    # if any headline row was elided, the b-side map must already be empty
    if doc.get("queries_elided"):
        assert doc.get("bside_queries", {}) == {}
        assert doc["headline_complete"] is False
    # b-side total always survives even when its map is shed
    assert doc["bside_total"] == 18.6


def test_headline_complete_marker():
    # small suite: everything fits, marker says complete
    small = dict(list(_full_suite_times().items())[:10])
    doc = json.loads(_call(small, bside_queries={}, bside_total=0.0))
    assert doc["headline_complete"] is True
    assert set(small) == set(doc["queries"])
    # full suite: can't fit 91 rows in 1900 chars, marker must say so
    doc = json.loads(_call(_full_suite_times()))
    if len(doc["queries"]) < 91:
        assert doc["headline_complete"] is False
        assert doc["queries_elided"] == 91 - len(doc["queries"])


def test_deterministic():
    a, b = _call(_full_suite_times()), _call(_full_suite_times())
    assert a == b


def test_pinned_set_matches_r13_line():
    assert _PINNED_PRINT == frozenset(_R13_PRINTED)
