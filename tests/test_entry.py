"""Driver-contract smoke tests at sf0.001 (mirrors the driver's t1)."""

from __future__ import annotations

import pytest


def test_registry_contract():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert len(q) >= 59
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH"))
               for s in o.values())


def test_entry_runs_and_returns_rows(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    cols = set(rows[0].asDict())
    assert {"user_id", "threshold", "first_anomaly_period"} <= cols
    assert all(r.threshold is not None for r in rows)


@pytest.mark.parametrize("name", ["q1_pricing_summary", "d4_lsh_candidates",
                                  "m6_reconstruction_error", "s1_cosine_topk"])
def test_representative_queries_run_at_sf0001(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    assert df.count() >= 0  # executes the full plan


def test_parity_list_is_consistent_with_registry():
    """Meta-invariants that keep the three query surfaces honest:
    ANSI_QUERIES has no duplicates, names only registry queries, every
    listed query HAS an oracle, and the declared-divergent set (oracle
    present but not in the parity list) is EMPTY as of r10 (m6
    converged via the relational forward pass, d8 via unrolled
    pointer-jumping with a fixpoint-proof column)."""
    from anomaly_detection_iiot_spark.queries import REGISTRY
    from tests.test_sql_frontend import ANSI_QUERIES

    assert len(ANSI_QUERIES) == len(set(ANSI_QUERIES)), "duplicates"
    assert set(ANSI_QUERIES) <= set(REGISTRY), "unknown names"
    with_oracle = {n for n, s in REGISTRY.items() if s.oracle is not None}
    assert set(ANSI_QUERIES) <= with_oracle, "parity without oracle"
    divergent = with_oracle - set(ANSI_QUERIES)
    assert divergent == set(), (
        f"undocumented divergence: {sorted(divergent)}"
    )


def test_driver_priority_names_are_registry_names():
    from anomaly_detection_iiot_spark.queries import (
        REGISTRY,
        _DRIVER_PRIORITY,
    )

    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))
    unknown = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
    assert not unknown, f"priority entries not in registry: {unknown}"
