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
