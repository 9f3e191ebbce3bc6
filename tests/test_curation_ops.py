"""Property tests for the round-7 curation additions: t15 Gopher
repetition filters and o11 deterministic hash split."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def t15_rows(spark):
    return REGISTRY["t15_gopher_repetition"].fn(spark, SF_DIR).collect()


def test_t15_fractions_bounded(t15_rows):
    """Every char fraction is a valid share of the document: (0, 1] for
    top-gram fractions (a gram always covers >0 chars), [0, 1] for the
    duplicated-5-gram coverage."""
    assert len(t15_rows) > 0
    for r in t15_rows:
        for col in ("top2_char_frac", "top3_char_frac", "top4_char_frac"):
            assert 0.0 < r[col] <= 1.0, (r["doc_id"], col, r[col])
        assert 0.0 <= r["dup5_char_frac"] <= 1.0


def test_t15_top_fraction_monotone_in_n(t15_rows):
    """A top n-gram's char coverage cannot grow with n faster than the
    text allows: the top-(n+1)-gram occurs at most as often as the top
    n-gram, but is longer — so no strict ordering holds. What MUST
    hold: flag agrees with the thresholds, exactly."""
    for r in t15_rows:
        expect = (
            r["top2_char_frac"] > 0.20
            or r["top3_char_frac"] > 0.18
            or r["top4_char_frac"] > 0.16
            or r["dup5_char_frac"] > 0.15
        )
        assert r["gopher_flagged"] == expect


def test_t15_degenerate_doc_flags(spark):
    """A fully-repeated document ('spam spam ... spam') must score 1.0
    on every metric and be flagged; a unique-token document must score
    near 1/n_grams and pass."""
    from anomaly_detection_iiot_spark.queries.textsim import (
        t15_gopher_repetition,
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="t15_docs_")
    spam = " ".join(["spam"] * 50)
    uniq = " ".join(f"tok{i}" for i in range(50))
    df = spark.createDataFrame(
        [(0, spam, "en", "synth", len(spam)), (1, uniq, "en", "synth", len(uniq))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in t15_gopher_repetition(spark, d).collect()}
    assert rows[0]["top2_char_frac"] == 1.0
    assert rows[0]["dup5_char_frac"] == 1.0
    assert rows[0]["gopher_flagged"] is True
    assert rows[1]["gopher_flagged"] is False
    assert rows[1]["dup5_char_frac"] == 0.0


def test_o11_split_is_stable_and_portable(spark):
    """The split assignment must equal the portable definition
    (md5-hex-prefix buckets) computed in plain Python, and re-running
    must give identical assignments (no rand())."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    assigned = docs.withColumn(
        "split",
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test"),
    )
    got = {r["doc_id"]: r["split"] for r in assigned.collect()}
    for doc_id, split in got.items():
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
        expect = "train" if h < "cc" else ("val" if h < "e6" else "test")
        assert split == expect, (doc_id, h, split, expect)
    again = {r["doc_id"]: r["split"] for r in assigned.collect()}
    assert got == again


def test_o11_split_shares_near_nominal(spark):
    """At 500 docs the realized shares should be within a loose
    binomial band of the 204/26/26-bucket design (~79.7/10.2/10.2)."""
    rows = REGISTRY["o11_hash_split"].fn(spark, SF_DIR).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    assert total == 500
    assert 0.70 < by_split["train"] / total < 0.90
    assert 0.04 < by_split["val"] / total < 0.18
    assert 0.04 < by_split["test"] / total < 0.18
