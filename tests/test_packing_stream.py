"""Streaming sequence packing (streaming/packing_stream.py): the
stateful online bin assignment must equal the batch running-sum window
(w15) when arrival order matches doc_id order — including bins that
straddle a micro-batch boundary (the state carry)."""

from __future__ import annotations

import os
import time

import pandas as pd

from anomaly_detection_iiot_spark.queries.textsim import w15_sequence_packing
from anomaly_detection_iiot_spark.streaming.packing_stream import packing_stream

_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _doc(i: int, lang: str, n_tokens: int):
    text = " ".join(_WORDS.split()[:n_tokens] * 1)
    return {
        "doc_id": i,
        "text": " ".join((_WORDS + " ").split()[: n_tokens]),
        "lang": lang,
        "source": "t",
        "n_chars": len(text),
    }


def test_packing_stream_equals_batch_across_batch_boundary(spark, tmp_path):
    table = str(tmp_path / "documents.parquet")
    os.makedirs(table)
    # budget 16: doc sizes chosen so a bin straddles the chunk boundary
    # (docs 0-3 fill 10+8+6+9=33 tokens over chunks; only correct state
    # carry reproduces the batch pack_ids)
    chunk0 = pd.DataFrame([_doc(0, "en", 10), _doc(1, "en", 8),
                           _doc(10, "de", 5)])
    chunk1 = pd.DataFrame([_doc(2, "en", 6), _doc(3, "en", 9),
                           _doc(11, "de", 7)])
    now = time.time()
    for i, pdf in enumerate([chunk0, chunk1]):
        f = os.path.join(table, f"chunk{i}.parquet")
        pdf.to_parquet(f)
        os.utime(f, (now + i, now + i))

    batch = {
        (r["doc_id"]): r.asDict()
        for r in w15_sequence_packing(spark, str(tmp_path)).collect()
    }
    # w15 uses budget 512; recompute expected bins at budget 16 from its
    # token counts to keep ONE token-count source of truth
    cum: dict[str, int] = {}
    expected = {}
    for did in sorted(batch):
        r = batch[did]
        c = cum.get(r["lang"], 0)
        expected[did] = c // 16
        cum[r["lang"]] = c + r["n_bpe_tokens"]

    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(table)
    )
    q = (
        packing_stream(stream, budget=16)
        .writeStream.format("memory")
        .queryName("packing")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r.asDict()
        for r in spark.sql("SELECT * FROM packing").collect()
    }
    assert set(got) == set(batch)
    for did, r in got.items():
        assert r["n_bpe_tokens"] == batch[did]["n_bpe_tokens"]
        assert r["pack_id"] == expected[did], (did, r, expected[did])
    # the straddle actually happened: en doc 2 or 3 landed in a bin that
    # started in chunk0
    assert expected[2] >= 1
