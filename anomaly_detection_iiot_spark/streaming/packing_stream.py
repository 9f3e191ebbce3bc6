"""Stateful streaming sequence packing: the online analogue of batch
w15 (queries/textsim.py::w15_sequence_packing).

Batch packing is a running-sum window per language; online, documents
arrive incrementally and each must be assigned its context-window bin
AT INGEST — so the per-language cumulative token count lives in a
GroupState (one long per language), and every micro-batch continues
the count exactly where the previous one stopped. Given arrival order
== doc_id order per language (the drop-directory convention the tests
pin), streaming output equals the batch window row-for-row.

State per key is ONE long — at 100 TB/day the state store stays
language-count-sized regardless of throughput; partitioning follows
``groupBy(lang)``, the same shuffle the batch window pays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators import textstats

STATE_SCHEMA = StructType([StructField("cum_tokens", LongType())])

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("pack_id", LongType()),
    ]
)


def packing_stream(docs: DataFrame, budget: int = 512) -> DataFrame:
    """Assign each arriving document the training-sequence bin its
    first token lands in: ``pack_id = floor(cum_before / budget)``,
    with ``cum_before`` carried across micro-batches in state."""
    counted = textstats.bpe_token_count(docs).select(
        "doc_id", "lang", "n_bpe_tokens"
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cum = int(state.get[0]) if state.exists else 0
        # a group's micro-batch may arrive as multiple unordered Arrow
        # chunks; concatenate and order by doc_id so within-batch
        # assignment is deterministic (the cross-batch order is the
        # arrival order, which the ingest convention makes doc_id order)
        pdf = pd.concat(list(pdfs)).sort_values("doc_id")
        packs = []
        for n in pdf["n_bpe_tokens"]:
            packs.append(cum // budget)
            cum += int(n)
        state.update((cum,))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "lang": key[0],
                "n_bpe_tokens": pdf["n_bpe_tokens"].astype("int64"),
                "pack_id": pd.Series(packs, dtype="int64").values,
            }
        )

    return counted.groupBy("lang").applyInPandasWithState(
        fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
