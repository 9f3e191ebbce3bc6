"""BPE merge-table induction over a document corpus — the tokenizer
TRAINING step (the suite already consumes BPE-ish token counts in
t1/w15/o10; this learns the merges).

Classic formulation (Sennrich et al. 2016): train on the WORD-FREQUENCY
table, not the raw corpus — the corpus is scanned once to build
(word, freq); every merge round then works on |vocab| rows, orders of
magnitude smaller than the corpus at 100 TB. Each round is

  1. pair counting: explode adjacent symbol pairs weighted by word
     freq, groupBy(left, right) sum — one shuffle over vocab-sized
     data, map-side combined;
  2. argmax pair with deterministic tie-break (freq DESC, left ASC,
     right ASC) — orderBy + limit(1), a single collected row;
  3. merge application: greedy left-to-right non-overlapping rewrite
     of every word's symbol array, expressed as a pure higher-order
     F.aggregate fold (no Python UDF — the whole round is
     whole-stage-codegen/JVM eval).

The driver round loop matches m9 (FedAvg) and s13 (k-means): the
per-round state that crosses the driver is ONE (left, right) pair.
Greedy-fold correctness: a merged symbol is left||right which can
never equal `left` again (right is non-empty), so the fold cannot
chain-merge through its own output — exactly the standard
leftmost-first semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercase whitespace tokens — the BPE training
    table. One corpus scan, one vocab-keyed shuffle."""
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) symbol pairs into one symbol, as a fold."""
    lft, rgt = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lft)
            & (s == rgt),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(freqs: DataFrame, n_merges: int) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.
    Returns [(left, right, pair_freq), ...] in merge order. Executes
    eagerly (one pair-count job + one argmax collect per round)."""
    state = freqs.select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    ).persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                state.select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), 1, F.size("syms") - 1),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("left"), b.alias("right")
                            ),
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("freq").alias("pair_freq"))
                .orderBy(F.desc("pair_freq"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not pairs:
                break
            left, right, pf = pairs[0].left, pairs[0].right, pairs[0].pair_freq
            merges.append((left, right, int(pf)))
            new_state = state.select(
                _apply_merge(F.col("syms"), left, right).alias("syms"),
                "freq",
            ).persist()
            state.unpersist()
            state = new_state
    finally:
        state.unpersist()
    return merges
