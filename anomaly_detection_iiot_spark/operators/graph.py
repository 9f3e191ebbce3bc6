"""Connected components over duplicate pairs (LLM-pipeline extension;
no reference equivalent).

Pair-level dedup (LSH + Jaccard verify) yields EDGES; an actual keeper
table needs the transitive closure: if A~B and B~C, then A, B, C are
one duplicate cluster even when A~C was never emitted. This is the
standard label-propagation / BSP connected-components loop (the same
algorithm GraphX and GraphFrames run):

    label(v) <- min(label(v), min over neighbors' labels)

iterated to fixpoint. Each iteration is one join + one aggregate —
shuffle volume O(|edges|) per round, rounds = graph diameter (duplicate
clusters are short chains in practice, so a handful). State per round
is the (node, label) frame, persisted; lineage is cut with
localCheckpoint every few rounds so the plan does not grow with the
iteration count (a 20-round loop would otherwise compile a 20-deep
join tree).

Convergence is detected with a driver-side scalar (count of changed
labels) — a per-round KB-scale collect, the Spark-idiomatic shape for
iterative algorithms (SURVEY §4: "FedAvg — driver-side algorithm").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    node_out: str = "doc_id",
    label_out: str = "cluster_id",
    max_iter: int = 30,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Min-label propagation over undirected ``(a, b)`` edges. Returns
    one row per node appearing in any pair, labeled with the smallest
    node id reachable from it (the cluster id). Deterministic."""
    fwd = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    labels = labels.persist()
    # Convergence scalar: labels are monotonically non-increasing per
    # node, so sum(label) is strictly decreasing until the fixpoint —
    # an equal sum between rounds IS convergence. One agg action per
    # round, no label-vs-label join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for it in range(max_iter):
        msgs = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    edges.unpersist()
    return labels.select(
        F.col("u").alias(node_out), F.col("label").alias(label_out)
    )
