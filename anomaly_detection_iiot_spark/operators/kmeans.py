"""Lloyd's k-means over an embedding column — IVF/PQ codebook TRAINING.

Closes the loop on the ANN family: s2/s6's coarse quantizers and PQ
codebooks were fixed vectors picked from the corpus; this module trains
them. Reference parity: the reference has no clustering (its models are
autoencoders), so this sits in the extension family BASELINE.json
requires (embedding similarity / dedup machinery at 100 TB needs
trained coarse quantizers).

Execution model (the same one Spark MLlib KMeans uses):
- centroids are TINY by definition → they live on the driver between
  iterations; each iteration is ONE distributed pass over the corpus
  (assignment folded into a narrow literal projection, zero shuffle;
  see ``similarity.ivf_assign`` for why literals beat a join) followed
  by ONE groupBy(bucket) with 64 avg() aggregates (single exchange on
  <=k keys, map-side partial aggregation does nearly all the work).
- the corpus is persisted across iterations by the caller if it is
  worth it (at 100 TB: MEMORY_AND_DISK on the projected 2-column
  frame, ~pointer-free Tungsten rows).

Cross-engine determinism (DuckDB oracle = the same loop unrolled as
chained CTEs):
- assignment keys on squared L2 with min-centroid-id tie-break — an
  integer decision, robust to fp noise;
- updated centroids are rounded to 9 decimals in BOTH engines before
  the next iteration, so cross-engine summation-order noise (~1e-15)
  cannot compound across iterations;
- folds accumulate left-to-right in fp64 exactly like DuckDB's
  list_sum (see ivf_assign's fidelity note).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import norm

# Above this many centroid doubles (k x dim), nearest-centroid
# assignment switches from the literal-expression fold to the Arrow
# matmul path: the literal plan's parse/codegen cost grows with k*dim
# (2.6 s compile at just k=8/dim=64 worth of per-iteration literals was
# the r8 s13 finding) and its runtime is an interpreted per-row loop
# over k, while the Arrow path is one dense numpy matmul per batch with
# a centroid matrix shipped once per task. k=8 coarse quantizers stay
# on the literal path (zero Python, oracle-exact fold order); k=4096
# quantizers get the matmul.
LITERAL_CENTROID_BUDGET = 4096


def _darr(values) -> str:
    """SQL array literal of doubles via shortest-repr round-trip (one
    JVM parse instead of one py4j call per element — see ivf_assign)."""
    return "array(" + ",".join(f"CAST('{v!r}' AS DOUBLE)" for v in values) + ")"


def assign_literal(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment (squared L2, min-id tie-break) as a
    narrow projection over literal centroids: adds ``bucket`` (long)
    and ``dist`` (double, squared L2 to the winning centroid). Zero
    shuffle, zero row expansion."""
    cents = sorted(centroids)
    cvecs = "array(" + ",".join(_darr(v) for _, v in cents) + ")"
    cids = "array(" + ",".join(f"{int(i)}L" for i, _ in cents) + ")"
    # ONE server-side-parsed expression (the s6/t16 pattern): the
    # Python-lambda HOF form cost hundreds of py4j round trips per
    # construction, and kmeans_train constructs this once per Lloyd
    # iteration. Fold order (left-to-right aggregate) and the
    # (dist, cid) lexicographic array_min tie-break are IDENTICAL to
    # the previous form — oracle-exact.
    best = F.expr(
        f"""array_min(transform(sequence(1, {len(cents)}),
  i -> named_struct(
    'd', aggregate(zip_with(transform(`{vec_col}`, x -> cast(x AS double)),
                            element_at({cvecs}, i),
                            (x, y) -> (x - y) * (x - y)),
                   cast(0 AS double), (acc, d) -> acc + d),
    'cid', element_at({cids}, i))))"""
    )
    return corpus.select(
        "*",
        best.getField("cid").alias("bucket"),
        best.getField("d").alias("dist"),
    )


def assign_arrow(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Large-k twin of ``assign_literal``: squared-L2 nearest centroid
    as one dense numpy computation per Arrow batch (mapInPandas, zero
    shuffle). Ids are sorted ascending and argmin takes the first
    minimum, so exact-distance ties break to the smallest centroid id —
    the same integer decision as the literal fold. fp summation is
    numpy's pairwise order instead of the fold's sequential order, so
    assignments can differ only on distances equal to within summation
    error (the dispatch test asserts agreement on the real corpus)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents = sorted(centroids)
    ids = np.array([int(i) for i, _ in cents], dtype=np.int64)
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in cents])
    c_sq = (C * C).sum(axis=1)
    out_schema = StructType(
        list(corpus.schema.fields)
        + [StructField("bucket", LongType()), StructField("dist", DoubleType())]
    )

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2, argmin over c;
            # recompute the winner's exact distance with a direct
            # difference so the reported dist has no cancellation
            d2 = (V * V).sum(axis=1, keepdims=True) - 2.0 * (V @ C.T) + c_sq
            win = d2.argmin(axis=1)
            diff = V - C[win]
            out = pdf.copy()
            out["bucket"] = ids[win]
            out["dist"] = (diff * diff).sum(axis=1)
            yield out

    return corpus.mapInPandas(batches, schema=out_schema)


def assign_centroids(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Dispatch on codebook size: literal fold below
    ``LITERAL_CENTROID_BUDGET`` centroid doubles, Arrow matmul above
    (compile cost flat in k on that path)."""
    n_doubles = sum(len(v) for _, v in centroids)
    if n_doubles <= LITERAL_CENTROID_BUDGET:
        return assign_literal(corpus, centroids, vec_col=vec_col)
    return assign_arrow(corpus, centroids, vec_col=vec_col)


def kmeans_train(
    corpus: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_empty: str = "shrink",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Train k centroids for ``iters`` Lloyd iterations, seeded from
    the first k rows by ``id_col`` (deterministic, engine-portable).

    Returns (final centroids, final assignment DataFrame with bucket +
    dist). Iterations execute EAGERLY at call time (each collects k
    tiny centroid rows — the driver round loop m9/FedAvg also uses);
    the returned assignment is lazy against the final centroids.
    Assignment dispatches literal-vs-Arrow on codebook size
    (``assign_centroids``), so compile cost stays flat at large k.

    ``on_empty`` controls what happens when an iteration leaves a
    cluster with no members: ``"shrink"`` (default) drops the centroid
    for all later iterations — the behavior the unrolled-CTE oracle
    mirrors — but WARNS, because a silently shrinking production
    codebook is a data-drift signal; ``"keep"`` retains the previous
    centroid for the empty bucket so k never shrinks (the MLlib-style
    guard; empty centroids can win members again in later rounds)."""
    if on_empty not in ("shrink", "keep"):
        raise ValueError(f"on_empty must be 'shrink' or 'keep': {on_empty!r}")
    # Small-corpus loops are bounded by per-iteration driver/scheduler
    # overhead (the t16/d8 finding): AQE per-stage replanning buys
    # nothing on a <=k-key exchange over a corpus that fits one
    # partition. Gate it off (restored after) below ~64k vectors; a
    # 100 TB corpus keeps AQE for the assignment scan's skew handling.
    spark = corpus.sparkSession
    n_vecs = corpus.count()
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    small = n_vecs <= 65536
    if small:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # the only exchange in the loop carries <= k keys
        spark.conf.set("spark.sql.shuffle.partitions", str(max(1, min(int(old_sp), k))))
    init = (
        corpus.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("long"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
        )
        .collect()
    )
    centroids = sorted((int(r[0]), [float(x) for x in r[1]]) for r in init)
    try:
        centroids = _lloyd_rounds(
            corpus, centroids, iters, dim, vec_col, on_empty
        )
    finally:
        if small:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return centroids, assign_centroids(corpus, centroids, vec_col=vec_col)


def _lloyd_rounds(corpus, centroids, iters, dim, vec_col, on_empty):
    # The dim update aggregates are centroid-independent — build the
    # Column objects ONCE, outside the round loop, and as server-parsed
    # expression strings (the s6/t16 pattern: one py4j call per column
    # instead of ~6 for the col/getItem/cast/avg/round/alias chain;
    # measured 1.17 s -> ~0.05 s construction at dim=64, and it no
    # longer multiplies by the iteration count).
    aggs = [
        F.expr(
            f"round(avg(cast(`{vec_col}`[{i}] AS double)), 9) AS c{i}"
        )
        for i in range(dim)
    ]
    for it in range(iters):
        stats = (
            assign_centroids(corpus, centroids, vec_col=vec_col)
            .groupBy("bucket")
            .agg(*aggs)
            .collect()
        )
        updated = sorted(
            (int(r["bucket"]), [float(r[f"c{i}"]) for i in range(dim)])
            for r in stats
        )
        if len(updated) < len(centroids):
            got = {cid for cid, _ in updated}
            empty = [cid for cid, _ in centroids if cid not in got]
            if on_empty == "keep":
                updated = sorted(
                    updated
                    + [(cid, v) for cid, v in centroids if cid in set(empty)]
                )
            else:
                warnings.warn(
                    f"kmeans_train: cluster(s) {empty} received no members "
                    f"in iteration {it + 1}; k shrinks {len(centroids)} -> "
                    f"{len(updated)} for the remaining iterations "
                    "(pass on_empty='keep' to retain empty centroids)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        centroids = updated
    return centroids


def cluster_report(
    spark,
    centroids: list[tuple[int, list[float]]],
    assigned: DataFrame,
) -> DataFrame:
    """Per-cluster audit: member count, inertia (sum of squared L2 to
    the final centroid), centroid head coordinate and L2 norm — the
    columns a codebook-drift monitor tracks."""
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in centroids],
        "cid long, cv array<double>",
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.sum("dist"), 6).alias("inertia"),
        )
        .join(F.broadcast(cent_df), F.col("bucket") == F.col("cid"))
        .select(
            F.col("bucket").cast("long").alias("cluster"),
            "n_members",
            "inertia",
            F.round(F.element_at("cv", 1), 6).alias("c_head"),
            F.round(norm(F.col("cv")), 6).alias("c_norm"),
        )
        .orderBy("cluster")
    )
