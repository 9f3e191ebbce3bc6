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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import norm


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
    cvecs = F.expr("array(" + ",".join(_darr(v) for _, v in cents) + ")")
    cids = F.expr("array(" + ",".join(f"{int(i)}L" for i, _ in cents) + ")")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    entries = F.transform(
        F.sequence(F.lit(1), F.lit(len(cents))),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(
                    v, F.element_at(cvecs, i), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("d"),
            F.element_at(cids, i).alias("cid"),
        ),
    )
    best = F.array_min(entries)  # lexicographic: min dist, then min id
    return corpus.select(
        "*", best["cid"].alias("bucket"), best["d"].alias("dist")
    )


def kmeans_train(
    corpus: DataFrame,
    k: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Train k centroids for ``iters`` Lloyd iterations, seeded from
    the first k rows by ``id_col`` (deterministic, engine-portable).

    Returns (final centroids, final assignment DataFrame with bucket +
    dist). Iterations execute EAGERLY at call time (each collects k
    tiny centroid rows — the driver round loop m9/FedAvg also uses);
    the returned assignment is lazy against the final centroids."""
    init = (
        corpus.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).cast("long"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
        )
        .collect()
    )
    centroids = sorted((int(r[0]), [float(x) for x in r[1]]) for r in init)
    for _ in range(iters):
        stats = (
            assign_literal(corpus, centroids, vec_col=vec_col)
            .groupBy("bucket")
            .agg(
                *[
                    F.round(
                        F.avg(F.col(vec_col)[i].cast("double")), 9
                    ).alias(f"c{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        centroids = sorted(
            (int(r["bucket"]), [float(r[f"c{i}"]) for i in range(dim)])
            for r in stats
        )
    return centroids, assign_literal(corpus, centroids, vec_col=vec_col)


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
