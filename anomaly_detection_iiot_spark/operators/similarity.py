"""Embedding similarity search operators (BASELINE.json north star; no
reference equivalent — the reference has no embedding path).

All vector math is JVM-side higher-order functions over ``array<double>``
(zip_with + aggregate = sequential left-fold dot product) — no Python
UDFs, so the scan→score pipeline stays in whole-stage codegen.

Scale design:

- ``brute_force_topk`` broadcasts the (small) QUERY side against the
  full corpus: one narrow pass over the big table, then a per-query
  top-k via window rank. At 100 TB the corpus scan is
  embarrassingly parallel; only k×|queries| rows shuffle for ranking.
- ``ivf_assign`` is the scale path: coarse-quantize every vector to its
  nearest centroid (broadcast centroids — IVF-Flat's cell assignment),
  persist partitioned/bucketed by ``bucket``; queries then probe only
  their own cell(s), turning ANN into a partition-pruned equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """float[] -> double[] so fold accumulation happens in fp64 on both
    engines (DuckDB oracle casts ``embedding::DOUBLE[]``)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query vector: broadcast the query side,
    score every corpus vector, rank within query (tie-break candidate
    id asc for cross-engine determinism)."""
    scored = (
        corpus.join(F.broadcast(queries), F.col(id_col) != F.col(qid_col))
        .withColumn("cosine", cosine(as_double(F.col(vec_col)), as_double(F.col(qvec_col))))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col(qid_col),
            F.col(id_col).alias("cid"),
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (argmax, tie-break
    centroid id asc). Centroids are broadcast; output adds ``bucket``."""
    scored = corpus.join(F.broadcast(centroids)).withColumn(
        "_csim", cosine(as_double(F.col(vec_col)), as_double(F.col(centroid_vec)))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc(centroid_id))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(corpus["*"], F.col(centroid_id).alias("bucket"))
    )
