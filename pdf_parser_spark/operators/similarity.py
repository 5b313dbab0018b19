"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
- brute-force cosine top-k: the correctness baseline — broadcast the query
  set, cross join against the corpus, window-rank per query.  Exact; cost is
  |Q| x |corpus| dot products, all JVM-side.
- IVF top-k: the scale path — restrict the scan to the query's coarse cluster
  (the `label` column stands in for a kmeans assignment; at 100 TB the
  assignment is a one-off kmeans fit broadcast to executors, then this SAME
  plan applies).  Cuts the scan by the cluster count, with the usual IVF
  recall trade-off.

Double-precision math + 4dp rounding so the DuckDB oracle reproduces values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(av, bv):
    dot = F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(av, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(bv, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 10, k: int = 3
) -> DataFrame:
    """Exact top-k: queries = vec_id < n_queries (deterministic subset).
    (query_id, neighbor_id, cos_sim, rank) — rank ties broken by neighbor_id
    so output is total-ordered for the oracle hash."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
    sim = F.round(_cosine(F.col("qv"), F.col("cv")), 4)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """IVF top-k: scan only the query's own coarse cluster (nprobe=1).
    Same output shape as brute_force_topk; recall < 1.0 by design."""
    emb = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
    )
    sim = F.round(_cosine(F.col("qv"), F.col("cv")), 4)
    scored = (
        F.broadcast(q)
        .join(c, on=F.col("qlabel") == F.col("clabel"))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
