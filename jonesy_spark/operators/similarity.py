"""Similarity search over embedding columns (``array<float>``).

Two tiers, per SURVEY.md §7 Phase 5:
  * brute-force cosine top-k — exact baseline; the query side is tiny
    and broadcast, so the corpus is scanned once, map-only, then a
    rank-within-query window picks k. Linear in corpus size; this IS
    the right plan up to ~10^7×10^2 pairs.
  * sign-bucketed (IVF/LSH-style) top-k — the scale path: both sides
    bucket on deterministic coordinate signs, equi-join on the bucket
    key, search within buckets. Recall < 1.0 by construction;
    multi-probe (flipping low-confidence bits) raises it without
    changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as VX


def _prepared(emb: DataFrame, n_partitions: int = 64) -> DataFrame:
    # Explicit repartition: embedding folds are CPU-heavy but byte-light,
    # so AQE's size-based coalescing would serialize them otherwise
    # (same rationale as operators.dedup.CPU_PARTITIONS).
    v = VX.as_double(F.col("embedding"))
    return emb.repartition(n_partitions).select(
        F.col("vec_id"), v.alias("v"), VX.norm(v).alias("nrm"), F.col("label")
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_queries: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Queries (vec_id < n_queries by default) are broadcast; ranking uses
    the rounded cosine with vec_id tiebreak so top-k is total-ordered
    and deterministic across engines.
    """
    e = _prepared(emb)
    if query_ids is not None:
        q = e.filter(F.col("vec_id").isin(query_ids))
    else:
        q = e.filter(F.col("vec_id") < n_queries)
    q = q.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                VX.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def bucketed_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_bucket_dims: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket (2^n_bucket_dims IVF-style cells), then exact rank within.

    The bucket equi-join replaces the broadcast cross product — at
    100 TB this is the difference between scanning the corpus per query
    and a hash join keyed on 2^k cells.
    """
    e = _prepared(emb).withColumn("bucket", VX.sign_bucket(F.col("v"), n_bucket_dims))
    q = (
        e.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cosine",
            F.round(
                VX.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label (stand-in
    for a cluster/IVF assignment) so the self-join is an equi-join."""
    e = _prepared(emb)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                VX.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
