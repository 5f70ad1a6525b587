"""Distributed connected components over candidate-pair graphs — the
clustering pass that turns near-duplicate PAIRS (operators.dedup,
operators.similarity) into duplicate CLUSTERS, so a corpus keeps exactly
one survivor per group of transitively-linked copies.

Reference scope: the reference engine has no graph operator — this
belongs to the beyond-the-reference LLM-pipeline surface (SURVEY.md §2's
training-data extension), where pair emission without cluster resolution
would leave the dedup job half-finished: A~B and B~C must collapse to
ONE kept document even when A~C was never emitted by the LSH bands.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public
literature), the shuffle-native formulation:

  * large-star: every node links its LARGER neighbors to the minimum of
    its neighborhood (incl. itself);
  * small-star: every node links itself and its smaller neighbors to
    its minimum SMALLER neighbor.

Each phase is one keyed aggregation plus one keyed join — no driver
adjacency, no per-row Python — and the pair converges in O(log^2 n)
rounds on ANY graph shape (adversarial million-hop chains included),
unlike naive min-label flooding whose round count is the graph DIAMETER.
Edges are always two longs: the shuffle width is 16 bytes/row however
wide the documents were.

Scale notes (100 TB):
  * per-round state is the edge list itself; ``localCheckpoint`` after
    every round truncates the lineage so round k's plan does not replay
    rounds 1..k-1 (and materializes the round, keeping each shuffle
    bounded);
  * convergence detection is a count+xxhash64 signature — one narrow
    aggregate per round, never a collect of edges;
  * hot hubs (a node in millions of pairs) are exactly the groupBy keys
    AQE skew-split handles; the star transforms strictly shrink edge
    count toward n-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Self-loop-free distinct edges oriented (u > v)."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Link every node's larger neighbors to min(neighborhood + self).
    Output stays (u > v)-oriented because the min is <= u < neighbor."""
    und = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("mn")).alias("v"),
        )
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Link each node and its smaller neighbors to its minimum smaller
    neighbor. Expects and preserves the (u > v) orientation."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    neighbor_links = edges.join(mins, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    self_links = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canonical(
        neighbor_links.union(self_links).select(
            F.col("a").alias("u"), F.col("b").alias("v")
        )
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 16,
) -> DataFrame:
    """``(node, component)`` for every node appearing in ``pairs``, with
    ``component`` = the minimum node id of its connected component (the
    same deterministic min-id representative the dedup operators and
    their hot-bucket cap use).

    One large-star + small-star round per loop iteration; stops when the
    edge signature (count, xxhash64 sum) is stable — at that fixpoint
    the edge list IS the star forest (child -> component min).
    ``max_rounds`` = 16 covers graphs far beyond 2^16 nodes of pathology
    (convergence is O(log^2 n) rounds); hitting it raises rather than
    returning half-merged clusters.
    """
    from pyspark.sql import Observation

    edges = _canonical(
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    ).localCheckpoint()
    signature = None
    for _ in range(max_rounds):
        # The signature rides the checkpoint materialization as an
        # observed metric, so convergence detection costs no second
        # pass over the edges. count + order-insensitive xor of
        # per-edge hashes: overflow-free under ANSI (unlike a sum) and
        # collision-safe enough for a convergence check (edges are
        # distinct, so xor never cancels a duplicate).
        obs = Observation()
        # Checkpoint BETWEEN the stars too: each star's output feeds two
        # consumers (its min table and the join probe), and Spark plans
        # them as separate subtrees (no ReusedExchange across the alias
        # boundary — verified on the executed plan), so an un-materialized
        # large-star would be computed twice per round.
        edges = (
            _small_star(_large_star(edges).localCheckpoint())
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h"),
            )
            .localCheckpoint()
        )
        sig = (obs.get["n"], obs.get["h"])
        if sig == signature:
            break
        signature = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    roots = edges.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    children = edges.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
    return children.union(roots).distinct()


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """The corpus after cluster-level dedup: every document that is a
    non-representative member of some near-dup component is dropped;
    component representatives and documents in no pair survive. A
    digest-width anti-join — the docs side never reshuffles."""
    losers = (
        connected_components(pairs, src=src, dst=dst)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
