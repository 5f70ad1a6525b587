"""Corpus retrieval: BM25 ranking over the document table — the
search tier a training-data pipeline uses to EXPLORE its corpus
(inspect what a dedup cluster holds, chase a contamination hit, pull
examples for a classifier's weak label) without shipping the corpus
to an external search system.

Public method: Okapi BM25 (Robertson & Walker / Spärck Jones — the
standard probabilistic ranking function)::

    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    score(d, q) = sum over t in q of
                  idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * len(d) / avg_len))

Scale shape — the reason this is one cheap pass, not an index build:
  * the token stream is filtered to the QUERY'S terms map-side before
    any aggregation — the shuffled stream is query-hit rows only, a
    vanishing fraction of the corpus;
  * df/N/avg_len are a bounded per-term frame (<= |query| rows,
    broadcast) and a 1-row corpus aggregate (broadcast cross-join);
  * top-k is ``orderBy + limit`` — per-partition partial top-k;
  * per-term contributions round to 9 digits and accumulate as
    DECIMALs (the classifier's determinism rule), so ranking is exact
    and partition-order-independent — ties then break on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import CPU_PARTITIONS


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` documents by BM25 score for a bag of query terms
    (terms are lowercased; duplicates collapse — BM25 is a bag-of-
    WORDS model over the query too, but repeated query terms add no
    standard benefit and would double-count idf). Output:
    ``(id, score, n_hits)`` descending score, id tiebreak; documents
    matching no term never appear (their score is 0 by definition).
    """
    terms = sorted({t.lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("bm25_search needs at least one non-empty query term")
    spark = docs.sparkSession
    qdf = spark.createDataFrame([(t,) for t in terms], "t string")

    toks = docs.repartition(CPU_PARTITIONS, F.col(id_col)).select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("t"),
    ).filter(F.col("t") != "")
    # per-doc length over ALL tokens (BM25 normalizes by full doc
    # length), plus the 1-row corpus aggregates
    lens = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("len"))
    corpus = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("len").alias("avg_len")
    )
    # query-term hits only from here on — the map-side semi-join is
    # what keeps the aggregation input query-sized, not corpus-sized
    hits = toks.join(F.broadcast(qdf), "t")
    tf = hits.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(corpus)).select(
        "t",
        F.round(
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
            9,
        ).alias("idf"),
    )
    contrib = (
        tf.join(lens, id_col)
        .join(F.broadcast(idf), "t")
        .crossJoin(F.broadcast(corpus))
        .select(
            id_col,
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("len") / F.col("avg_len"))
                ),
                9,
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("c").cast("decimal(12,9)")), 6)
            .cast("double")
            .alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_hits"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )
