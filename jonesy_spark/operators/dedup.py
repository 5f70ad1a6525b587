"""Deduplication operators for the LLM-data-pipeline surface: exact,
MinHash-LSH, SimHash, and n-gram-Jaccard near-dup.

Scale design (the whole point at 100 TB):
  * never all-pairs — every near-dup operator *blocks* first (LSH band
    buckets, simhash buckets, lang×length blocks) so the self-join is an
    equi-join on a bucket key, not a cross join;
  * sketches (minhash/simhash) are map-only projections over built-in
    expressions — no shuffle until the bucket join;
  * candidate verification (true Jaccard) runs only on pairs that share
    a bucket — the expensive step sees a vanishing fraction of n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: lowercase, trim, collapse runs of
    whitespace, then group by md5 and keep the min id as representative.

    One hash-aggregate shuffle on the 32-char digest (not the full
    text — at 100 TB grouping on the raw document would shuffle the
    corpus; the digest shuffles 32 bytes/row).
    """
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(F.col(id_col), F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count("*").alias("n_copies"),
        )
    )


#: Forced parallelism for CPU-bound sketch/verify stages. AQE coalesces
#: exchanges by *byte* size; these stages are tiny in bytes but heavy in
#: CPU (md5 sketches, set intersections), so without an explicit
#: repartition they collapse to one task on small inputs. An explicit
#: numPartitions is respected by AQE.
CPU_PARTITIONS = 64


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: token sets → md5 minhash signature (map-only) → band keys
    → self-equi-join on (band_id, band_key) → distinct candidate pairs
    → verify true token-set Jaccard >= threshold.

    With b bands of r rows, P(candidate) = 1-(1-j^r)^b — the b/r choice
    tunes the recall/cost knee. The band join is the only shuffle; its
    key cardinality grows with corpus size so skew stays bounded (AQE
    splits hot buckets).
    """
    band_size = n_hashes // n_bands
    tok = df.select(
        F.col(id_col).alias("doc_id"), TX.tokens(F.col(text_col)).alias("toks")
    ).repartition(CPU_PARTITIONS)
    # Band keys are md5-compressed (32 chars instead of band_size × 32):
    # the shuffle/join key shrinks ~8x; md5 keeps the oracle exact (any
    # collision would only *add* a candidate, which verification then
    # re-checks — and the oracle applies the identical md5, so candidate
    # sets match bit-for-bit).
    banded = (
        tok.withColumn("sig", TX.minhash_signature(F.col("toks"), n_hashes))
        .withColumn("band", F.explode(TX.lsh_bands(F.col("sig"), n_bands, band_size)))
        .select(
            "doc_id",
            F.size("toks").alias("sz"),
            F.col("band.band_id").alias("band_id"),
            F.md5(F.col("band.band_key")).alias("band_key"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    # Candidate pairs carry ids only — the band join and the pair dedup
    # shuffle 16-byte rows, never the token arrays. The token-set size
    # rides along (one int) so the threshold-implied size-ratio bound
    # (j >= t forces |A|/|B| within [t, 1/t]) kills impossible pairs at
    # hash-probe time, before the distinct shuffle or any re-attach.
    candidates = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Token sets re-attach via keyed joins on doc_id — NOT a forced
    # broadcast: at 100 TB the token table IS the corpus, so the join
    # must be able to degrade to a shuffle join. Catalyst auto-broadcasts
    # the token side while its size estimate is under
    # spark.sql.autoBroadcastJoinThreshold and otherwise plans a
    # sort-merge/shuffled-hash join on doc_id — each side shuffles once,
    # O(corpus), never O(pairs × corpus).
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    verified = (
        candidates.repartition(CPU_PARTITIONS)
        .join(ta, "doc_a")
        .join(tb, "doc_b")
    )
    return (
        verified.withColumn("jaccard", TX.jaccard(F.col("toks_a"), F.col("toks_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "lang",
    max_hamming: int = 3,
    n_bits: int = 64,
    n_bands: int = 8,
) -> DataFrame:
    """SimHash near-duplicate pairs: ``n_bits``-bit fingerprint per doc,
    pairs within a block compared by Hamming distance.

    Fingerprinting is map-only; the pair join blocks on ``block_col``
    AND pigeonhole bands. 64 bits / 8 bands gives 2^8 bucket values per
    band — candidate volume shrinks ~2^8/n_bands-fold vs all-pairs and
    keeps shrinking as fingerprints spread, which is what survives a
    100× corpus (a 16-bit fingerprint's 2^4 buckets per band would go
    near-quadratic).
    """
    band_size = n_bits // n_bands
    assert n_bits % n_bands == 0
    assert max_hamming < n_bands, (
        "pigeonhole blocking needs max_hamming < n_bands to be lossless"
    )
    fp = df.repartition(CPU_PARTITIONS).select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        TX.simhash_bits(
            F.transform(TX.tokens(F.col(text_col)), TX.wide_hash), n_bits
        ).alias("simhash"),
    )
    # Pigeonhole band blocking: with max_hamming errors spread over
    # n_bands > max_hamming bands, at least one band is error-free, so
    # every qualifying pair shares an exact band — the band equi-join is
    # LOSSLESS (same output as all-pairs) while pruning candidates ~
    # n_bands/2^band_size-fold. This is the 100 TB plan: never all-pairs.
    banded = fp.select(
        "doc_id",
        "block",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.substring(
                        F.col("simhash"), b * band_size + 1, band_size
                    ).alias("band_bits"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "block", "simhash", "band.band_id", "band.band_bits")
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash_a"),
            F.col("b.simhash").alias("simhash_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        candidates.withColumn(
            "hamming",
            TX.hamming_distance(F.col("simhash_a"), F.col("simhash_b"), n_bits),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    n_hashes: int = 16,
    n_bands: int = 8,
) -> DataFrame:
    """Character n-gram Jaccard near-dup pairs, blocked by (lang,
    MinHash band) so candidate volume stays sub-quadratic as the corpus
    grows.

    The old block key (lang, exact length-bucket) had FIXED cardinality
    — candidates within each block grew O(n²) with corpus size, and
    pairs straddling a bucket boundary were silently dropped. Banding
    the gram-set MinHash gives a key whose cardinality grows with the
    corpus and removes the boundary loss; recall is the standard LSH
    curve 1-(1-j^r)^b (r=2, b=8: ~97% at j=0.6, →1 as j→1), mirrored
    exactly in the oracle. Length pruning still happens — losslessly —
    via the threshold-implied size-ratio filter before any set op.
    """
    band_size = n_hashes // n_bands
    g = df.repartition(CPU_PARTITIONS).select(
        F.col(id_col).alias("doc_id"),
        F.col("lang"),
        TX.char_ngrams(F.col(text_col), n).alias("grams"),
    )
    banded = (
        g.filter(F.size("grams") > 0)
        .withColumn("sig", TX.minhash_signature(F.col("grams"), n_hashes))
        .withColumn("band", F.explode(TX.lsh_bands(F.col("sig"), n_bands, band_size)))
        .select(
            "doc_id",
            "lang",
            F.size("grams").alias("sz"),
            F.col("band.band_id").alias("band_id"),
            F.md5(F.col("band.band_key")).alias("band_key"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    # The gram-set SIZE rides along on the banded rows (one int) so the
    # threshold-implied size-ratio bound (j >= t forces |A|/|B| within
    # [t, 1/t]) evaluates as a join residual — candidate pairs that can't
    # possibly verify are dropped at hash-probe time, before the
    # dropDuplicates shuffle and the gram re-attach joins ever see them.
    # Exact integer/decimal math, so the prune is lossless and mirrors
    # bit-for-bit in the oracle.
    candidates = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.sz") >= threshold * F.col("b.sz"))
            & (F.col("b.sz") >= threshold * F.col("a.sz")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Gram sets re-attach via keyed joins on doc_id (no forced broadcast
    # — same degrade-to-shuffle rationale as minhash_lsh_pairs).
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    pairs = candidates.repartition(CPU_PARTITIONS).join(ga, "doc_a").join(gb, "doc_b")
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            TX.jaccard(F.col("grams_a"), F.col("grams_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
