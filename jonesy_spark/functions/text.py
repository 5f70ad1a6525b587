"""Text-analysis Column builders for the LLM-data-pipeline surface:
tokenization, shingles, md5-based MinHash, SimHash, counting heuristics.

Everything is built-in expressions (split / transform / aggregate / md5)
so the hot path stays in whole-stage codegen — at 100 TB these run as
map-only projections with zero Python. md5 is the cross-engine
deterministic hash (identical hex in Spark and DuckDB), which is what
makes the sketches oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Distinct whitespace tokens of lowercased text.

    Single-space split (not \\s+) to match the oracle's string_split;
    consecutive spaces produce empty-string tokens on both engines.
    """
    return F.array_distinct(F.split(F.lower(F.trim(text)), " "))


def token_list(text: Column) -> Column:
    """Non-distinct whitespace tokens (for counts/ratios)."""
    return F.split(F.trim(text), " ")


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-gram set (shingles) of the text.

    Texts shorter than n yield an EMPTY set: without the guard,
    sequence(1, len-(n-1)) with start > stop produces a descending
    sequence and substring emits spurious truncated grams — the DuckDB
    twin's range() is empty there, and empty is also the correct n-gram
    semantics."""
    return F.when(
        F.length(text) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text) - (n - 1)),
                lambda i: F.substring(text, i, n),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: Column, b: Column, ndigits: int = 6) -> Column:
    """Set Jaccard similarity of two distinct-element array columns,
    rounded.

    Uses |A∪B| = |A|+|B|−|A∩B| so only ONE set operation runs per pair
    (array_union would be a second full hash pass) — this is the hot
    expression of every near-dup verification."""
    inter = F.size(F.array_intersect(a, b))
    return F.round(inter / (F.size(a) + F.size(b) - inter), ndigits)


def minhash_signature(toks: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: for permutation i, min over tokens of
    md5(i || '|' || token).

    Min over uniformly-distributed hex strings is a valid min-hash;
    md5's hex form is identical across engines, so signatures (and
    therefore LSH buckets) are exactly reproducible in the oracle.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(i.cast("string"), F.lit("|"), t)))
        ),
    )


def lsh_bands(signature: Column, n_bands: int, band_size: int) -> Column:
    """Split a signature into (band_id, band_key) structs for LSH
    bucketing; docs sharing any band key become candidate pairs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.concat_ws(",", F.slice(signature, b * band_size + 1, band_size)).alias(
                "band_key"
            ),
        ),
    )


def simhash_bits(hashes: Column, n_bits: int = 64) -> Column:
    """SimHash fingerprint as an ``n_bits``-char '0'/'1' string.

    Bit p votes +1 when hex digit p of a token's hash is >= 8, else -1;
    the bit is 1 when the sum over tokens is >= 0. Near-duplicate texts
    differ in few bits (compare with hamming_distance). ``hashes`` must
    provide >= n_bits hex digits per element (one md5 gives 32; see
    wide_hash for 64)."""
    digit_vote = lambda h, p: F.when(  # noqa: E731
        F.substring(h, p, 1).isin(*"89abcdef"), 1
    ).otherwise(-1)
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda p: F.when(
                F.aggregate(
                    hashes, F.lit(0), lambda acc, h: acc + digit_vote(h, p)
                )
                >= 0,
                "1",
            ).otherwise("0"),
        ),
    )


def wide_hash(token: Column) -> Column:
    """64 hex digits per token: md5(t) || md5('#' || t) — two independent
    md5 draws, still bit-for-bit reproducible in the DuckDB oracle."""
    return F.concat(F.md5(token), F.md5(F.concat(F.lit("#"), token)))


def hamming_distance(a: Column, b: Column, n_bits: int = 64) -> Column:
    """Hamming distance between two equal-length bit-string fingerprints."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda p: F.when(F.substring(a, p, 1) != F.substring(b, p, 1), 1).otherwise(
                0
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def occurrences(text: Column, needle: str) -> Column:
    """Count of (possibly overlapping-free) occurrences of a literal
    substring, via the length-difference trick — exact integer math."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def whitespace_token_count(text: Column) -> Column:
    return F.size(token_list(text))


def subtoken_count(text: Column, chunk: int = 4) -> Column:
    """BPE-ish upper bound: ceil(len/chunk) summed over whitespace tokens."""
    return F.aggregate(
        token_list(text),
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / chunk).cast("int"),
    )


def doc_fingerprint(text: Column, n_windows: int = 4, window: int = 16) -> Column:
    """Winnowing-style fingerprint: min md5 over ``n_windows`` evenly
    spaced ``window``-char slices (a deterministic rolling-hash stand-in)."""
    # floor division (not cast-of-double: DuckDB CAST rounds, Spark
    # truncates — floor matches DuckDB's // exactly on positives).
    # greatest(1, ...) pins positions for texts shorter than the window:
    # negative starts would otherwise hit engine-specific substring
    # semantics (mirrored in the oracle).
    positions = F.transform(
        F.sequence(F.lit(0), F.lit(n_windows - 1)),
        lambda i: F.greatest(
            F.lit(1),
            F.lit(1)
            + F.floor((F.length(text) - window) * i / F.lit(n_windows - 1)).cast(
                "int"
            ),
        ),
    )
    return F.array_min(
        F.transform(positions, lambda p: F.md5(F.substring(text, p, window)))
    )
