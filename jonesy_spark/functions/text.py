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


def word_ngrams(text: Column, n: int = 5) -> Column:
    """Distinct word n-gram set: normalize (lower, trim, collapse
    whitespace — the dedup_exact normalization), split on single
    spaces, join each n-word window back with spaces. Texts with fewer
    than n words yield an EMPTY set (same guard rationale as
    :func:`char_ngrams`; the DuckDB twin's range() is empty there).

    DuckDB twin: ``list_distinct(list_transform(range(1, len(ws)-n+2),
    i -> array_to_string(ws[i:i+n-1], ' ')))`` over
    ``string_split(lower(trim(regexp_replace(text,'\\s+',' ','g'))),' ')``."""
    words = F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")
    return F.when(
        F.size(words) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(words, i, n)),
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


def jaccard_micro(a: Column, b: Column) -> Column:
    """Set Jaccard of two distinct-element array columns in fixed-point
    micro-units (BIGINT, value × 1e6) — the hash-stable form for
    driver-compared outputs (see ``scalars.micro_units``: scale first,
    round ONCE, so Spark and any DuckDB version round the same product
    double). Same single-set-operation shape as :func:`jaccard`."""
    from .scalars import micro_units

    inter = F.size(F.array_intersect(a, b))
    return micro_units(inter / (F.size(a) + F.size(b) - inter))


#: Mersenne prime 2^31-1: modulus of the permuted-hash family. Element
#: hashes stay < 2^28 and multipliers < 2^31, so products fit a BIGINT
#: on both engines — no overflow, bit-for-bit reproducible in the oracle.
MERSENNE31 = 2_147_483_647
#: Fixed multipliers deriving permutation i's (a_i, b_i) coefficients:
#: a_i = (A_MULT*(i+1)) % p, b_i = (B_MULT*(i+1)) % p. Deterministic, so
#: the DuckDB oracle reproduces every bucket exactly.
A_MULT = 2_654_435_761  # Knuth's multiplicative-hash constant
B_MULT = 97_531


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


#: GPT-2-style pre-tokenizer alternation (contractions, letter runs,
#: digit runs, punctuation runs, whitespace), minus the original's
#: trailing-space lookahead so the SAME pattern is leftmost-first
#: compatible across Java regex (Spark), RE2 (DuckDB) and PCRE —
#: verified identical counts cross-engine in tests. Whitespace is the
#: EXPLICIT Java class, never ``\s``: ``\s`` means different sets per
#: engine (Java includes \x0B, RE2 doesn't, Python's is full Unicode —
#: NEL \x85 diverges), so spelling the set out is what makes the
#: pattern portable rather than merely similar.
PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+"
    r"|[ \t\n\x0B\f\r]+"
)


def pretoken_count(text: Column) -> Column:
    """BPE-ish token-count proxy: the number of pre-tokenizer segments
    under :data:`PRETOKEN_PATTERN`. Real BPE merges only ever split
    WITHIN a pretoken, so this counts <= the true BPE token count while
    tracking it far more closely than whitespace words (punctuation,
    contractions and digit runs count separately, as they tokenize).
    Pure ``regexp_count`` — JVM-side, map-only, no vocabulary."""
    return F.regexp_count(text, F.lit(PRETOKEN_PATTERN))


def strip_control_chars(text: Column) -> Column:
    """Remove C0/C1 control characters (except \\t \\n \\r) — crawl
    payloads carry stray terminal controls that corrupt downstream
    tokenization and CSV sinks. Pure ``regexp_replace``, map-only."""
    return F.regexp_replace(
        text, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F\x80-\x9F]", ""
    )


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization via an Arrow-batched pandas UDF — the
    one text op here with no Spark built-in, and a CORRECTNESS input to
    exact dedup: 'café' composed (U+00E9) and decomposed (e + U+0301)
    are different bytes, different md5 digests, and therefore invisible
    to digest dedup until normalized to one form. Ingest-time use:
    normalize once at the front door so every downstream digest,
    sketch and gram key sees canonical bytes.

    pandas' vectorized ``Series.str.normalize`` processes each Arrow
    batch in one call — the sanctioned slow-path shape (same as the
    multimodal codec boundary), never per-row Python.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # pragma: no cover - executed on workers
        return s.str.normalize("NFC")

    return _nfc(text)


#: Unicode script ranges as EXPLICIT codepoint classes — the same
#: portability rule as PRETOKEN_PATTERN: Java spells scripts
#: \p{IsHan}, RE2 spells them \p{Han}, so named script classes are
#: engine-specific; literal ranges are identical everywhere. Coarse on
#: purpose (script family detection for routing, not linguistics).
SCRIPT_RANGES = {
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "cjk": r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]",
    "arabic": r"[\x{0600}-\x{06FF}]",
}


def script_counts(text: Column) -> list[Column]:
    """One aliased ``regexp_count`` per script family (``n_<script>``)
    — map-only, JVM-side; the input to routing decisions ("send CJK
    docs to the CJK tokenizer") and to mixed-script spam detection."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat in SCRIPT_RANGES.items()
    ]


def dominant_script(text: Column) -> Column:
    """The script family with the highest character count ('none' when
    no family matches; ties break by the fixed SCRIPT_RANGES order via
    strict greater-than). A deterministic CASE chain — reproducible in
    any SQL engine with the same literal ranges."""
    counts = {n: F.regexp_count(text, F.lit(p)) for n, p in SCRIPT_RANGES.items()}
    expr = F.lit("none")
    # build innermost-last: reversed iteration leaves the FIRST-listed
    # family as the outermost WHEN, so it wins ties
    for name in reversed(list(SCRIPT_RANGES)):
        cond = counts[name] > F.lit(0)
        for other in SCRIPT_RANGES:
            if other != name:
                cond = cond & (counts[name] >= counts[other])
        expr = F.when(cond, F.lit(name)).otherwise(expr)
    return expr


#: Ordered (entity, replacement) pairs — the SPECIFIC entities decode
#: first and ``&amp;`` strictly LAST, so "&amp;lt;" decodes to the
#: literal text "&lt;" (one pass, never re-scanned) instead of "<".
#: The same fixed order is what makes the DuckDB twin byte-identical.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Strip order is load-bearing: script/style BODIES go first (their
#: content may contain '<' that the generic tag pattern would split),
#: then comments, then every remaining tag. Flags are in-pattern
#: ((?is)) so Java regex (Spark) and RE2 (DuckDB) read the same string;
#: lazy quantifiers behave identically in both.
HTML_STRIP_PATTERNS = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    r"<[^>]*>",
)


def strip_html(html: Column) -> Column:
    """Crawl-tier HTML -> text extraction: drop script/style bodies,
    comments and tags, decode the common entities, collapse whitespace
    (EXPLICIT Java class, the PRETOKEN_PATTERN portability rule — never
    ``\\s``). Pure regexp_replace/replace chain — whole-stage codegen,
    map-only, no UDF; at 100 TB this is the WARC front door's hottest
    expression and it never leaves the JVM.

    LIMITATION (heuristic extractor, not a parser — ADVICE r11): the
    generic tag pattern ``<[^>]*>`` mishandles real-world markup where
    ``>`` appears inside a quoted attribute value (``<a title="x>y">``
    leaves ``y">`` behind) or a tag is unterminated (the remainder of
    the document survives as "text"). On such pages fragments leak
    into the extracted text; the downstream quality gates
    (c4/gopher — symbol-ratio, alpha-ratio, stop-word rules) are the
    designed backstop that rejects pages the heuristic mangles."""
    out = html
    for pat in HTML_STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"[ \t\n\x0B\f\r]+", " "))
