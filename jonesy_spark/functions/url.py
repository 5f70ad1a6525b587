"""URL canonicalization Column builders — the key-preparation step for
URL-level dedup of crawled corpora (dedup by canonical URL is the cheap
first gate before any content-level near-dup).

Pure built-in expressions (parse_url / regexp / array ops): map-only,
codegen'd, deterministic — the canonical form is a join/group key, so it
must be bit-stable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Query parameters that never change the resource: tracking/session ids.
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content "
    "gclid fbclid msclkid mc_cid mc_eid ref referrer sessionid phpsessid"
).split()


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` and port stripped."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(url: Column) -> Column:
    """Last-two-labels heuristic for the registrable domain
    (``a.b.example.com`` → ``example.com``). A production build swaps in
    the public-suffix list via the same expression seam; the heuristic
    keeps this dependency-free and deterministic."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def _clean_query(url: Column) -> Column:
    """Query string minus tracking params, keys sorted — '' if nothing
    survives. Sorting makes param order canonical (?a=1&b=2 ==
    ?b=2&a=1)."""
    q = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "")
        & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).isin(*TRACKING_PARAMS),
    )
    return F.concat_ws("&", F.array_sort(kept))


def normalize_url(url: Column) -> Column:
    """Canonical URL: https scheme, lowercased host sans ``www.``/default
    port, path sans trailing slash, tracking-free sorted query, no
    fragment. Scheme is folded (http==https) because crawls see both for
    the same resource; fragments are client-side only."""
    host = url_host(url)
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", "").otherwise(F.regexp_replace(path, r"/$", ""))
    q = _clean_query(url)
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    # Unparseable/host-less URLs fall back to the raw string: a NULL
    # canonical key would collapse EVERY malformed URL into one dedup
    # group and silently drop all but one of those documents.
    return F.coalesce(canon, url)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    prefer: Column | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE row per canonical URL — greatest-n-per-group on the
    normalized key, ``prefer`` ordering first (e.g. quality desc) with
    an id tiebreak so the survivor is deterministic. One keyed shuffle
    on the canonical URL; no collects, no cross joins."""
    norm = normalize_url(F.col(url_col)).alias("canonical_url")
    order = [prefer, F.col(id_col)] if prefer is not None else [F.col(id_col)]
    w = Window.partitionBy("canonical_url").orderBy(*order)
    return (
        df.withColumn("canonical_url", norm)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
