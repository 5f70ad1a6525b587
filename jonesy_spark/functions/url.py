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

#: Vendored snapshot of the multi-label entries of the public suffix
#: list (publicsuffix.org, Mozilla-maintained, MPL) that a web crawl
#: actually hits: the second-level registration suffixes of the major
#: ccTLDs. A registrable domain is suffix + one label, so hosts ending
#: in one of these keep THREE labels (foo.example.co.uk ->
#: example.co.uk) where the default keeps two. Deliberately a static
#: snapshot, not a fetched list — the canonical key must be bit-stable
#: across runs; unknown multi-label suffixes degrade to the last-two
#: heuristic, never to an error.
PUBLIC_SUFFIX_SNAPSHOT = (
    # uk / ie
    "co.uk org.uk ac.uk gov.uk net.uk sch.uk me.uk ltd.uk plc.uk nhs.uk "
    # au / nz
    "com.au net.au org.au edu.au gov.au asn.au id.au "
    "co.nz net.nz org.nz ac.nz govt.nz school.nz gen.nz geek.nz "
    # jp / kr / tw / hk / sg / my / th / id / in / cn
    "co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp "
    "co.kr ne.kr or.kr re.kr pe.kr go.kr ac.kr ms.kr hs.kr es.kr sc.kr "
    "com.tw net.tw org.tw edu.tw gov.tw idv.tw "
    "com.hk net.hk org.hk edu.hk gov.hk idv.hk "
    "com.sg net.sg org.sg edu.sg gov.sg per.sg "
    "com.my net.my org.my edu.my gov.my name.my "
    "co.th net.th or.th ac.th go.th in.th mi.th "
    "co.id net.id or.id ac.id go.id web.id sch.id my.id biz.id "
    "co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in "
    "gov.in nic.in "
    "com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn "
    # americas
    "com.br net.br org.br gov.br edu.br mil.br art.br blog.br "
    "com.mx net.mx org.mx edu.mx gob.mx "
    "com.ar net.ar org.ar edu.ar gob.ar mil.ar "
    "com.co net.co org.co edu.co gov.co "
    "com.pe net.pe org.pe edu.pe gob.pe "
    "co.cr com.ec com.uy com.ve "
    # europe / mideast / africa
    "com.tr net.tr org.tr edu.tr gov.tr k12.tr bel.tr av.tr "
    "com.ua net.ua org.ua edu.ua gov.ua in.ua "
    "com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl "
    "com.ru net.ru org.ru "
    "co.il net.il org.il ac.il gov.il muni.il k12.il "
    "com.sa net.sa org.sa edu.sa gov.sa med.sa "
    "com.eg net.eg org.eg edu.eg gov.eg "
    "co.za net.za org.za gov.za ac.za web.za "
    "com.ng net.ng org.ng edu.ng gov.ng "
    "co.ke or.ke ac.ke go.ke "
).split()


def url_host(url: Column) -> Column:
    """Lowercased host with any leading ``www.`` and port stripped."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(url: Column) -> Column:
    """Registrable domain: public suffix + one label, using the vendored
    :data:`PUBLIC_SUFFIX_SNAPSHOT` for multi-label suffixes
    (``foo.example.co.uk`` → ``example.co.uk``) and the last-two-labels
    rule otherwise (``a.b.example.com`` → ``example.com``). Pure
    codegen'd expression — the isin() compiles to a literal set probe,
    no join, no UDF, no network fetch."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    return F.when(
        (F.size(labels) >= 3) & last2.isin(PUBLIC_SUFFIX_SNAPSHOT),
        F.array_join(F.slice(labels, -3, 3), "."),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


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
