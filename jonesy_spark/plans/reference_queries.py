"""The reference's relational surface, re-hosted on the fixture tables.

Every query here reproduces the semantics of one of the 8 SQL builders
in the reference (``jonesy/queries.py``, see SURVEY.md §2 inventory ids
P*/J*/A*/O*/F*) on the driver's TPC-H-ish fixtures, with the role
mapping from FIXTURES.md: orders/lineitem ↔ enrollment-like facts,
customer/supplier/part ↔ dimensions, nation/region ↔ small broadcast
dims, events ↔ change-log stream.

Spark-first translations (not ports):
  * correlated scalar subqueries → window functions / decorrelated
    joins (Catalyst would decorrelate anyway; we write the plan we want),
  * ROWNUM pagination → partitioned execution (kept once, as `paginate`,
    for the byte-compat path),
  * hand-ordered joins → Catalyst + AQE with broadcast hints on dims.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.windows import latest_per_group, paginate

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship — J11 greatest-n-per-group dedup (reference queries.py:70-95).
# ---------------------------------------------------------------------------


@query(
    "latest_order_per_customer",
    oracle="""
    SELECT DISTINCT
        o_custkey   AS custkey,
        o_orderpriority AS priority,
        o_orderstatus   AS status,
        o_orderdate     AS effective_date
    FROM orders o
    WHERE o_orderdate = (
        SELECT max(o2.o_orderdate) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
          AND o2.o_orderpriority = o.o_orderpriority
    )
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: latest-effective-date row per group, ties kept then DISTINCT.

    Reference expresses this as a correlated ``MAX(EFFECTIVE_DATE)``
    scalar subquery (``jonesy/queries.py:90-95``); here it is a window
    max — one shuffle on the group keys instead of a per-row rescan.
    Tie rows all survive the filter and collapse in ``distinct()``,
    matching the reference's DISTINCT projection (``queries.py:72``).
    """
    orders = Catalog(spark, sf_dir).orders
    latest = latest_per_group(
        orders, ["o_custkey", "o_orderpriority"], "o_orderdate", keep_ties=True
    )
    return latest.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("effective_date"),
    ).distinct()


# ---------------------------------------------------------------------------
# P1/P5/O1/F1 — simple filtered projection with TRIM + stable ordering
# (get_advisor_notes_access queries.py:22-28; get_basic_attributes :33-49).
# ---------------------------------------------------------------------------


@query(
    "basic_attributes",
    oracle="""
    SELECT
        c_custkey AS custkey,
        trim(c_name) AS name,
        c_mktsegment AS segment,
        c_acctbal AS acctbal
    FROM customer
    WHERE c_mktsegment <> 'MACHINERY' AND c_acctbal IS NOT NULL
    ORDER BY c_custkey
    """,
)
def basic_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P5+O1: projection, != / IS NOT NULL predicates, TRIM, ordered.

    Mirrors get_basic_attributes (reference ``jonesy/queries.py:33-49``):
    `person_type != 'Z' AND affiliations IS NOT NULL` becomes the
    segment/acctbal filters; ROWNUM pagination is dropped (SURVEY §4.3)
    — Spark partitions the scan instead.
    """
    customer = Catalog(spark, sf_dir).customer
    return (
        customer.filter(
            (F.col("c_mktsegment") != "MACHINERY") & F.col("c_acctbal").isNotNull()
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            F.trim(F.col("c_name")).alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# O3/A2/A3 — current terms: top-3 + scalar subqueries
# (get_current_terms queries.py:54-67).
# ---------------------------------------------------------------------------


@query(
    "current_terms_topk",
    oracle="""
    SELECT term_month
    FROM (
        SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS term_month
        FROM orders
        WHERE o_orderdate <= (SELECT max(o_orderdate) FROM orders)
    )
    ORDER BY term_month DESC
    LIMIT 3
    """,
)
def current_terms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+A2: DISTINCT 'terms', scalar-MAX subquery bound, top-3.

    Mirrors get_current_terms (``jonesy/queries.py:54-67``): the
    reference picks the 3 most recent terms not later than the next
    future term (scalar MAX/MIN subqueries A2/A3 at ``queries.py:58-65``)
    with `rownum <= 3`. Here: order months ≤ global max date, DESC,
    limit 3. The scalar subquery is a 1-row broadcast in Spark.
    """
    orders = Catalog(spark, sf_dir).orders
    max_dt = orders.agg(F.max("o_orderdate").alias("__max_dt"))
    return (
        orders.join(F.broadcast(max_dt))
        .filter(F.col("o_orderdate") <= F.col("__max_dt"))
        .select(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("term_month")
        )
        .distinct()
        .orderBy(F.col("term_month").desc())
        .limit(3)
    )


# ---------------------------------------------------------------------------
# P2/P4/A6/O2 — wide renamed DISTINCT projection of a term slice
# (get_term_enrollments queries.py:286-315).
# ---------------------------------------------------------------------------


@query(
    "term_enrollments",
    oracle="""
    SELECT DISTINCT
        l.l_orderkey    AS section_id,
        o.o_custkey     AS ldap_uid,
        l.l_linenumber  AS enroll_seq,
        l.l_quantity    AS units_taken,
        l.l_returnflag  AS enroll_status,
        l.l_linestatus  AS grading_basis,
        o.o_orderpriority AS course_career,
        l.l_shipdate    AS last_updated
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(o.o_orderdate) = 1995
    ORDER BY section_id, ldap_uid
    """,
)
def term_enrollments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P4+A6+O2: equality 'term' filter, wide aliased projection,
    DISTINCT, two-key ordering.

    Mirrors get_term_enrollments (``jonesy/queries.py:286-315``): the
    `TERM_ID = {term_id}` equality filter (P4, ``queries.py:309``)
    becomes a year slice; the 13-column aliased SELECT DISTINCT
    (``queries.py:294-307``) becomes this 8-column projection; ORDER BY
    section_id, sis_id (O2, ``queries.py:310``) is preserved. The filter
    is pushed to the parquet scan by Catalyst.
    """
    cat = Catalog(spark, sf_dir)
    li, orders = cat.lineitem, cat.orders
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.year("o_orderdate") == 1995)
        .select(
            F.col("l_orderkey").alias("section_id"),
            F.col("o_custkey").alias("ldap_uid"),
            F.col("l_linenumber").alias("enroll_seq"),
            F.col("l_quantity").alias("units_taken"),
            F.col("l_returnflag").alias("enroll_status"),
            F.col("l_linestatus").alias("grading_basis"),
            F.col("o_orderpriority").alias("course_career"),
            F.col("l_shipdate").alias("last_updated"),
        )
        .distinct()
        .orderBy("section_id", "ldap_uid")
    )


# ---------------------------------------------------------------------------
# O6 — ROWNUM pagination envelope (queries.py:35-48,288-314; jobs.py:104-111)
# ---------------------------------------------------------------------------


@query(
    "pagination_window",
    oracle="""
    SELECT custkey, name
    FROM (
        SELECT c_custkey AS custkey, c_name AS name,
               row_number() OVER (ORDER BY c_custkey) AS rn
        FROM customer
    )
    WHERE rn > 40 AND rn <= 80
    """,
)
def pagination_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: rows (40, 80] of the c_custkey-ordered scan.

    Byte-compat port of the reference's ROWNUM batch window
    (``jonesy/queries.py:35-48``, driver loop ``jobs.py:104-111``,
    BATCH_SIZE=120000 ``jobs.py:18``). Kept for contract parity only —
    the unpartitioned row_number funnels through one task; at scale use
    partitioned writes instead (SURVEY §4.3).
    """
    customer = Catalog(spark, sf_dir).customer
    page = paginate(
        customer.select(
            F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
        ),
        [F.col("custkey")],
        offset=40,
        limit=40,
    )
    return page
