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
from ..functions.scalars import micro_units
from ..functions import scalars as SC
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
        CAST(round(c_acctbal * 1000000) AS BIGINT) AS acctbal_micro
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
            micro_units(F.col("c_acctbal")).alias("acctbal_micro"),
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
        CAST(round(l.l_quantity * 1000000) AS BIGINT) AS units_taken_micro,
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
            micro_units(F.col("l_quantity")).alias("units_taken_micro"),
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


# ---------------------------------------------------------------------------
# P3/J4-J8/F-suite/A6 — the big course extract: 5-way dim join + computed
# projection + DISTINCT (get_term_courses queries.py:151-204,246-283).
# ---------------------------------------------------------------------------


@query(
    "term_courses",
    oracle="""
    SELECT DISTINCT
        l.l_orderkey                       AS section_id,
        CAST(l.l_linenumber AS VARCHAR)    AS section_nbr,
        trim(p.p_name)                     AS course_name,
        regexp_replace(p.p_brand, '[^0-9]', '', 'g') AS catalog_root,
        substr(p.p_type, 1, instr(p.p_type, ' ') - 1) AS catalog_prefix,
        CASE WHEN l.l_returnflag = 'R' THEN 'true' ELSE 'false' END AS is_returned,
        concat_ws('|', s.s_name, n.n_name, r.r_name) AS instructor_path,
        strftime(o.o_orderdate, '%Y-%m-%d')          AS term_begin,
        o.o_orderpriority                  AS course_career
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    LEFT JOIN part p     ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    LEFT JOIN nation n   ON s.s_nationkey = n.n_nationkey
    LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE year(o.o_orderdate) = 1996
    """,
)
def term_courses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+J4-J8+A6: inner join with side filter, chained LEFT joins over
    dims, computed projection (F1/F2/F8/F10/F11/F12/F15/F18), DISTINCT
    to collapse join fan-out.

    Mirrors get_term_courses (``jonesy/queries.py:151-204,246-283``):
    sections ⋈ extended_term (J4, side filter ACAD_CAREER='UGRD' →
    o_orderstatus='F') ⟕ crosswalk (J5) ⟕ catalog (J6) ⟕ meetings (J7)
    ⟕ instructors (J8); catalog-number parsing (F8-F11,
    ``queries.py:167-170``) becomes brand/type parsing; the instructor
    name assembly (F12, ``queries.py:179-185``) becomes concat_ws; the
    boolean CASE (F15, ``queries.py:161``) is kept verbatim.

    Scale: all four dim joins are broadcast (dims ≪ fact); only the
    orders join shuffles, and AQE turns it broadcast too when the term
    slice is small. DISTINCT is one hash-aggregate shuffle.
    """
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    orders = cat.orders.filter(
        (F.col("o_orderstatus") == "F") & (F.year("o_orderdate") == 1996)
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cat.part), li.l_partkey == F.col("p_partkey"), "left")
        .join(F.broadcast(cat.supplier), li.l_suppkey == F.col("s_suppkey"), "left")
        .join(
            F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"), "left"
        )
        .join(
            F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"), "left"
        )
    )
    return joined.select(
        F.col("l_orderkey").alias("section_id"),
        F.col("l_linenumber").cast("string").alias("section_nbr"),
        F.trim(F.col("p_name")).alias("course_name"),
        F.regexp_replace(F.col("p_brand"), "[^0-9]", "").alias("catalog_root"),
        F.expr("substring(p_type, 1, instr(p_type, ' ') - 1)").alias("catalog_prefix"),
        F.when(F.col("l_returnflag") == "R", "true")
        .otherwise("false")
        .alias("is_returned"),
        F.concat_ws("|", F.col("s_name"), F.col("n_name"), F.col("r_name")).alias(
            "instructor_path"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("term_begin"),
        F.col("o_orderpriority").alias("course_career"),
    ).distinct()


# ---------------------------------------------------------------------------
# J2/J3/P6/P9/O5 — change-log join with watermark + IN-list
# (get_recent_instructor_updates queries.py:124-148).
# ---------------------------------------------------------------------------


@query(
    "recent_instructor_updates",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, value,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT
        e.event_id   AS change_id,
        e.user_id    AS instr_id,
        trim(c.c_name) AS instr_name,
        c.c_mktsegment AS dept,
        e.event_type AS change_type,
        e.ts         AS last_updated,
        CAST(round(e.value * 1000000) AS BIGINT) AS amount_micro
    FROM ev e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type IN ('click', 'view', 'purchase')
      AND e.ts >= TIMESTAMP '2024-01-25 00:00:00'
    ORDER BY e.ts DESC
    """,
)
def recent_instructor_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+P6+P9+O5: change-log scan with watermark cutoff, IN-list change
    filter, dim join, DESC ordering.

    Mirrors get_recent_instructor_updates (``jonesy/queries.py:124-148``):
    `change_type IN ('C','U')` (P6, ``:146``) → event_type IN-list; the
    5-day `last_updated >= cutoff` watermark (P9, ``:147``, computed at
    ``jobs.py:19,40``) → fixed timestamp literal (deterministic for the
    oracle; the streaming variant uses withWatermark); ORDER BY …
    last_updated DESC (O5, ``:148``).

    Scale: the cutoff filter is pushed to the scan (partition pruning on
    a date-partitioned source); the dim join broadcasts.
    """
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    return (
        ev.filter(
            F.col("event_type").isin("click", "view", "purchase")
            & (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(cat.customer), ev.user_id == F.col("c_custkey"))
        .select(
            F.col("event_id").alias("change_id"),
            F.col("user_id").alias("instr_id"),
            F.trim(F.col("c_name")).alias("instr_name"),
            F.col("c_mktsegment").alias("dept"),
            F.col("event_type").alias("change_type"),
            F.col("ts").alias("last_updated"),
            micro_units(F.col("value")).alias("amount_micro"),
        )
        .orderBy(F.col("last_updated").desc())
    )


# ---------------------------------------------------------------------------
# J2 — composite-key equi-join (instructor-updates ⋈ assigned-instructors,
# queries.py:136-142: 5-part key) + map-side partial aggregation.
# ---------------------------------------------------------------------------


@query(
    "composite_key_join",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               count(*) AS n_lines,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 1000000 AS BIGINT)
                   AS total_qty_micro
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT
        l.l_orderkey  AS orderkey,
        l.l_partkey   AS partkey,
        l.l_suppkey   AS suppkey,
        l.l_linenumber AS linenumber,
        ps.n_lines    AS n_lines,
        ps.total_qty_micro AS total_qty_micro
    FROM lineitem l
    JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
    WHERE ps.n_lines > 1
    """,
)
def composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: multi-column composite-key equi-join (reference joins on a
    5-part key, ``jonesy/queries.py:136-142``; here a 2-part
    part+supplier key) against a grouped aggregate.

    Scale: the aggregate and the join share the same key, so Catalyst
    reuses one shuffle partitioning for both stages (no second
    repartition); partial aggregation combines map-side first. The
    decimal-sum-cast keeps the double deterministic for the oracle.
    """
    li = Catalog(spark, sf_dir).lineitem
    stats = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").alias("n_lines"),
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 1_000_000)
        .cast("long")
        .alias("total_qty_micro"),
    )
    return (
        li.join(stats, on=["l_partkey", "l_suppkey"], how="inner")
        .filter(F.col("n_lines") > 1)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("n_lines"),
            F.col("total_qty_micro"),
        )
    )


# ---------------------------------------------------------------------------
# P10/J1/A1 — conditional predicate with correlated scalar lookup
# ("omit drops and withdrawals", queries.py:4-19, used at :109).
# ---------------------------------------------------------------------------


@query(
    "omit_drops_withdrawals",
    oracle="""
    SELECT
        l.l_orderkey   AS section_id,
        l.l_linenumber AS enroll_seq,
        l.l_returnflag AS status,
        l.l_linestatus AS grading_basis,
        CAST(round(l.l_quantity * 1000000) AS BIGINT) AS units_micro
    FROM lineitem l
    WHERE l.l_returnflag <> 'A'
      AND (CASE l.l_linestatus
             WHEN 'O' THEN (
                SELECT min(l2.l_returnflag) FROM lineitem l2
                WHERE l2.l_orderkey = l.l_orderkey
                  AND l2.l_linenumber = 1
                  AND l2.l_returnflag <> 'A')
             ELSE l.l_returnflag
           END) <> 'R'
    """,
)
def omit_drops_withdrawals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+J1+A1: CASE-dispatched predicate whose one branch is a
    correlated MIN lookup against the 'primary' row, with Oracle NULL
    semantics (NULL lookup ⇒ NULL <> 'R' ⇒ row filtered).

    Mirrors omit_drops_and_withdrawals (``jonesy/queries.py:4-19``):
    secondary enrollments (GRADING_BASIS_CODE='NON' → l_linestatus='O')
    check MIN(grade) of the student's primary-section enrollment
    (→ MIN(l_returnflag) of the order's linenumber-1 row); everyone else
    checks their own grade; drops ('D' → 'A') excluded outright.

    Spark-first decorrelation: instead of a per-row rescan, build the
    primary lookup once (filter + groupBy + min — one shuffle), LEFT
    join back on the key, and express the CASE with when/otherwise.
    Spark's `!=` on NULL yields NULL which `filter` drops — exactly the
    Oracle semantics the reference depends on (SURVEY.md §7 hard part 1).
    """
    li = Catalog(spark, sf_dir).lineitem
    primary = (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_returnflag") != "A"))
        .groupBy("l_orderkey")
        .agg(F.min("l_returnflag").alias("primary_flag"))
    )
    effective = F.when(F.col("l_linestatus") == "O", F.col("primary_flag")).otherwise(
        F.col("l_returnflag")
    )
    return (
        li.join(primary, on="l_orderkey", how="left")
        .filter((F.col("l_returnflag") != "A") & (effective != "R"))
        .select(
            F.col("l_orderkey").alias("section_id"),
            F.col("l_linenumber").alias("enroll_seq"),
            F.col("l_returnflag").alias("status"),
            F.col("l_linestatus").alias("grading_basis"),
            micro_units(F.col("l_quantity")).alias("units_micro"),
        )
    )


# ---------------------------------------------------------------------------
# J10/A5 — latest-version-per-group with a sentinel escape hatch
# (course catalog versioning, queries.py:269-283).
# ---------------------------------------------------------------------------


@query(
    "latest_event_version",
    oracle="""
    WITH ev AS (SELECT event_id, user_id, event_type, value,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT
        e.user_id    AS user_id,
        e.event_type AS event_type,
        e.ts         AS version_ts,
        CAST(round(e.value * 1000000) AS BIGINT) AS value_micro
    FROM ev e
    WHERE e.ts = (
        SELECT max(e2.ts) FROM ev e2
        WHERE e2.user_id = e.user_id
          AND e2.event_type = e.event_type
          AND (e2.value > 50 OR CAST(e2.ts AS DATE) = DATE '2024-01-01')
    )
    """,
)
def latest_event_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10+A5: greatest-version-per-group where the MAX ranges only over
    rows passing a predicate (value window) OR a sentinel-date escape,
    ties kept.

    Mirrors the latest-course-version subquery
    (``jonesy/queries.py:269-283``): `updatedDate = (SELECT MAX(...)
    WHERE term-window OR fromDate = 1901-01-01 sentinel)`. Spark-first:
    a *conditional* window max — ``max(when(pred, ts)).over(w)`` — one
    shuffle, no correlated rescan; groups with no qualifying row get a
    NULL max and drop out, matching the reference.
    """
    ev = Catalog(spark, sf_dir).events
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type")
    qualifying = (F.col("value") > 50) | (
        F.col("ts").cast("date") == F.lit("2024-01-01").cast("date")
    )
    return (
        ev.withColumn("__vmax", F.max(F.when(qualifying, F.col("ts"))).over(w))
        .filter(F.col("ts") == F.col("__vmax"))
        .select(
            F.col("user_id"),
            F.col("event_type"),
            F.col("ts").alias("version_ts"),
            micro_units(F.col("value")).alias("value_micro"),
        )
    )


# ---------------------------------------------------------------------------
# F1-F16 — scalar function suite (queries.py:153-202 expression surface).
# ---------------------------------------------------------------------------


@query(
    "scalar_functions_suite",
    oracle="""
    SELECT
        p_partkey                                   AS partkey,
        trim(p_name)                                AS name_trimmed,
        CAST(p_size AS VARCHAR)                     AS size_str,
        regexp_replace(p_brand, '[^0-9]', '', 'g')  AS brand_num,
        substr(p_type, 1, instr(p_type, ' ') - 1)   AS type_prefix,
        substr(p_type, instr(p_type, ' ') + 1)      AS type_rest,
        concat_ws('|', trim(p_name), p_brand)       AS name_brand,
        regexp_replace(p_name, '[\\n\\r]', '', 'g') AS name_nonl,
        CASE WHEN p_size > 25 THEN 'LARGE' ELSE 'SMALL' END AS size_class,
        CASE WHEN p_retailprice IS NOT NULL THEN 'priced' ELSE 'unpriced' END AS priced,
        CAST(round(p_retailprice * 1000000) AS BIGINT) AS price_micro
    FROM part
    """,
)
def scalar_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F16: the reference's scalar expression surface in one projection.

    Maps TRIM (F1 ``queries.py:167-170``), TO_CHAR number→string (F2
    ``:154``), REGEXP_REPLACE letter-stripping (F8 ``:168-170``),
    SUBSTR/INSTR catalog parsing (F10/F11 ``:169-170``), `||` concat
    (F12 ``:179-185``), CHR(10)/CHR(13) newline strip (F9/F14 ``:200``),
    searched + simple CASE (F15/F16 ``:161,188-195,6-19``), NVL2-style
    null dispatch (F13 ``:182``).

    All built-in Column expressions — single stage, whole-stage
    codegen, no UDFs (SURVEY.md §2.11 design rule).
    """
    part = Catalog(spark, sf_dir).part
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.trim("p_name").alias("name_trimmed"),
        F.col("p_size").cast("string").alias("size_str"),
        F.regexp_replace(F.col("p_brand"), "[^0-9]", "").alias("brand_num"),
        F.expr("substring(p_type, 1, instr(p_type, ' ') - 1)").alias("type_prefix"),
        F.expr("substring(p_type, instr(p_type, ' ') + 1)").alias("type_rest"),
        F.concat_ws("|", F.trim("p_name"), F.col("p_brand")).alias("name_brand"),
        F.regexp_replace(F.col("p_name"), "[\\n\\r]", "").alias("name_nonl"),
        F.when(F.col("p_size") > 25, "LARGE").otherwise("SMALL").alias("size_class"),
        F.when(F.col("p_retailprice").isNotNull(), "priced")
        .otherwise("unpriced")
        .alias("priced"),
        micro_units(F.col("p_retailprice")).alias("price_micro"),
    )


# ---------------------------------------------------------------------------
# F3/F18/F19 — timestamp formatting & timezone reinterpretation
# (jobs.py:164-184 CSV coercion; queries.py:196-197 TO_CHAR HH24:MI).
# ---------------------------------------------------------------------------


@query(
    "timestamp_formats",
    oracle="""
    SELECT
        event_id AS event_id,
        strftime(CAST(ts AS TIMESTAMP), '%H:%M')                   AS hhmm,
        strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S UTC')   AS iso_utc,
        strftime(timezone('America/Los_Angeles',
                          timezone('UTC', CAST(ts AS TIMESTAMP))),
                 '%Y-%m-%d %H:%M:%S')           AS pacific_wall,
        CAST(extract(day FROM ts) AS INTEGER)   AS day_of_month
    FROM events
    """,
)
def timestamp_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+F18+F19: TO_CHAR 'HH24:MI', strftime-style rendering, and the
    load-bearing UTC→America/Los_Angeles wall-time reinterpretation.

    The reference's CSV serializer re-renders mislabeled-UTC timestamps
    as Pacific wall time per row in Python (``jonesy/jobs.py:166-171``).
    Spark-first this is NOT a UDF: `from_utc_timestamp` + `date_format`
    run JVM-side inside codegen (SURVEY.md §2.11), so the coercion costs
    nothing at 100 TB.
    """
    ev = Catalog(spark, sf_dir).events
    return ev.select(
        F.col("event_id"),
        F.date_format("ts", "HH:mm").alias("hhmm"),
        F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC")).alias(
            "iso_utc"
        ),
        F.date_format(
            F.from_utc_timestamp("ts", "America/Los_Angeles"), "yyyy-MM-dd HH:mm:ss"
        ).alias("pacific_wall"),
        F.dayofmonth("ts").alias("day_of_month"),
    )


# ---------------------------------------------------------------------------
# O4/F15 — priority-ordered extract (queries.py:111-121).
# ---------------------------------------------------------------------------


@query(
    "priority_ordered_extract",
    oracle="""
    SELECT
        o_orderkey  AS orderkey,
        o_custkey   AS custkey,
        o_orderpriority AS career,
        CASE o_orderpriority
            WHEN '1-URGENT' THEN 1
            WHEN '2-HIGH' THEN 2
            WHEN '3-MEDIUM' THEN 3
            WHEN '4-NOT SPECIFIED' THEN 4
            ELSE 5
        END AS career_priority,
        o_orderdate AS last_updated
    FROM orders
    ORDER BY career_priority, o_custkey, o_orderdate DESC
    """,
)
def priority_ordered_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+F15: computed CASE priority key + multi-key ORDER BY with DESC.

    Mirrors the recent-enrollments ordering (``jonesy/queries.py:111-121``)
    whose CASE maps course career → priority int so a downstream
    truncation keeps important rows first. The global sort exists only
    for the single-file extract contract; at scale we'd
    `repartitionByRange(priority)` + `sortWithinPartitions` instead.
    """
    orders = Catalog(spark, sf_dir).orders
    priority = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
    )
    return (
        orders.select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("career"),
            priority.alias("career_priority"),
            F.col("o_orderdate").alias("last_updated"),
        )
        .orderBy("career_priority", "custkey", F.col("last_updated").desc())
    )


# ---------------------------------------------------------------------------
# A2/A3 — scalar subqueries as filter bounds (queries.py:58-65).
# ---------------------------------------------------------------------------


@query(
    "scalar_subquery_filter",
    oracle="""
    SELECT
        o_orderkey AS orderkey,
        o_custkey  AS custkey,
        o_orderdate AS orderdate,
        o_orderstatus AS status
    FROM orders
    WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
      AND o_orderdate > (SELECT min(o_orderdate) FROM orders WHERE o_orderstatus = 'F')
    """,
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3: scalar MAX/MIN subqueries as filter bounds.

    Mirrors get_current_terms' scalar subqueries
    (``jonesy/queries.py:58-65``: MAX(term_id) / filtered MIN(term_id)).
    Spark-first: each scalar is a 1-row aggregate cross-joined in
    (Catalyst plans it as a broadcast); dates-only arithmetic keeps it
    exact for the oracle.
    """
    orders = Catalog(spark, sf_dir).orders
    max_bound = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("__max_bound")
    )
    min_bound = orders.filter(F.col("o_orderstatus") == "F").agg(
        F.min("o_orderdate").alias("__min_bound")
    )
    return (
        orders.join(F.broadcast(max_bound))
        .join(F.broadcast(min_bound))
        .filter(
            (F.col("o_orderdate") > F.col("__max_bound"))
            & (F.col("o_orderdate") > F.col("__min_bound"))
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderstatus").alias("status"),
        )
    )


# ---------------------------------------------------------------------------
# J9/P8 — validity-interval range join (queries.py:267-268).
# ---------------------------------------------------------------------------


@query(
    "range_join_calendar",
    oracle="""
    WITH cal AS (
        SELECT DISTINCT
            CAST(date_trunc('month', o_orderdate) AS DATE) AS m_start,
            last_day(CAST(date_trunc('month', o_orderdate) AS DATE)) AS m_end
        FROM orders
    )
    SELECT
        cal.m_start AS month_start,
        count(*)    AS n_shipments,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 1000000 AS BIGINT)
            AS revenue_micro
    FROM lineitem l
    JOIN cal ON l.l_shipdate >= cal.m_start AND l.l_shipdate <= cal.m_end
    GROUP BY cal.m_start
    """,
)
def range_join_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9+P8: validity-interval containment join (fromDate <= d <= toDate)
    against a derived calendar, then aggregate.

    Mirrors the course-validity range predicate
    (``jonesy/queries.py:267-268``: CAST(fromDate AS DATE) <=
    TERM_END_DT <= toDate). Spark-first scale pattern: *bucketize* the
    range key — derive the equi-join key (month) on the fact side, hash
    equi-join against the broadcast calendar, keep the containment
    predicate as a residual filter. That turns an O(n·m) nested-loop
    range join into a broadcast hash join; correct whenever intervals
    align to buckets (here: exactly).
    """
    cat = Catalog(spark, sf_dir)
    cal = (
        cat.orders.select(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("m_start")
        )
        .distinct()
        .withColumn("m_end", F.last_day(F.col("m_start")))
    )
    li = cat.lineitem.withColumn(
        "__m", F.to_date(F.date_trunc("month", "l_shipdate"))
    )
    return (
        li.join(F.broadcast(cal), li.__m == cal.m_start)
        .filter(
            (F.col("l_shipdate") >= F.col("m_start"))
            & (F.col("l_shipdate") <= F.col("m_end"))
        )
        .groupBy(F.col("m_start").alias("month_start"))
        .agg(
            F.count("*").alias("n_shipments"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 1_000_000)
            .cast("long")
            .alias("revenue_micro"),
        )
    )


# ---------------------------------------------------------------------------
# P9 — watermark incremental extraction + latest-state dedup
# (jobs.py:19,40; queries.py:110,147; SURVEY §2.10).
# ---------------------------------------------------------------------------


@query(
    "watermark_incremental",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, value,
                       CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT
        user_id,
        event_type,
        ts    AS last_seen,
        CAST(round(value * 1000000) AS BIGINT) AS last_value_micro
    FROM ev
    WHERE ts >= TIMESTAMP '2024-01-26 00:00:00'
    QUALIFY ts = max(ts) OVER (PARTITION BY user_id, event_type)
    """,
)
def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 + greatest-per-group: the incremental-refresh pattern — scan
    only rows newer than the watermark, then keep latest state per key.

    Mirrors upload_recent_refresh's 5-day lookback
    (``jonesy/jobs.py:19,40``; predicate at ``queries.py:110,147``) as a
    batch filter; the Structured Streaming twin lives in
    ``jonesy_spark.streaming`` (withWatermark + dropDuplicates state).
    Scale: the watermark predicate prunes partitions on a
    date-partitioned source before any shuffle.
    """
    ev = Catalog(spark, sf_dir).events
    recent = ev.filter(F.col("ts") >= F.lit("2024-01-26 00:00:00").cast("timestamp"))
    latest = latest_per_group(recent, ["user_id", "event_type"], "ts", keep_ties=True)
    return latest.select(
        "user_id",
        "event_type",
        F.col("ts").alias("last_seen"),
        micro_units(F.col("value")).alias("last_value_micro"),
    )


# ---------------------------------------------------------------------------
# F8-F13 — catalog-number parsing + name assembly via the scalar library
# (queries.py:167-185).
# ---------------------------------------------------------------------------


@query(
    "catalog_number_parsing",
    oracle="""
    SELECT
        p_partkey AS partkey,
        p_brand   AS raw,
        regexp_replace(p_brand, '[A-Za-z]', '', 'g')   AS root,
        regexp_extract(p_brand, '^\\s*([A-Za-z]*)', 1) AS prefix,
        regexp_extract(p_brand, '([A-Za-z]*)\\s*$', 1) AS suffix,
        CASE WHEN p_size > 25 THEN 'true' ELSE 'false' END AS is_large,
        trim(p_name) || CASE WHEN p_type IS NOT NULL AND trim(p_type) <> ''
                             THEN ' ' || trim(p_type) ELSE '' END
                     || ' ' || trim(p_brand) AS assembled_name
    FROM part
    """,
)
def catalog_number_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F13 via the named scalar library (functions.scalars): letter
    stripping (Oracle 2-arg REGEXP_REPLACE → explicit '' replacement),
    prefix/suffix extraction, boolean flag, NVL2-style name assembly
    (``jonesy/queries.py:161,167-185``)."""
    part = Catalog(spark, sf_dir).part
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("raw"),
        SC.catalog_root(F.col("p_brand")).alias("root"),
        SC.catalog_prefix(F.col("p_brand")).alias("prefix"),
        SC.catalog_suffix(F.col("p_brand")).alias("suffix"),
        SC.boolean_flag(F.col("p_size") > 25, True).alias("is_large"),
        SC.full_name(F.col("p_name"), F.col("p_type"), F.col("p_brand")).alias(
            "assembled_name"
        ),
    )


# ---------------------------------------------------------------------------
# F15/A6 — concatenated conditional day codes (meeting-days encoder,
# queries.py:188-195) as a distinct-sorted aggregation.
# ---------------------------------------------------------------------------


@query(
    "active_day_codes",
    oracle="""
    WITH coded AS (
        SELECT user_id,
               CASE dayofweek(CAST(ts AS TIMESTAMP))
                   WHEN 0 THEN 'SU' WHEN 1 THEN 'MO' WHEN 2 THEN 'TU'
                   WHEN 3 THEN 'WE' WHEN 4 THEN 'TH' WHEN 5 THEN 'FR'
                   ELSE 'SA'
               END AS code
        FROM events
    )
    SELECT user_id,
           string_agg(DISTINCT code, ',' ORDER BY code) AS day_codes
    FROM coded
    GROUP BY user_id
    """,
)
def active_day_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15's meeting-days pattern (``jonesy/queries.py:188-195``: CASE
    per weekday → concatenated 'MO'/'TU'/... codes) as a per-user
    distinct-sorted day-code string; collect_set + array_sort keeps the
    concat deterministic."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.select("user_id", SC.day_code(F.col("ts")).alias("code"))
        .groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("code")), ",").alias("day_codes")
        )
    )


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
