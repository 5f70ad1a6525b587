"""The reference's eight query builders re-expressed 1:1 over the real
SIS schemas (FIXTURES.md §1-13) — the literal parity layer.

Where ``reference_queries.py`` re-hosts each operator on the driver's
TPC-H fixtures (so the round driver can oracle-check them), this module
implements the actual extraction queries over the actual relations, so a
user of the reference can run the queries they run today. Semantics are
re-derived from ``reference jonesy/queries.py`` (cited per function) and
re-expressed Spark-first: correlated scalar subqueries become grouped
lookups/window maxima, ROWNUM envelopes disappear, and Oracle's
NULL-as-empty-string concatenation is made explicit with coalesce.

Tests generate deterministic SIS fixtures (tests/sis_fixtures.py) and
differential-check every builder against a DuckDB oracle.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, fixtures_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{fixtures_dir}/{name}.parquet")


def _nz(col: Column) -> Column:
    """Oracle concatenation treats NULL as '' — make that explicit."""
    return F.coalesce(col, F.lit(""))


# ---------------------------------------------------------------------------
# upload_advisors queries
# ---------------------------------------------------------------------------


def advisor_notes_access(spark: SparkSession, fixtures_dir: str) -> DataFrame:
    """get_advisor_notes_access (reference ``jonesy/queries.py:22-28``):
    plain 3-column projection."""
    return _t(spark, fixtures_dir, "advisor_note_permissions").select(
        "USER_ID", "CS_ID", "PERMISSION_LIST"
    )


def instructor_advisor_relationships(
    spark: SparkSession, fixtures_dir: str
) -> DataFrame:
    """get_instructor_advisor_relationships (``jonesy/queries.py:70-95``).

    The correlated `EFFECTIVE_DATE = (SELECT MAX ... same advisor+number)`
    runs over ALL rows (no institution/career filter inside) — so the
    window max is computed before the outer filters, exactly as Oracle
    would. Ties at the max all survive and collapse via DISTINCT.
    """
    ia = _t(spark, fixtures_dir, "instructor_advisors")
    w = Window.partitionBy("ADVISOR_ID", "INSTRUCTOR_ADISOR_NUMBER")
    return (
        ia.withColumn("__max_eff", F.max("EFFECTIVE_DATE").over(w))
        .filter(
            (F.col("INSTITUTION") == "UCB01")
            & (F.col("ACADEMIC_CAREER") == "UGRD")
            & (F.col("EFFECTIVE_STATUS") == "A")
            & (F.col("EFFECTIVE_DATE") == F.col("__max_eff"))
        )
        .select(
            "ADVISOR_ID",
            "CAMPUS_ID",
            F.col("INSTRUCTOR_ADISOR_NUMBER").alias("INSTRUCTOR_ADVISOR_NBR"),
            "ADVISOR_TYPE",
            "ADVISOR_TYPE_DESCR",
            "INSTRUCTOR_TYPE",
            "INSTRUCTOR_TYPE_DESCR",
            "ACADEMIC_PROGRAM",
            "ACADEMIC_PROGRAM_DESCR",
            "ACADEMIC_PLAN",
            "ACADEMIC_PLAN_DESCR",
            "ACADEMIC_SUB_PLAN",
            "ACADEMIC_SUB_PLAN_DESCR",
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# term discovery + snapshot queries
# ---------------------------------------------------------------------------


def current_terms(
    spark: SparkSession, fixtures_dir: str, today: date
) -> DataFrame:
    """get_current_terms (``jonesy/queries.py:54-67``): the UGRD term in
    progress plus the next two — `DISTINCT term_id >= (MAX term_id <
    (MIN future-UGRD term))`, top 3.

    CURRENT_DATE is an explicit parameter (deterministic tests); the two
    nested scalar subqueries become 1-row broadcast aggregates.
    """
    terms = _t(spark, fixtures_dir, "terms")
    next_future = terms.filter(
        (F.col("institution") == "UCB01")
        & (F.col("acadcareer_code") == "UGRD")
        & F.col("term_type").isNotNull()
        & (F.col("term_begin_dt") > F.lit(today))
    ).agg(F.min("term_id").alias("__next_future"))
    floor_term = (
        terms.join(F.broadcast(next_future))
        .filter(F.col("term_id") < F.col("__next_future"))
        .agg(F.max("term_id").alias("__floor"))
    )
    return (
        terms.join(F.broadcast(floor_term))
        .filter(F.col("term_id") >= F.col("__floor"))
        .select("term_id")
        .distinct()
        .orderBy("term_id")
        .limit(3)
    )


def basic_attributes(spark: SparkSession, fixtures_dir: str) -> DataFrame:
    """get_basic_attributes (``jonesy/queries.py:33-49``): filtered,
    trimmed person projection ordered by ldap_uid; the ROWNUM batch
    envelope is dropped (partitioned execution replaces client paging,
    SURVEY.md §4.3)."""
    pi = _t(spark, fixtures_dir, "person_info")
    return (
        pi.filter((F.col("person_type") != "Z") & F.col("affiliations").isNotNull())
        .select(
            "ldap_uid",
            F.col("student_id").alias("sid"),
            F.trim("first_name").alias("first_name"),
            F.trim("last_name").alias("last_name"),
            "email_address",
            "affiliations",
            "person_type",
            "alternateid",
        )
        .orderBy("ldap_uid")
    )


def term_enrollments(
    spark: SparkSession, fixtures_dir: str, term_id: str
) -> DataFrame:
    """get_term_enrollments (``jonesy/queries.py:286-315``): 13-column
    DISTINCT projection of one term, ordered; ROWNUM envelope dropped."""
    enroll = _t(spark, fixtures_dir, "enrollments")
    return (
        enroll.filter(F.col("TERM_ID") == term_id)
        .select(
            F.col("CLASS_SECTION_ID").alias("section_id"),
            F.col("TERM_ID").alias("term_id"),
            F.col("SESSION_ID").alias("session_id"),
            F.col("CAMPUS_UID").alias("ldap_uid"),
            F.col("STUDENT_ID").alias("sis_id"),
            F.col("STDNT_ENRL_STATUS_CODE").alias("enrollment_status"),
            F.col("WAITLISTPOSITION").alias("waitlist_position"),
            F.col("UNITS_TAKEN").alias("units"),
            F.col("GRADE_MARK").alias("grade"),
            F.col("GRADE_POINTS").alias("grade_points"),
            F.col("GRADING_BASIS_CODE").alias("grading_basis"),
            F.col("GRADE_MARK_MID").alias("grade_midterm"),
            F.col("INSTITUTION").alias("institution"),
        )
        .distinct()
        .orderBy("section_id", "sis_id")
    )


# ---------------------------------------------------------------------------
# recent-refresh queries (P10 + watermark)
# ---------------------------------------------------------------------------


def _primary_grade_lookup(spark: SparkSession, fixtures_dir: str) -> DataFrame:
    """Decorrelation of omit_drops_and_withdrawals' scalar subquery
    (``jonesy/queries.py:4-19``): MIN(primary GRADE_MARK) per
    (secondary section, term, student).

    The reference's LEFT JOIN + `prim_enr.STUDENT_ID IS NOT NULL` is an
    inner join in disguise; groups with no surviving primary enrollment
    simply don't appear, so the later left join yields NULL — which the
    NULL-propagating `!= 'W'` then filters, matching Oracle exactly.
    """
    sec = _t(spark, fixtures_dir, "sections")
    enroll = _t(spark, fixtures_dir, "enrollments")
    prim = enroll.filter(F.col("STDNT_ENRL_STATUS_CODE") != "D").select(
        F.col("CLASS_SECTION_ID").alias("__prim_section"),
        F.col("TERM_ID").alias("__term"),
        F.col("STUDENT_ID").alias("__student"),
        F.col("GRADE_MARK").alias("__grade"),
    )
    return (
        sec.select(
            F.col("id").alias("__sec_id"),
            F.col("`term-id`").alias("__term"),
            F.col("primaryAssociatedSectionId").alias("__prim_section"),
        )
        .join(prim, ["__prim_section", "__term"])
        .groupBy(
            F.col("__sec_id").alias("CLASS_SECTION_ID"),
            F.col("__term").alias("TERM_ID"),
            F.col("__student").alias("STUDENT_ID"),
        )
        .agg(F.min("__grade").alias("__prim_min_grade"))
    )


def omit_drops_filter(enroll_with_lookup: DataFrame) -> DataFrame:
    """The shared predicate fragment (D4): status != 'D' and the
    CASE-dispatched grade check with Oracle NULL semantics."""
    effective = F.when(
        F.col("GRADING_BASIS_CODE") == "NON", F.col("__prim_min_grade")
    ).otherwise(F.col("GRADE_MARK"))
    return enroll_with_lookup.filter(
        (F.col("STDNT_ENRL_STATUS_CODE") != "D") & (effective != "W")
    )


def recent_enrollment_updates(
    spark: SparkSession, fixtures_dir: str, term_id: str, recency_cutoff: datetime
) -> DataFrame:
    """get_recent_enrollment_updates (``jonesy/queries.py:97-121``):
    term slice + omit-drops conditional filter + watermark + DISTINCT +
    career-priority ordering (O4)."""
    enroll = _t(spark, fixtures_dir, "enrollments")
    lookup = _primary_grade_lookup(spark, fixtures_dir)
    filtered = omit_drops_filter(
        enroll.join(lookup, ["CLASS_SECTION_ID", "TERM_ID", "STUDENT_ID"], "left")
    )
    priority = (
        F.when(F.col("course_career") == "UGRD", 1)
        .when(F.col("course_career") == "GRAD", 2)
        .when(F.col("course_career") == "LAW", 3)
        .when(F.col("course_career") == "UCBX", 4)
        .otherwise(5)
    )
    return (
        filtered.filter(
            (F.col("TERM_ID") == term_id)
            & (F.col("LAST_UPDATED") >= F.lit(recency_cutoff))
        )
        .select(
            F.col("CLASS_SECTION_ID").alias("section_id"),
            F.col("TERM_ID").alias("term_id"),
            F.col("CAMPUS_UID").alias("ldap_uid"),
            F.col("STUDENT_ID").alias("sis_id"),
            F.col("STDNT_ENRL_STATUS_CODE").alias("enroll_status"),
            F.col("COURSE_CAREER").alias("course_career"),
            F.col("LAST_UPDATED").alias("last_updated"),
        )
        .distinct()
        .orderBy(
            "term_id",
            priority,
            "section_id",
            "ldap_uid",
            F.col("last_updated").desc(),
        )
    )


def recent_instructor_updates(
    spark: SparkSession, fixtures_dir: str, term_id: str, recency_cutoff: datetime
) -> DataFrame:
    """get_recent_instructor_updates (``jonesy/queries.py:124-148``):
    change-log ⋈ assigned-instructors on the 5-part composite key (J2) ⋈
    sections (J3), change-type IN + watermark, DISTINCT, DESC order."""
    up = _t(spark, fixtures_dir, "instructor_updates")
    instr = _t(spark, fixtures_dir, "assigned_instructors")
    sec = _t(spark, fixtures_dir, "sections")
    joined = (
        up.join(
            instr,
            (F.col("`cs-course-id`") == F.col("crse_id"))
            & (F.col("`term-id`") == F.col("term_id"))
            & (F.col("`session-id`") == F.col("session_code"))
            & (F.col("offeringNumber") == F.col("crse_offer_nbr"))
            & (F.col("number") == F.col("class_section")),
        )
        .join(
            sec,
            (sec["id"] == F.col("class_section_id"))
            & (sec["`term-id`"] == F.col("term_id")),
        )
    )
    return (
        joined.filter(
            F.col("change_type").isin("C", "U")
            & (F.col("term_id") == term_id)
            & (F.col("last_updated") >= F.lit(recency_cutoff))
        )
        .select(
            F.col("instr_id").alias("sis_id"),
            F.col("term_id"),
            F.col("class_section_id").alias("section_id"),
            F.col("crse_id").alias("course_id"),
            F.col("`campus-uid`").alias("ldap_uid"),
            F.col("`role-code`").alias("role_code"),
            F.col("primary"),
            F.col("last_updated"),
        )
        .distinct()
        .orderBy(
            "term_id", "course_id", "section_id", "ldap_uid",
            F.col("last_updated").desc(),
        )
    )


# ---------------------------------------------------------------------------
# term courses (flat BCOURSES view) — the F-suite monster
# ---------------------------------------------------------------------------


def term_courses(spark: SparkSession, fixtures_dir: str, term_id: str) -> DataFrame:
    """get_term_courses (``jonesy/queries.py:151-204``): ~37-column
    DISTINCT projection of the denormalized courses view, with the full
    scalar surface — Oracle's letter-stripping catalog parse chain
    (F8-F11), NULL-tolerant name assembly (F12/F13), per-weekday day-code
    concat (F15), HH24:MI formatting (F3), newline stripping (F9/F14).

    Oracle-isms made explicit: `||` treats NULL as '' (coalesce), 2-arg
    REGEXP_REPLACE/REPLACE delete (explicit '' replacement).
    """
    cf = _t(spark, fixtures_dir, "courses_flat").filter(F.col("STRM") == term_id)

    nbr = F.trim(F.col("CATALOG_NBR"))
    root = F.regexp_replace(nbr, "[A-Za-z]", "")
    # REPLACE(trim(nbr), root, '|'): collapse the numeric root to a marker,
    # leaving '<prefix>|<suffix>'.
    marked = F.replace(nbr, root, F.lit("|"))
    prefix = F.replace(F.substring(marked, 1, 1), F.lit("|"), F.lit(""))
    suffix = F.expr(
        "substring(replace(trim(CATALOG_NBR), regexp_replace(trim(CATALOG_NBR),"
        " '[A-Za-z]', ''), '|'),"
        " instr(replace(trim(CATALOG_NBR), regexp_replace(trim(CATALOG_NBR),"
        " '[A-Za-z]', ''), '|'), '|') + 1)"
    )

    name = F.trim(
        F.concat(
            _nz(F.trim("NAME_PREFIX")),
            F.lit(" "),
            _nz(F.trim("FIRST_NAME")),
            F.lit(" "),
            _nz(F.trim("MIDDLE_NAME")),
            # Oracle NVL2(TRIM(x)): a whitespace-only middle name TRIMs
            # to NULL there (no empty strings in Oracle), so the
            # conditional space needs the != '' guard in Spark, where
            # trim('  ') yields '' (non-NULL).
            F.when(
                F.trim("MIDDLE_NAME").isNotNull() & (F.trim("MIDDLE_NAME") != ""),
                " ",
            ).otherwise(""),
            _nz(F.trim("LAST_NAME")),
            F.lit(" "),
            _nz(F.trim("NAME_SUFFIX")),
        )
    )

    day = lambda col, code: _nz(F.when(F.col(col) == "Y", code))  # noqa: E731
    meeting_days = F.concat(
        day("MON", "MO"), day("TUES", "TU"), day("WED", "WE"),
        day("THURS", "TH"), day("FRI", "FR"), day("SAT", "SA"), day("SUN", "SU"),
    )

    return cf.select(
        F.col("CLASS_NBR").cast("string").alias("section_id"),
        F.col("STRM").alias("term_id"),
        F.col("SESSION_CODE").alias("session_id"),
        F.col("SUBJECT").alias("dept_name"),
        F.col("SUBJECT").alias("dept_code"),
        F.col("ACAD_CAREER").alias("course_career_code"),
        F.col("SCHEDULE_PRINT").alias("print_in_schedule_of_classes"),
        F.when(F.col("PRIMARY_FLAG") == "Y", "true").otherwise("false").alias("primary"),
        F.col("SSR_COMPONENT").alias("instruction_format"),
        F.col("CLASS_NBR_1").cast("string").alias("primary_associated_section_id"),
        F.trim("DISPLAY_NAME").alias("display_name"),
        F.col("CLASS_SECTION").alias("section_num"),
        F.col("DISPLAY_NAME").alias("course_display_name"),
        nbr.alias("catalog_id"),
        root.alias("catalog_root"),
        prefix.alias("catalog_prefix"),
        suffix.alias("catalog_suffix"),
        F.col("EFFDT").alias("course_updated_date"),
        F.col("CRSE_ID").alias("course_id"),
        F.col("ENRL_TOT").alias("enrollment_count"),
        F.col("ENRL_CAP").alias("enroll_limit"),
        F.col("WAIT_CAP").alias("waitlist_limit"),
        F.col("START_DT").alias("start_date"),
        F.col("END_DT").alias("end_date"),
        F.col("CAMPUS_ID").alias("instructor_uid"),
        name.alias("instructor_name"),
        F.col("INSTR_ROLE").alias("instructor_role_code"),
        F.col("DESCR").alias("location"),
        meeting_days.alias("meeting_days"),
        F.date_format("MEETING_TIME_START", "HH:mm").alias("meeting_start_time"),
        F.date_format("MEETING_TIME_END", "HH:mm").alias("meeting_end_time"),
        F.col("START_DATE").alias("meeting_start_date"),
        F.col("END_DATE").alias("meeting_end_date"),
        F.trim(F.regexp_replace("COURSE_TITLE_LONG", "[\\n\\r]", "")).alias(
            "course_title"
        ),
        F.col("COURSE_TITLE").alias("course_title_short"),
        F.col("INSTRUCTION_MODE").alias("instruction_mode"),
    ).distinct()


def term_courses_normalized(
    spark: SparkSession, fixtures_dir: str, term_id: str
) -> DataFrame:
    """get_term_courses_deprecated (``jonesy/queries.py:207-283``): the
    5-join normalized course extract — sections ⋈ extended-term (J4) ⟕
    crosswalk (J5) ⟕ catalog (J6) ⟕ meetings (J7, 5-part key) ⟕
    instructors (J8, 5-part key) — with the validity-window range
    predicate (J9) and the latest-version-or-sentinel subquery (J10).

    Faithful subtleties: the crs-referencing WHERE conditions make the
    xlat/crs LEFT joins effectively inner (NULL fails the CAST
    comparisons); and because the outer query fixes ``sec."term-id" =
    term_id``, the correlated version subquery's term2 set is CONSTANT —
    so J10 decorrelates to a conditional max over (version-id,
    displayName) against that one term's end date.
    """
    sec = _t(spark, fixtures_dir, "sections").filter(F.col("`term-id`") == term_id)
    term1 = (
        _t(spark, fixtures_dir, "extended_term")
        .filter(F.col("ACAD_CAREER") == "UGRD")
        .select(F.col("STRM"), F.col("TERM_END_DT"))
    )
    xlat = _t(spark, fixtures_dir, "xlat")
    crs = _t(spark, fixtures_dir, "courses_catalog")
    mtg = _t(spark, fixtures_dir, "meetings")
    instr = _t(spark, fixtures_dir, "assigned_instructors")

    # J10 decorrelated: qualifying versions per (cms-id, displayName)
    # against the constant term2 = (UGRD, term_id) end date(s).
    term2 = term1.filter(F.col("STRM") == term_id).select(
        F.col("TERM_END_DT").alias("__t2_end")
    )
    qualifies = (
        (F.col("fromDate").cast("date") <= F.col("__t2_end"))
        & (F.col("toDate").cast("date") >= F.col("__t2_end"))
    ) | (F.col("updatedDate").cast("date") == F.lit("1901-01-01").cast("date"))
    vmax = (
        crs.join(F.broadcast(term2))
        .groupBy(
            F.col("`cms-version-independent-id`").alias("__vid"),
            F.col("displayName").alias("__vname"),
        )
        .agg(F.max(F.when(qualifies, F.col("updatedDate"))).alias("__vmax"))
    )

    joined = (
        sec.join(F.broadcast(term1), sec["`term-id`"] == term1["STRM"])
        .join(
            F.broadcast(xlat),
            F.col("classDisplayName") == sec["displayName"],
            "left",
        )
        .join(
            F.broadcast(crs),
            F.col("courseDisplayName") == crs["displayName"],
            "left",
        )
        .join(
            F.broadcast(mtg),
            (mtg["`cs-course-id`"] == sec["`cs-course-id`"])
            & (mtg["`term-id`"] == sec["`term-id`"])
            & (mtg["`session-id`"] == sec["`session-id`"])
            & (mtg["offeringNumber"] == sec["offeringNumber"])
            & (mtg["sectionNumber"] == sec["sectionNumber"]),
            "left",
        )
        .join(
            F.broadcast(instr),
            (instr["`cs-course-id`"] == sec["`cs-course-id`"])
            & (instr["`term-id`"] == sec["`term-id`"])
            & (instr["`session-id`"] == sec["`session-id`"])
            & (instr["offeringNumber"] == sec["offeringNumber"])
            & (instr["number"] == sec["sectionNumber"]),
            "left",
        )
        .join(
            F.broadcast(vmax),
            (F.col("__vid") == crs["`cms-version-independent-id`"])
            & (F.col("__vname") == crs["displayName"]),
            "left",
        )
    )

    filtered = joined.filter(
        (crs["fromDate"].cast("date") <= F.col("TERM_END_DT"))
        & (crs["toDate"].cast("date") >= F.col("TERM_END_DT"))
        & (crs["updatedDate"] == F.col("__vmax"))
    )
    return filtered.select(
        sec["id"].alias("section_id"),
        sec["`term-id`"].alias("term_id"),
        sec["`session-id`"].alias("session_id"),
        crs["subjectArea"].alias("dept_name"),
        crs["classSubjectArea"].alias("dept_code"),
        crs["`academicCareer-code`"].alias("course_career_code"),
        sec["printInScheduleOfClasses"].alias("print_in_schedule_of_classes"),
        sec["primary"].alias("primary"),
        sec["`component-code`"].alias("instruction_format"),
        sec["primaryAssociatedSectionId"].cast("string").alias(
            "primary_associated_section_id"
        ),
        sec["displayName"].alias("section_display_name"),
        sec["sectionNumber"].alias("section_num"),
        crs["displayName"].alias("course_display_name"),
        crs["`catalogNumber-formatted`"].alias("catalog_id"),
        crs["`catalogNumber-number`"].alias("catalog_root"),
        crs["`catalogNumber-prefix`"].alias("catalog_prefix"),
        crs["`catalogNumber-suffix`"].alias("catalog_suffix"),
        crs["updatedDate"].alias("course_updated_date"),
        crs["`cms-version-independent-id`"].alias("course_version_independent_id"),
        sec["enrolledCount"].alias("enrollment_count"),
        sec["maxEnroll"].alias("enroll_limit"),
        sec["maxWaitlist"].alias("waitlist_limit"),
        sec["startDate"].alias("start_date"),
        sec["endDate"].alias("end_date"),
        instr["`campus-uid`"].alias("instructor_uid"),
        F.trim(instr["formattedName"]).alias("instructor_name"),
        instr["`role-code`"].alias("instructor_role_code"),
        mtg["`location-descr`"].alias("location"),
        mtg["meetsDays"].alias("meeting_days"),
        mtg["startTime"].alias("meeting_start_time"),
        mtg["endTime"].alias("meeting_end_time"),
        mtg["startDate"].alias("meeting_start_date"),
        mtg["endDate"].alias("meeting_end_date"),
        F.trim(crs["title"]).alias("course_title"),
        F.trim(crs["transcriptTitle"]).alias("course_title_short"),
        sec["`instructionMode-code`"].alias("instruction_mode"),
    ).distinct()
