"""Literal-schema parity: the reference's 8 query builders over the real
SIS relations (tests/sis_fixtures.py), each differential-checked against
a DuckDB oracle that mirrors the Oracle SQL semantics (NULL-propagating
concat handled with explicit coalesce on BOTH sides)."""

from __future__ import annotations

import duckdb
import pytest

from conftest import assert_matches_oracle
from jonesy_spark.plans import sis_queries as SQ
from sis_fixtures import CUTOFF, TODAY

TERM = "2238"
CUTOFF_SQL = f"TIMESTAMP '{CUTOFF:%Y-%m-%d %H:%M:%S}'"


@pytest.fixture(scope="session")
def sis_duck(sis_dir):
    con = duckdb.connect()
    for t in [
        "terms", "extended_term", "sections", "enrollments", "person_info",
        "advisor_note_permissions", "instructor_advisors", "instructor_updates",
        "assigned_instructors", "courses_flat", "courses_catalog", "xlat",
        "meetings",
    ]:
        con.execute(f'CREATE VIEW {t} AS SELECT * FROM \'{sis_dir}/{t}.parquet\'')
    yield con
    con.close()


def test_advisor_notes_access(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.advisor_notes_access(spark, sis_dir),
        sis_duck,
        "SELECT USER_ID, CS_ID, PERMISSION_LIST FROM advisor_note_permissions",
    )


def test_instructor_advisor_relationships(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.instructor_advisor_relationships(spark, sis_dir),
        sis_duck,
        """
        SELECT DISTINCT
            I.ADVISOR_ID, I.CAMPUS_ID,
            I.INSTRUCTOR_ADISOR_NUMBER AS INSTRUCTOR_ADVISOR_NBR,
            I.ADVISOR_TYPE, I.ADVISOR_TYPE_DESCR,
            I.INSTRUCTOR_TYPE, I.INSTRUCTOR_TYPE_DESCR,
            I.ACADEMIC_PROGRAM, I.ACADEMIC_PROGRAM_DESCR,
            I.ACADEMIC_PLAN, I.ACADEMIC_PLAN_DESCR,
            I.ACADEMIC_SUB_PLAN, I.ACADEMIC_SUB_PLAN_DESCR
        FROM instructor_advisors I
        WHERE I.INSTITUTION = 'UCB01' AND I.ACADEMIC_CAREER = 'UGRD'
          AND I.EFFECTIVE_STATUS = 'A'
          AND I.EFFECTIVE_DATE = (
              SELECT max(I1.EFFECTIVE_DATE) FROM instructor_advisors I1
              WHERE I1.ADVISOR_ID = I.ADVISOR_ID
                AND I1.INSTRUCTOR_ADISOR_NUMBER = I.INSTRUCTOR_ADISOR_NUMBER)
        """,
    )


def test_current_terms(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.current_terms(spark, sis_dir, TODAY),
        sis_duck,
        f"""
        SELECT DISTINCT term_id FROM terms WHERE term_id >= (
            SELECT max(term_id) FROM terms WHERE term_id < (
                SELECT min(term_id) FROM terms
                WHERE institution = 'UCB01' AND acadcareer_code = 'UGRD'
                  AND term_type IS NOT NULL
                  AND term_begin_dt > DATE '{TODAY:%Y-%m-%d}'))
        ORDER BY term_id LIMIT 3
        """,
    )


def test_basic_attributes(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.basic_attributes(spark, sis_dir),
        sis_duck,
        """
        SELECT ldap_uid, student_id AS sid, trim(first_name) AS first_name,
               trim(last_name) AS last_name, email_address, affiliations,
               person_type, alternateid
        FROM person_info
        WHERE person_type <> 'Z' AND affiliations IS NOT NULL
        ORDER BY ldap_uid
        """,
    )


def test_term_enrollments(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.term_enrollments(spark, sis_dir, TERM),
        sis_duck,
        f"""
        SELECT DISTINCT
            CLASS_SECTION_ID AS section_id, TERM_ID AS term_id,
            SESSION_ID AS session_id, CAMPUS_UID AS ldap_uid,
            STUDENT_ID AS sis_id, STDNT_ENRL_STATUS_CODE AS enrollment_status,
            WAITLISTPOSITION AS waitlist_position, UNITS_TAKEN AS units,
            GRADE_MARK AS grade, GRADE_POINTS AS grade_points,
            GRADING_BASIS_CODE AS grading_basis, GRADE_MARK_MID AS grade_midterm,
            INSTITUTION AS institution
        FROM enrollments WHERE TERM_ID = '{TERM}'
        """,
    )


def test_recent_enrollment_updates(spark, sis_dir, sis_duck):
    df = SQ.recent_enrollment_updates(spark, sis_dir, TERM, CUTOFF)
    assert_matches_oracle(
        df,
        sis_duck,
        f"""
        SELECT DISTINCT
            enroll.CLASS_SECTION_ID AS section_id,
            enroll.TERM_ID AS term_id,
            enroll.CAMPUS_UID AS ldap_uid,
            enroll.STUDENT_ID AS sis_id,
            enroll.STDNT_ENRL_STATUS_CODE AS enroll_status,
            enroll.COURSE_CAREER AS course_career,
            enroll.LAST_UPDATED AS last_updated
        FROM enrollments enroll
        WHERE enroll.TERM_ID = '{TERM}'
          AND enroll.STDNT_ENRL_STATUS_CODE <> 'D'
          AND (CASE enroll.GRADING_BASIS_CODE WHEN 'NON' THEN (
                SELECT min(prim_enr.GRADE_MARK)
                FROM sections sec
                JOIN enrollments prim_enr
                  ON prim_enr.CLASS_SECTION_ID = sec."primaryAssociatedSectionId"
                 AND prim_enr.TERM_ID = enroll.TERM_ID
                 AND prim_enr.STUDENT_ID = enroll.STUDENT_ID
                 AND prim_enr.STDNT_ENRL_STATUS_CODE <> 'D'
                WHERE sec."id" = enroll.CLASS_SECTION_ID
                  AND sec."term-id" = enroll.TERM_ID)
               ELSE enroll.GRADE_MARK END) <> 'W'
          AND enroll.LAST_UPDATED >= {CUTOFF_SQL}
        """,
    )
    # the crafted P10 branch rows: only U9002's secondary survives
    kept = {r["sis_id"] for r in df.collect() if r["sis_id"].startswith("U90")}
    assert "U9002" in kept
    assert kept.isdisjoint({"U9001", "U9003", "U9004", "U9007"})


def test_recent_instructor_updates(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.recent_instructor_updates(spark, sis_dir, TERM, CUTOFF),
        sis_duck,
        f"""
        SELECT DISTINCT
            up.instr_id AS sis_id,
            up.term_id,
            up.class_section_id AS section_id,
            up.crse_id AS course_id,
            instr."campus-uid" AS ldap_uid,
            instr."role-code" AS role_code,
            sec."primary" AS "primary",
            up.last_updated
        FROM instructor_updates up
        JOIN assigned_instructors instr ON (
            instr."cs-course-id" = up.crse_id AND
            instr."term-id" = up.term_id AND
            instr."session-id" = up.session_code AND
            instr."offeringNumber" = up.crse_offer_nbr AND
            instr."number" = up.class_section)
        JOIN sections sec ON (
            sec."id" = up.class_section_id AND sec."term-id" = up.term_id)
        WHERE up.change_type IN ('C', 'U') AND up.term_id = '{TERM}'
          AND up.last_updated >= {CUTOFF_SQL}
        """,
    )


def test_term_courses_flat(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.term_courses(spark, sis_dir, TERM),
        sis_duck,
        f"""
        WITH base AS (
            SELECT *,
                trim(CATALOG_NBR) AS nbr,
                regexp_replace(trim(CATALOG_NBR), '[A-Za-z]', '', 'g') AS root
            FROM courses_flat WHERE STRM = '{TERM}'
        ), marked AS (
            SELECT *, replace(nbr, root, '|') AS mk FROM base
        )
        SELECT DISTINCT
            CAST(CLASS_NBR AS VARCHAR) AS section_id,
            STRM AS term_id,
            SESSION_CODE AS session_id,
            SUBJECT AS dept_name,
            SUBJECT AS dept_code,
            ACAD_CAREER AS course_career_code,
            SCHEDULE_PRINT AS print_in_schedule_of_classes,
            CASE WHEN PRIMARY_FLAG = 'Y' THEN 'true' ELSE 'false' END AS "primary",
            SSR_COMPONENT AS instruction_format,
            CAST(CLASS_NBR_1 AS VARCHAR) AS primary_associated_section_id,
            trim(DISPLAY_NAME) AS display_name,
            CLASS_SECTION AS section_num,
            DISPLAY_NAME AS course_display_name,
            nbr AS catalog_id,
            root AS catalog_root,
            replace(substr(mk, 1, 1), '|', '') AS catalog_prefix,
            substr(mk, instr(mk, '|') + 1) AS catalog_suffix,
            EFFDT AS course_updated_date,
            CRSE_ID AS course_id,
            ENRL_TOT AS enrollment_count,
            ENRL_CAP AS enroll_limit,
            WAIT_CAP AS waitlist_limit,
            START_DT AS start_date,
            END_DT AS end_date,
            CAMPUS_ID AS instructor_uid,
            trim(coalesce(trim(NAME_PREFIX), '') || ' ' ||
                 coalesce(trim(FIRST_NAME), '') || ' ' ||
                 coalesce(trim(MIDDLE_NAME), '') ||
                 CASE WHEN trim(MIDDLE_NAME) IS NOT NULL
                       AND trim(MIDDLE_NAME) <> '' THEN ' ' ELSE '' END ||
                 coalesce(trim(LAST_NAME), '') || ' ' ||
                 coalesce(trim(NAME_SUFFIX), '')) AS instructor_name,
            INSTR_ROLE AS instructor_role_code,
            DESCR AS location,
            coalesce(CASE WHEN MON = 'Y' THEN 'MO' END, '') ||
                coalesce(CASE WHEN TUES = 'Y' THEN 'TU' END, '') ||
                coalesce(CASE WHEN WED = 'Y' THEN 'WE' END, '') ||
                coalesce(CASE WHEN THURS = 'Y' THEN 'TH' END, '') ||
                coalesce(CASE WHEN FRI = 'Y' THEN 'FR' END, '') ||
                coalesce(CASE WHEN SAT = 'Y' THEN 'SA' END, '') ||
                coalesce(CASE WHEN SUN = 'Y' THEN 'SU' END, '') AS meeting_days,
            strftime(MEETING_TIME_START, '%H:%M') AS meeting_start_time,
            strftime(MEETING_TIME_END, '%H:%M') AS meeting_end_time,
            START_DATE AS meeting_start_date,
            END_DATE AS meeting_end_date,
            trim(replace(replace(COURSE_TITLE_LONG, chr(10), ''), chr(13), ''))
                AS course_title,
            COURSE_TITLE AS course_title_short,
            INSTRUCTION_MODE AS instruction_mode
        FROM marked
        """,
    )


def test_term_courses_normalized(spark, sis_dir, sis_duck):
    assert_matches_oracle(
        SQ.term_courses_normalized(spark, sis_dir, TERM),
        sis_duck,
        f"""
        SELECT DISTINCT
            sec."id" AS section_id,
            sec."term-id" AS term_id,
            sec."session-id" AS session_id,
            crs."subjectArea" AS dept_name,
            crs."classSubjectArea" AS dept_code,
            crs."academicCareer-code" AS course_career_code,
            sec."printInScheduleOfClasses" AS print_in_schedule_of_classes,
            sec."primary" AS "primary",
            sec."component-code" AS instruction_format,
            CAST(sec."primaryAssociatedSectionId" AS VARCHAR)
                AS primary_associated_section_id,
            sec."displayName" AS section_display_name,
            sec."sectionNumber" AS section_num,
            crs."displayName" AS course_display_name,
            crs."catalogNumber-formatted" AS catalog_id,
            crs."catalogNumber-number" AS catalog_root,
            crs."catalogNumber-prefix" AS catalog_prefix,
            crs."catalogNumber-suffix" AS catalog_suffix,
            crs."updatedDate" AS course_updated_date,
            crs."cms-version-independent-id" AS course_version_independent_id,
            sec."enrolledCount" AS enrollment_count,
            sec."maxEnroll" AS enroll_limit,
            sec."maxWaitlist" AS waitlist_limit,
            sec."startDate" AS start_date,
            sec."endDate" AS end_date,
            instr."campus-uid" AS instructor_uid,
            trim(instr."formattedName") AS instructor_name,
            instr."role-code" AS instructor_role_code,
            mtg."location-descr" AS location,
            mtg."meetsDays" AS meeting_days,
            mtg."startTime" AS meeting_start_time,
            mtg."endTime" AS meeting_end_time,
            mtg."startDate" AS meeting_start_date,
            mtg."endDate" AS meeting_end_date,
            trim(crs."title") AS course_title,
            trim(crs."transcriptTitle") AS course_title_short,
            sec."instructionMode-code" AS instruction_mode
        FROM sections sec
        JOIN extended_term term1
          ON term1.STRM = sec."term-id" AND term1.ACAD_CAREER = 'UGRD'
        LEFT OUTER JOIN xlat ON xlat."classDisplayName" = sec."displayName"
        LEFT OUTER JOIN courses_catalog crs
          ON xlat."courseDisplayName" = crs."displayName"
        LEFT OUTER JOIN meetings mtg ON (
            mtg."cs-course-id" = sec."cs-course-id" AND
            mtg."term-id" = sec."term-id" AND
            mtg."session-id" = sec."session-id" AND
            mtg."offeringNumber" = sec."offeringNumber" AND
            mtg."sectionNumber" = sec."sectionNumber")
        LEFT OUTER JOIN assigned_instructors instr ON (
            instr."cs-course-id" = sec."cs-course-id" AND
            instr."term-id" = sec."term-id" AND
            instr."session-id" = sec."session-id" AND
            instr."offeringNumber" = sec."offeringNumber" AND
            instr."number" = sec."sectionNumber")
        WHERE sec."term-id" = '{TERM}'
          AND CAST(crs."fromDate" AS DATE) <= term1.TERM_END_DT
          AND CAST(crs."toDate" AS DATE) >= term1.TERM_END_DT
          AND crs."updatedDate" = (
              SELECT max(crs2."updatedDate")
              FROM courses_catalog crs2, extended_term term2
              WHERE crs2."cms-version-independent-id" =
                        crs."cms-version-independent-id"
                AND crs2."displayName" = crs."displayName"
                AND term2.ACAD_CAREER = 'UGRD'
                AND term2.STRM = sec."term-id"
                AND ((CAST(crs2."fromDate" AS DATE) <= term2.TERM_END_DT AND
                      CAST(crs2."toDate" AS DATE) >= term2.TERM_END_DT)
                     OR CAST(crs2."updatedDate" AS DATE) = DATE '1901-01-01'))
        """,
    )
