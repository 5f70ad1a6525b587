"""Deterministic SIS-domain fixture generator per FIXTURES.md.

Builds the 13 relations the reference reads (FIXTURES.md §1-13) as small
parquet tables, with every value domain the queries branch on: P10's
four primary-lookup branches, DISTINCT-able duplicates, effective-date
ties, catalog-number forms, all-day-flag combos, newline-bearing titles,
watermark-straddling timestamps. Seeded → byte-stable across runs.
"""

from __future__ import annotations

import random
from datetime import date, datetime, timedelta

import pandas as pd

SEED = 42
#: Fixed 'today' for CURRENT_DATE-dependent queries (deterministic).
TODAY = date(2024, 6, 1)
#: Watermark cutoff used by the recent-update queries in tests.
CUTOFF = datetime(2024, 5, 25, 0, 0, 0)

TERM_IDS = ["2238", "2242", "2245", "2248", "2252", "2255", "2258", "2262"]
#: term begin dates: first five in the past, last three in the future
TERM_BEGINS = {
    "2238": date(2023, 8, 20),
    "2242": date(2024, 1, 9),
    "2245": date(2024, 5, 20),
    "2248": date(2024, 8, 20),  # future vs TODAY
    "2252": date(2025, 1, 9),
    "2255": date(2025, 5, 20),
    "2258": date(2025, 8, 20),
    "2262": date(2026, 1, 9),
}

CAREERS = ["UGRD", "GRAD", "LAW", "UCBX", "OTHER"]


def _ts_around_cutoff(rng: random.Random) -> datetime:
    return CUTOFF + timedelta(
        days=rng.uniform(-6, 6), seconds=rng.randrange(86400)
    )


def build_sis_fixtures(out_dir: str) -> dict[str, pd.DataFrame]:
    rng = random.Random(SEED)
    tables: dict[str, pd.DataFrame] = {}

    # -- terms (FIXTURES §3): duplicate term_ids across careers/institutions
    rows = []
    for t in TERM_IDS:
        for inst in ["UCB01", "UCX01"]:
            for career in ["UGRD", "GRAD"]:
                rows.append(
                    dict(
                        term_id=t,
                        institution=inst,
                        acadcareer_code=career,
                        term_type=None if (career == "GRAD" and inst == "UCX01") else "R",
                        term_begin_dt=TERM_BEGINS[t],
                    )
                )
    tables["terms"] = pd.DataFrame(rows)

    # -- extended_term (§4)
    tables["extended_term"] = pd.DataFrame(
        [
            dict(
                STRM=t,
                ACAD_CAREER=career,
                TERM_END_DT=TERM_BEGINS[t] + timedelta(days=110),
            )
            for t in TERM_IDS
            for career in ["UGRD", "GRAD"]
        ]
    )

    # -- sections (§2): primaries + secondaries pointing at them
    sec_rows = []
    active_terms = TERM_IDS[:4]
    for term in active_terms:
        for c in range(20):
            course = f"CRS{c:03d}"
            prim_id = f"S{term}{c:03d}P"
            sec_rows.append(
                dict(
                    **{
                        "id": prim_id,
                        "term-id": term,
                        "session-id": "1",
                        "cs-course-id": course,
                        "offeringNumber": 1,
                        "sectionNumber": "001",
                        "primary": "true",
                        "primaryAssociatedSectionId": None,
                        "displayName": f"SUBJ {course}",
                        "component-code": "LEC",
                        "instructionMode-code": "P",
                        "printInScheduleOfClasses": "Y",
                        "enrolledCount": rng.randrange(10, 200),
                        "maxEnroll": 200,
                        "maxWaitlist": 20,
                        "startDate": TERM_BEGINS[term],
                        "endDate": TERM_BEGINS[term] + timedelta(days=100),
                    }
                )
            )
            for s in range(2):
                sec_rows.append(
                    dict(
                        **{
                            "id": f"S{term}{c:03d}{s}",
                            "term-id": term,
                            "session-id": "1",
                            "cs-course-id": course,
                            "offeringNumber": 1,
                            "sectionNumber": f"10{s}",
                            "primary": "false",
                            "primaryAssociatedSectionId": prim_id,
                            "displayName": f"SUBJ {course}",
                            "component-code": rng.choice(["DIS", "LAB"]),
                            "instructionMode-code": "P",
                            "printInScheduleOfClasses": "Y",
                            "enrolledCount": rng.randrange(5, 30),
                            "maxEnroll": 30,
                            "maxWaitlist": 5,
                            "startDate": TERM_BEGINS[term],
                            "endDate": TERM_BEGINS[term] + timedelta(days=100),
                        }
                    )
                )
    tables["sections"] = pd.DataFrame(sec_rows)

    # -- enrollments (§1): crafted P10 branches + random bulk
    enr_rows = []

    def enroll(section, term, student, status, grade, basis, career=None):
        enr_rows.append(
            dict(
                CLASS_SECTION_ID=section,
                TERM_ID=term,
                SESSION_ID="1",
                CAMPUS_UID=f"uid{student[1:]}",
                STUDENT_ID=student,
                STDNT_ENRL_STATUS_CODE=status,
                WAITLISTPOSITION=rng.randrange(1, 20) if status == "W" else None,
                UNITS_TAKEN=float(rng.choice([1.0, 3.0, 4.0])),
                GRADE_MARK=grade,
                GRADE_POINTS=float(rng.randrange(0, 16)),
                GRADING_BASIS_CODE=basis,
                GRADE_MARK_MID=rng.choice(["A", "B", None]),
                INSTITUTION="UCB01",
                COURSE_CAREER=career or rng.choice(CAREERS),
                LAST_UPDATED=_ts_around_cutoff(rng),
            )
        )

    term = active_terms[0]
    # P10 branch (a): NON secondary whose primary enrollment grade = 'W' → filtered
    enroll(f"S{term}000P", term, "U9001", "E", "W", "GRD")
    enroll(f"S{term}0000", term, "U9001", "E", None, "NON")
    # branch (b): primary grade != 'W' → kept
    enroll(f"S{term}001P", term, "U9002", "E", "B", "GRD")
    enroll(f"S{term}0010", term, "U9002", "E", None, "NON")
    # branch (c): primary enrollment dropped → lookup NULL → filtered
    enroll(f"S{term}002P", term, "U9003", "D", "A", "GRD")
    enroll(f"S{term}0020", term, "U9003", "E", None, "NON")
    # branch (d): no primary enrollment at all → NULL → filtered
    enroll(f"S{term}0030", term, "U9004", "E", None, "NON")
    # non-NON rows: own grade checked
    enroll(f"S{term}004P", term, "U9005", "E", "W", "GRD")  # filtered (own W)
    enroll(f"S{term}005P", term, "U9006", "E", "A", "GRD")  # kept
    enroll(f"S{term}006P", term, "U9007", "D", "A", "GRD")  # dropped status

    # random bulk incl. exact duplicate rows (SELECT DISTINCT observable)
    sections_by_term: dict[str, list[tuple[str, str | None]]] = {}
    for r in sec_rows:
        sections_by_term.setdefault(r["term-id"], []).append(
            (r["id"], r["primaryAssociatedSectionId"])
        )
    for term in active_terms:
        for _ in range(260):
            sec_id, prim = rng.choice(sections_by_term[term])
            student = f"U{rng.randrange(100, 220):04d}"
            basis = rng.choice(["GRD", "GRD", "EPN", "NON"])
            status = rng.choice(["E", "E", "E", "W", "D"])
            grade = rng.choice(["A", "B", "P", "W", None])
            enroll(sec_id, term, student, status, grade, basis)
            if prim is not None and basis == "NON" and rng.random() < 0.7:
                # give the student a primary-section enrollment too
                enroll(
                    prim, term, student, rng.choice(["E", "E", "D"]),
                    rng.choice(["A", "B", "W", None]), "GRD",
                )
    # literal duplicates
    dup = pd.DataFrame(enr_rows[-5:])
    tables["enrollments"] = pd.concat(
        [pd.DataFrame(enr_rows), dup], ignore_index=True
    )

    # -- person_info (§13)
    pi_rows = []
    for i in range(400):
        pi_rows.append(
            dict(
                ldap_uid=f"{100000 + i}",
                student_id=f"U{i:04d}",
                first_name=rng.choice(["  Ana", "Bo ", " Chen ", "Dee"]),
                last_name=rng.choice([" Lee ", "Nguyen", "  Park", "Quinn "]),
                email_address=f"u{i}@berkeley.edu",
                affiliations=None if i % 11 == 0 else "STUDENT-TYPE-REGISTERED",
                person_type="Z" if i % 17 == 0 else rng.choice(["S", "A"]),
                alternateid=f"alt{i}",
            )
        )
    tables["person_info"] = pd.DataFrame(pi_rows)

    # -- advisor_note_permissions (§5)
    tables["advisor_note_permissions"] = pd.DataFrame(
        [
            dict(
                USER_ID=f"{200000 + i}",
                CS_ID=f"CS{i:04d}",
                PERMISSION_LIST=rng.choice(["read", "read_write", None]),
            )
            for i in range(50)
        ]
    )

    # -- instructor_advisors (§6): ≥3 dates per (advisor, number), with ties
    ia_rows = []
    eff_dates = [date(2022, 1, 10), date(2023, 1, 10), date(2024, 1, 10)]
    for a in range(60):
        advisor = f"A{a:03d}"
        for nbr in (1, 2):
            for d in eff_dates:
                ia_rows.append(
                    dict(
                        ADVISOR_ID=advisor,
                        CAMPUS_ID=f"c{a:03d}",
                        INSTRUCTOR_ADISOR_NUMBER=nbr,
                        ADVISOR_TYPE="MAJ",
                        ADVISOR_TYPE_DESCR="Major advisor",
                        INSTRUCTOR_TYPE="PROF",
                        INSTRUCTOR_TYPE_DESCR="Professor",
                        ACADEMIC_PROGRAM=f"PROG{a % 5}",
                        ACADEMIC_PROGRAM_DESCR=f"Program {a % 5}",
                        ACADEMIC_PLAN=f"PLAN{a % 7}",
                        ACADEMIC_PLAN_DESCR=f"Plan {a % 7}",
                        ACADEMIC_SUB_PLAN=None,
                        ACADEMIC_SUB_PLAN_DESCR=None,
                        INSTITUTION="UCB01" if a % 4 else "UCX01",
                        ACADEMIC_CAREER="UGRD" if a % 3 else "GRAD",
                        EFFECTIVE_STATUS="A" if a % 5 else "I",
                        EFFECTIVE_DATE=d,
                    )
                )
            # tie at the max date: one identical projection (collapses via
            # DISTINCT), plus for even advisors a differing-plan row (both
            # survive)
            ia_rows.append(dict(ia_rows[-1]))
            if a % 2 == 0:
                tie = dict(ia_rows[-1])
                tie["ACADEMIC_PLAN"] = "PLANX"
                tie["ACADEMIC_PLAN_DESCR"] = "Plan X"
                ia_rows.append(tie)
    tables["instructor_advisors"] = pd.DataFrame(ia_rows)

    # -- instructor_updates (§7) + assigned_instructors (§8)
    up_rows, asg_rows = [], []
    for term in active_terms:
        for c in range(20):
            course = f"CRS{c:03d}"
            for snum in ["001", "100", "101"]:
                sec_id = (
                    f"S{term}{c:03d}P" if snum == "001" else f"S{term}{c:03d}{int(snum)-100}"
                )
                uid = f"{300000 + c}"
                asg_rows.append(
                    dict(
                        **{
                            "cs-course-id": course,
                            "term-id": term,
                            "session-id": "1",
                            "offeringNumber": 1,
                            "number": snum,
                            "campus-uid": uid,
                            "role-code": rng.choice(["PI", "TNIC"]),
                            "formattedName": f"  Prof {c:03d}  ",
                        }
                    )
                )
                if rng.random() < 0.8:
                    up_rows.append(
                        dict(
                            instr_id=f"I{c:03d}",
                            term_id=term,
                            class_section_id=sec_id,
                            crse_id=course,
                            session_code="1",
                            crse_offer_nbr=1,
                            class_section=snum,
                            change_type=rng.choice(["C", "U", "D"]),
                            last_updated=_ts_around_cutoff(rng),
                        )
                    )
    tables["instructor_updates"] = pd.DataFrame(up_rows)
    tables["assigned_instructors"] = pd.DataFrame(asg_rows)

    # -- courses_flat (§9): BCOURSESV00_VW denormalized rows
    cf_rows = []
    catalog_forms = ["103", "C103", "39B", "C103B", " 24 ", "1A", "R1B"]
    day_combos = [
        ("Y", None, "Y", None, "Y", None, None),
        (None, "Y", None, "Y", None, None, None),
        ("Y", "Y", "Y", "Y", "Y", None, None),
        (None, None, None, None, None, "Y", "Y"),
        (None, None, None, None, None, None, None),
    ]
    for term in active_terms:
        for c in range(100):
            mon, tues, wed, thurs, fri, sat, sun = day_combos[c % len(day_combos)]
            start = datetime(2024, 1, 1, 8 + (c % 10), 30 * (c % 2))
            cf_rows.append(
                dict(
                    CLASS_NBR=10000 + c,
                    STRM=term,
                    SESSION_CODE="1",
                    SUBJECT=f"SUBJ{c % 7}",
                    ACAD_CAREER=rng.choice(["UGRD", "GRAD"]),
                    SCHEDULE_PRINT="Y",
                    PRIMARY_FLAG="Y" if c % 3 else "N",
                    SSR_COMPONENT=rng.choice(["LEC", "DIS"]),
                    CLASS_NBR_1=20000 + c,
                    DISPLAY_NAME=f"  SUBJ{c % 7} {catalog_forms[c % len(catalog_forms)]} ",
                    CLASS_SECTION=f"{c % 4:03d}",
                    CATALOG_NBR=catalog_forms[c % len(catalog_forms)],
                    EFFDT=date(2023, 1, 1) + timedelta(days=c),
                    CRSE_ID=f"CRSE{c:04d}",
                    ENRL_TOT=rng.randrange(0, 300),
                    ENRL_CAP=300,
                    WAIT_CAP=30,
                    START_DT=TERM_BEGINS[term],
                    END_DT=TERM_BEGINS[term] + timedelta(days=100),
                    CAMPUS_ID=f"{300000 + c}",
                    NAME_PREFIX=rng.choice(["Dr", None]),
                    FIRST_NAME=f" First{c} ",
                    MIDDLE_NAME="  " if c % 5 == 3 else (None if c % 2 else f"M{c}"),
                    LAST_NAME=f" Last{c} ",
                    NAME_SUFFIX=rng.choice(["Jr", None]),
                    INSTR_ROLE="PI",
                    DESCR=f"Hall {c % 9}",
                    MON=mon, TUES=tues, WED=wed, THURS=thurs,
                    FRI=fri, SAT=sat, SUN=sun,
                    MEETING_TIME_START=start,
                    MEETING_TIME_END=start + timedelta(minutes=80),
                    START_DATE=TERM_BEGINS[term],
                    END_DATE=TERM_BEGINS[term] + timedelta(days=100),
                    COURSE_TITLE_LONG=f"Long\ntitle\rfor {c} ",
                    COURSE_TITLE=f"Title {c}",
                    INSTRUCTION_MODE="P",
                )
            )
    # duplicates → DISTINCT observable
    cf = pd.DataFrame(cf_rows)
    tables["courses_flat"] = pd.concat([cf, cf.head(4)], ignore_index=True)

    # -- courses_catalog (§10) + xlat (§11) + meetings (§12)
    cat_rows, xlat_rows = [], []
    for c in range(20):
        course = f"CRS{c:03d}"
        display = f"SUBJ {course}"
        xlat_rows.append(
            dict(classDisplayName=display, courseDisplayName=f"CAT {course}")
            if c % 5
            else dict(classDisplayName=f"ORPHAN {c}", courseDisplayName=f"NOPE {c}")
        )
        for v, upd in enumerate(
            [datetime(2020, 3, 1), datetime(2022, 3, 1), datetime(1901, 1, 1)]
        ):
            cat_rows.append(
                dict(
                    **{
                        "displayName": f"CAT {course}",
                        "subjectArea": f"SUBJ{c % 7}",
                        "classSubjectArea": f"SUBJ{c % 7}",
                        "academicCareer-code": "UGRD",
                        "catalogNumber-formatted": f"C{c}",
                        "catalogNumber-number": str(c),
                        "catalogNumber-prefix": "C",
                        "catalogNumber-suffix": "",
                        "title": f" Catalog title {c} ",
                        "transcriptTitle": f"CT {c}",
                        "updatedDate": upd,
                        "cms-version-independent-id": f"CMS{c:03d}",
                        "fromDate": "2019-01-01" if v < 2 else "2030-01-01",
                        "toDate": "2030-12-31" if v < 2 else "2031-12-31",
                    }
                )
            )
    tables["courses_catalog"] = pd.DataFrame(cat_rows)
    tables["xlat"] = pd.DataFrame(xlat_rows)

    mtg_rows = []
    for term in active_terms:
        for c in range(20):
            course = f"CRS{c:03d}"
            n_meet = c % 3  # 0, 1 or 2 meetings
            for m in range(n_meet):
                mtg_rows.append(
                    dict(
                        **{
                            "cs-course-id": course,
                            "term-id": term,
                            "session-id": "1",
                            "offeringNumber": 1,
                            "sectionNumber": "001",
                            "location-descr": f"Room {c}-{m}",
                            "meetsDays": "MOWEFR",
                            "startTime": "09:00",
                            "endTime": "10:30",
                            "startDate": TERM_BEGINS[term],
                            "endDate": TERM_BEGINS[term] + timedelta(days=100),
                        }
                    )
                )
    tables["meetings"] = pd.DataFrame(mtg_rows)

    for name, df in tables.items():
        # µs timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS)
        df.to_parquet(
            f"{out_dir}/{name}.parquet",
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    return tables
