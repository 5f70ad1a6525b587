#!/usr/bin/env python
"""Driver-witness coverage ledger: which registry queries have EVER
had a green driver CORRECTNESS row, which are witnessed only by the
pytest/differential tier, and which are in tonight's roster.

The driver checks at most 50 queries per round, so driver coverage of
the full registry accrues by ROTATION (plans/__init__.py documents
each swap). This script makes the accrued union mechanical instead of
a prose claim: it unions every CORRECTNESS_r*.json in the repo root
with the current driver-facing roster and prints per-query status.

Usage: python scripts/coverage_ledger.py [--staleness [--check]] [--parity [--check]] [--floor]

``--staleness`` prints the PARITY.md witness-staleness table instead
(r9 verdict #8): per registry row, the last green driver round, its
age in rounds relative to the round being built (max seen + 1), and
the action the staleness rule requires — ``on roster`` (re-admitted
this round), ``fresh`` (< 4 rounds old), ``REVIEW`` (>= 4 rounds old
and excluded: its DRIVER_EXCLUDED justification must be re-reviewed
this round), or ``pytest-only``/``queued`` for never-witnessed rows.

``--staleness --check`` exits nonzero if PARITY.md's committed table
(between the STALENESS-TABLE markers) differs from the generated one
(r10 verdict #8: the table is generated, never pasted — drift between
the committed table and the CORRECTNESS files fails the suite).

``--floor`` prints the rotation-floor queue (r10 verdict #1): the
FLOOR_K oldest-witnessed oracle-ready rows, which the current roster
MUST include (enforced by tests/test_rotation.py) — so every row
re-earns a driver green on a bounded schedule instead of aging
unboundedly behind valid-but-stale cover entries.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

#: Rotation floor (r10 verdict #1): every round's roster must include
#: the FLOOR_K oldest-witnessed oracle-ready rows (never-witnessed
#: counts as oldest, so brand-new oracle-ready rows take first-witness
#: slots immediately). 131 rows / 50 slots at 16 forced swaps a round
#: bounds every row's witness age (raised 12 -> 16 per VERDICT r11 #2).
FLOOR_K = 16

#: Repo root — a module attribute (not inlined) so the round-boundary
#: simulation test can point the ledger at a sandbox tree containing a
#: CORRECTNESS file newer than the committed PARITY.md (r12 verdict #1).
ROOT = "/root/repo"

STALENESS_BEGIN = "<!-- STALENESS-TABLE-BEGIN (generated) -->"
STALENESS_END = "<!-- STALENESS-TABLE-END -->"


def _parity_md() -> str:
    return os.path.join(ROOT, "PARITY.md")


def _round_of(path: str) -> int:
    return int(os.path.basename(path).removesuffix(".json").removeprefix("CORRECTNESS_r"))


def _correctness_files(as_built: bool = False, up_to: int | None = None) -> list[str]:
    """CORRECTNESS_r*.json paths, oldest first.

    With ``up_to=N``, drop every file from a round > N — the cap the
    generated PARITY blocks embed so the round-boundary drift guard
    regenerates against the SAME file set the committed block was
    built from (r12 verdict #1): the driver landing a new CORRECTNESS
    file after the builder's last commit must not flip witness tags
    out from under the committed document.

    With ``as_built=True``, drop the newest file IF its key set equals
    the current roster: the driver writes exactly the roster's rows
    each round, so key-set equality means that file is the CURRENT
    roster's own landing — the floor decisions were made against the
    files BEFORE it. Measuring this way keeps the committed roster
    green through exactly one driver landing (the same convention as
    the cadence test), going red only on the next build, when the next
    floor batch can actually be admitted."""
    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if up_to is not None:
        files = [p for p in files if _round_of(p) <= up_to]
    if as_built and files:
        from jonesy_spark.plans import driver_queries

        with open(files[-1]) as f:
            latest_keys = set(json.load(f))
        if latest_keys == set(driver_queries()):
            files = files[:-1]
    return files


def latest_round_on_disk() -> int:
    """Max round among CORRECTNESS files (0 if none) — the default cap
    stamped into freshly generated PARITY blocks."""
    files = _correctness_files()
    return _round_of(files[-1]) if files else 0


def collect_witnesses(as_built: bool = False, up_to: int | None = None) -> dict[str, list[str]]:
    """name -> sorted round tags ('r01'..) with a fully-green driver
    row, unioned over every CORRECTNESS_r*.json in the repo root."""
    witnessed: dict[str, list[str]] = {}
    for path in _correctness_files(as_built=as_built, up_to=up_to):
        rnd = os.path.basename(path).removesuffix(".json").removeprefix("CORRECTNESS_")
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                witnessed.setdefault(name, []).append(rnd)
    return witnessed


def floor_due(k: int = FLOOR_K) -> list[str]:
    """The k oldest-witnessed oracle-ready registry rows as of the
    file set the current roster was built against (never-witnessed
    first, then by last green round, ties by name) — the rows the
    rotation floor requires ON the roster this round."""
    from jonesy_spark.plans import all_oracle_sql, all_queries

    witnessed = collect_witnesses(as_built=True)
    last: dict[str, int] = {
        name: max(int(r.removeprefix("r")) for r in rounds)
        for name, rounds in witnessed.items()
    }
    ready = sorted(
        set(all_queries()) & set(all_oracle_sql()),
        key=lambda n: (last.get(n, 0), n),
    )
    return ready[:k]


def staleness_rows(up_to: int | None = None) -> tuple[int, list[tuple[str, str, object, str]]]:
    """(current_round, [(name, last_green, age, action)]) — the data
    behind PARITY.md's staleness table, derived ONLY from the
    CORRECTNESS files (capped at ``up_to`` when given) plus the live
    registry/roster."""
    from jonesy_spark.plans import all_oracle_sql, all_queries, driver_queries

    witnessed = collect_witnesses(up_to=up_to)
    seen_rounds = [_round_of(p) for p in _correctness_files(up_to=up_to)]
    current = (max(seen_rounds) + 1) if seen_rounds else 1
    registry = set(all_queries())
    oracles = set(all_oracle_sql())
    roster = set(driver_queries())

    out = []
    for name in sorted(registry):
        rounds = witnessed.get(name, [])
        last = max(int(r.removeprefix("r")) for r in rounds) if rounds else None
        age = (current - last) if last is not None else None
        if name in roster:
            action = "on roster"
        elif last is None:
            action = "pytest-only" if name not in oracles else "queued"
        elif age >= 4:
            action = "REVIEW"
        else:
            action = "fresh"
        out.append((name, f"r{last:02d}" if last else "—", age, action))
    return current, out


def staleness_table(up_to: int | None = None) -> str:
    """The exact text committed to PARITY.md between the markers.

    The block's first line records the CORRECTNESS-file cap it was
    generated from; the drift test regenerates AT that cap, so a
    driver file landing after the builder's last commit cannot flip
    the committed table red (r12 verdict #1). Membership, exclusion,
    and cover drift still fail: those come from the live registry."""
    if up_to is None:
        up_to = latest_round_on_disk()
    current, rows = staleness_rows(up_to=up_to)
    lines = [
        STALENESS_BEGIN,
        f"Witness tags from CORRECTNESS files through r{up_to:02d}.",
        "",
        f"| query | last driver green | age (rounds, vs r{current}) | action |",
        "|---|---|---|---|",
    ]
    for name, last, age, action in rows:
        lines.append(
            f"| {name} | {last} | {age if age is not None else '—'} | {action} |"
        )
    n_review = sum(1 for r in rows if r[3] == "REVIEW")
    lines.append("")
    lines.append(
        f"{len(rows)} registry rows; {n_review} at the >=4-round review "
        "line this round."
    )
    lines.append(STALENESS_END)
    return "\n".join(lines)


PARITY_BEGIN = "<!-- PARITY-ROSTER-BEGIN (generated) -->"
PARITY_END = "<!-- PARITY-ROSTER-END -->"


def parity_table(up_to: int | None = None) -> str:
    """The generated roster/exclusion witness map (r11 verdict #8):
    PARITY.md's per-family tables are derived from the live registry
    metadata (DRIVER_EXCLUDED / EXCLUSION_COVERS / PYTEST_ONLY_BY_
    DESIGN) plus the CORRECTNESS files — the same facts the rotation
    tests enforce — so the committed document cannot drift into prose
    the machinery no longer proves. Hand-written text in PARITY.md is
    design rationale only; this table is the inventory.

    The block's first line records the CORRECTNESS-file cap it was
    generated from; the drift test regenerates AT that cap (r12
    verdict #1), so the driver landing a post-commit CORRECTNESS file
    only shifts witness-recency tags — which the committed block
    explicitly scopes out — while membership/exclusion/cover drift
    (live-registry facts) still fails the suite."""
    from jonesy_spark.plans import (
        DRIVER_EXCLUDED,
        EXCLUSION_COVERS,
        PYTEST_ONLY_BY_DESIGN,
        driver_queries,
    )

    if up_to is None:
        up_to = latest_round_on_disk()
    witnessed = collect_witnesses(up_to=up_to)
    last = {
        name: max(int(r.removeprefix("r")) for r in rounds)
        for name, rounds in witnessed.items()
    }
    roster = set(driver_queries())

    def tag(name: str) -> str:
        return f"r{last[name]:02d}" if name in last else "new"

    lines = [PARITY_BEGIN]
    lines.append(f"Witness tags from CORRECTNESS files through r{up_to:02d}.")
    lines.append("")
    lines.append(
        f"**Driver roster ({len(roster)} rows, last green in parens):** "
        + ", ".join(f"`{n}` ({tag(n)})" for n in sorted(roster))
    )
    lines.append("")
    lines.append(
        "| excluded row | own last green | family witnessed via |"
    )
    lines.append("|---|---|---|")
    n_pytest_only = 0
    for name in sorted(DRIVER_EXCLUDED):
        own = tag(name) if name in last else "—"
        if name in PYTEST_ONLY_BY_DESIGN:
            via = "pytest-only by design (documented in plans/__init__.py)"
            n_pytest_only += 1
        else:
            covers = EXCLUSION_COVERS.get(name, ())
            via = ", ".join(
                f"`{c}` ({'roster' if c in roster else tag(c)})"
                for c in covers
            )
        lines.append(f"| `{name}` | {own} | {via} |")
    lines.append("")
    lines.append(
        f"{len(DRIVER_EXCLUDED)} excluded rows: "
        f"{n_pytest_only} pytest-only by design, "
        f"{len(DRIVER_EXCLUDED) - n_pytest_only} with family covers "
        "(each enforced on-roster-or-within-cadence by "
        "tests/test_rotation.py)."
    )
    lines.append(PARITY_END)
    return "\n".join(lines)


SURVEY_BEGIN = "<!-- SURVEY-MAP-BEGIN (generated) -->"
SURVEY_END = "<!-- SURVEY-MAP-END -->"


def survey_table() -> str:
    """PARITY.md's §2 / LLM-capability inventory, rendered from
    ``plans.survey_map`` (VERDICT r12 #8): the tables live as data
    next to the registry they cite, every cited registry row is
    validated live, and the committed doc is a render, not prose."""
    from jonesy_spark.plans import all_queries, survey_map

    registry = set(all_queries())
    missing = sorted(survey_map.REGISTRY_REFS - registry)
    if missing:
        raise SystemExit(
            f"survey_map cites registry rows that no longer exist: {missing} "
            "— fix the TABLES text (a rename must be propagated here)"
        )
    lines = [SURVEY_BEGIN]
    lines.extend(survey_map.TABLES)
    lines.append("")
    lines.append(
        f"{len(survey_map.REGISTRY_REFS)} registry rows cited across these "
        "tables, all validated against the live registry at render time "
        "(jonesy_spark/plans/survey_map.py; drift-tested by "
        "tests/test_rotation.py)."
    )
    lines.append(SURVEY_END)
    return "\n".join(lines)


def survey_refs_from_tables() -> frozenset[str]:
    """Recompute REGISTRY_REFS from the TABLES text — the no-rot half
    of the survey-map invariant pair."""
    import re

    from jonesy_spark.plans import all_queries, survey_map

    registry = set(all_queries())
    return frozenset(
        tok
        for line in survey_map.TABLES
        for tok in re.findall(r"`([a-z0-9_]+)`", line)
        if tok in registry
    )


def committed_survey_table() -> str | None:
    return _committed_block(SURVEY_BEGIN, SURVEY_END)


def check_survey() -> int:
    got = committed_survey_table()
    want = survey_table()
    if got is None:
        print("PARITY.md: SURVEY-MAP markers not found", file=sys.stderr)
        return 2
    if got != want:
        print(
            "PARITY.md survey map is stale — regenerate with:\n"
            "  python scripts/coverage_ledger.py --survey --write",
            file=sys.stderr,
        )
        return 1
    print("PARITY.md survey map matches the generated one")
    return 0


def _committed_block(begin: str, end: str) -> str | None:
    try:
        with open(_parity_md()) as f:
            text = f.read()
    except OSError:
        return None
    b = text.find(begin)
    e = text.find(end)
    if b < 0 or e < 0:
        return None
    return text[b : e + len(end)]


def committed_cap(block: str | None) -> int | None:
    """The CORRECTNESS-file cap a committed block was generated at
    (its 'through rNN' stamp), or None for a pre-r13 block without
    one — the check then regenerates uncapped, preserving the old
    byte-for-byte semantics for legacy documents."""
    import re

    if block is None:
        return None
    # Anchored to the stamp LINE (ADVICE r13): a future generated table
    # cell or action text containing 'through rNN.' must not be misread
    # as the cap, which would silently regenerate the drift guard
    # against the wrong file set.
    m = re.search(
        r"^Witness tags from CORRECTNESS files through r(\d+)\.$",
        block,
        re.MULTILINE,
    )
    return int(m.group(1)) if m else None


def committed_parity_table() -> str | None:
    """PARITY.md's marker-delimited roster map, or None if absent."""
    return _committed_block(PARITY_BEGIN, PARITY_END)


def check_parity() -> int:
    """Exit 0 iff PARITY.md's committed roster map matches the one
    regenerated at the committed block's own CORRECTNESS cap
    (r11 verdict #8; cap semantics r12 verdict #1)."""
    got = committed_parity_table()
    want = parity_table(up_to=committed_cap(got))
    if got is None:
        print("PARITY.md: PARITY-ROSTER markers not found", file=sys.stderr)
        return 2
    if got != want:
        import difflib

        diff = difflib.unified_diff(
            got.splitlines(), want.splitlines(),
            "PARITY.md (committed)", "generated", lineterm="",
        )
        print("\n".join(diff), file=sys.stderr)
        print(
            "\nPARITY.md roster map is stale — regenerate with:\n"
            "  python scripts/coverage_ledger.py --parity",
            file=sys.stderr,
        )
        return 1
    print("PARITY.md roster map matches the generated one")
    return 0


def committed_staleness_table() -> str | None:
    """PARITY.md's marker-delimited table, or None if markers absent."""
    return _committed_block(STALENESS_BEGIN, STALENESS_END)


def check_staleness() -> int:
    """Exit 0 iff PARITY.md's committed table matches the one
    regenerated at the committed block's own CORRECTNESS cap
    (r10 verdict #8; cap semantics r12 verdict #1)."""
    got = committed_staleness_table()
    want = staleness_table(up_to=committed_cap(got))
    if got is None:
        print("PARITY.md: STALENESS-TABLE markers not found", file=sys.stderr)
        return 2
    if got != want:
        import difflib

        diff = difflib.unified_diff(
            got.splitlines(), want.splitlines(),
            "PARITY.md (committed)", "generated", lineterm="",
        )
        print("\n".join(diff), file=sys.stderr)
        print(
            "\nPARITY.md staleness table is stale — regenerate with:\n"
            "  python scripts/coverage_ledger.py --staleness",
            file=sys.stderr,
        )
        return 1
    print("PARITY.md staleness table matches the generated one")
    return 0


def write_block(begin: str, end: str, fresh: str) -> int:
    """Splice a freshly generated block between the markers in
    PARITY.md — the one-command regen step that must ride in the same
    commit as any roster/registry change (and, per ADVICE r12, in any
    commit that lands a CORRECTNESS_r*.json, though the cap stamp now
    makes that coupling a nicety rather than a suite-green
    requirement)."""
    with open(_parity_md()) as f:
        text = f.read()
    b = text.find(begin)
    e = text.find(end)
    if b < 0 or e < 0:
        print("PARITY.md markers not found", file=sys.stderr)
        return 2
    with open(_parity_md(), "w") as f:
        f.write(text[:b] + fresh + text[e + len(end):])
    print(f"PARITY.md block rewritten ({begin.strip('<!-> ')})")
    return 0


def print_staleness() -> int:
    print(staleness_table())
    return 0


def print_floor() -> int:
    from jonesy_spark.plans import driver_queries

    roster = set(driver_queries())
    due = floor_due()
    print(f"rotation-floor queue (FLOOR_K={FLOOR_K} oldest-witnessed oracle-ready):")
    ok = True
    for name in due:
        mark = "on roster" if name in roster else "MISSING FROM ROSTER"
        ok = ok and name in roster
        print(f"  {name:32s} {mark}")
    return 0 if ok else 1


def main() -> int:
    from jonesy_spark.plans import all_oracle_sql, all_queries, driver_queries

    registry = set(all_queries())
    oracles = set(all_oracle_sql())
    roster = set(driver_queries())

    witnessed = collect_witnesses()

    ever = set(witnessed) & registry
    never = registry - set(witnessed)
    stale = {n for n in witnessed if n not in registry}

    print(f"registry: {len(registry)} queries ({len(oracles)} with oracles)")
    print(f"driver-witnessed ever: {len(ever)}; never: {len(never)}; roster now: {len(roster)}")
    if stale:
        print(f"witnessed under names no longer registered: {sorted(stale)}")
    print()
    for name in sorted(registry):
        rounds = ",".join(witnessed.get(name, []))
        mark = "*" if name in roster else " "
        tier = rounds if rounds else ("oracle+pytest" if name in oracles else "pytest-only")
        print(f"  {mark} {name:32s} {tier}")
    print()
    print("* = in tonight's driver roster. Names with round lists have")
    print("accrued driver witnesses; 'oracle+pytest' rows await rotation;")
    print("'pytest-only' rows are the deliberate non-SQL-expressible ops.")
    tonight = sorted(n for n in never if n in roster)
    queue = sorted(n for n in never if n in oracles and n not in roster)
    print(f"in tonight's roster, first witness pending ({len(tonight)}): {', '.join(tonight)}")
    print(f"rotation queue after that ({len(queue)}): {', '.join(queue)}")
    return 0


if __name__ == "__main__":
    if "--staleness" in sys.argv and "--check" in sys.argv:
        raise SystemExit(check_staleness())
    if "--staleness" in sys.argv and "--write" in sys.argv:
        raise SystemExit(write_block(STALENESS_BEGIN, STALENESS_END, staleness_table()))
    if "--staleness" in sys.argv:
        raise SystemExit(print_staleness())
    if "--survey" in sys.argv and "--check" in sys.argv:
        raise SystemExit(check_survey())
    if "--survey" in sys.argv and "--write" in sys.argv:
        raise SystemExit(write_block(SURVEY_BEGIN, SURVEY_END, survey_table()))
    if "--survey" in sys.argv:
        print(survey_table())
        raise SystemExit(0)
    if "--parity" in sys.argv and "--check" in sys.argv:
        raise SystemExit(check_parity())
    if "--parity" in sys.argv and "--write" in sys.argv:
        raise SystemExit(write_block(PARITY_BEGIN, PARITY_END, parity_table()))
    if "--parity" in sys.argv:
        print(parity_table())
        raise SystemExit(0)
    if "--floor" in sys.argv:
        raise SystemExit(print_floor())
    raise SystemExit(main())
