#!/usr/bin/env python
"""Driver-witness coverage ledger: which registry queries have EVER
had a green driver CORRECTNESS row, which are witnessed only by the
pytest/differential tier, and which are in tonight's roster.

The driver checks at most 50 queries per round, so driver coverage of
the full registry accrues by ROTATION (plans/__init__.py documents
each swap). This script makes the accrued union mechanical instead of
a prose claim: it unions every CORRECTNESS_r*.json in the repo root
with the current driver-facing roster and prints per-query status.

Usage: python scripts/coverage_ledger.py [--staleness]

``--staleness`` prints the PARITY.md witness-staleness table instead
(r9 verdict #8): per registry row, the last green driver round, its
age in rounds relative to the round being built (max seen + 1), and
the action the staleness rule requires — ``on roster`` (re-admitted
this round), ``fresh`` (< 4 rounds old), ``REVIEW`` (>= 4 rounds old
and excluded: its DRIVER_EXCLUDED justification must be re-reviewed
this round), or ``pytest-only``/``queued`` for never-witnessed rows.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def collect_witnesses() -> dict[str, list[str]]:
    """name -> sorted round tags ('r01'..) with a fully-green driver
    row, unioned over every CORRECTNESS_r*.json in the repo root."""
    witnessed: dict[str, list[str]] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
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


def staleness_rows() -> tuple[int, list[tuple[str, str, object, str]]]:
    """(current_round, [(name, last_green, age, action)]) — the data
    behind PARITY.md's staleness table, derived ONLY from the
    CORRECTNESS files plus the live registry/roster."""
    from jonesy_spark.plans import all_oracle_sql, all_queries, driver_queries

    witnessed = collect_witnesses()
    seen_rounds = [
        int(os.path.basename(p).removesuffix(".json").removeprefix("CORRECTNESS_r"))
        for p in glob.glob("/root/repo/CORRECTNESS_r*.json")
    ]
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


def print_staleness() -> int:
    current, rows = staleness_rows()
    print(f"| query | last driver green | age (rounds, vs r{current}) | action |")
    print("|---|---|---|---|")
    for name, last, age, action in rows:
        print(f"| {name} | {last} | {age if age is not None else '—'} | {action} |")
    n_review = sum(1 for r in rows if r[3] == "REVIEW")
    print(
        f"\n{len(rows)} registry rows; {n_review} at the >=4-round review "
        "line this round."
    )
    return 0


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
    if "--staleness" in sys.argv:
        raise SystemExit(print_staleness())
    raise SystemExit(main())
