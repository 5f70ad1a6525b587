#!/usr/bin/env python
"""Driver-witness coverage ledger: which registry queries have EVER
had a green driver CORRECTNESS row, which are witnessed only by the
pytest/differential tier, and which are in tonight's roster.

The driver checks at most 50 queries per round, so driver coverage of
the full registry accrues by ROTATION (plans/__init__.py documents
each swap). This script makes the accrued union mechanical instead of
a prose claim: it unions every CORRECTNESS_r*.json in the repo root
with the current driver-facing roster and prints per-query status.

Usage: python scripts/coverage_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from jonesy_spark.plans import all_oracle_sql, all_queries, driver_queries

    registry = set(all_queries())
    oracles = set(all_oracle_sql())
    roster = set(driver_queries())

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
    raise SystemExit(main())
