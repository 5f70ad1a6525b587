#!/usr/bin/env python
"""Physical-plan anti-pattern sweep over the ENTIRE query registry.

For every registered query (driver-facing AND registry-only), build its
DataFrame at the given scale factor and grep the formatted physical
plan for the anti-patterns the scale contract forbids:

  * ``CartesianProduct``          — a non-broadcast cross join: O(n*m)
                                    at corpus scale, never acceptable;
  * ``BatchEvalPython``           — row-at-a-time Python UDF in the
                                    plan (the sanctioned Python paths
                                    are Arrow-batched: ArrowEvalPython
                                    / MapInPandas / FlatMapGroupsInPandas);
  * broadcast of an unbounded side — not grep-detectable generically;
    covered by the per-operator plan tests instead.

Also counted per query (informational, not failures):

  * ``Exchange``                  — shuffles: the number to WATCH when
                                    a plan changes across rounds;
  * ``BroadcastNestedLoopJoin``   — accepted ONLY for the deliberate
                                    1-row/bounded-side cross joins
                                    (totals frames, centroid arrays,
                                    model metadata); listed so a new
                                    unbounded one is visible;
  * ``ArrowEvalPython`` / ``MapInPandas`` — the sanctioned Python
                                    boundary (codec/as-of), listed to
                                    keep its footprint visible.

Exit 1 when any hard anti-pattern appears. Usage:

    python scripts/plan_audit.py [--sf-dir /root/testdata/sf0.001] [name ...]

Note: a few builders run real jobs at build time (connected-components
rounds, incremental-index seeds) — the audit executes them at the tiny
default SF; plan capture itself never executes the returned frame.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import re
import sys

sys.path.insert(0, "/root/repo")

HARD = ("CartesianProduct", "BatchEvalPython")
WATCH = (
    "Exchange",
    "BroadcastNestedLoopJoin",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "SortMergeJoin",
    "BroadcastHashJoin",
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> dict[str, int]:
    # formatted explain prints each node in the tree AND a numbered
    # detail block — count only the numbered detail entries.
    counts: dict[str, int] = {}
    for node in HARD + WATCH:
        counts[node] = len(re.findall(rf"\(\d+\) {node}", plan))
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from jonesy_spark.plans import all_queries
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", shuffle_partitions=8)
    queries = all_queries()
    names = args.names or sorted(queries)

    failures: list[str] = []
    rows = []
    for name in names:
        try:
            counts = audit(plan_of(queries[name](spark, args.sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            continue
        bad = {k: v for k, v in counts.items() if k in HARD and v}
        if bad:
            failures.append(name)
        rows.append({"query": name, **counts})
        flags = " ".join(f"{k}={v}" for k, v in counts.items() if v)
        print(f"{'FAIL' if bad else 'ok  '} {name}: {flags}")

    total = {k: sum(r[k] for r in rows) for k in HARD + WATCH}
    print(json.dumps({"queries": len(rows), "totals": total, "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
