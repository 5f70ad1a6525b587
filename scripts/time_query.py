#!/usr/bin/env python
"""A/B timing harness for single queries: replicates bench.py's
methodology (noop sink, cache cleared per run, warm-min over repeats,
converged-warm ramp chase) for a subset of queries, so optimization
changes can be priced without a full bench pass.

Usage:  python scripts/time_query.py [-n RUNS] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--runs", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from jonesy_spark.operators.dedup import release_caches
    from jonesy_spark.plans import all_queries
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="time_query")
    queries = all_queries()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        release_caches(df)
        return dt

    for name in args.names:
        runs = [run_once(name) for _ in range(args.runs)]
        warm = min(runs[1:]) if len(runs) > 1 else runs[0]
        print(
            f"{name}: cold={runs[0]:.2f} warm_min={warm:.2f} "
            f"runs={[round(r, 2) for r in runs]}"
        )


if __name__ == "__main__":
    main()
