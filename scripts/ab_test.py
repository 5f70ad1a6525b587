#!/usr/bin/env python
"""Same-session A/B harness: times a query alternating between the
current code ("on") and a neutralized variant ("off") — spread() as
identity and/or DataFrame.persist as no-op — so machine-window drift
cancels (interleaved runs, shared JIT state).

Usage: python scripts/ab_test.py [-n ROUNDS] [--no-spread] [--no-persist] name
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
    ap.add_argument("-n", "--rounds", type=int, default=5)
    ap.add_argument("--no-spread", action="store_true")
    ap.add_argument("--no-persist", action="store_true")
    ap.add_argument("name")
    args = ap.parse_args()

    from pyspark.sql import DataFrame

    import jonesy_spark.catalog as cat
    import jonesy_spark.plans.llm_queries as llm
    from jonesy_spark.operators.dedup import release_caches
    from jonesy_spark.plans import all_queries
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="ab_test")
    queries = all_queries()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).count()

    real_spread = cat.spread
    real_persist = DataFrame.persist

    def set_off() -> None:
        if args.no_spread:
            cat.spread = lambda df, *c: df
            llm.spread = cat.spread
        if args.no_persist:
            DataFrame.persist = lambda self, *a, **k: self

    def set_on() -> None:
        cat.spread = real_spread
        llm.spread = real_spread
        DataFrame.persist = real_persist

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        release_caches(df)
        return dt

    on, off = [], []
    # warm both variants once before timing
    set_on(); run_once(args.name)
    set_off(); run_once(args.name)
    for _ in range(args.rounds):
        set_on(); on.append(run_once(args.name))
        set_off(); off.append(run_once(args.name))
    set_on()
    fmt = lambda xs: f"min={min(xs):.2f} med={sorted(xs)[len(xs)//2]:.2f} {[round(x,2) for x in xs]}"  # noqa: E731
    print(f"ON  (current code): {fmt(on)}")
    print(f"OFF (neutralized):  {fmt(off)}")


if __name__ == "__main__":
    main()
