#!/usr/bin/env python
"""Decade scale probe: time registry queries at an arbitrary SF dir
(default the synthesized /tmp/jonesy_sf1 from gen_sf1.py) under the
bench harness's timing discipline (noop sink, cache cleared per run,
min-of-RUNS steady state) and print one JSON line per query plus a
summary — the measured-scaling record SCALE.md cites (VERDICT r8 #6).

Usage:
    python scripts/gen_sf1.py
    python scripts/scale_probe.py [--sf-dir /tmp/jonesy_sf1]
        [--runs 2] [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

#: Default probe set: the most expensive bench rows (the banded
#: self-joins whose candidate sets could grow superlinearly on skew,
#: the PQ tier, the heaviest Arrow codec boundary, the persisted-index
#: probe) plus the corpus-pipeline rows (global budget cut, classifier
#: train+score).
DEFAULT_PROBE = [
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "prefix_jaccard_join",
    "dedup_clusters",
    "ann_pq_topk",
    "multimodal_video_codec",
    "incremental_near_dup",
    "token_budget_prune",
    "quality_classifier",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/jonesy_sf1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from jonesy_spark.operators.dedup import release_caches
    from jonesy_spark.plans import all_queries
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    queries = all_queries()
    names = args.names or DEFAULT_PROBE

    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").limit(1).count()

    def calibrate() -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            spark.read.parquet(
                f"{args.sf_dir}/lineitem.parquet"
            ).groupBy("l_returnflag").count().write.mode(
                "overwrite"
            ).format("noop").save()
            ts.append(time.time() - t0)
        return round(min(ts), 3)

    cal = calibrate()
    results = {}
    for name in names:
        runs = []
        rows = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = queries[name](spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.time() - t0)
            if rows is None:
                rows = df.count()
            release_caches(df)
        results[name] = {
            "cold": round(runs[0], 2),
            "steady": round(min(runs), 2),
            "rows": rows,
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "calibration": cal,
                "steady_total": round(
                    sum(r["steady"] for r in results.values()), 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
