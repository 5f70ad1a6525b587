#!/usr/bin/env python
"""Price the COMPOSED crawl-intake job end-to-end at the sf1 tier
(VERDICT r11 #1): the r11 round tested `pipeline.intake.intake_batch`
for parity and idempotence but never measured the composition as a
whole at scale. This probe:

  1. seeds an sf1-scale WARC landing set (the 50k-doc key-shifted
     replica corpus from scripts/gen_sf1.py, wrapped in the job's
     HTML-bodied fixture markup, packed into real .warc.gz archives);
  2. runs ``JOB=crawl_intake`` against it (the REGISTERED job, via
     run_job — not a re-implementation) and records wall + the full
     per-stage accounting from the manifest;
  3. prices the persist point: times the quarantine PARSE alone on the
     same archives — if the three sinks (novel docs, quarantine,
     digest index) re-decompressed per sink, the composed wall would
     sit at >= 3x the parse wall; the measured ratio is the evidence;
  4. re-runs the job same-day (idempotent overwrite) and next-day over
     unchanged archives (zero novel) — the two convergence walls;
  5. kills the STREAMING twin mid-drain over the same landing set and
     resumes it from the checkpoint, then verifies the folded
     accounting report equals the landed corpus (ledger-fold
     equality through a crash).

Output: one JSON line per leg + a summary line (paste target:
SCALE.md round-12 section). Read-only on /root/testdata; everything
else under /tmp (regenerable, never committed).

Usage: python scripts/intake_probe.py [--docs /tmp/jonesy_sf1/documents.parquet]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/jonesy_intake_sf1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="/tmp/jonesy_sf1/documents.parquet")
    args = ap.parse_args()

    from datetime import date

    from pyspark.sql import functions as F

    from jonesy_spark.pipeline import warc as W
    from jonesy_spark.pipeline.jobs import JobContext, run_job
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="intake_probe")

    if not os.path.exists(args.docs):
        raise SystemExit(
            f"{args.docs} missing — run scripts/gen_sf1.py first"
        )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    src = f"{WORK}/raw_archives"

    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()
    # the job's fixture shape: minimal markup + two stop words so the
    # Gopher PASS branch carries data (jobs._crawl_intake)
    fixture = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"),
            F.col("text"),
            F.lit(" the of</p></body></html>"),
        ).alias("text"),
    )
    t0 = time.time()
    W.write_fixture_archives(fixture, src, n_archives=16)
    seed_wall = round(time.time() - t0, 2)
    n_bytes = sum(
        os.path.getsize(p) for p in glob.glob(f"{src}/*.warc.gz")
    )
    print(
        json.dumps(
            {
                "leg": "seed",
                "n_docs": n_docs,
                "n_archives": 16,
                "archive_bytes": n_bytes,
                "wall_s": seed_wall,
            }
        ),
        flush=True,
    )

    # ---- leg 1: the PARSE alone (the persist-point yardstick) -------
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(src)
        .select(
            F.col("path").alias("archive_id"),
            F.col("content").alias("payload"),
        )
    )
    t0 = time.time()
    n_parsed = W.warc_records_quarantined(raw).count()
    parse_wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {"leg": "parse_only", "n_records": n_parsed, "wall_s": parse_wall}
        ),
        flush=True,
    )

    # ---- leg 2: the registered job, cold -> same-day -> next-day ----
    os.environ["WARC_SRC"] = src
    try:
        job_root = f"{WORK}/job"
        walls = {}
        for tag, day in (
            ("cold", date(2026, 8, 1)),
            ("same_day_rerun", date(2026, 8, 1)),
            ("next_day_no_novel", date(2026, 8, 2)),
        ):
            ctx = JobContext(
                spark, "/root/testdata/sf0.001", job_root, [], run_date=day
            )
            t0 = time.time()
            run_job("crawl_intake", ctx)
            walls[tag] = round(time.time() - t0, 2)
        manifest = json.loads(
            open(f"{job_root}/crawl_intake/_MANIFEST.json").read()
        )
        landed = spark.read.parquet(
            f"{job_root}/crawl_intake/documents"
        ).count()
        print(
            json.dumps(
                {
                    "leg": "job",
                    "walls_s": walls,
                    "composed_over_parse": round(
                        walls["cold"] / parse_wall, 2
                    ),
                    "intake_last_run": manifest["intake"],
                    "docs_landed": landed,
                }
            ),
            flush=True,
        )
    finally:
        del os.environ["WARC_SRC"]

    # ---- leg 3: streaming twin, killed mid-drain, resumed -----------
    from jonesy_spark.streaming.incremental import run_crawl_intake_stream

    sdest = f"{WORK}/stream/corpus"
    sindex = f"{WORK}/stream/digest_index"
    sckpt = f"{WORK}/stream/ckpt"
    t0 = time.time()
    q = run_crawl_intake_stream(
        spark, src, sdest, sindex, sckpt,
        max_files_per_trigger=2, blocking=False,
    )
    kill_after = 3
    while (
        q.isActive
        and len(glob.glob(f"{sdest}/_report/ingest_batch=*")) < kill_after
    ):
        time.sleep(0.3)
    interrupted = q.isActive
    q.stop()
    kill_wall = round(time.time() - t0, 2)
    landed_mid = len(glob.glob(f"{sdest}/ingest_batch=*"))
    t0 = time.time()
    run_crawl_intake_stream(
        spark, src, sdest, sindex, sckpt,
        max_files_per_trigger=2, blocking=True,
    )
    resume_wall = round(time.time() - t0, 2)

    corpus = spark.read.parquet(sdest)
    n_stream = corpus.count()
    n_distinct = corpus.select("doc_id").distinct().count()
    rep = spark.read.parquet(f"{sdest}/_report")
    fold = rep.agg(
        F.sum("n_extracted").alias("x"),
        F.sum("n_kept").alias("k"),
        F.sum("n_novel").alias("n"),
    ).collect()[0]
    ok = (
        interrupted
        and n_stream == n_distinct == int(fold["n"])
        and n_stream == landed
    )
    print(
        json.dumps(
            {
                "leg": "stream_kill_resume",
                "interrupted_while_active": interrupted,
                "epochs_before_kill": kill_after,
                "docs_before_kill": landed_mid,
                "kill_wall_s": kill_wall,
                "resume_wall_s": resume_wall,
                "docs_streamed": n_stream,
                "report_fold": {
                    "n_extracted": int(fold["x"]),
                    "n_kept": int(fold["k"]),
                    "n_novel": int(fold["n"]),
                },
                "fold_equals_corpus_equals_batch": ok,
            }
        ),
        flush=True,
    )
    if not ok:
        raise SystemExit("ledger-fold equality FAILED")


if __name__ == "__main__":
    main()
