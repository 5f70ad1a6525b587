"""Env-driven job entry point: ``JOB=upload_snapshot python -m
jonesy_spark``.

Mirrors the reference spine (``jonesy.py:7-16``): merge layered config
(shared < secret < environment), read the job name from ``JOB``, and
dispatch through the registry — unknown or missing names abort with the
known-job list. The cron wrappers under ``scripts/cron/`` (reference
``scripts/data-loch-*.sh:20``) invoke exactly this module.

Config keys (all overridable per layer):
  * ``JOB``        — registry name (required).
  * ``SF_DIR``     — input table directory (default
    ``/root/testdata/sf0.001``).
  * ``OUT_ROOT``   — local staging root for gzip CSV extracts.
  * ``TARGETS``    — comma-separated sink targets (default one local
    target under ``OUT_ROOT``; S3A targets use the assume-role conf
    from :func:`jonesy_spark.pipeline.sinks.s3a_assume_role_conf`).
"""

from __future__ import annotations

import sys
import tempfile

from .pipeline.jobs import JOBS, JobContext, layered_config, run_job
from .session import get_spark


def main(argv: list[str] | None = None, env: dict[str, str] | None = None) -> JobContext:
    cfg = layered_config(env=env)
    job = cfg.get("JOB", "")
    if job not in JOBS:  # fail before paying a Spark start-up
        raise SystemExit(f"unknown or missing job {job!r}; known: {sorted(JOBS)}")
    out_root = cfg.get("OUT_ROOT") or tempfile.mkdtemp(prefix="jonesy-extracts-")
    targets = [t for t in cfg.get("TARGETS", "").split(",") if t] or [
        f"{out_root}/loch"
    ]
    ctx = JobContext(
        spark=get_spark(),
        sf_dir=cfg.get("SF_DIR", "/root/testdata/sf0.001"),
        out_root=out_root,
        targets=targets,
    )
    run_job(job, ctx)
    print(f"{job}: wrote {len(ctx.written)} extracts under {out_root}", file=sys.stderr)
    return ctx


if __name__ == "__main__":
    main()
