"""End-to-end SIS job replicas over generated fixtures: every extract
the reference's cron jobs produce, as headerless gzip CSV under the
date-hashed prefix in every target."""

from __future__ import annotations

import csv
import gzip
import os
from datetime import datetime

import pytest

from jonesy_spark.pipeline.sinks import daily_prefix
from jonesy_spark.pipeline.sis_jobs import SisJobContext, run_sis_job
from sis_fixtures import TODAY

NOW = datetime(2024, 5, 30, 3, 0, 0)  # cutoff = 2024-05-25 (5-day lookback)


@pytest.fixture
def ctx(spark, sis_dir, tmp_path):
    return SisJobContext(
        spark=spark,
        fixtures_dir=sis_dir,
        out_root=str(tmp_path / "out"),
        targets=[str(tmp_path / "bucket-a"), str(tmp_path / "bucket-b")],
        run_date=TODAY,
        now=NOW,
    )


def _gz_rows(path):
    with gzip.open(path, "rt", newline="") as fh:
        return list(csv.reader(fh))


@pytest.mark.parametrize(
    "job,expected_keys",
    [
        ("upload_advisors", 2),
        ("upload_snapshot", 7),  # attributes + 3 terms × (courses, enrollments)
        ("upload_recent_refresh", 6),  # 3 terms × 2 extracts
    ],
)
def test_sis_jobs_end_to_end(ctx, job, expected_keys):
    run_sis_job(job, ctx)
    assert len(ctx.written) == expected_keys
    prefix = daily_prefix(ctx.run_date)
    for key in ctx.written:
        for t in ctx.targets:
            obj = os.path.join(t, prefix, key)
            assert os.path.isfile(obj), obj


def test_advisor_extract_contract(ctx):
    run_sis_job("upload_advisors", ctx)
    obj = os.path.join(
        ctx.targets[0],
        daily_prefix(ctx.run_date),
        "advisors/instructor-advisor-map.csv.gz",
    )
    rows = _gz_rows(obj)
    assert rows, "empty extract"
    assert rows[0][0] != "advisor_id"  # headerless
    assert all(len(r) == 13 for r in rows)  # 13-column projection


def test_unknown_sis_job_aborts(ctx):
    with pytest.raises(SystemExit, match="unknown"):
        run_sis_job("nope", ctx)
