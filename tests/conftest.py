"""Shared fixtures: one SparkSession per test session + a DuckDB
differential-compare helper that mirrors the driver's check
(row-count + schema names + order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

from jonesy_spark.catalog import FIXTURE_TABLES
from jonesy_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="jonesy_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sis_dir(tmp_path_factory):
    from sis_fixtures import build_sis_fixtures

    d = tmp_path_factory.mktemp("sis_fixtures")
    build_sis_fixtures(str(d))
    return str(d)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, ndigits=6):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(f"{round(v, ndigits):.{ndigits}f}")
            elif isinstance(v, (list, tuple)):
                norm.append(str([round(x, ndigits) if isinstance(x, float) else x for x in v]))
            else:
                norm.append(str(v))
        out.append(tuple(norm))
    return sorted(out)


def assert_matches_oracle(spark_df, duck_con, sql, ndigits=6):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL,
    matching the driver: same row count, same column names (sorted),
    same normalized values."""
    cols = sorted(spark_df.columns)
    spark_rows = [tuple(r[c] for c in cols) for r in spark_df.collect()]

    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == cols, f"schema mismatch: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(r[i] for i in idx) for r in res.fetchall()]

    assert len(spark_rows) == len(duck_rows), (
        f"row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    assert len(spark_rows) > 0, "empty result — degenerate test"
    s, d = _normalize(spark_rows, ndigits), _normalize(duck_rows, ndigits)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"
