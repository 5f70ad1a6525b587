"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``jonesy_spark``; this module only adapts it to
the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jonesy_spark.plans import driver_oracle_sql, driver_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: J11 greatest-n-per-group
    dedup (latest order per customer+priority, ties kept, DISTINCT)."""
    return driver_queries()["latest_order_per_customer"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (curated to
    the driver's 50-entry cap; the full registry incl. bench-only twins
    is jonesy_spark.plans.all_queries)."""
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops; the driver then records a weaker
    rows-only check)."""
    return driver_oracle_sql()
