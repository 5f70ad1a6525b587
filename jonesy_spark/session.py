"""SparkSession builder tuned for this engine.

Local-mode testing runs on ``local[N]``; the same config block is what we
would ship to a real cluster (AQE, skew-join handling, partition
coalescing) — only master/memory change. Session timezone is pinned to
UTC so timestamp semantics match the DuckDB oracle (DuckDB timestamps are
UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "jonesy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    Scale notes (100 TB design):
      * AQE on — runtime partition coalescing, skew-join splitting and
        dynamic broadcast-join demotion replace hand-tuned plans.
      * ``spark.sql.shuffle.partitions`` is a floor; AQE coalesces down.
        On a real cluster set it ~2-3x total cores.
      * Arrow enabled — every Pandas-UDF hop is Arrow-batched.
      * UTC session tz — deterministic timestamp rendering everywhere.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
