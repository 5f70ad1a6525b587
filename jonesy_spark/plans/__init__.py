"""Named query builders + matching DuckDB oracle SQL.

Each submodule exposes ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLE`` (name -> ANSI SQL over the driver-registered DuckDB views
``region nation customer supplier part orders lineitem events documents
embeddings``). The driver hash-compares the two at sf0.01
(order-insensitive), so every computed column is aliased identically on
both sides and floating-point results are made deterministic (decimal
sums cast back to double; cosines rounded).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import reference_queries


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        merged.update(mod.QUERIES)
    return merged


def all_oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLE)
    return merged


def _modules():
    mods = [reference_queries]
    for name in ("extension_queries", "llm_queries"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods
