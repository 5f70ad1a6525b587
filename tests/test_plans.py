"""Plan-shape regression tests: the physical plans we tuned for must
stay tuned (broadcasts stay broadcasts, pushdowns stay pushed) — and
bucketed tables must join without an exchange."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from conftest import SF_DIR
from jonesy_spark.catalog import Catalog
from jonesy_spark.plans import all_queries


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_courses_all_dims_broadcast(spark):
    plan = plan_of(all_queries()["term_courses"](spark, SF_DIR))
    # formatted explain lists each node twice (tree + detail): count the
    # numbered detail entries.
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 5
    assert "SortMergeJoin" not in plan


def test_pricing_summary_filter_pushed(spark):
    plan = plan_of(all_queries()["pricing_summary_agg"](spark, SF_DIR))
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_shipdate" in m.group(1)


def test_omit_drops_lookup_broadcast(spark):
    """The decorrelated primary lookup must broadcast — the fact side
    never shuffles."""
    plan = plan_of(all_queries()["omit_drops_withdrawals"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_scalar_suite_single_stage_no_exchange(spark):
    """A pure projection must stay map-only (no shuffle at any scale)."""
    plan = plan_of(all_queries()["scalar_functions_suite"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key co-locates them: the join
    plan has no shuffle exchange on either input (SURVEY.md §1.4 /
    guide's bucketing pattern — at 100 TB this removes the dominant
    shuffle of repeated fact-fact joins)."""
    cat = Catalog(spark, SF_DIR)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner actually uses the buckets
        # (these fixture tables are small enough to broadcast otherwise)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            cat.lineitem.select("l_orderkey", "l_quantity")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "li"))
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bkt_lineitem")
        )
        (
            cat.orders.select("o_orderkey", "o_custkey")
            .write.mode("overwrite")
            .option("path", str(tmp_path / "ord"))
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bkt_orders")
        )
        joined = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # no shuffle exchange feeding the join (bucket co-location)
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
