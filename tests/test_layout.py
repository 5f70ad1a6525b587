"""Z-order write layout: file-skipping measured against REAL parquet
footer stats (operators.layout) — the lakehouse clustering tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from jonesy_spark.operators.layout import files_touched, write_zordered, zvalue


def test_zvalue_interleave_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (255, 255), (3, 5)], "a int, b int"
    )
    got = [
        r["z"]
        for r in df.select(zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    ]
    # (a,b) -> interleave: a bits at even positions, b at odd
    assert got == [0, 1, 2, 3, 65535, 0b100111]


def test_zorder_layout_equalizes_pruning(spark, tmp_path):
    """The measured contract (footer min/max arithmetic, not a proxy):
    a plain single-column sort prunes perfectly on ITS column and not
    at all on the other; the Z-order layout prunes on BOTH — its
    worst-case predicate touches a small multiple of the best case,
    never the whole table. Row round-trip is exact."""
    # sf0.01: enough rows that 16 files have real bucket resolution —
    # at sf0.001 each file holds ~400 rows and spans too much z-range
    # for footer stats to separate
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zp = str(tmp_path / "z")
    pp = str(tmp_path / "plain")
    write_zordered(li, zp, "l_partkey", "l_suppkey", n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(pp)
    )
    amin, amax = [
        (r[0], r[1]) for r in li.agg(F.min("l_partkey"), F.max("l_partkey")).collect()
    ][0]
    bmin, bmax = [
        (r[0], r[1]) for r in li.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()
    ][0]
    # predicate on the NON-sorted column: plain layout prunes nothing;
    # z-curve locality is lumpy per box position, so assert the MEAN
    # over several slices (the workload-level claim)
    span = (bmax - bmin) // 8
    z_touch, p_touch, total = 0, 0, None
    for lo in range(bmin, bmax - span, span):
        zb, zt = files_touched(zp, "l_partkey", amin, amax, "l_suppkey", lo, lo + 5)
        pb, pt = files_touched(pp, "l_partkey", amin, amax, "l_suppkey", lo, lo + 5)
        assert pb == pt, "single-column sort must touch every file on the other dim"
        z_touch += zb
        p_touch += pb
        total = zt
    assert z_touch < p_touch / 2, (
        f"z-order should prune the other dim: {z_touch} vs {p_touch} over {total}-file layouts"
    )
    # conservation: count + order-insensitive checksum
    back = spark.read.parquet(zp)
    assert back.count() == li.count()
    chk = lambda d: d.agg(
        F.sum(
            F.xxhash64(
                "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
            ).cast("decimal(38,0)")
        )
    ).first()[0]
    assert chk(back) == chk(li)


def test_zvalue_injective_on_full_grid(spark):
    """The Morton interleave must be a bijection on the full
    [0,256)x[0,256) grid — any collision would merge unrelated cells
    and silently weaken every pruning bound."""
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("a"),
        (F.col("id") / 256).cast("int").alias("b"),
    )
    n = grid.select(zvalue(F.col("a"), F.col("b")).alias("z")).agg(
        F.countDistinct("z").alias("n"), F.max("z").alias("m"), F.min("z").alias("lo")
    ).first()
    assert n["n"] == 65536 and n["lo"] == 0 and n["m"] == 65535
