#!/usr/bin/env python
"""One-session phase probe for the r14 PQ rewrite: times the map-side
(literal-centers) encode/ADC against the old explode+broadcast-join
shapes, interleaved so machine drift cancels. Phases:

  enc_new   pq_encode (HEAD: array_min over literal-center folds)
  enc_old   inline reconstruction of the pre-rewrite encode
  adc_new   pq_topk tail given precomputed codes (flat-LUT fold)
  adc_old   inline reconstruction of the pre-rewrite LUT-join ADC

Usage: python scripts/pq_phase_probe.py [-n ROUNDS]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--rounds", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import jonesy_spark.operators.similarity as SIM
    from jonesy_spark.catalog import Catalog
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="pq_phase_probe")
    emb = Catalog(spark, SF_DIR).embeddings
    emb.limit(1).count()

    prep = SIM._prepared(emb).persist()
    prep.count()
    books = SIM.pq_codebooks(emb, m=8, k=16, prepared=prep)
    books.persist().count()
    mm = 8
    dim = emb.select(F.size("embedding").alias("s")).first()["s"]
    d = dim // mm
    n_queries, overfetch, k = 10, 4, 10

    unit = prep.select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("u"),
    )

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def enc_new():
        noop(SIM.pq_encode(emb, books, prepared=prep))

    def enc_old():
        subs = unit.select(
            "vec_id",
            "label",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("int").alias("sub"),
                            F.slice(F.col("u"), j * d + 1, d).alias("x"),
                        )
                        for j in range(mm)
                    ]
                )
            ).alias("s"),
        ).select("vec_id", "label", "s.sub", "s.x")
        d2 = F.aggregate(
            F.zip_with(F.col("x"), F.col("sv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        best = (
            subs.join(F.broadcast(books), "sub")
            .select(
                "vec_id",
                "label",
                "sub",
                F.struct(d2.alias("d"), F.col("code")).alias("dc"),
            )
            .groupBy("vec_id", "label", "sub")
            .agg(F.min("dc").getField("code").alias("code"))
        )
        noop(
            best.groupBy("vec_id", "label").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "code"))),
                    lambda s: s.getField("code"),
                ).alias("codes")
            )
        )

    codes = SIM.pq_encode(emb, books, prepared=prep).persist()
    codes.count()
    q = unit.filter(F.col("vec_id") < n_queries)

    cb: dict[int, list] = {}
    for r in books.select("sub", "code", "sv").collect():
        cb.setdefault(r["sub"], []).append((r["code"], r["sv"]))
    kk = max(len(v) for v in cb.values())

    def tail(adc):
        w_adc = Window.partitionBy("query_id").orderBy(
            F.col("adc_d2").asc(), F.col("vec_id")
        )
        cand = (
            adc.withColumn("rank", F.row_number().over(w_adc))
            .filter(F.col("rank") <= overfetch * k)
            .select("query_id", "vec_id")
        )
        fl = prep.select(
            "vec_id", F.col("v").alias("fv"), F.col("nrm").alias("fn")
        )
        qf = fl.withColumnsRenamed(
            {"vec_id": "query_id", "fv": "qfv", "fn": "qfn"}
        )
        from jonesy_spark.functions import vectors as VX
        from jonesy_spark.operators.similarity import micro_units

        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine_micro").desc(), F.col("vec_id")
        )
        noop(
            fl.join(F.broadcast(cand), "vec_id")
            .join(
                F.broadcast(qf.filter(F.col("query_id") < n_queries)),
                "query_id",
            )
            .withColumn(
                "cosine_micro",
                micro_units(
                    VX.dot(F.col("qfv"), F.col("fv"))
                    / (F.col("qfn") * F.col("fn"))
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine_micro", "rank")
        )

    def adc_new():
        def _lut_entry(j, sv):
            return F.aggregate(
                F.zip_with(
                    F.slice(F.col("u"), j * d + 1, d),
                    F.array(*[F.lit(float(v)) for v in sv]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, y: acc + y,
            )

        lut_arr = q.select(
            F.col("vec_id").alias("query_id"),
            F.array(
                *[
                    _lut_entry(j, sv)
                    for j in range(mm)
                    for _code, sv in sorted(cb[j])
                ]
            ).alias("lut"),
        )
        adc_fold = F.aggregate(
            F.sequence(F.lit(0), F.lit(mm - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                F.col("lut"), j * kk + F.element_at(F.col("codes"), j + 1) + 1
            ),
        )
        adc = (
            codes.crossJoin(F.broadcast(lut_arr))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id", adc_fold.alias("adc_d2"))
        )
        tail(adc)

    def adc_old():
        qsubs = q.select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("int").alias("sub"),
                            F.slice(F.col("u"), j * d + 1, d).alias("qx"),
                        )
                        for j in range(mm)
                    ]
                )
            ).alias("s"),
        ).select("query_id", "s.sub", "s.qx")
        lut = qsubs.join(F.broadcast(books), "sub").select(
            "query_id",
            "sub",
            "code",
            F.aggregate(
                F.zip_with(
                    F.col("qx"), F.col("sv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, y: acc + y,
            ).alias("d2"),
        )
        exploded = codes.select(
            "vec_id", F.posexplode("codes").alias("sub", "code")
        ).withColumn("sub", F.col("sub").cast("int"))
        adc = (
            exploded.join(F.broadcast(lut), ["sub", "code"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", "vec_id")
            .agg(F.sum("d2").alias("adc_d2"))
        )
        tail(adc)

    phases = {
        "enc_new": enc_new,
        "enc_old": enc_old,
        "adc_new": adc_new,
        "adc_old": adc_old,
    }
    results: dict[str, list[float]] = {p: [] for p in phases}
    for _ in range(args.rounds):
        for p, fn in phases.items():
            t0 = time.time()
            fn()
            results[p].append(time.time() - t0)
    for p, ts in results.items():
        warm = min(ts[1:]) if len(ts) > 1 else ts[0]
        print(f"{p}: warm_min={warm:.2f} runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()
