#!/usr/bin/env python
"""Synthesize the sf1 probe tier (10x sf0.1) for the decade scale probe.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB story needs at
least one measured decade of scaling (VERDICT r8 #6), so this script
derives sf1 from sf0.1 deterministically — read-only on /root/testdata,
output under /tmp (regenerable at will, never committed):

* fact tables (lineitem, orders, customer, part, supplier, events,
  documents, embeddings) become 10 key-shifted replicas — every id
  column gets ``replica * stride`` added, strides far above the sf0.1
  key ranges, so referential integrity holds within each replica and
  nothing collides across replicas;
* dimension tables (region, nation) copy as-is;
* ``documents.text`` gets every token suffixed with the replica tag
  (replica 0 keeps the original text): each replica is then a DISJOINT
  corpus with sf0.1's exact per-document token statistics, so the
  near-dup/banding structure is 10 x sf0.1's — the honest decade for
  the banded self-joins (10 identical copies of each doc would instead
  manufacture 10-cliques sf0.1 never had, a different workload);
* ``events.user_id`` shifts per replica (distinct users scale 10x) and
  ``ts`` stays, so the event stream is 10x denser over the same span —
  the hypertable-rollup bucket count stays constant while rows per
  bucket grow, which is what a busier cluster looks like;
* ``embeddings`` replicas keep their float values (the ANN probes'
  cost is candidate volume per cell, which scales with rows; exact
  duplicate points across replicas only stress the tie-break, which is
  vec_id-total-ordered).

Usage: python scripts/gen_sf1.py [--dest /tmp/jonesy_sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
#: id strides: comfortably above every sf0.1 max key (checked below).
STRIDE = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="/tmp/jonesy_sf1")
    ap.add_argument(
        "--replicas",
        type=int,
        default=REPLICAS,
        help="replica count (default 10 = sf1); the incremental probe "
        "uses larger tiers to show rebuild growing while probe stays "
        "flat",
    )
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="subset of fact tables to synthesize (default: all)",
    )
    ap.add_argument(
        "--expand-text",
        type=int,
        default=1,
        help="repeat each document's text N times (with a distinct "
        "boundary token per copy) — lifts per-doc bytes ~Nx WITHOUT "
        "adding documents, so corpus-term walls (shingle explode, "
        "digest hashing) rise above the local-mode scheduler floor "
        "while batch sizes stay fixed (VERDICT r10 #3)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="gen_sf1")

    id_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }

    for name in ("region", "nation"):
        if args.tables is not None and name not in args.tables:
            continue
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.dest}/{name}.parquet")
        print(f"copied {name}")

    for name, keys in id_cols.items():
        if args.tables is not None and name not in args.tables:
            continue
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        bounds = src.select(
            *[F.min(k).alias(f"mn_{k}") for k in keys],
            *[F.max(k).alias(f"mx_{k}") for k in keys],
        ).first()
        # replica ranges [min + r*STRIDE, max + r*STRIDE] must not
        # overlap: require non-negative ids strictly under the stride
        # (a signed content-hash id tier would need a rebase first)
        assert all(
            bounds[f"mx_{k}"] is None
            or (0 <= bounds[f"mn_{k}"] and bounds[f"mx_{k}"] < STRIDE)
            for k in keys
        ), (name, dict(bounds.asDict()))
        parts = []
        for r in range(args.replicas):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(r * STRIDE))
            if name == "documents" and r > 0:
                # disjoint replica corpus: suffix every token
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"x{r}")),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "documents" and args.expand_text > 1:
                # longer documents, not more of them: k copies of the
                # text joined with per-copy boundary tokens (seg1..segk)
                # — bytes and token counts scale ~k, document count and
                # dup structure stay fixed
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.sequence(
                                F.lit(1), F.lit(args.expand_text)
                            ),
                            lambda i: F.concat_ws(
                                " ",
                                F.col("text"),
                                F.concat(F.lit("seg"), i.cast("string")),
                            ),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{args.dest}/{name}.parquet"
        )
        n = spark.read.parquet(f"{args.dest}/{name}.parquet").count()
        print(f"wrote {name}: {n} rows")


if __name__ == "__main__":
    main()
