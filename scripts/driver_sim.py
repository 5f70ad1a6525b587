#!/usr/bin/env python
"""Simulate the driver's verify pass against __spark_entry__.

Drives the real surface: imports __spark_entry__ (the package boundary
the driver consumes), smoke-runs entry() at sf0.001, then runs every
queries() entry at sf0.01 side-by-side with its oracle_sql() in DuckDB
and compares row-count + sorted-column schema + an order-insensitive
value hash — the same contract as CORRECTNESS_r{N}.json.

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    h = hashlib.md5()
    for row in sorted("|".join(norm_value(v) for v in row) for row in rows):
        h.update(row.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from jonesy_spark.catalog import FIXTURE_TABLES
    from jonesy_spark.session import get_spark

    spark = get_spark(app_name="driver_sim")

    t0 = time.time()
    edf = entrymod.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema={edf.columns} [{time.time()-t0:.1f}s]")
    assert len(erows) >= 0

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.names:
        # registry-only queries (driver-excluded) are drivable by name:
        # fall back to the full registry, rows-only when no oracle
        from jonesy_spark.plans import all_oracle_sql, all_queries

        reg, reg_oracles = all_queries(), all_oracle_sql()
        for n in args.names:
            if n not in queries and n in reg:
                queries[n] = reg[n]
                if n in reg_oracles:
                    oracles[n] = reg_oracles[n]
    names = args.names or sorted(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf_dir)
            cols = sorted(df.columns)
            srows = [[r[c] for c in cols] for r in df.collect()]
            shash = value_hash(srows, cols)
            if name not in oracles:
                print(f"  {name}: rows-only check, {len(srows)} rows [{time.time()-t0:.1f}s]")
                continue
            res = con.execute(oracles[name])
            dcols_raw = [d[0] for d in res.description]
            dcols = sorted(dcols_raw)
            idx = [dcols_raw.index(c) for c in dcols]
            drows = [[r[i] for i in idx] for r in res.fetchall()]
            dhash = value_hash(drows, dcols)
            ok = (len(srows) == len(drows)) and (cols == dcols) and (shash == dhash)
            status = "OK " if ok else "FAIL"
            print(
                f"  {status} {name}: spark={len(srows)} oracle={len(drows)} "
                f"hash={'match' if shash == dhash else f'{shash[:8]}!={dhash[:8]}'} "
                f"[{time.time()-t0:.1f}s]"
            )
            if not ok:
                failures.append(name)
                if cols != dcols:
                    print(f"       schema: spark={cols} oracle={dcols}")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  ERR  {name}: {type(exc).__name__}: {exc}")
    print(f"{len(names) - len(failures)}/{len(names)} queries match")
    if failures:
        print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
