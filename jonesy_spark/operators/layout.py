"""Write-layout optimization: Z-order clustering for multi-dimensional
file skipping.

Reference scope: beyond the reference (its sink is a serial gzip CSV
stream); this is the lakehouse-tier layout optimizer (public technique:
Morton/Z-order curves, as in Delta Lake's OPTIMIZE ZORDER and
Hudi/Iceberg clustering). The problem it solves is real at 100 TB: a
table sorted by ONE column prunes scans on that column only — a second
predicate column is scattered uniformly across every file, so its
min/max footer stats prune nothing. Interleaving the bits of both
columns' bucket ranks gives a 1-D sort key under which files are
LOCALIZED in every interleaved dimension at once: each file covers a
small hyper-rectangle, and a selective conjunctive predicate touches
only the files whose rectangle intersects it (verified against real
parquet footer stats in tests).

Shape: bucketing is ``width_bucket`` over per-column [min, max] (one
tiny 2-row aggregate collect; swap in ``approxQuantile`` boundaries per
column for heavily skewed dims — the docstring contract, not a code
path, because rank-bucketing needs a per-dim boundary broadcast that
value-bucketing avoids); the Z-value is a pure bit-interleave expression
(codegen'd shifts/ors, built once in Python); the write is
``repartitionByRange`` on the Z-value (the terasort exchange — samples
the key, balances files even when the interleave is lumpy) with an
in-partition sort so row-group stats tighten too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension: 2 dims x 8 bits = 16-bit Z-values — 65 536
#: distinct cells, plenty below any practical file count while keeping
#: the interleave expression short.
DIM_BITS = 8


def zvalue(a_bucket: Column, b_bucket: Column, bits: int = DIM_BITS) -> Column:
    """Morton interleave of two ``[0, 2^bits)`` bucket ids into one
    Z-value: bit i of ``a`` lands at position 2i, bit i of ``b`` at
    2i+1. Pure shift/and/or expression tree — whole-stage codegen, no
    UDF."""
    # disjoint bit positions, so SUM == bitwise OR (and Column `|` is
    # logical OR in PySpark, not bitwise)
    z = F.lit(0).cast("long")
    a_bucket = a_bucket.cast("long")
    b_bucket = b_bucket.cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(a_bucket, i) % 2, 2 * i)
            + F.shiftleft(F.shiftrightunsigned(b_bucket, i) % 2, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = DIM_BITS,
) -> str:
    """Write ``df`` as parquet clustered on the Z-order of
    ``(col_a, col_b)``: every output file covers a small rectangle of
    the 2-D key space, so footer min/max stats prune files for
    predicates on EITHER or BOTH columns (vs one column for a plain
    sort). Columns must be numeric (cast dates/timestamps to epoch
    first). Returns ``path``.

    Cost: one 1-row min/max aggregate, one range exchange on the
    Z-value, one in-partition sort — the same bill as any sorted write;
    Z-ordering changes WHICH order, not how much work."""
    stats = df.agg(
        F.min(col_a).alias("a0"),
        F.max(col_a).alias("a1"),
        F.min(col_b).alias("b0"),
        F.max(col_b).alias("b1"),
    ).first()
    n_buckets = 1 << bits
    a_b = (
        F.width_bucket(
            F.col(col_a), F.lit(stats["a0"]), F.lit(stats["a1"]), n_buckets
        )
        - 1
    )
    b_b = (
        F.width_bucket(
            F.col(col_b), F.lit(stats["b0"]), F.lit(stats["b1"]), n_buckets
        )
        - 1
    )
    # width_bucket puts the max value in bucket n_buckets+... clamp into
    # [0, n_buckets) so the interleave never sees a stray high bit
    a_b = F.least(F.greatest(a_b, F.lit(0)), F.lit(n_buckets - 1))
    b_b = F.least(F.greatest(b_b, F.lit(0)), F.lit(n_buckets - 1))
    z = zvalue(a_b, b_b, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def files_touched(path: str, col_a: str, a_lo, a_hi, col_b: str, b_lo, b_hi) -> tuple[int, int]:
    """(files whose footer [min, max] ranges intersect the 2-D box,
    total files) — the file-skipping arithmetic a stats-aware reader
    (Spark's parquet filter pushdown, Delta data skipping) performs,
    computed here directly from parquet footers so layout tests assert
    REAL pruning, not a proxy."""
    import glob
    import os

    import pyarrow.parquet as pq

    total, touched = 0, 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        total += 1
        md = pq.ParquetFile(f).metadata
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                name = c.path_in_schema
                if name not in (col_a, col_b) or c.statistics is None:
                    continue
                s = c.statistics
                mins[name] = s.min if name not in mins else min(mins[name], s.min)
                maxs[name] = s.max if name not in maxs else max(maxs[name], s.max)
        if (
            mins.get(col_a) is not None
            and not (maxs[col_a] < a_lo or mins[col_a] > a_hi)
            and mins.get(col_b) is not None
            and not (maxs[col_b] < b_lo or mins[col_b] > b_hi)
        ):
            touched += 1
    return touched, total
