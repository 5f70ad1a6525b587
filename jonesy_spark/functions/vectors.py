"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), fully JVM-side codegen.

No UDFs: a Pandas-UDF dot product pays an Arrow round-trip per batch;
``F.aggregate`` stays inside whole-stage codegen, which at 100 TB is the
difference between a map-only scan and a Python bottleneck. The fold is
sequential left-to-right, so results are bit-deterministic for the
oracle comparison (we still round at the boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    """Cast array<float> → array<double> so arithmetic matches the
    oracle's DOUBLE[] math."""
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column, ndigits: int = 6) -> Column:
    """Cosine similarity rounded to ``ndigits`` — rounding makes the
    value stable across accumulation orders (engine-portable)."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), ndigits)


def sign_bucket(v: Column, n_dims: int = 6) -> Column:
    """Coarse LSH/IVF bucket key: concatenated signs of the first
    ``n_dims`` coordinates (2^n_dims buckets).

    This is the scale path for similarity search: bucket both sides,
    equi-join on the bucket key, search within the bucket — turning an
    O(n·m) all-pairs cosine into a hash join. Deterministic (no random
    hyperplanes) so the DuckDB oracle reproduces it exactly.
    """
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(n_dims)),
            lambda i: F.when(F.element_at(v, i) >= 0, "1").otherwise("0"),
        ),
    )
