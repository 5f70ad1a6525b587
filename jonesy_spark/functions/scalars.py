"""Named scalar Column builders — the reference's F1-F21 expression
surface (SURVEY.md §2.8) as a reusable library.

Each builder is a pure ``Column`` expression (Catalyst-optimizable,
codegen'd); query plans compose them instead of re-writing raw
expressions. Citations map each builder to its origin in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Weekday number (Spark dayofweek: 1=Sunday) → reference day codes
#: (F15 per-weekday CASE chain, reference ``jonesy/queries.py:188-195``).
DAY_CODES = {1: "SU", 2: "MO", 3: "TU", 4: "WE", 5: "TH", 6: "FR", 7: "SA"}


def catalog_root(catalog_nbr: Column) -> Column:
    """F8: strip all letters → numeric catalog root ('C103B' → '103')
    (``jonesy/queries.py:168-170``, Oracle 2-arg REGEXP_REPLACE —
    Spark needs the explicit empty replacement, SURVEY §7 hard part 5)."""
    return F.regexp_replace(catalog_nbr, "[A-Za-z]", "")


def catalog_prefix(catalog_nbr: Column) -> Column:
    """F10/F11: leading letters before the numeric root
    (``jonesy/queries.py:169-170`` SUBSTR/INSTR parsing)."""
    return F.regexp_extract(catalog_nbr, r"^\s*([A-Za-z]*)", 1)


def catalog_suffix(catalog_nbr: Column) -> Column:
    """F10: trailing letters after the numeric root."""
    return F.regexp_extract(catalog_nbr, r"([A-Za-z]*)\s*$", 1)


def full_name(
    first: Column, middle: Column, last: Column
) -> Column:
    """F12+F13+F1: instructor full-name assembly with NVL2-style optional
    middle name (``jonesy/queries.py:179-185``: `first || NVL2(middle,
    ' ' || middle, '') || ' ' || last`, trimmed)."""
    middle_part = F.when(
        middle.isNotNull() & (F.trim(middle) != ""), F.concat(F.lit(" "), F.trim(middle))
    ).otherwise(F.lit(""))
    return F.concat(F.trim(first), middle_part, F.lit(" "), F.trim(last))


def day_code(ts: Column) -> Column:
    """F15: weekday → two-letter day code via a searched CASE chain
    (``jonesy/queries.py:188-195`` maps MON..SUN 'Y' flags to
    'MO'..'SU'; here derived from a timestamp's weekday)."""
    c = F.dayofweek(ts)
    expr: Column | None = None
    for num, code in DAY_CODES.items():
        expr = F.when(c == num, code) if expr is None else expr.when(c == num, code)
    return expr


def strip_newlines(col: Column) -> Column:
    """F9+F14: delete CHR(10)/CHR(13) from free-text titles
    (``jonesy/queries.py:200``)."""
    return F.regexp_replace(col, "[\\n\\r]", "")


def boolean_flag(col: Column, true_value: str = "Y") -> Column:
    """F15: `CASE WHEN flag = 'Y' THEN 'true' ELSE 'false' END`
    (``jonesy/queries.py:161``) — string booleans for byte-compat."""
    return F.when(col == true_value, "true").otherwise("false")


def utc_label(ts: Column) -> Column:
    """F18: `%Y-%m-%d %H:%M:%S UTC` rendering (``jonesy/jobs.py:169``)."""
    return F.concat(F.date_format(ts, "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC"))


def micro_units(col: Column, digits: int = 6) -> Column:
    """Fixed-point integer rendering of a computed double: the value
    scaled by 10**digits, rounded to the nearest integer, as BIGINT.

    Why this exists: the driver hash-compares query output against a
    DuckDB oracle, and a *computed* double is the one type whose
    rendering is harness-dependent — Spark's ``round(x, 6)`` goes
    through BigDecimal HALF_UP on the exact binary expansion while
    DuckDB's goes through ``std::round(x*1e6)/1e6``, so a near-tie
    double can round differently per engine *and per DuckDB version*
    (CORRECTNESS_r06's one red row). Scaling FIRST and rounding ONCE
    makes both engines round the *same* product double, and the output
    integer survives any float normalization downstream. Oracle twin:
    ``CAST(round((expr) * 1e6) AS BIGINT)``.

    Use for every hashed computed-double column (cosines, logprobs,
    ratios, quality composites); raw pass-through doubles read from
    parquet are already bit-identical on both engines and don't need
    it.

    Contracts: NULL passes through as NULL; ties round HALF_UP away
    from zero on both engines; and a non-finite input FAILS LOUDLY
    (ANSI CAST_OVERFLOW) rather than hashing a silent sentinel — a
    NaN/Infinity reaching a hashed output is an upstream bug, the
    quarantine rule at expression level.
    """
    return F.round(col * F.lit(10 ** digits)).cast("long")
