"""The sim's canonicalizer must mirror the DRIVER's pandas canon, not
a friendlier one: the r06/r07 misses (DuckDB HUGEINT -> pandas float64
hashing `99.0` against Spark's int64 `99`; list-valued cells crashing
the driver's multi-column sort_values) both slipped through the old
fetchall()-string sim. These tests pin the two failure classes as
locally-reproducible errors and the dtype gate that pre-empts them
(r07 verdict #3)."""

from __future__ import annotations

import datetime as dt
import importlib.util
import pathlib

import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "driver_sim",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "driver_sim.py",
)
driver_sim = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(driver_sim)


def test_int64_and_float64_hash_differently():
    """The token_budget_prune class: DuckDB's HUGEINT window sum lands
    in pandas as float64 (99.0) while Spark emits int64 (99) — the
    driver hashes them apart, so the sim must too."""
    ints = pd.DataFrame({"k": [1, 2], "v": pd.array([99, 7], dtype="int64")})
    floats = pd.DataFrame({"k": [1, 2], "v": [99.0, 7.0]})
    assert driver_sim.canon_hash(ints) != driver_sim.canon_hash(floats)


def test_equal_int_frames_hash_equal_regardless_of_row_order():
    a = pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]})
    b = pd.DataFrame({"v": [30, 10, 20], "k": [3, 1, 2]})
    assert driver_sim.canon_hash(a) == driver_sim.canon_hash(b)


def test_list_cells_crash_multicolumn_sort_like_the_driver():
    """The multimodal_real_codec / hash_embeddings class: the driver's
    sort_values factorizes object columns and dies on unhashable
    lists. The sim must raise, not normalize."""
    pdf = pd.DataFrame({"doc_id": [1, 2], "arr": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError):
        driver_sim.canon_hash(pdf)


def test_dtype_gate_flags_floats_and_lists_only():
    hazardous = pd.DataFrame(
        {
            "f": [1.5, 2.5],
            "arr": [[1], [2]],
            "ok_int": pd.array([1, 2], dtype="int64"),
            "ok_str": ["a", None],
            "ok_bool": [True, False],
            "ok_date": [dt.date(2020, 1, 1), dt.date(2020, 1, 2)],
        }
    )
    flagged = driver_sim.dtype_hazards(hazardous, "spark")
    assert any(h.startswith("spark.f:") for h in flagged)
    assert any(h.startswith("spark.arr:") for h in flagged)
    assert len(flagged) == 2


def test_nullable_bigint_promotion_is_flagged():
    """A BIGINT column with one NULL arrives in pandas as float64 on
    both engines — symmetric today, hash-red after any NULL asymmetry
    (the anomaly_flags hazard). The gate treats it as an error."""
    promoted = pd.Series([99, None], dtype="float64").to_frame("v")
    assert driver_sim.dtype_hazards(promoted, "duckdb") == [
        "duckdb.v:float64"
    ]


def test_date_and_midnight_timestamp_render_identically():
    """Spark keeps DateType as datetime.date objects; DuckDB widens
    DATE to datetime64 — the driver is green on date rows, so the
    canon must agree across the two representations."""
    spark_side = pd.DataFrame(
        {"d": [dt.date(2021, 5, 4), dt.date(2021, 5, 5)]}
    )
    duck_side = pd.DataFrame(
        {"d": pd.to_datetime(["2021-05-04", "2021-05-05"])}
    )
    assert driver_sim.canon_hash(spark_side) == driver_sim.canon_hash(
        duck_side
    )
