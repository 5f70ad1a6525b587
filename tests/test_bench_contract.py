"""The bench harness's driver-facing contract, pinned (VERDICT r11 #3):
the compact stdout line must fit the driver's ~2000-char tail capture
at the CURRENT headline-set size, and every benched name must be a
real registry row — a rename or an over-grown set fails here instead
of landing as a null `parsed` field in the round artifact."""

from __future__ import annotations

import importlib.util
import json
import pathlib

_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SPEC = importlib.util.spec_from_file_location("bench", _ROOT / "bench.py")
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


def test_headline_names_are_registry_rows():
    from jonesy_spark.plans import all_queries

    registry = set(all_queries())
    missing = [q for q in bench.HEADLINE if q not in registry]
    assert not missing, f"benched names not in the registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate rows"
    assert set(bench.R5_COMPARABLE) <= set(bench.HEADLINE)


def test_compact_line_fits_tail_capture_at_current_set_size():
    """Dry-run the compact line at worst-plausible per-query widths
    (one-decimal values just under 100 s — a 56-row set summing past
    that is a broken bench, not a wider line) — it must stay under the
    runtime assert's 1900-char bound, which itself sits under the
    driver's ~2000-char tail capture."""
    compact = {
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(bench.HEADLINE),
        "artifact": "bench_out.json",
        "queries": {k: 99.9 for k in bench.HEADLINE},
        "calibration": 0.123,
        "calibration_spread_ratio": 1.23,
        "subtotal_r5_per_calib_series": 123.4,
        "value": 1234.567,
    }
    line = json.dumps(compact)
    assert len(line) <= 1900, (
        f"{len(line)} chars at {len(bench.HEADLINE)} rows — the compact "
        "line has outgrown the tail capture; move keys to bench_out.json"
    )


def test_spiky_stretch_detection_localizes_drift():
    """The self-healing trigger (VERDICT r12 #2), pinned on the r12
    artifact's own shape: its interleaved series (spread 3.05x) must
    select exactly the head and tail stretches the judge adjudicated
    as drift-inflated, and a flat series must select nothing."""
    # r12's actual series: 0.447, 0.165, 0.174, 0.161, 0.187, 0.259,
    # 0.491 with after=0.362 — head (idx 0-1 brackets) and tail spiky
    series = [0.447, 0.165, 0.174, 0.161, 0.187, 0.259, 0.491]
    spiky = bench.spiky_stretches(series, 0.362, n_queries=56, cal_every=8)
    assert 0 in spiky and 1 in spiky          # bracketed by the 0.447 head point
    assert 6 in spiky and 5 in spiky          # the 0.491 tail point
    assert 2 not in spiky and 3 not in spiky  # the flat middle is untouched

    flat = [0.17, 0.165, 0.172, 0.168, 0.17, 0.169, 0.171]
    assert bench.spiky_stretches(flat, 0.167, n_queries=56, cal_every=8) == []

    # a partial final stretch is bracketed by the after-marker
    assert bench.spiky_stretches([0.17], 0.6, n_queries=12, cal_every=8) == [1]


def test_flat_series_with_warmed_after_marker_is_not_spiky():
    """r13 regression: the probe C2-ramps across the run, so the
    after-marker is systematically the fastest point — a flat in-loop
    series with a fast after must NOT trigger healing. The yardstick
    spiky_stretches compares against is the IN-LOOP SERIES MEDIAN
    (the after-marker only brackets the final stretch); a min-based
    yardstick would make the whole flat series look spiky relative to
    the ramped-down minimum and false-heal every run — the exact
    cycle the r13 median fix removed. Do not 'fix' this back to min."""
    flat = [0.205, 0.179, 0.166, 0.156, 0.175, 0.165, 0.189]  # r13 raw
    assert bench.spiky_stretches(flat, 0.123, n_queries=58, cal_every=8) == []
