"""JSONL corpus ingest: declared-schema parse, corrupt-record
quarantine, parquet round-trip, observed-metric accounting."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jonesy_spark.pipeline import ingest as I

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "src0", "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "src1", "n_chars": 5},
    {"doc_id": 3, "text": "delta épsilon ünïcode", "lang": "es", "source": "src0", "n_chars": 21},
]
#: valid JSON, contract violation: required field null / absent.
MISSING = [
    {"doc_id": None, "text": "orphan", "lang": "en", "source": "src0", "n_chars": 6},
    {"text": "no id either", "lang": "en", "source": "src1", "n_chars": 12},
    {"doc_id": 4, "lang": "en", "source": "src1", "n_chars": 0},
]
#: not JSON at all, or JSON whose doc_id can't convert to LONG.
MALFORMED_LINES = [
    "{not json at all",
    '{"doc_id": "xyz-not-a-number", "text": "typed wrong", "lang": "en", "source": "src0", "n_chars": 11}',
    "<html>definitely a stray crawl artifact</html>",
]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "raw"
    p.mkdir()
    lines = [json.dumps(r) for r in GOOD + MISSING] + MALFORMED_LINES
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_split_quarantine_partitions_every_line(spark, jsonl_dir):
    parsed = I.read_jsonl_corpus(spark, jsonl_dir)
    clean, quarantine = I.split_quarantine(parsed)
    clean_rows = {r["doc_id"]: r for r in clean.collect()}
    assert set(clean_rows) == {1, 2, 3}
    # round-trip fidelity incl. unicode
    assert clean_rows[3]["text"] == "delta épsilon ünïcode"
    assert I.CORRUPT_COL not in clean.columns

    q = quarantine.collect()
    by_reason = {}
    for r in q:
        by_reason.setdefault(r["reason"], []).append(r)
    assert len(by_reason["missing_required"]) == 3
    assert len(by_reason["malformed"]) == 3
    # malformed rows keep the verbatim line as evidence
    raw = {r[I.CORRUPT_COL] for r in by_reason["malformed"]}
    assert "{not json at all" in raw
    # the type-failure line is malformed (doc_id could not convert) but
    # PERMISSIVE still salvages the well-typed fields
    typed_wrong = [r for r in by_reason["malformed"] if r["text"] == "typed wrong"]
    assert typed_wrong and typed_wrong[0]["doc_id"] is None
    # lineage column points at the input file
    assert all(r["src_file"].endswith("part-0.jsonl") for r in q)


def test_ingest_job_writes_and_accounts(spark, jsonl_dir, tmp_path):
    dest = str(tmp_path / "docs")
    report = I.ingest_jsonl_corpus(
        spark, jsonl_dir, dest, partition_by=("source",), max_records_per_file=2
    )
    assert (
        report.rows_clean,
        report.rows_malformed,
        report.rows_missing_required,
    ) == (3, 3, 3)
    assert report.rows_total == 9

    # clean table reads back without the quarantine (underscore dirs are
    # invisible to the parquet reader) and matches the contract schema
    back = spark.read.parquet(dest)
    assert sorted(back.columns) == sorted(I.DOCUMENTS_SCHEMA.fieldNames())
    assert back.count() == 3
    assert back.schema["doc_id"].dataType == T.LongType()
    # partition pruning works on the layout we chose
    assert back.filter(F.col("source") == "src1").count() == 1

    quarantined = spark.read.parquet(report.quarantine_path)
    assert quarantined.count() == 6
    assert quarantined.filter(F.col("reason") == "malformed").count() == 3


def test_ingest_overwrite_is_idempotent(spark, jsonl_dir, tmp_path):
    dest = str(tmp_path / "docs")
    r1 = I.ingest_jsonl_corpus(spark, jsonl_dir, dest)
    r2 = I.ingest_jsonl_corpus(spark, jsonl_dir, dest)
    assert (r1.rows_clean, r1.rows_malformed) == (r2.rows_clean, r2.rows_malformed)
    assert spark.read.parquet(dest).count() == 3


def test_declared_schema_never_widens(spark, tmp_path):
    # Extra fields in the JSON are dropped, not inferred into the
    # schema: the contract is what the caller declared.
    p = tmp_path / "raw"
    p.mkdir()
    (p / "x.jsonl").write_text(
        json.dumps(
            {"doc_id": 9, "text": "t", "lang": "en", "source": "s", "n_chars": 1,
             "surprise_column": {"nested": True}}
        )
        + "\n"
    )
    clean, quarantine = I.split_quarantine(I.read_jsonl_corpus(spark, str(p)))
    assert clean.columns == I.DOCUMENTS_SCHEMA.fieldNames()
    assert clean.count() == 1 and quarantine.count() == 0


def test_corrupt_col_collision_rejected(spark):
    bad = T.StructType([T.StructField(I.CORRUPT_COL, T.StringType())])
    with pytest.raises(ValueError):
        I.read_jsonl_corpus(spark, "/nonexistent", schema=bad)


def test_ingest_normalize_canonicalizes_text(spark, tmp_path):
    """normalize=True makes composed/decomposed twins land with
    identical bytes (exact dedup then catches them); raw quarantine
    evidence stays untouched."""
    raw = tmp_path / "raw"
    raw.mkdir()
    composed = "caf\u00e9 au lait"
    decomposed = "cafe\u0301 au lait"
    lines = [
        json.dumps({"doc_id": 1, "text": composed, "lang": "fr", "source": "s", "n_chars": 12}),
        json.dumps({"doc_id": 2, "text": decomposed, "lang": "fr", "source": "s", "n_chars": 13}),
        json.dumps({"doc_id": 3, "text": "ctl\u0007chars\u009dhere", "lang": "en", "source": "s", "n_chars": 13}),
    ]
    (raw / "a.jsonl").write_text("\n".join(lines) + "\n", encoding="utf-8")
    dest = str(tmp_path / "docs")
    report = I.ingest_jsonl_corpus(spark, str(raw), dest, normalize=True)
    assert report.rows_clean == 3

    back = {r["doc_id"]: r["text"] for r in spark.read.parquet(dest).collect()}
    assert back[1] == back[2] == composed
    assert back[3] == "ctlcharshere"
