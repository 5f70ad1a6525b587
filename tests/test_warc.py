"""WARC crawl-archive codec tests: framing round trip, gzip members,
malformed-payload quarantine, and the Spark explode seam."""

from __future__ import annotations

import pytest

from jonesy_spark.pipeline import warc as W

RECS = [
    ("https://example.org/a", "2024-01-01T00:00:00Z", b"hello world"),
    ("https://example.org/b", "2024-01-02T00:00:00Z", "unicode é中".encode()),
    ("https://example.org/c", "2024-01-03T00:00:00Z", b""),  # empty body
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    payload = W.encode_warc(RECS, gzip_members=gz)
    got = W.parse_warc(payload)
    assert [(r["url"], r["ts"], r["body"]) for r in got] == RECS
    assert all(r["type"] == "response" for r in got)


def test_warc_crlf_in_body_and_padding():
    """Bodies containing CRLF CRLF must not desynchronize the walker
    (Content-Length framing, not delimiter scanning), and stray
    inter-record CRLFs are tolerated."""
    tricky = [("u", "t", b"a\r\n\r\nWARC/1.0\r\nnot a header\r\n\r\n")]
    payload = W.encode_warc(tricky) + b"\r\n" + W.encode_warc(RECS[:1])
    got = W.parse_warc(payload)
    assert got[0]["body"] == tricky[0][2]
    assert got[1]["url"] == RECS[0][0]


def test_warc_malformed_raises():
    good = W.encode_warc(RECS[:1])
    with pytest.raises(ValueError, match="truncated body"):
        W.parse_warc(good[:-6])
    with pytest.raises(ValueError, match="bad version"):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="missing Content-Length"):
        W.parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")
    with pytest.raises(ValueError, match="missing record terminator"):
        W.parse_warc(good[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="corrupt gzip"):
        W.parse_warc(b"\x1f\x8b" + b"\x00" * 20)


def test_warc_text_records_explodes_archives(spark):
    """The Spark seam: two archives explode into their response
    records; non-response records are dropped."""
    a1 = W.encode_warc(RECS[:2], gzip_members=True)
    # hand-build a request record (ignored) followed by a response
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    a2 = req + W.encode_warc(RECS[2:])
    df = spark.createDataFrame(
        [("a1", bytearray(a1)), ("a2", bytearray(a2))],
        "archive_id string, payload binary",
    )
    got = sorted(
        (r["archive_id"], r["record_url"], r["text"], r["n_bytes"])
        for r in W.warc_text_records(df).collect()
    )
    assert got == [
        ("a1", "https://example.org/a", "hello world", 11),
        ("a1", "https://example.org/b", "unicode é中", 13),
        ("a2", "https://example.org/c", "", 0),
    ]


def test_warc_records_quarantined_isolates_bad_archives(spark):
    """The job-grade walker: a mis-framed archive becomes ONE error
    row; the sibling archive's records still explode."""
    good = W.encode_warc(RECS[:2], gzip_members=True)
    bad = b"NOT-WARC" + b"\x00" * 16
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("bad", bytearray(bad))],
        "archive_id string, payload binary",
    )
    rows = W.warc_records_quarantined(df).collect()
    errs = [r for r in rows if r["error"] is not None]
    recs = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and errs[0]["archive_id"] == "bad"
    assert "unterminated header" in errs[0]["error"]
    assert sorted(r["record_url"] for r in recs) == [
        "https://example.org/a",
        "https://example.org/b",
    ]


def test_ingest_warc_corpus_end_to_end(spark, tmp_path):
    """Archive dir -> quarantined + clean parquet + report: the good
    archives' records land under the documents contract (deterministic
    content-hash doc_id, NFC'd text, archive-name source, provenance
    columns); the corrupt archive lands in _quarantine with the
    framing diagnosis."""
    src = tmp_path / "archives"
    src.mkdir()
    (src / "shard-0.warc.gz").write_bytes(
        W.encode_warc(RECS[:2], gzip_members=True)
    )
    (src / "shard-1.warc.gz").write_bytes(W.encode_warc(RECS[2:]))
    (src / "shard-2.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 10)
    dest = str(tmp_path / "docs")

    report = W.ingest_warc_corpus(spark, str(src), dest)
    assert report.rows_clean == 3
    assert report.archives_failed == 1

    docs = spark.read.parquet(dest)
    assert sorted(docs.columns) == sorted(
        [
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
            "archive_id",
            "record_url",
            "record_ts",
        ]
    )
    by_url = {r["record_url"]: r for r in docs.collect()}
    assert by_url["https://example.org/a"]["text"] == "hello world"
    assert by_url["https://example.org/a"]["source"] == "shard-0.warc.gz"
    assert by_url["https://example.org/a"]["n_chars"] == 11
    assert len({r["doc_id"] for r in docs.collect()}) == 3

    quar = spark.read.parquet(f"{dest}/_quarantine").collect()
    assert len(quar) == 1
    assert quar[0]["reason"] == "archive_parse_error"
    assert "corrupt gzip" in quar[0]["error"]

    # determinism: rerun reproduces the same doc_ids (the resumability
    # contract — reruns over the same bytes are byte-identical)
    report2 = W.ingest_warc_corpus(spark, str(src), str(tmp_path / "d2"))
    docs2 = spark.read.parquet(str(tmp_path / "d2"))
    assert {r["doc_id"] for r in docs2.collect()} == set(
        r["doc_id"] for r in docs.collect()
    )
    assert report2.rows_clean == 3


def test_ingest_warc_job_seeds_fixtures_and_writes_manifest(
    spark, tmp_path
):
    """The cron-registered job end-to-end with no WARC_SRC: seeds real
    .warc.gz fixture archives from the documents table, ingests them
    through the quarantine contract, writes the manifest."""
    import json

    from jonesy_spark.catalog import Catalog
    from jonesy_spark.pipeline.jobs import JobContext, run_job

    ctx = JobContext(spark, "/root/testdata/sf0.001", str(tmp_path), [])
    run_job("ingest_warc", ctx)

    n_docs = Catalog(spark, "/root/testdata/sf0.001").documents.count()
    docs = spark.read.parquet(str(tmp_path / "warc_run" / "documents"))
    assert docs.count() == n_docs
    assert (
        spark.read.parquet(
            str(tmp_path / "warc_run" / "documents" / "_quarantine")
        ).count()
        == 0
    )
    manifest = json.loads(
        (tmp_path / "warc_run" / "_MANIFEST.json").read_text()
    )
    assert manifest["ingest"]["rows_clean"] == n_docs
    assert manifest["ingest"]["archives_failed"] == 0
    assert "warc_run/documents" in ctx.written


def test_warc_to_training_corpus_chain(spark, tmp_path):
    """The 100 TB story end to end: crawl archives -> quarantined
    ingest -> the full corpus pipeline (dedup, gates, split, packing)
    -> training sequences. The WARC front door's output is a first-
    class documents table for every downstream stage."""
    from jonesy_spark.pipeline.corpus_job import prepare_training_corpus

    src = tmp_path / "archives"
    src.mkdir()
    recs = [
        (
            f"https://site{i % 3}.example/page/{i}",
            "2024-03-01T00:00:00Z",
            (
                f"document {i} body with some shared words and token{i} "
                f"plus filler {' '.join(str(i * 7 + j) for j in range(10))}"
            ).encode(),
        )
        for i in range(24)
    ]
    # plant one exact duplicate pair across archives
    recs.append(("https://dup.example/a", "2024-03-01T00:00:01Z", recs[0][2]))
    (src / "s0.warc.gz").write_bytes(W.encode_warc(recs[:12], gzip_members=True))
    (src / "s1.warc.gz").write_bytes(W.encode_warc(recs[12:], gzip_members=True))

    dest = str(tmp_path / "docs")
    report = W.ingest_warc_corpus(spark, str(src), dest)
    assert report.rows_clean == 25

    docs = spark.read.parquet(dest)
    out = prepare_training_corpus(docs)
    clean_ids = {r["doc_id"] for r in out["clean"].select("doc_id").collect()}
    # the cross-archive exact duplicate collapsed to one survivor
    dup_ids = {
        r["doc_id"]
        for r in docs.filter(
            docs.record_url.isin(
                "https://site0.example/page/0", "https://dup.example/a"
            )
        ).collect()
    }
    assert len(dup_ids & clean_ids) == 1
    split = {r["split"] for r in out["split"].collect()}
    assert split <= {"train", "val", "test"}
    seqs = out["sequences"].collect()
    assert len(seqs) >= 1
    assert all(r["n_docs"] >= 1 and r["seq_tokens"] > 0 for r in seqs)


@pytest.mark.slow
def test_crawl_intake_job_gates_dedups_and_converges(spark, tmp_path):
    """The composed nightly intake job with no WARC_SRC: seeds
    HTML-bodied fixture archives, extracts, gates, dedups against the
    persisted index. A same-day rerun converges (idempotent overwrite
    of its own run partition); the NEXT day's run over unchanged
    archives ingests zero novel documents."""
    import json
    from datetime import date

    from jonesy_spark.pipeline.jobs import JobContext, run_job

    ctx = JobContext(
        spark, "/root/testdata/sf0.001", str(tmp_path), [],
        run_date=date(2024, 3, 1),
    )
    run_job("crawl_intake", ctx)

    root = tmp_path / "crawl_intake"
    docs = spark.read.parquet(str(root / "documents"))
    n_first = docs.count()
    manifest = json.loads((root / "_MANIFEST.json").read_text())
    assert manifest["intake"]["n_extracted"] > 0
    # the gate is live: some fixture docs fail the 50-word floor
    assert 0 < manifest["intake"]["n_kept"] < manifest["intake"]["n_extracted"]
    assert manifest["intake"]["n_novel"] == n_first > 0
    # extraction is live: no markup survives into the corpus
    assert docs.filter(docs.text.contains("<")).count() == 0
    assert f"crawl_intake/documents/ingest_batch=run-2024-03-01" in ctx.written

    # same-day rerun: converges to the same corpus, not a double ingest
    run_job(
        "crawl_intake",
        JobContext(
            spark, "/root/testdata/sf0.001", str(tmp_path), [],
            run_date=date(2024, 3, 1),
        ),
    )
    assert spark.read.parquet(str(root / "documents")).count() == n_first

    # next-day run over unchanged archives: everything already indexed
    run_job(
        "crawl_intake",
        JobContext(
            spark, "/root/testdata/sf0.001", str(tmp_path), [],
            run_date=date(2024, 3, 2),
        ),
    )
    manifest2 = json.loads((root / "_MANIFEST.json").read_text())
    assert manifest2["intake"]["n_novel"] == 0
    assert spark.read.parquet(str(root / "documents")).count() == n_first


@pytest.mark.slow
def test_crawl_to_corpus_job_end_to_end_conservation(spark, tmp_path):
    """The composed raw-bytes-to-training-shards job (VERDICT r11 #4):
    WARC fixtures -> intake (parse/extract/gate/digest-dedup) ->
    corpus pipeline (dedup/split/pack/assemble), with row-count
    conservation asserted at EVERY boundary — and a rerun over the
    same archives reproducing the identical shards (the determinism
    contract the corpus job already holds, now end to end from raw
    bytes)."""
    import json
    from datetime import date

    from jonesy_spark.pipeline.jobs import JobContext, run_job

    ctx = JobContext(
        spark, "/root/testdata/sf0.001", str(tmp_path), [],
        run_date=date(2024, 3, 1),
    )
    run_job("crawl_to_corpus", ctx)

    root = tmp_path / "crawl_corpus"
    manifest = json.loads((root / "_MANIFEST.json").read_text())
    intake, bounds = manifest["intake"], manifest["boundaries"]

    # boundary 1 (intake): extraction saw rows, the gate rejected some,
    # dedup landed exactly the novel set as the documents tier
    assert intake["n_extracted"] > 0
    assert 0 < intake["n_kept"] <= intake["n_extracted"]
    assert intake["n_novel"] <= intake["n_kept"]
    n_docs = spark.read.parquet(str(root / "documents")).count()
    assert n_docs == intake["n_novel"] == bounds["n_documents"] > 0

    # boundary 2 (corpus gates/dedup): can only shrink the doc tier
    assert 0 < bounds["n_clean"] <= bounds["n_documents"]

    # boundary 3 (split): partitions the clean tier exactly — one
    # decision per surviving document, nothing dropped or invented
    split = spark.read.parquet(str(root / "corpus" / "split"))
    assert split.count() == bounds["n_split"] == bounds["n_clean"]
    by = {r["split"]: r["count"] for r in split.groupBy("split").count().collect()}
    assert sum(by.values()) == bounds["n_clean"]
    assert by.get("train", 0) > 0

    # boundary 4 (pack/assemble): every sequence carries >= 1 doc and
    # the assembled doc total equals the train split size
    seqs = spark.read.parquet(str(root / "corpus" / "sequences"))
    assert seqs.count() == bounds["n_sequences"] > 0
    from pyspark.sql import functions as F

    n_packed_docs = seqs.agg(F.sum("n_docs")).collect()[0][0]
    assert n_packed_docs == by["train"]

    # determinism: a same-day rerun over the same archives converges
    # to byte-identical sequences (doc_id hashes the archive path +
    # record identity + content, so "same archives" means same paths —
    # the idempotence contract the intake job already holds, extended
    # through pack/assemble)
    cols = sorted(seqs.columns)
    first = sorted(map(tuple, seqs.select(*cols).collect()))
    ctx2 = JobContext(
        spark, "/root/testdata/sf0.001", str(tmp_path), [],
        run_date=date(2024, 3, 1),
    )
    run_job("crawl_to_corpus", ctx2)
    again = spark.read.parquet(str(root / "corpus" / "sequences"))
    assert first == sorted(map(tuple, again.select(*cols).collect()))
    # and the rerun did not double-ingest the document tier
    assert spark.read.parquet(str(root / "documents")).count() == n_docs


def _fixture_raw(spark, src: str):
    """Shared WARC fixture for the kill/resume pair: ONE archive path
    feeds both workdirs (doc_id hashes the archive path, so comparable
    runs must read identical paths)."""
    from pyspark.sql import functions as F

    from jonesy_spark.catalog import Catalog
    from jonesy_spark.pipeline import warc as W

    fixture = Catalog(spark, "/root/testdata/sf0.001").documents.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"),
            F.col("text"),
            F.lit(" the of</p></body></html>"),
        ).alias("text"),
    )
    W.write_fixture_archives(fixture, src)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(src)
        .select(
            F.col("path").alias("archive_id"),
            F.col("content").alias("payload"),
        )
    )


@pytest.mark.slow
def test_crawl_to_corpus_kill_and_resume(spark, tmp_path):
    """The composed job's crash witness (VERDICT r12 #3): kill the
    batch composition AFTER the intake tier commits but BEFORE the
    pack tier completes, then re-run — the rerun's manifest and every
    boundary count must be identical to an uninterrupted run's, and
    the partial state must be INVISIBLE through the committed front
    door (read_corpus_outputs refuses while _MANIFEST.json — written
    last — is absent)."""
    import json

    import pytest

    from jonesy_spark.pipeline.corpus_job import (
        prepare_corpus_from_crawl,
        prepare_training_corpus,
        read_corpus_outputs,
    )
    from jonesy_spark.pipeline.intake import intake_batch

    raw = _fixture_raw(spark, str(tmp_path / "raw"))
    run_id = "run-2024-03-01"

    # control: one uninterrupted run
    a = str(tmp_path / "a")
    res_a = prepare_corpus_from_crawl(spark, raw, a, run_id=run_id)
    seq_cols = sorted(read_corpus_outputs(spark, a)["sequences"].columns)
    seqs_a = sorted(
        map(tuple, spark.read.parquet(f"{a}/corpus/sequences").select(*seq_cols).collect())
    )

    # the killed run: intake commits, split lands, the sequences write
    # dies mid-task-commit (no _SUCCESS, a part file torn away), and
    # the manifest — the commit marker, written last — never lands
    b = str(tmp_path / "b")
    intake_batch(
        spark,
        raw,
        docs_root=f"{b}/documents",
        quarantine_root=f"{b}/_quarantine",
        index_path=f"{b}/digest_index",
        run_id=run_id,
        small_batch=False,
    )
    out = prepare_training_corpus(spark.read.parquet(f"{b}/documents"))
    out["split"].write.mode("overwrite").parquet(f"{b}/corpus/split")
    out["sequences"].write.mode("overwrite").parquet(f"{b}/corpus/sequences")
    seq_dir = tmp_path / "b" / "corpus" / "sequences"
    (seq_dir / "_SUCCESS").unlink()
    next(p for p in seq_dir.iterdir() if p.name.startswith("part-")).unlink()

    assert not (tmp_path / "b" / "_MANIFEST.json").exists()
    with pytest.raises(FileNotFoundError, match="never.*committed|_MANIFEST"):
        read_corpus_outputs(spark, b)

    # resume: the SAME composition re-run over the same archives —
    # intake overwrites its own run-id subtree (its `seen` read
    # excludes it, so nothing self-dedups away), the corpus tier
    # recomputes from the identical landed documents, and every
    # boundary count, the manifest, and the packed bytes come back
    # identical to the uninterrupted control
    res_b = prepare_corpus_from_crawl(spark, raw, b, run_id=run_id)
    assert res_b["boundaries"] == res_a["boundaries"]
    assert res_b["intake"] == res_a["intake"]
    man_a = json.loads((tmp_path / "a" / "_MANIFEST.json").read_text())
    man_b = json.loads((tmp_path / "b" / "_MANIFEST.json").read_text())
    assert man_a == man_b

    got = read_corpus_outputs(spark, b)
    seqs_b = sorted(map(tuple, got["sequences"].select(*seq_cols).collect()))
    assert seqs_b == seqs_a

    # the torn-state guard has teeth the other way too: committed
    # manifest + mutilated outputs (a duplicated part file inflating
    # the row count) fails loudly instead of reading
    import shutil

    part = next(p for p in seq_dir.iterdir() if p.name.startswith("part-"))
    shutil.copy(part, seq_dir / "part-09999-dup.snappy.parquet")
    with pytest.raises(ValueError, match="torn"):
        read_corpus_outputs(spark, b)
