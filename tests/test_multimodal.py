"""Multimodal binary-column plumbing: schema, batching, stub behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from jonesy_spark.catalog import Catalog
from jonesy_spark.multimodal.binary_ops import (
    attach_binary_payload,
    decode_stub,
    extract_features,
)


def test_binary_payload_schema(spark):
    docs = Catalog(spark, SF_DIR).documents
    payloads = attach_binary_payload(docs)
    schema = dict(payloads.dtypes)
    assert schema == {
        "doc_id": "bigint",
        "payload": "binary",
        "mime": "string",
        "byte_len": "bigint",
    }


def test_extract_features_deterministic(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(20)
    feats = extract_features(attach_binary_payload(docs), fake=True)
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert len(rows) == 20
    # Cross-check one row against a driver-side recomputation.
    src = docs.select("doc_id", "text").first()
    expected = [b / 255.0 for b in hashlib.md5(src["text"].encode()).digest()[:4]]
    got = rows[src["doc_id"]]["feature"]
    assert got == pytest.approx(expected, abs=1e-6)
    assert rows[src["doc_id"]]["byte_len"] == len(src["text"].encode())


def test_extract_features_real_decoder_stubbed(spark):
    docs = Catalog(spark, SF_DIR).documents.limit(1)
    feats = extract_features(attach_binary_payload(docs), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        feats.collect()


def test_decode_stub_unit():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", fake=False)
    assert decode_stub(b"abc", fake=True) == decode_stub(b"abc", fake=True)


def test_codec_dispatch_on_mime():
    """The real (fake=False) path dispatches on mime to whatever codec
    imports: with PIL present an image/* payload decodes to an 8x8
    grayscale feature vector; without it the call raises — in BOTH
    environments a non-image mime raises (no codec claims it)."""
    from jonesy_spark.multimodal import binary_ops as B

    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", fake=False, mime="application/pdf")

    if B._PILImage is None:
        with pytest.raises(NotImplementedError):
            decode_stub(b"\x89PNG", fake=False, mime="image/png")
        with pytest.raises(NotImplementedError):
            B.resize_stub(b"\x89PNG", 8, fake=False, mime="image/png")
    else:  # pragma: no cover - PIL absent in this container
        import io

        buf = io.BytesIO()
        B._PILImage.new("RGB", (3, 5), (10, 200, 30)).save(buf, format="PNG")
        png = buf.getvalue()
        feat = decode_stub(png, fake=False, mime="image/png")
        assert len(feat) == 64 and all(0.0 <= x <= 1.0 for x in feat)
        assert feat == decode_stub(png, fake=False, mime="image/png")
        out = B.resize_stub(png, 4, fake=False, mime="image/png")
        assert B._PILImage.open(io.BytesIO(out)).size == (4, 4)


def test_sample_frames_fanout(spark):
    """Frame sampling yields bounded per-doc fan-out with deterministic
    frame hashes, and frames stay joinable on doc_id."""
    from jonesy_spark.multimodal.binary_ops import sample_frames

    docs = Catalog(spark, SF_DIR).documents.limit(10)
    frames = sample_frames(attach_binary_payload(docs), stride=64, max_frames=4)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    for frames_of_doc in per_doc.values():
        assert 1 <= len(frames_of_doc) <= 4
        assert [f["frame_idx"] for f in sorted(frames_of_doc, key=lambda f: f["frame_idx"])] == list(
            range(len(frames_of_doc))
        )
        for f in frames_of_doc:
            assert len(f["frame_hash"]) == 12
            assert len(bytes(f["frame_bytes"])) <= 64


def test_resize_stub_behavior():
    from jonesy_spark.multimodal.binary_ops import resize_stub

    with pytest.raises(NotImplementedError):
        resize_stub(b"abc", 8, fake=False)
    out = resize_stub(b"abcdef", 4, fake=True)
    assert out == b"abcd"
    assert resize_stub(b"ab", 4, fake=True) == b"ab\0\0"


def test_feature_join_back(spark):
    """Features join back to the source on doc_id (plumbing stays relational)."""
    docs = Catalog(spark, SF_DIR).documents.limit(50)
    feats = extract_features(attach_binary_payload(docs), fake=True)
    joined = docs.join(feats.select("doc_id", "feature", "decoder"), "doc_id")
    assert joined.count() == 50
    assert "feature" in joined.columns


def test_byte_dhash_locality():
    """The fake path is a real dHash over byte samples: flipping one
    byte flips at most 2 bits; unrelated payloads land far apart."""
    import random

    from jonesy_spark.multimodal.binary_ops import perceptual_hash

    rnd = random.Random(7)
    base = bytes(rnd.randrange(256) for _ in range(640))
    h0 = perceptual_hash(base, fake=True, mime="image/png")
    # flip one sampled byte -> at most 2 comparison bits change
    mutated = bytearray(base)
    mutated[320] = (mutated[320] + 128) % 256
    h1 = perceptual_hash(bytes(mutated), fake=True, mime="image/png")
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 2
    # determinism + int64 range
    assert h0 == perceptual_hash(base, fake=True, mime="image/png")
    assert -(1 << 63) <= h0 < (1 << 63)
    assert perceptual_hash(b"", fake=True, mime="x") == 0


def test_media_near_dup_pairs(spark):
    """End-to-end: corrupted copies pair with their originals at small
    hamming; unrelated payloads don't pair; the band join is lossless
    for hamming <= max_hamming (every planted near-dup is found)."""
    import random

    from jonesy_spark.multimodal.binary_ops import media_near_dup

    rnd = random.Random(13)
    rows = []
    for i in range(10):
        p = bytes(rnd.randrange(256) for _ in range(640))
        rows.append((i, bytearray(p)))
        # id 100+i: a lightly-corrupted copy (2 byte flips)
        c = bytearray(p)
        for off in (100, 500):
            c[off] = (c[off] + 97) % 256
        rows.append((100 + i, c))
    df = spark.createDataFrame(
        [(i, bytes(p), "image/png", len(p)) for i, p in rows],
        "doc_id long, payload binary, mime string, byte_len long",
    )
    pairs = {
        (r["doc_id"], r["dup_doc_id"]): r["hamming"]
        for r in media_near_dup(df, max_hamming=7).collect()
    }
    # every planted copy found, paired with its original
    for i in range(10):
        assert (i, 100 + i) in pairs, f"missing planted near-dup {i}"
        assert pairs[(i, 100 + i)] <= 4
    # no cross-pairs between unrelated originals
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_media_near_dup_rejects_bad_hamming(spark):
    import pytest

    from jonesy_spark.multimodal.binary_ops import media_near_dup

    df = spark.createDataFrame([], "doc_id long, payload binary, mime string, byte_len long")
    with pytest.raises(ValueError):
        media_near_dup(df, max_hamming=8)
