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
