"""WARC ingest: the web-crawl archive format as a first-class source.

Public corpora at the 100 TB scale overwhelmingly arrive as WARC
(ISO 28500 — the Common Crawl interchange format): a stream of
length-prefixed records, each a ``WARC/1.0`` header block (CRLF-framed
name:value fields ending in an empty line) followed by exactly
``Content-Length`` payload bytes, then CRLF CRLF. Archives are usually
per-record-gzipped (concatenated gzip members), which is what keeps
them streamable.

This module vendors a dependency-free reader/writer pair plus the
Spark boundary:

* :func:`encode_warc` / :func:`parse_warc` — exactly-specified bytes
  in, records out; malformed framing raises (the quarantine rule —
  a mis-framed archive silently corrupts every later record, so the
  parse fails the PAYLOAD loudly rather than resynchronizing).
* gzip transparency: a payload whose magic is ``1f 8b`` is
  decompressed as concatenated members via stdlib zlib before the
  record walk — the Common Crawl layout, no library needed.
* :func:`warc_text_records` — the Spark seam: ``mapInPandas`` over
  ``(archive_id, payload)`` rows (e.g. ``spark.read.format
  ("binaryFile")`` over a WARC directory), one Arrow hop per batch,
  exploding each archive into its ``response`` records ``(archive_id,
  record_url, record_ts, text, n_bytes)``.

Scale shape: WARC archives are NOT splittable mid-file (records are
length-prefixed with no sync markers), so the unit of parallelism is
the ARCHIVE — exactly how Common Crawl ships (tens of thousands of
~1 GB files), and exactly what ``binaryFile`` + ``mapInPandas``
parallelize over: one archive per task, no driver involvement, Python
touching only the codec boundary. Downstream of this seam the rows
are ordinary ``documents``-shaped text for the ingest pipeline's
declared-schema/quarantine contract.

Reference note: the reference engine reads only database views
(``jonesy/queries.py:28-264``); this module is part of the
training-data extension surface, like the JSONL front door in
``pipeline/ingest.py``.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

CRLF = b"\r\n"


def encode_warc(
    records: list[tuple[str, str, bytes]], gzip_members: bool = False
) -> bytes:
    """Serialize ``(url, iso_ts, body)`` triples as a WARC/1.0 stream
    of ``response`` records; ``gzip_members=True`` compresses each
    record as its own gzip member (the Common Crawl layout)."""
    out = []
    for url, ts, body in records:
        header = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + b"WARC-Target-URI: " + url.encode() + CRLF
            + b"WARC-Date: " + ts.encode() + CRLF
            + b"Content-Length: " + str(len(body)).encode() + CRLF
            + CRLF
        )
        rec = header + body + CRLF + CRLF
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress concatenated gzip members (each WARC record its own
    member in the Common Crawl layout) into one plain stream."""
    out = []
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(payload[pos:]))
            out.append(d.flush())
        except zlib.error as exc:
            raise ValueError(
                f"corrupt gzip member at offset {pos}: {exc}"
            ) from exc
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"corrupt gzip member at offset {pos}")
        pos += consumed
    return b"".join(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Walk a (possibly per-record-gzipped) WARC stream into records:
    ``{"type", "url", "ts", "body"}`` dicts, in archive order.

    Framing violations raise ``ValueError``: a record without the
    mandatory version line, ``Content-Length``, or its trailing
    CRLF CRLF desynchronizes every subsequent record, so the whole
    payload is quarantined loudly rather than half-read."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records = []
    pos, end = 0, len(payload)
    while pos < end:
        # tolerate stray inter-record CRLFs (some writers pad)
        while payload[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= end:
            break
        head_end = payload.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError(
                f"record {len(records)}: unterminated header at {pos}"
            )
        head = payload[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"record {len(records)}: bad version line {lines[0]!r}"
            )
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError(f"record {len(records)}: missing Content-Length")
        n = int(fields["content-length"])
        body_start = head_end + 4
        body = payload[body_start : body_start + n]
        if len(body) < n:
            raise ValueError(
                f"record {len(records)}: truncated body ({len(body)} < {n})"
            )
        if payload[body_start + n : body_start + n + 4] != CRLF + CRLF:
            raise ValueError(
                f"record {len(records)}: missing record terminator"
            )
        records.append(
            {
                "type": fields.get("warc-type", ""),
                "url": fields.get("warc-target-uri", ""),
                "ts": fields.get("warc-date", ""),
                "body": body,
            }
        )
        pos = body_start + n + 4
    return records


def warc_text_records(df):
    """The Spark seam: explode ``(archive_id, payload)`` rows into
    their ``response`` records' text — ``(archive_id, record_url,
    record_ts, text, n_bytes)``. One Arrow-batched Python hop per
    batch of archives; parallelism = archive count (the format's
    natural split unit — see the module docstring)."""
    import pandas as pd

    schema = (
        "archive_id string, record_url string, record_ts string, "
        "text string, n_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            aids, urls, tss, texts, sizes = [], [], [], [], []
            for aid, p in zip(pdf["archive_id"], pdf["payload"]):
                for rec in parse_warc(bytes(p)):
                    if rec["type"] != "response":
                        continue
                    aids.append(aid)
                    urls.append(rec["url"])
                    tss.append(rec["ts"])
                    texts.append(rec["body"].decode("utf-8", "replace"))
                    sizes.append(len(rec["body"]))
            yield pd.DataFrame(
                {
                    "archive_id": aids,
                    "record_url": urls,
                    "record_ts": tss,
                    "text": texts,
                    "n_bytes": sizes,
                }
            )

    return df.mapInPandas(run, schema=schema)
