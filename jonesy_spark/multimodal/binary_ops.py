"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
Arrow-batched Pandas-UDF decode/feature plumbing.

Design (per the 100 TB brief): media travels as a ``binary`` column next
to typed metadata (mime, byte_len, width/height/duration when known).
Decode / resize / frame-sample run as ``mapInPandas`` over Arrow record
batches — one Python hop per *batch*, never per row, and the schema is
declared up front so Catalyst can prune un-referenced columns before
the Python boundary.

The actual codec step is STUBBED: this container has no image/audio
libraries, so ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the payload bytes. The Spark-side plumbing —
schema, batching, partition behavior — is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extraction step (declared up front so
#: downstream plans are fully typed).
FEATURE_SCHEMA = (
    "doc_id long, mime string, byte_len long, feature array<float>, decoder string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in source: pack a text column as the opaque binary payload
    plus typed metadata, mirroring how a real media table would land
    (payload + mime + byte_len)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
    )


def decode_stub(payload: bytes, fake: bool) -> list[float]:
    """Codec boundary. Real deployment would dispatch on mime to
    PIL/librosa/av; none exist in this container."""
    if not fake:
        raise NotImplementedError(
            "media codecs unavailable in this environment; pass fake=True "
            "for the deterministic stand-in"
        )
    # Deterministic fake: 4 floats from the md5 of the payload.
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:4]]


#: Output schema of the frame-sampling step: one row per sampled frame.
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, frame_hash string"
)


def sample_frames(df: DataFrame, stride: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit up to
    ``max_frames`` fixed-stride slices of each binary payload as rows.

    The slicing stands in for codec-level frame extraction (no av
    libraries in this container); the Spark shape is the real one — a
    ``mapInPandas`` fan-out where each input row yields N output rows,
    so downstream per-frame operators (resize, embed) stay relational.
    """
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized explode: one frame count per row, then a single
            # np.repeat fan-out — no per-row iterrows; the only Python
            # loop left is over the (already exploded) frame slices,
            # which is the per-frame codec boundary itself.
            payloads = [bytes(p) for p in pdf["payload"]]
            counts = np.array(
                [min(max_frames, max(1, len(p) // stride)) for p in payloads]
            )
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), counts)
            frame_idx = np.concatenate([np.arange(c) for c in counts])
            frames = [
                p[i * stride : (i + 1) * stride]
                for p, c in zip(payloads, counts)
                for i in range(c)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": frames,
                    "frame_hash": [
                        _hl.md5(fr).hexdigest()[:12] for fr in frames
                    ],
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(payload: bytes, target: int, fake: bool) -> bytes:
    """Resize codec boundary — stubbed like decode_stub; the fake path
    deterministically truncates/pads so plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True"
        )
    return payload[:target].ljust(target, b"\0")


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers each partition as an iterator of pandas batches; we
    transform batch-at-a-time (vectorized apply over the batch) and
    yield typed frames matching FEATURE_SCHEMA. At scale the partition
    count (not the batch size) bounds Python parallelism — repartition
    upstream if payload sizes are skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "byte_len": pdf["byte_len"],
                    "feature": pdf["payload"].map(lambda p: decode_stub(bytes(p), fake)),
                    "decoder": "stub-fake" if fake else "real",
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
