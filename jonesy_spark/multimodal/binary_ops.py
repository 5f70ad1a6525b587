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
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real codec — present in a deployed image, not here
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised in this container
    _PILImage = None

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


def decode_stub(
    payload: bytes, fake: bool, mime: str = "application/octet-stream"
) -> list[float]:
    """Codec boundary: dispatches on mime to whatever decoder imports in
    this environment (PIL for ``image/*``; librosa/av would slot in the
    same way for audio/video). When no decoder applies and ``fake`` is
    False this raises — a missing codec must fail the batch loudly, not
    emit silent garbage features."""
    if fake:
        # Deterministic fake: 4 floats from the md5 of the payload.
        digest = hashlib.md5(payload).digest()
        return [b / 255.0 for b in digest[:4]]
    if _PILImage is not None and mime.startswith("image/"):
        # 8x8 grayscale thumbnail as the feature vector: deterministic
        # (PIL's nearest-neighbor resize), size-normalized, and cheap —
        # a stand-in for a real embedding model at the same seam.
        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        return [p / 255.0 for p in img.getdata()]
    raise NotImplementedError(
        f"no decoder available for mime={mime!r} in this environment; "
        "pass fake=True for the deterministic stand-in"
    )


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


def resize_stub(
    payload: bytes,
    target: int,
    fake: bool,
    mime: str = "application/octet-stream",
) -> bytes:
    """Resize codec boundary — same dispatch as :func:`decode_stub`:
    PIL for ``image/*`` when importable (re-encoded as PNG at
    ``target`` x ``target``); the fake path deterministically
    truncates/pads so plumbing is testable without codecs."""
    if fake:
        return payload[:target].ljust(target, b"\0")
    if _PILImage is not None and mime.startswith("image/"):
        img = _PILImage.open(io.BytesIO(payload)).resize((target, target))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    raise NotImplementedError(
        f"no image codec for mime={mime!r} in this environment; "
        "pass fake=True"
    )


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
                    "feature": [
                        decode_stub(bytes(p), fake, m)
                        for p, m in zip(pdf["payload"], pdf["mime"])
                    ],
                    "decoder": "stub-fake"
                    if fake
                    else ("pil" if _PILImage is not None else "real"),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
