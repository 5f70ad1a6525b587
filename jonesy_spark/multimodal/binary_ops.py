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


#: Output schema of the perceptual-hash step.
PHASH_SCHEMA = "doc_id long, phash long"


def _dhash_bits(values: list[int]) -> int:
    """64-bit difference hash over a 65-sample signal: bit i is
    (sample[i+1] > sample[i]). The classic dHash construction —
    locality-preserving: a small change to the signal flips few bits."""
    h = 0
    for i in range(64):
        h = (h << 1) | (1 if values[i + 1] > values[i] else 0)
    # two's-complement into int64 range for a Spark BIGINT
    return h - (1 << 64) if h >= (1 << 63) else h


def perceptual_hash(payload: bytes, fake: bool, mime: str) -> int:
    """64-bit perceptual hash of a media payload.

    PIL path (``image/*`` when importable): standard image dHash —
    grayscale 9x8 thumbnail, bit per horizontal neighbor comparison.
    Fake path: the SAME dHash construction over 65 evenly-spaced bytes
    of the raw payload ("byte-space dHash") — deterministic, codec-free
    and still locality-preserving (a few changed bytes flip a few
    bits), so the near-dup plumbing is testable end-to-end without
    codecs, unlike an md5-style fake that would destroy locality.
    """
    if not fake and _PILImage is not None and mime.startswith("image/"):
        img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((9, 8))
        px = list(img.getdata())  # row-major 9x8
        h = 0
        for r in range(8):
            for c in range(8):
                h = (h << 1) | (1 if px[r * 9 + c + 1] > px[r * 9 + c] else 0)
        return h - (1 << 64) if h >= (1 << 63) else h
    if not fake:
        raise NotImplementedError(
            f"no perceptual-hash codec for mime={mime!r}; pass fake=True"
        )
    if len(payload) == 0:
        return 0
    n = len(payload)
    samples = [payload[min(n - 1, (i * n) // 65)] for i in range(65)]
    return _dhash_bits(samples)


def perceptual_hashes(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas batch computation of :func:`perceptual_hash` —
    ``(doc_id, phash)``, the sketch table media near-dup blocks on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [
                        perceptual_hash(bytes(p), fake, m)
                        for p, m in zip(pdf["payload"], pdf["mime"])
                    ],
                }
            )

    return df.mapInPandas(run, schema=PHASH_SCHEMA)


def media_near_dup(
    df: DataFrame, max_hamming: int = 7, fake: bool = True
) -> DataFrame:
    """Near-duplicate media pairs by perceptual hash: ``(doc_id,
    dup_doc_id, hamming)`` for every payload pair within
    ``max_hamming`` bits.

    Same 100 TB shape as the text SimHash operator: 8 pigeonhole bands
    of 8 bits (PROVABLY lossless for ``max_hamming < 8`` — two hashes
    within h bits must agree on at least one of h+1 disjoint bands),
    band-key self-join, exact ``bit_count(xor)`` verification. The
    only Python is the per-payload hash (Arrow-batched); banding,
    joining and verification are all JVM-side bit arithmetic on one
    BIGINT per row.
    """
    if not 0 <= max_hamming < 8:
        raise ValueError(f"max_hamming must be in [0, 8) for 8 bands, got {max_hamming}")
    sketches = perceptual_hashes(df, fake=fake)
    banded = sketches.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned(F.col("phash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("band_key"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_id", "b.band_key")
    right = banded.select(
        F.col("doc_id").alias("dup_doc_id"),
        F.col("phash").alias("dup_phash"),
        "band_id",
        "band_key",
    )
    return (
        banded.join(right, ["band_id", "band_key"])
        .filter(F.col("doc_id") < F.col("dup_doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("phash").bitwiseXOR(F.col("dup_phash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id", "dup_doc_id", "hamming")
        .dropDuplicates(["doc_id", "dup_doc_id"])
    )
