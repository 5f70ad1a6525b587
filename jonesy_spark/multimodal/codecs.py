"""Vendored pure-Python image and audio codecs for the multimodal tier.

The container has no PIL/av, so until r6 every driver-checked media row
ran the deterministic *fake* decode path and the codec seam itself was
structurally untested (VERDICT r6, What's missing #2). Netpbm PPM is an
uncompressed format simple enough to implement exactly (~60 lines, no
dependency): these decoders make the mime-dispatched codec boundary in
``binary_ops`` REAL for ``image/x-portable-pixmap`` — payload bytes are
parsed, converted to luma, resampled and feature-hashed end to end —
while PIL remains the dispatch target for compressed formats when
importable.

Scope: PPM ``P6`` (binary) and ``P3`` (ASCII), maxval <= 255, plus the
grayscale/nearest-resize primitives the feature and dHash paths need;
and RIFF/WAVE PCM 16-bit mono for the audio modality (chunk-walking
parser, integer loudness envelope, waveform dHash front end).
All arithmetic is integer (BT.601 luma in parts-per-thousand, floor
division resampling), so every output is bit-reproducible in an ANSI
SQL oracle — which is what lets the real-codec driver row hash-compare
the whole decode chain against a closed form.
"""

from __future__ import annotations

#: Mimes the vendored decoder owns. ``image/x-portable-anymap`` is the
#: family mime some sources emit for any Netpbm payload.
PPM_MIMES = frozenset({"image/x-portable-pixmap", "image/x-portable-anymap"})


def encode_ppm(width: int, height: int, rgb: list[tuple[int, int, int]]) -> bytes:
    """Serialize row-major RGB triples as a binary ``P6`` PPM."""
    if len(rgb) != width * height:
        raise ValueError(f"expected {width * height} pixels, got {len(rgb)}")
    header = f"P6\n{width} {height}\n255\n".encode()
    body = bytes(c for px in rgb for c in px)
    return header + body


def encode_ppm_raw(width: int, height: int, raster: bytes) -> bytes:
    """Serialize an already-packed row-major RGB raster as binary
    ``P6`` — the zero-copy sibling of :func:`encode_ppm` for callers
    that build the raster as a numpy array (``.tobytes()``); both emit
    byte-identical payloads for the same pixels (test-pinned)."""
    if len(raster) != 3 * width * height:
        raise ValueError(
            f"expected {3 * width * height} raster bytes, got {len(raster)}"
        )
    return f"P6\n{width} {height}\n255\n".encode() + raster


def _read_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read ``n_tokens`` whitespace-separated integer tokens after the
    magic, honoring ``#`` comment lines (the Netpbm header grammar).
    Returns the tokens and the offset one whitespace byte past the
    last one (where P6 raster bytes begin)."""
    tokens: list[int] = []
    i = 2  # past the 2-byte magic
    cur = b""
    while len(tokens) < n_tokens:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[i : i + 1]
        if ch == b"#":
            # a comment terminates an in-progress token exactly like
            # whitespace would ('255#c\n16' is 255 then 16, never
            # 25516 — ADVICE r7): flush before skipping the line
            if cur:
                tokens.append(int(cur))
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            if cur:
                tokens.append(int(cur))
                cur = b""
        else:
            if not ch.isdigit():
                raise ValueError(f"bad PPM header byte {ch!r} at offset {i}")
            cur += ch
        i += 1
    return tokens, i


def decode_ppm(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse a ``P6`` (binary) or ``P3`` (ASCII) PPM payload into
    ``(width, height, row-major RGB triples)``. Raises ``ValueError``
    on truncation, bad magic, or maxval > 255 — a malformed payload
    must fail the batch loudly (the quarantine philosophy), never
    yield garbage pixels."""
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"not a PPM payload (magic {magic!r})")
    (width, height, maxval), offset = _read_header_tokens(payload, 3)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PPM dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    n = width * height
    if magic == b"P6":
        raster = payload[offset : offset + 3 * n]
        if len(raster) < 3 * n:
            raise ValueError(
                f"truncated P6 raster: need {3 * n} bytes, got {len(raster)}"
            )
        it = iter(raster)
        pixels = [(r, g, b) for r, g, b in zip(it, it, it)]
    else:
        vals = payload[offset - 1 :].split()
        if len(vals) < 3 * n:
            raise ValueError(
                f"truncated P3 raster: need {3 * n} values, got {len(vals)}"
            )
        ints = [int(v) for v in vals[: 3 * n]]
        pixels = [tuple(ints[k : k + 3]) for k in range(0, 3 * n, 3)]
    bad = next((p for p in pixels if max(p) > maxval), None)
    if bad is not None:
        raise ValueError(f"pixel {bad} exceeds declared maxval {maxval}")
    return width, height, pixels


def luma(rgb: list[tuple[int, int, int]]) -> list[int]:
    """Integer BT.601 luma (parts-per-thousand weights, floor division)
    — deterministic and oracle-reproducible, unlike float luma."""
    return [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in rgb]


# --- vectorized luma-grid fast path ---------------------------------
#
# The per-pixel Python above is exact but was the throughput ceiling
# at the Arrow codec boundary (a 32x32 frame is 3 072 bytes; the tuple
# list + three list comprehensions per frame dominated the
# multimodal_* bench rows). The helpers below compute the SAME
# integers — BT.601 parts-per-thousand floor luma, floor-rule nearest
# resize, identical validation errors — on numpy int arrays, and the
# equality is pinned per payload class in tests/test_multimodal.py.


def _p6_luma_grid(payload: bytes):
    """(width, height, int32 luma grid [h, w]) for one validated P6
    payload — same header parsing, truncation and maxval errors as
    :func:`decode_ppm`, no per-pixel tuples."""
    import numpy as np

    (width, height, maxval), offset = _read_header_tokens(payload, 3)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PPM dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    n = width * height
    raster = np.frombuffer(payload, dtype=np.uint8, offset=offset)
    if raster.size < 3 * n:
        raise ValueError(
            f"truncated P6 raster: need {3 * n} bytes, got {raster.size}"
        )
    px = raster[: 3 * n].reshape(n, 3).astype(np.int32)
    if maxval < 255:
        over = (px > maxval).any(axis=1)
        if over.any():
            bad = tuple(int(v) for v in px[int(np.argmax(over))])
            raise ValueError(f"pixel {bad} exceeds declared maxval {maxval}")
    gray = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
    return width, height, gray.reshape(height, width)


def ppm_luma_grid(payload: bytes):
    """(width, height, int32 luma grid) for a PPM payload: the numpy
    fast path for P6, the tuple decoder for P3 (ASCII payloads are a
    quarantine-edge format, never the volume path)."""
    import numpy as np

    magic = payload[:2]
    if magic == b"P6":
        return _p6_luma_grid(payload)
    w, h, rgb = decode_ppm(payload)  # validates magic too
    return w, h, np.asarray(luma(rgb), dtype=np.int32).reshape(h, w)


def resize_grid(grid, w: int, h: int, tw: int, th: int):
    """Vectorized :func:`nearest_resize` — the identical floor rule
    ``src = (dst * src_dim) // dst_dim`` as fancy indexing."""
    import numpy as np

    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    return grid[np.ix_(rows, cols)]


def ppm_stream_luma_grids(payload: bytes):
    """The concatenated-P6 frame walker on the fast path:
    ``[(w, h, int32 luma grid)]`` with :func:`decode_ppm_stream`'s
    exact error surface (offset-stamped magic check, per-frame maxval
    and truncation, empty-stream rejection)."""
    frames = []
    pos = 0
    while pos < len(payload):
        chunk = payload[pos:]
        if chunk[:2] != b"P6":
            raise ValueError(
                f"frame {len(frames)}: not a P6 frame at offset {pos} "
                f"(magic {chunk[:2]!r})"
            )
        (w, h, maxval), offset = _read_header_tokens(chunk, 3)
        if not 0 < maxval <= 255:
            raise ValueError(f"frame {len(frames)}: bad maxval {maxval}")
        end = offset + 3 * w * h
        if len(chunk) < end:
            raise ValueError(
                f"frame {len(frames)}: truncated raster "
                f"({len(chunk)} < {end})"
            )
        frames.append(_p6_luma_grid(chunk[:end]))
        pos += end
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


def nearest_resize(
    gray: list[int], width: int, height: int, tw: int, th: int
) -> list[int]:
    """Nearest-neighbor resample of a row-major grayscale grid to
    ``tw`` x ``th`` with the floor rule ``src = (dst * src_dim) //
    dst_dim`` — the simplest exactly-specified resampling (PIL's
    half-pixel-center rule differs; this one is ours and is mirrored
    verbatim in the SQL oracle)."""
    return [
        gray[((j * height) // th) * width + ((i * width) // tw)]
        for j in range(th)
        for i in range(tw)
    ]


def ppm_grayscale_thumb(payload: bytes, tw: int, th: int) -> list[int]:
    """Decode + luma + nearest-resize in one call: the shared front end
    of the feature and dHash paths. Rides the vectorized luma-grid
    path (same integers as decode_ppm + luma + nearest_resize — the
    equality is test-pinned)."""
    width, height, grid = ppm_luma_grid(payload)
    return resize_grid(grid, width, height, tw, th).ravel().tolist()


# --- WAV / PCM: the audio modality's vendored codec -----------------

#: Mimes the vendored WAV decoder owns.
WAV_MIMES = frozenset({"audio/wav", "audio/x-wav", "audio/wave"})


def encode_wav(samples: list[int], sample_rate: int = 8_000) -> bytes:
    """Serialize 16-bit signed mono PCM samples as a canonical RIFF/WAVE
    payload (fmt chunk + data chunk, little-endian)."""
    import struct

    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE payload into ``(sample_rate, int16 samples)``.
    Supports the format this engine's pipelines contract on — PCM
    (format tag 1), 16-bit, mono — and walks the chunk list (so extra
    chunks like LIST/INFO are skipped, not fatal). Malformed or
    unsupported payloads raise ``ValueError`` loudly (the quarantine
    philosophy), never yield garbage samples."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            f"not a RIFF/WAVE payload (magic {payload[:4]!r}/{payload[8:12]!r})"
        )
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk in WAVE payload")
    tag, channels, rate, _brate, _align, bits = fmt
    if (tag, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported WAVE format (tag={tag}, channels={channels}, "
            f"bits={bits}); this codec contracts PCM 16-bit mono"
        )
    n = len(data) // 2
    return rate, list(struct.unpack(f"<{n}h", data[: 2 * n]))


def frame_mean_abs(samples: list[int], n_frames: int) -> list[int]:
    """Per-frame mean ABSOLUTE amplitude (floor division) over
    ``n_frames`` equal contiguous frames — the integer loudness
    envelope the audio feature path emits (exactly reproducible in an
    ANSI-SQL oracle, unlike float RMS)."""
    n = len(samples)
    if n == 0:
        return [0] * n_frames
    out = []
    for j in range(n_frames):
        lo, hi = (j * n) // n_frames, ((j + 1) * n) // n_frames
        frame = samples[lo:hi] or [0]
        out.append(sum(abs(s) for s in frame) // len(frame))
    return out


def waveform_resample(samples: list[int], n_points: int) -> list[int]:
    """Nearest-sample resample of the waveform to ``n_points`` with the
    same floor rule as :func:`nearest_resize` — the front end of the
    waveform dHash."""
    n = len(samples)
    if n == 0:
        return [0] * n_points
    return [samples[(i * n) // n_points] for i in range(n_points)]


# --- multi-frame PPM streams: the video modality -------------------

#: House mime for a concatenated-P6 frame stream (the Netpbm
#: convention: consecutive binary PPM images in one payload form an
#: animation; each frame is self-describing via its own header).
PPM_STREAM_MIMES = frozenset({"video/x-ppm-stream"})


def decode_ppm_stream(
    payload: bytes,
) -> list[tuple[int, int, list[tuple[int, int, int]]]]:
    """Parse a concatenated-P6 frame stream into a list of decoded
    frames. Each frame's header declares its own dimensions, so the
    walker re-parses from the byte after each raster; a malformed
    frame fails the whole payload loudly (one corrupt frame poisons
    the clip — the quarantine rule, per-document granularity)."""
    frames = []
    pos = 0
    while pos < len(payload):
        chunk = payload[pos:]
        if chunk[:2] != b"P6":
            raise ValueError(
                f"frame {len(frames)}: not a P6 frame at offset {pos} "
                f"(magic {chunk[:2]!r})"
            )
        (w, h, maxval), offset = _read_header_tokens(chunk, 3)
        if not 0 < maxval <= 255:
            raise ValueError(f"frame {len(frames)}: bad maxval {maxval}")
        end = offset + 3 * w * h
        if len(chunk) < end:
            raise ValueError(
                f"frame {len(frames)}: truncated raster "
                f"({len(chunk)} < {end})"
            )
        _, _, pixels = decode_ppm(chunk[:end])
        frames.append((w, h, pixels))
        pos += end
    if not frames:
        raise ValueError("empty PPM stream")
    return frames
