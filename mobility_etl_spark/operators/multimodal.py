"""Multimodal binary-column operators (SURVEY.md §2.C N4): decode,
feature-extract, resize, frame-sample, pointer-load — all as
Arrow-batched ``mapInPandas`` stages over opaque ``binary`` payloads.

Decode is REAL for binary PPM (P6) — :func:`decode_ppm` is a pure
numpy parser, and :func:`decode_resize_images` runs an actual
decode → nearest-neighbor resize → channel statistics pipeline,
oracle-checked pixel-for-pixel (``multimodal_ppm_decode``) — and REAL
for COMPRESSED PNG via pure stdlib zlib (:func:`decode_png`: DEFLATE
inflate, CRC-32 validation, all five scanline filter reconstructions).
Codecs that genuinely need external libraries (JPEG/MP3/H.264) stay
behind the honest :func:`fake_decode` stub: it derives deterministic
media dimensions from the payload bytes so every downstream stage —
batch iteration, schemas, partitioning, output contracts — is still
real and tested. Swap the stub for Pillow/av and nothing else changes.

100 TB pattern (pointer-not-payload): store (uri, sha256, n_bytes) in
the table, keep bytes in object storage, and load them *inside* the
mapInPandas batch loop (:func:`load_pointer_payloads`) — the shuffle
moves 100-byte pointers, never gigabyte payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_SIZE = 256  # bytes per fake "frame" — one video frame stand-in


def fake_decode(payload: bytes) -> dict:
    """Deterministic decode stub: pretend the payload is media with
    dimensions derived from its content hash. Replace with
    Pillow/torchaudio/av in production (NotImplementedError would be
    the honest stub, but a deterministic fake lets every downstream
    stage be end-to-end tested)."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,  # 64..255
        "height": 64 + h[1] % 192,
        "n_channels": 3,
    }


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)


def decode_features(payloads: DataFrame) -> DataFrame:
    """Decode + feature-extract: (doc_id, payload) → typed media
    metadata. Arrow batches in, Arrow batches out; Python never sees
    one row at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m["width"]).astype("int32"),
                    "height": meta.map(lambda m: m["height"]).astype("int32"),
                    "n_channels": meta.map(lambda m: m["n_channels"]).astype("int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                }
            )

    return payloads.mapInPandas(run, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("thumb_sha256", StringType()),
    ]
)


def resize_thumbnails(payloads: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage: aspect-preserving bound to ``max_side``; the
    "thumbnail" is the deterministic stub (every FRAME_SIZE-th byte of
    the payload, standing in for the resampled pixel buffer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "out_width": [], "out_height": [], "thumb_sha256": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = fake_decode(payload)
                scale = max_side / max(m["width"], m["height"])
                rows["doc_id"].append(doc_id)
                rows["out_width"].append(max(1, int(m["width"] * scale)))
                rows["out_height"].append(max(1, int(m["height"] * scale)))
                rows["thumb_sha256"].append(
                    hashlib.sha256(payload[::FRAME_SIZE]).hexdigest()
                )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(payloads: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling stage (one row in → many out): the payload is
    cut into FRAME_SIZE-byte frames and every ``every``-th frame is
    emitted — the keyframe-extraction shape for video. Output rows
    carry the raw frame bytes for downstream per-frame features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
                for idx in range(0, n_frames, every):
                    frame = payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_bytes"].append(len(frame))
                    rows["frame"].append(frame)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, FRAME_SCHEMA)


PPM_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("thumb_sum_r", LongType()),
    ]
)


def encode_ppm(width: int, height: int, doc_id: int) -> bytes:
    """A real binary PPM (P6) image with a deterministic pixel pattern
    — the payload generator for the decode pipeline's tests/oracle.
    Channel values are simple integer functions of (x, y, doc_id) so an
    independent engine can recompute every statistic from first
    principles."""
    import numpy as np

    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:, :, 0] = (3 * x + 7 * y + doc_id) % 256
    img[:, :, 1] = (x * y + doc_id) % 256
    img[:, :, 2] = (x + 2 * y) % 256
    return b"P6\n%d %d\n255\n" % (width, height) + img.tobytes()


def decode_ppm(payload: bytes):
    """REAL image decode, pure numpy (binary PPM / P6): parse the
    text header, reinterpret the pixel buffer as (h, w, 3) uint8. No
    media library required — which is exactly why PPM is the modality
    this container can decode for real while JPEG/PNG stay behind the
    honest :func:`fake_decode` stub."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    width, height, maxval = (int(g) for g in m.groups())
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=width * height * 3, offset=m.end()
    )
    return pixels.reshape(height, width, 3)


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resample by integer index selection — the
    vectorized numpy form of src = (dst · src_size) // dst_size."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


def decode_resize_images(payloads: DataFrame, thumb: int = 4) -> DataFrame:
    """The REAL decode → resize → feature stage (N4, no stub): each
    Arrow batch decodes its PPM payloads, computes exact per-channel
    sums, and nearest-resamples to a ``thumb``×``thumb`` thumbnail.
    Same mapInPandas shape as the stubbed codecs, so swapping in a
    JPEG decoder is a one-function change."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in PPM_DECODE_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_ppm(payload)
                h, w = img.shape[:2]
                small = resize_nearest(img, thumb, thumb)
                sums = img.astype("int64").sum(axis=(0, 1))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(w * h)
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
                rows["thumb_sum_r"].append(
                    int(small[:, :, 0].astype("int64").sum())
                )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, PPM_DECODE_SCHEMA)


POINTER_LOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("uri", StringType()),
        StructField("loaded_sha256", StringType()),
        StructField("hash_ok", IntegerType()),
    ]
)


def load_pointer_payloads(pointers: DataFrame) -> DataFrame:
    """Pointer-not-payload load: rows are (doc_id, uri, sha256); bytes
    are opened INSIDE the batch loop from ``uri`` and integrity-checked
    against the stored digest. Local paths here; s3/abfss in
    production — same operator, different filesystem."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            loaded = []
            for uri in pdf["uri"]:
                with open(uri, "rb") as f:
                    loaded.append(hashlib.sha256(f.read()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "uri": pdf["uri"],
                    "loaded_sha256": loaded,
                    "hash_ok": (
                        pd.Series(loaded).values == pdf["sha256"].values
                    ).astype("int32"),
                }
            )

    return pointers.mapInPandas(run, POINTER_LOAD_SCHEMA)


# --------------------------------------------------------------------- audio


def encode_wav(doc_id: int) -> bytes:
    """A real RIFF/WAVE file (PCM16) with a closed-form sample pattern
    — the audio counterpart of :func:`encode_ppm`. Channel count,
    sample rate and length all vary with doc_id so the decoder's
    header parsing is actually exercised; sample values are integer
    functions of (doc_id, frame, channel) an independent engine can
    recompute exactly."""
    import struct

    import numpy as np

    channels = 1 + doc_id % 2
    rate = 8000 + (doc_id % 3) * 4000
    frames = 40 + doc_id % 20
    i = np.arange(frames, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)[None, :]
    samples = ((doc_id * 31 + i * 17 + c * 7) % 2001 - 1000).astype("<i2")
    data = samples.tobytes()  # interleaved little-endian PCM16
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes):
    """REAL audio decode, pure stdlib+numpy (RIFF/WAVE PCM16): walk the
    chunk list generically (fmt may be followed by LIST/fact chunks in
    the wild), validate PCM16, reinterpret the data chunk as an
    interleaved (frames, channels) int16 array. Returns
    (sample_rate, samples). Like PPM for images, WAV is the audio
    container this environment can decode for real — compressed codecs
    (MP3/AAC/Opus) stay behind the honest stub."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    rate = channels = None
    samples = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"truncated fmt chunk ({len(body)} bytes)")
            audio_fmt, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}")
            if block_align != channels * 2:
                raise ValueError(
                    f"block_align {block_align} != channels*2 ({channels * 2})"
                )
        elif cid == b"data":
            if channels is None:
                raise ValueError("data chunk before fmt")
            if len(body) < size:
                raise ValueError(
                    f"truncated data chunk ({len(body)} of {size} bytes)"
                )
            if size % (channels * 2) != 0:
                raise ValueError(
                    f"data chunk size {size} not a multiple of the "
                    f"{channels * 2}-byte frame"
                )
            samples = np.frombuffer(body, dtype="<i2").reshape(-1, channels)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None:
        raise ValueError("no data chunk")
    return rate, samples


WAV_DECODE_SCHEMA = (
    "doc_id long, channel int, n_channels int, sample_rate int, "
    "n_frames int, peak_abs int, sumsq bigint, zero_crossings int"
)


def wav_channel_features(payloads: DataFrame) -> DataFrame:
    """Decode → per-channel feature extraction for WAV payloads: one
    output row per (doc_id, channel) with exact integer statistics —
    peak |amplitude|, energy (Σs²), strict zero crossings
    (s[i-1]·s[i] < 0). All integers, so the oracle equality is exact.
    Same Arrow-batched mapInPandas shape as every codec stage; at
    100 TB decode cost is per-byte numpy work with no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id",
                    "channel",
                    "n_channels",
                    "sample_rate",
                    "n_frames",
                    "peak_abs",
                    "sumsq",
                    "zero_crossings",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_wav(payload)
                frames, channels = samples.shape
                s64 = samples.astype("int64")
                for ch in range(channels):
                    s = s64[:, ch]
                    rows["doc_id"].append(int(doc_id))
                    rows["channel"].append(ch)
                    rows["n_channels"].append(channels)
                    rows["sample_rate"].append(int(rate))
                    rows["n_frames"].append(frames)
                    rows["peak_abs"].append(int(abs(s).max()))
                    rows["sumsq"].append(int((s * s).sum()))
                    rows["zero_crossings"].append(
                        int(((s[:-1] * s[1:]) < 0).sum())
                    )
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, WAV_DECODE_SCHEMA)


# --------------------------------------------------------------------- video


def encode_y4m(doc_id: int) -> bytes:
    """A real YUV4MPEG2 (y4m) video clip, C444 colorspace, with
    closed-form plane values — the video counterpart of
    :func:`encode_ppm`/:func:`encode_wav`. Dimensions and frame count
    vary with doc_id so header parsing and frame segmentation are both
    exercised."""
    import numpy as np

    w = 8 + doc_id % 5
    h = 6 + doc_id % 4
    n_frames = 3 + doc_id % 4
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()
    out = [header]
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    for f in range(n_frames):
        yp = ((doc_id * 7 + f * 13 + y * 3 + x) % 256).astype(np.uint8)
        up = ((doc_id + f + x * 2 + y) % 256).astype(np.uint8)
        vp = ((doc_id * 5 + f * 3 + x + y * 4) % 256).astype(np.uint8)
        out.append(b"FRAME\n" + yp.tobytes() + up.tobytes() + vp.tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """REAL video decode, pure numpy (YUV4MPEG2 / C444): parse the
    stream header tokens (W/H/C), walk the FRAME markers, reinterpret
    each frame's three full planes. Returns (w, h, frames) where
    frames is a list of (3, h, w) uint8 arrays. Interlaced/subsampled
    colorspaces and compressed codecs (H.264 etc.) stay behind the
    honest stub — y4m is the container this environment can decode
    for real."""
    import numpy as np

    nl = payload.index(b"\n")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = b"C420"
    for t in tokens[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"C":
            colorspace = t
    if w is None or h is None:
        raise ValueError("missing W/H in y4m header")
    if colorspace != b"C444":
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    frame_bytes = 3 * w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        planes = np.frombuffer(payload, np.uint8, count=frame_bytes, offset=pos)
        frames.append(planes.reshape(3, h, w))
        pos += frame_bytes
    return w, h, frames


Y4M_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "sum_y bigint, sum_u bigint, sum_v bigint"
)


def y4m_frame_stats(payloads: DataFrame) -> DataFrame:
    """Decode → per-frame plane statistics for y4m payloads: one row
    per (doc_id, frame) with exact integer plane sums — the real
    frame-extraction stage the stubbed ``sample_frames`` models for
    opaque codecs. Arrow-batched mapInPandas; per-byte numpy work, no
    shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "frame_idx", "width", "height",
                    "sum_y", "sum_u", "sum_v",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, frames = decode_y4m(payload)
                for idx, fr in enumerate(frames):
                    s = fr.astype("int64").sum(axis=(1, 2))
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sum_y"].append(int(s[0]))
                    rows["sum_u"].append(int(s[1]))
                    rows["sum_v"].append(int(s[2]))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, Y4M_SCHEMA)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, doc_id: int) -> bytes:
    """A REAL PNG (8-bit RGB, color type 2): the same closed-form
    pixel pattern as :func:`encode_ppm`, DEFLATE-compressed with
    scanline filters CYCLING through all five types (None/Sub/Up/
    Average/Paeth by ``y % 5``) so the decoder's full filter
    reconstruction is exercised, chunked as IHDR/IDAT/IEND with real
    CRC-32s. Pure stdlib (zlib, struct, binascii) — PNG is the one
    compressed image format this container can round-trip for real."""
    import binascii
    import struct
    import zlib

    import numpy as np

    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:, :, 0] = (3 * x + 7 * y + doc_id) % 256
    img[:, :, 1] = (x * y + doc_id) % 256
    img[:, :, 2] = (x + 2 * y) % 256

    bpp = 3
    raw = bytearray()
    prev = bytes(width * bpp)
    for yy in range(height):
        line = img[yy].tobytes()
        ftype = yy % 5
        raw.append(ftype)
        if ftype == 0:  # None
            raw += line
        elif ftype == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) % 256
                for i in range(len(line))
            )
        elif ftype == 2:  # Up
            raw += bytes(
                (line[i] - prev[i]) % 256 for i in range(len(line))
            )
        elif ftype == 3:  # Average
            raw += bytes(
                (
                    line[i]
                    - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2
                )
                % 256
                for i in range(len(line))
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                % 256
                for i in range(len(line))
            )
        prev = line

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = binascii.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL compressed-image decode, pure stdlib: parse the chunk
    stream (validating every CRC-32), require 8-bit RGB (color type
    2, no interlace), zlib-INFLATE the concatenated IDAT data, and
    reconstruct all five scanline filters (None/Sub/Up/Average/Paeth)
    byte-exactly per RFC 2083. Returns ((h, w, 3) uint8 array,
    filter-type list) — the filters are surfaced so tests can prove
    the hard paths actually ran. This is the honest counterweight to
    :func:`fake_decode`: DEFLATE + filter reconstruction is a genuine
    compressed codec; JPEG/MP3/H.264 still need libraries this
    container doesn't have and stay stubbed."""
    import binascii
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if binascii.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(f"unsupported PNG shape {ihdr}")
    raw = zlib.decompress(bytes(idat))
    bpp, stride = 3, width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(height * stride)
    prev = bytes(stride)
    filters = []
    for yy in range(height):
        off = yy * (stride + 1)
        ftype = raw[off]
        filters.append(ftype)
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) % 256
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) % 256
        elif ftype == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) % 256
        elif ftype == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) % 256
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype} on row {yy}")
        out[yy * stride : (yy + 1) * stride] = line
        prev = bytes(line)
    img = np.frombuffer(bytes(out), dtype=np.uint8).reshape(height, width, 3)
    return img, filters


#: μ-law companding constants: 14-bit linear range, 33 = 2^5 + 1 bias.
_ULAW_CLIP = 8159
_ULAW_BIAS = 33


def encode_ulaw(doc_id: int) -> bytes:
    """A COMPRESSED audio payload: G.711-style μ-law companding (8-bit
    logarithmic codes for 14-bit linear samples — a real 2:1 lossy
    codec built from pure integer arithmetic, precisely specified here
    so any engine can replay it closed-form). Samples are a closed
    form of (doc_id, i); container is a minimal 'ULAW' header + one
    code byte per sample.

    Per sample s in [-8159, 8159]: sign bit; m = min(|s|, 8159) + 33;
    segment e = bitlen(m) - 6 in [0, 7]; mantissa = the 4 bits below
    the leading 1; code = sign<<7 | e<<4 | mantissa."""
    import numpy as np

    n = 50 + doc_id % 50
    i = np.arange(n, dtype=np.int64)
    s = (doc_id * 7919 + i * i * 31) % 16001 - 8000
    sign = (s < 0).astype(np.int64)
    m = np.minimum(np.abs(s), _ULAW_CLIP) + _ULAW_BIAS
    bounds = 64 << np.arange(7, dtype=np.int64)  # 64,128,...,4096
    e = np.searchsorted(bounds, m, side="right")
    mantissa = (m >> (e + 1)) & 0xF
    code = (sign << 7) | (e << 4) | mantissa
    return b"ULAW" + n.to_bytes(4, "big") + bytes(code.astype(np.uint8))


def decode_ulaw(payload: bytes):
    """REAL compressed-audio decode: expand μ-law codes back to linear
    samples with the midpoint reconstruction
    ``m̂ = ((2·mantissa + 33) << e) − 33`` (the implied leading 1 plus
    the midpoint of the e+1 truncated bits — the standard μ-law
    expander shape). Returns an int64 numpy array; max quantization
    error is bounded by half the segment step (2^e ≤ 128)."""
    import numpy as np

    if payload[:4] != b"ULAW":
        raise ValueError("not a ULAW payload")
    n = int.from_bytes(payload[4:8], "big")
    code = np.frombuffer(payload, dtype=np.uint8, count=n, offset=8).astype(
        np.int64
    )
    sign = 1 - 2 * (code >> 7)
    e = (code >> 4) & 0x7
    mantissa = code & 0xF
    m_hat = ((2 * mantissa + 33) << e) - _ULAW_BIAS
    return sign * m_hat


def encode_avi_rle8(doc_id: int) -> bytes:
    """A REAL compressed video: minimal RIFF/AVI container wrapping
    MS-RLE8 (BI_RLE8) frames — 8-bit palette-indexed, run-length
    encoded scanlines stored bottom-up, with EOL/EOD escapes and
    absolute-mode segments exercised on every third row. Frame pixels
    and the per-doc palette are closed forms of (x, y, frame, doc_id)
    so any engine recomputes every channel statistic from first
    principles. Pure stdlib (struct)."""
    import struct

    w = 8 + doc_id % 9
    h = 6 + doc_id % 5
    n_frames = 2 + doc_id % 3

    def pix(x: int, y: int, f: int) -> int:
        return (3 * x + 7 * y + 11 * f + doc_id) % 256

    frames = []
    for f in range(n_frames):
        data = bytearray()
        for y in reversed(range(h)):  # bottom-up storage
            row = [pix(x, y, f) for x in range(w)]
            x = 0
            if y % 3 == 0 and w >= 3:
                # absolute-mode segment: 00 NN idx... (pad to word)
                nn = min(w, 4) if min(w, 4) >= 3 else 3
                data += bytes([0, nn]) + bytes(row[:nn])
                if nn % 2:
                    data.append(0)
                x = nn
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                data += bytes([run, row[x]])
                x += run
            data += b"\x00\x00"  # EOL
        data += b"\x00\x01"  # EOD
        frames.append(bytes(data))

    palette = bytearray()
    for i in range(256):  # BGR0 entries
        palette += bytes(
            [(i * 11 + 2) % 256, (i * 7 + 1) % 256, (i * 5 + doc_id) % 256, 0]
        )

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", 40000, 0, 0, 0, n_frames, 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"mrle", 0, 0, 0, 0, 1, 25, 0, n_frames, 0, 0, 0,
        0, 0, w, h,
    )
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 0, 0, 256, 0)
        + bytes(palette)
    )  # biCompression=1 = BI_RLE8
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", fr) for fr in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_rle8(payload: bytes):
    """REAL compressed-video decode, pure stdlib: walk the RIFF chunk
    tree (hdrl → avih dims, strl → strf BITMAPINFOHEADER + palette,
    movi → 00dc frames), require biCompression=1 (MS-RLE8), and
    decode every frame's run-length stream — encoded runs, EOL (00
    00), EOD (00 01), delta (00 02 dx dy) and absolute mode (00 NN,
    word-aligned) — into bottom-up palette indices, returned top-down.
    Returns (frames: list[(h, w) uint8 index arrays], palette:
    (256, 3) uint8 RGB array). Malformed streams (runs past row end,
    missing EOD, truncated chunks) raise."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(buf: int, end: int):
        chunks = []
        pos = buf
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if body_at + size > end:
                raise ValueError(f"truncated {tag!r} chunk")
            chunks.append((tag, body_at, size))
            pos = body_at + size + (size % 2)
        return chunks

    w = h = None
    palette = None
    comp = None
    frames_raw = []
    for tag, at, size in walk(12, 8 + struct.unpack_from("<I", payload, 4)[0]):
        if tag != b"LIST":
            continue
        kind = payload[at : at + 4]
        inner = walk(at + 4, at + size)
        if kind == b"hdrl":
            for t2, a2, s2 in inner:
                if t2 == b"avih":
                    vals = struct.unpack_from("<14I", payload, a2)
                    w, h = vals[8], vals[9]
                elif t2 == b"LIST" and payload[a2 : a2 + 4] == b"strl":
                    for t3, a3, s3 in walk(a2 + 4, a2 + s2):
                        if t3 == b"strf":
                            bi = struct.unpack_from("<IiiHHII", payload, a3)
                            comp = bi[5]
                            pal = np.frombuffer(
                                payload, np.uint8, 256 * 4, a3 + 40
                            ).reshape(256, 4)
                            palette = pal[:, [2, 1, 0]].copy()  # BGR0 -> RGB
        elif kind == b"movi":
            for t2, a2, s2 in inner:
                if t2 == b"00dc":
                    frames_raw.append(payload[a2 : a2 + s2])
    if w is None or palette is None:
        raise ValueError("missing avih/strf headers")
    if comp != 1:
        raise ValueError(f"not MS-RLE8 (biCompression={comp})")

    frames = []
    for raw in frames_raw:
        img = np.zeros((h, w), dtype=np.uint8)
        x, y, pos, done = 0, 0, 0, False  # y in bottom-up space
        while pos < len(raw):
            b0, b1 = raw[pos], raw[pos + 1]
            pos += 2
            if b0 > 0:  # encoded run
                if x + b0 > w:
                    raise ValueError("run past row end")
                img[y, x : x + b0] = b1
                x += b0
            elif b1 == 0:  # EOL
                x, y = 0, y + 1
            elif b1 == 1:  # EOD
                done = True
                break
            elif b1 == 2:  # delta
                x += raw[pos]
                y += raw[pos + 1]
                pos += 2
            else:  # absolute mode
                if x + b1 > w:
                    raise ValueError("absolute run past row end")
                img[y, x : x + b1] = np.frombuffer(
                    raw, np.uint8, b1, pos
                )
                x += b1
                pos += b1 + (b1 % 2)
        if not done:
            raise ValueError("frame missing EOD escape")
        frames.append(img[::-1].copy())  # bottom-up -> top-down
    return frames, palette


#: IMA-ADPCM tables (standard 89-entry step table, 8-entry index map).
ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
ADPCM_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def adpcm_samples(doc_id: int):
    """Closed-form source signal for the ADPCM face: a triangle wave
    in [-4000, 4000] with |Δ| ≤ 397 per sample (differential codecs
    track slope-bounded signals; a modulus sweep's wrap-around jumps
    would defeat the adapter by construction, not by defect)."""
    import numpy as np

    n = 40 + doc_id % 40
    i = np.arange(n, dtype=np.int64)
    return np.abs((i * 397 + doc_id * 13) % 16000 - 8000) - 4000


def encode_adpcm(doc_id: int) -> bytes:
    """REAL differential audio compression: IMA-ADPCM (4-bit nibbles
    for 16-bit samples — 4:1). The canonical quantize-and-adapt state
    machine: per sample, the predictor error quantizes against the
    current step (bits 4/2/1 by successive halving, bit 8 the sign),
    the predictor integrates the dequantized delta, and the step index
    walks the adaptation table. Container: 'ADPC' + n + packed
    nibbles (low nibble first)."""
    samples = adpcm_samples(doc_id)
    pred, idx = 0, 0
    nibs = []
    for s in map(int, samples):
        step = ADPCM_STEPS[idx]
        diff = s - pred
        sgn = 8 if diff < 0 else 0
        ad = abs(diff)
        b4 = 1 if ad >= step else 0
        ad -= b4 * step
        b2 = 1 if ad >= step // 2 else 0
        ad -= b2 * (step // 2)
        b1 = 1 if ad >= step // 4 else 0
        nib = sgn | (b4 << 2) | (b2 << 1) | b1
        d = step // 8 + b4 * step + b2 * (step // 2) + b1 * (step // 4)
        pred = max(-32768, min(32767, pred + (-d if sgn else d)))
        idx = max(0, min(88, idx + ADPCM_INDEX[nib & 7]))
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)  # pad nibble (beyond n, ignored by the decoder)
    packed = bytes(
        (nibs[i] | (nibs[i + 1] << 4)) for i in range(0, len(nibs), 2)
    )
    return b"ADPC" + len(samples).to_bytes(4, "big") + packed


def decode_adpcm(payload: bytes):
    """REAL differential-audio decode: replay the IMA-ADPCM state
    machine over the packed nibbles. Returns (samples int64 array,
    final_predictor, final_index). Wrong magic or a truncated nibble
    stream raises."""
    import numpy as np

    if payload[:4] != b"ADPC":
        raise ValueError("not an ADPC payload")
    n = int.from_bytes(payload[4:8], "big")
    need = 8 + (n + 1) // 2
    if len(payload) < need:
        raise ValueError("truncated ADPCM nibble stream")
    out = np.empty(n, dtype=np.int64)
    pred, idx = 0, 0
    for i in range(n):
        byte = payload[8 + i // 2]
        nib = (byte >> 4) if i % 2 else (byte & 0xF)
        step = ADPCM_STEPS[idx]
        b4, b2, b1 = (nib >> 2) & 1, (nib >> 1) & 1, nib & 1
        d = step // 8 + b4 * step + b2 * (step // 2) + b1 * (step // 4)
        pred = max(-32768, min(32767, pred + (-d if nib & 8 else d)))
        idx = max(0, min(88, idx + ADPCM_INDEX[nib & 7]))
        out[i] = pred
    return out, pred, idx


def encode_gif(doc_id: int, pixels=None, size=None) -> bytes:
    """A REAL dictionary-compressed image: GIF87a with a full LZW
    encoder — variable-width codes (9→12 bits, LSB-first bit packing),
    CLEAR/EOI control codes, growing string table — over the same
    closed-form palette-indexed pattern family as the AVI face. Pure
    stdlib."""
    import struct

    if size is None:
        w, h = 10 + doc_id % 13, 8 + doc_id % 11
    else:
        w, h = size
    if pixels is None:
        pixels = [
            (5 * x + 3 * y + doc_id) % 256
            for y in range(h)
            for x in range(w)
        ]

    mcs = 8  # min code size for 256-color
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    out_bits: list[int] = []
    width = mcs + 1

    def emit(code: int):
        nonlocal width
        for b in range(width):
            out_bits.append((code >> b) & 1)

    table: dict[tuple, int] = {(i,): i for i in range(1 << mcs)}
    next_code = eoi + 1
    emit(clear)
    cur: tuple = ()
    for p in pixels:
        cand = cur + (p,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        cur = (p,)
    if cur:
        emit(table[cur])
    emit(eoi)

    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)

    palette = bytearray()
    for i in range(256):
        palette += bytes(
            [(i * 5 + doc_id) % 256, (i * 7 + 1) % 256, (i * 11 + 2) % 256]
        )

    hdr = b"GIF87a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + bytes(palette)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0) + bytes([mcs])
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunkb = data[i : i + 255]
        blocks += bytes([len(chunkb)]) + chunkb
    return hdr + img + bytes(blocks) + b"\x00" + b"\x3b"


def decode_gif(payload: bytes):
    """REAL LZW decode, pure stdlib: parse the GIF87a screen
    descriptor + global color table + image descriptor, reassemble the
    data sub-blocks, and run the full GIF-LZW decoder — LSB-first
    variable-width codes, CLEAR resets, the KwKwK (code == next_code)
    case, width growth at table fill, EOI termination. Returns
    ((h, w) uint8 index array, (256, 3) palette). Malformed streams
    (bad signature, out-of-range codes, pixel overflow/underflow,
    missing EOI) raise."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if not flags & 0x80:
        raise ValueError("missing global color table")
    gct_n = 2 << (flags & 0x7)
    pos = 13
    palette = (
        np.frombuffer(payload, np.uint8, gct_n * 3, pos)
        .reshape(gct_n, 3)
        .copy()
    )
    pos += gct_n * 3
    while payload[pos] != 0x2C:  # skip extensions
        if payload[pos] != 0x21:
            raise ValueError(f"unexpected block 0x{payload[pos]:02x}")
        pos += 2
        while payload[pos]:
            pos += payload[pos] + 1
        pos += 1
    _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
    if iflags & 0x40:
        raise ValueError("interlaced GIF not supported")
    pos += 10
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos]:
        n = payload[pos]
        data += payload[pos + 1 : pos + 1 + n]
        pos += n + 1
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    out: list[int] = []
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    width = mcs + 1
    bitpos = 0
    prev: bytes | None = None
    total_bits = len(data) * 8
    ended = False
    while bitpos < total_bits:
        if bitpos + width > total_bits:
            # Trailing-byte edge: the decoder appends a phantom table
            # entry for the encoder's final flush code (an entry the
            # encoder never created) and may grow width past what the
            # encoder used to emit EOI.  When EOI's bits end exactly on
            # the last byte boundary there is nothing left to read at
            # the grown width.  GIF pads the final byte with zero bits,
            # so zero-extend the remainder and accept ONLY an exact
            # EOI; anything else is a genuinely truncated stream.
            tail = 0
            for b in range(total_bits - bitpos):
                tail |= (
                    (data[(bitpos + b) // 8] >> ((bitpos + b) % 8)) & 1
                ) << b
            if tail == eoi:
                ended = True
            break
        code = 0
        for b in range(width):
            code |= ((data[(bitpos + b) // 8] >> ((bitpos + b) % 8)) & 1) << b
        bitpos += width
        if code == clear:
            table = table[: eoi + 1]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            ended = True
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if not ended:
        raise ValueError("missing EOI code")
    if len(out) != iw * ih:
        raise ValueError(f"decoded {len(out)} pixels, expected {iw * ih}")
    return np.array(out, dtype=np.uint8).reshape(ih, iw), palette
