"""Multimodal binary-column operators (SURVEY.md §2.C N4): decode,
feature-extract, resize, frame-sample, pointer-load — all as
Arrow-batched ``mapInPandas`` stages over opaque ``binary`` payloads.

Decode is STUBBED (no Pillow/torchaudio/av in this container, by
design): :func:`fake_decode` derives deterministic media dimensions
from the payload bytes so every downstream stage — batch iteration,
schemas, partitioning, output contracts — is real, tested, and (where
the arithmetic is expressible) oracle-checked. Swap ``fake_decode``
for a real decoder and nothing else changes.

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
