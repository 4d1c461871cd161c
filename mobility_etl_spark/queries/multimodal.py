"""Multimodal binary-column plumbing (SURVEY.md §2.C N4) + the pandas
UDF surface (E38–E39).

Pattern for image/audio/video at 100 TB: payloads are opaque
``binary`` columns (or pointers: URI + hash, loaded inside the UDF),
metadata is a typed struct, and decode/feature-extraction runs in
Arrow-batched ``mapInPandas`` — the only place Python belongs in the
hot path. Decode is REAL for PPM (image), WAV (audio), Y4M (video)
and — COMPRESSED, via pure stdlib — PNG (DEFLATE), μ-law audio
(companding) and MS-RLE8 AVI video (run-length); codecs that genuinely
need external libraries (JPEG/MP3/H.264) are STUBBED here (no media
libs in this container, by design) and everything Spark-side —
schema, batch iteration, partitioning, output contract — is still
real and oracle-checked because the stub features (byte length,
sha256) are deterministic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Output contract of the feature extractor (schema-on-write, §1.3).
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload_sha256", StringType()),
        StructField("codec", StringType()),
    ]
)


def decode_payload(payload: bytes) -> object:
    """Modality decode stub — image/audio libs are not in this container.

    In production this is Pillow/torchaudio/av; the engine only cares
    that it runs inside the Arrow batch loop below.
    """
    raise NotImplementedError("decode stub: no media libraries in this environment")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow-batched, vectorized per batch.

    Real plumbing: iterates record batches, computes per-payload
    features without collecting to the driver. sha256/len stand in for
    the decode step (deterministic → oracle-checkable).
    """
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "payload_sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()
                ),
                "codec": "stub",
            }
        )


@register(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS payload_sha256,
           'stub' AS codec
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("N4", "E38", "E39"),
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through mapInPandas: cast text
    to ``binary`` (standing in for image/audio payloads), run the
    Arrow-batched extractor, return the typed feature table. The
    deterministic stub features make the full Python-UDF path
    hash-checkable against DuckDB."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct("lang", "source").alias("meta"),
    )
    return payloads.mapInPandas(_extract_features, FEATURE_SCHEMA)


def _payloads(spark: SparkSession, sf_dir: str, max_id: int = 300) -> DataFrame:
    """documents.text as opaque binary payloads (the image/audio stand-in)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < max_id)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS nb
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(unnest(range(0, CAST(ceil(nb / 256.0) AS INT), 4)) AS INTEGER)
               AS frame_idx,
           CAST(LEAST(256, nb - CAST(unnest(range(0, CAST(ceil(nb / 256.0) AS INT), 4))
                                     AS INTEGER) * 256) AS INTEGER) AS frame_bytes
    FROM d
    """,
    tags=("N4", "E39", "E41"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas (one payload row → many
    frame rows, the video keyframe shape): 256-byte frames, every 4th
    emitted. The oracle re-derives frame indices and sizes from byte
    lengths — hash-checking the fan-out arithmetic end-to-end."""
    from mobility_etl_spark.operators.multimodal import sample_frames

    frames = sample_frames(_payloads(spark, sf_dir), every=4)
    return frames.select("doc_id", "frame_idx", "frame_bytes")


@register(
    "multimodal_pointer_load",
    oracle="""
    SELECT doc_id,
           sha256(text) AS loaded_sha256,
           1 AS hash_ok
    FROM documents
    WHERE doc_id < 150
    """,
    tags=("N4", "E39"),
)
def multimodal_pointer_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointer-not-payload: payloads land as files; the table carries
    (doc_id, uri, sha256); bytes are opened inside the Arrow batch
    loop and integrity-checked. Hash-matching the oracle's direct
    sha256 over the table proves the pointer round-trip is lossless."""
    import os
    import tempfile

    from mobility_etl_spark.operators.multimodal import load_pointer_payloads

    root = tempfile.mkdtemp(prefix="mes_ptr_")
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
        .collect()  # bounded: builds the payload *fixture store*
    )
    recs = []
    for r in rows:
        payload = r.text.encode()
        uri = os.path.join(root, f"{r.doc_id}.bin")
        with open(uri, "wb") as f:
            f.write(payload)
        recs.append((r.doc_id, uri, hashlib.sha256(payload).hexdigest()))
    pointers = spark.createDataFrame(recs, "doc_id long, uri string, sha256 string")
    loaded = load_pointer_payloads(pointers)
    return loaded.select(
        "doc_id", "loaded_sha256", F.col("hash_ok").cast("int").alias("hash_ok")
    )


@register(
    "multimodal_decode_resize",
    oracle="""
    WITH d AS (
        SELECT doc_id, text,
               64 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT)
                   % 192 AS w,
               64 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT)
                   % 192 AS h
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           GREATEST(1, CAST(TRUNC(w * (32.0 / GREATEST(w, h)))
                            AS INT)) AS out_width,
           GREATEST(1, CAST(TRUNC(h * (32.0 / GREATEST(w, h)))
                            AS INT)) AS out_height,
           sha256(array_to_string(
               list_transform(
                   range(0, CAST(ceil(length(text) / 256.0) AS INT)),
                   i -> substr(text, i * 256 + 1, 1)), ''))
               AS thumb_sha256
    FROM d
    """,
    tags=("N4", "E39"),
)
def multimodal_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + aspect-preserving resize through two chained
    mapInPandas stages. EXACT oracle since r12 (was rows-only): the
    deterministic decode stub's dims are sha256-derived
    (64 + digest_byte % 192 — replayed from the hex digest in SQL),
    the resize is max(1, trunc(dim * 32/max(w,h))) in IEEE double on
    both engines, and the stub thumbnail is payload[::256], rebuilt
    byte-for-byte with list_transform + substr (documents are ASCII,
    so character slicing == byte slicing; non-ASCII corpora would
    need a blob-typed replay). The production swap replaces the stub
    with a real codec (queries/multimodal.py:multimodal_ppm_decode
    proves that path end-to-end)."""
    from mobility_etl_spark.operators.multimodal import (
        decode_features,
        resize_thumbnails,
    )

    payloads = _payloads(spark, sf_dir, max_id=200)
    dims = decode_features(payloads)
    thumbs = resize_thumbnails(payloads, max_side=32)
    return dims.join(thumbs, "doc_id").select(
        "doc_id", "width", "height", "out_width", "out_height", "thumb_sha256"
    )


@register(
    "multimodal_ppm_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               8 + doc_id % 9 AS w,
               8 + doc_id % 7 AS h
        FROM documents WHERE doc_id < 200
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h, xs.x, ys.y,
               (3 * xs.x + 7 * ys.y + d.doc_id) % 256 AS r,
               (xs.x * ys.y + d.doc_id) % 256 AS g,
               (xs.x + 2 * ys.y) % 256 AS b
        FROM dims d
        JOIN generate_series(0, 16) AS xs(x) ON xs.x < d.w
        JOIN generate_series(0, 16) AS ys(y) ON ys.y < d.h
    ),
    tpx AS (
        SELECT d.doc_id,
               (3 * ((j.j * d.w) // 4) + 7 * ((i.i * d.h) // 4) + d.doc_id)
                   % 256 AS r
        FROM dims d
        JOIN generate_series(0, 3) AS i(i) ON true
        JOIN generate_series(0, 3) AS j(j) ON true
    ),
    thumb AS (
        SELECT doc_id, CAST(SUM(r) AS BIGINT) AS thumb_sum_r
        FROM tpx GROUP BY doc_id
    )
    SELECT px.doc_id,
           CAST(MIN(px.w) AS INTEGER) AS width,
           CAST(MIN(px.h) AS INTEGER) AS height,
           CAST(COUNT(*) AS INTEGER) AS n_px,
           CAST(SUM(px.r) AS BIGINT) AS sum_r,
           CAST(SUM(px.g) AS BIGINT) AS sum_g,
           CAST(SUM(px.b) AS BIGINT) AS sum_b,
           MIN(thumb.thumb_sum_r) AS thumb_sum_r
    FROM px JOIN thumb USING (doc_id)
    GROUP BY px.doc_id
    """,
    tags=("N4", "E39"),
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode (no stub, no media library): each doc gets a
    genuine binary PPM (P6) image with a closed-form pixel pattern,
    and operators/multimodal.py:decode_resize_images parses the
    header, reinterprets the pixel buffer, nearest-resamples a 4x4
    thumbnail, and sums channels - all inside Arrow-batched
    mapInPandas. The oracle recomputes every statistic pixel-by-pixel
    from the pattern definition, so the decoder, the resampler's
    (dst*src)//dst index math, and the batch plumbing are all
    value-checked cross-engine. The JPEG/PNG production swap changes
    one function; the pipeline shape is proven here."""
    from mobility_etl_spark.operators.multimodal import (
        decode_resize_images,
        encode_ppm,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_ppm(8 + int(d) % 9, 8 + int(d) % 7, int(d))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return decode_resize_images(payloads, thumb=4)


@register(
    "multimodal_wav_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               1 + doc_id % 2 AS n_channels,
               CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
               40 + doc_id % 20 AS n_frames
        FROM documents WHERE doc_id < 200
    ),
    smp AS (
        SELECT d.doc_id, d.n_channels, d.sample_rate, d.n_frames,
               ch.c AS channel, fr.i,
               (d.doc_id * 31 + fr.i * 17 + ch.c * 7) % 2001 - 1000 AS s
        FROM dims d
        JOIN generate_series(0, 1) AS ch(c) ON ch.c < d.n_channels
        JOIN generate_series(0, 59) AS fr(i) ON fr.i < d.n_frames
    ),
    lagged AS (
        SELECT *,
               LAG(s) OVER (PARTITION BY doc_id, channel ORDER BY i)
                   AS prev_s
        FROM smp
    )
    SELECT doc_id,
           CAST(channel AS INTEGER) AS channel,
           CAST(MIN(n_channels) AS INTEGER) AS n_channels,
           MIN(sample_rate) AS sample_rate,
           CAST(MIN(n_frames) AS INTEGER) AS n_frames,
           CAST(MAX(ABS(s)) AS INTEGER) AS peak_abs,
           CAST(SUM(s * s) AS BIGINT) AS sumsq,
           CAST(SUM(CASE WHEN prev_s * s < 0 THEN 1 ELSE 0 END)
                AS INTEGER) AS zero_crossings
    FROM lagged
    GROUP BY doc_id, channel
    """,
    tags=("N4", "E39"),
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode (no stub, no media library): each doc gets a
    genuine RIFF/WAVE PCM16 payload — varying channel count, sample
    rate and length — and operators/multimodal.py:decode_wav walks the
    chunk list, validates the fmt block, reinterprets the interleaved
    frame buffer, and extracts exact per-channel integer features
    (peak, energy, zero crossings) inside Arrow-batched mapInPandas.
    The oracle recomputes every statistic sample-by-sample from the
    closed-form signal, so header parsing, channel de-interleaving and
    the feature math are all value-checked cross-engine. Compressed
    codecs (MP3/AAC) remain behind the honest stub; this proves the
    container/decode plumbing end to end — the audio counterpart of
    multimodal_ppm_decode."""
    from mobility_etl_spark.operators.multimodal import (
        encode_wav,
        wav_channel_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return wav_channel_features(payloads)


@register(
    "multimodal_y4m_frames",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               8 + doc_id % 5 AS w,
               6 + doc_id % 4 AS h,
               3 + doc_id % 4 AS n_frames
        FROM documents WHERE doc_id < 150
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h, fr.f, ys.y, xs.x,
               (d.doc_id * 7 + fr.f * 13 + ys.y * 3 + xs.x) % 256 AS yv,
               (d.doc_id + fr.f + xs.x * 2 + ys.y) % 256 AS uv,
               (d.doc_id * 5 + fr.f * 3 + xs.x + ys.y * 4) % 256 AS vv
        FROM dims d
        JOIN generate_series(0, 6) AS fr(f) ON fr.f < d.n_frames
        JOIN generate_series(0, 11) AS xs(x) ON xs.x < d.w
        JOIN generate_series(0, 9) AS ys(y) ON ys.y < d.h
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(SUM(yv) AS BIGINT) AS sum_y,
           CAST(SUM(uv) AS BIGINT) AS sum_u,
           CAST(SUM(vv) AS BIGINT) AS sum_v
    FROM px
    GROUP BY doc_id, f
    """,
    tags=("N4", "E39"),
)
def multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode (no stub, no media library): each doc gets a
    genuine YUV4MPEG2 clip (varying dimensions and frame counts) and
    operators/multimodal.py:decode_y4m parses the header tokens, walks
    the FRAME markers, de-planes C444 YUV, and emits exact per-frame
    plane sums — the real counterpart of the stubbed ``sample_frames``
    stage for compressed codecs. The oracle recomputes every plane
    value from the closed form, so header parsing, frame segmentation
    and plane math are value-checked cross-engine. With PPM/PNG
    (image), WAV (audio) and Y4M (video), all three media modalities
    now have a REAL container decode path — PNG a real COMPRESSED one
    (multimodal_png_decode); only library-bound codecs (JPEG/MP3/
    H.264) remain stubbed."""
    from mobility_etl_spark.operators.multimodal import (
        encode_y4m,
        y4m_frame_stats,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_y4m(int(d)) for d in pdf["doc_id"]],
                }
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return y4m_frame_stats(payloads)


@register(
    "multimodal_png_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               8 + doc_id % 11 AS w,
               8 + doc_id % 6 AS h
        FROM documents WHERE doc_id < 200
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h, xs.x, ys.y,
               (3 * xs.x + 7 * ys.y + d.doc_id) % 256 AS r,
               (xs.x * ys.y + d.doc_id) % 256 AS g,
               (xs.x + 2 * ys.y) % 256 AS b
        FROM dims d
        JOIN generate_series(0, 18) AS xs(x) ON xs.x < d.w
        JOIN generate_series(0, 13) AS ys(y) ON ys.y < d.h
    )
    SELECT doc_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS INTEGER) AS n_px,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(LEAST(MIN(h), 5) AS INTEGER) AS n_filter_kinds
    FROM px GROUP BY doc_id
    """,
    tags=("N4", "E39"),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode, pure stdlib (no media library):
    each doc gets a genuine PNG — DEFLATE-compressed scanlines cycling
    through all five PNG filter types, CRC-32-chunked — and
    operators/multimodal.py:decode_png inflates the IDAT stream,
    validates every chunk CRC, and reconstructs Sub/Up/Average/Paeth
    filtering byte-exactly, inside Arrow-batched mapInPandas. The
    oracle recomputes every statistic from the closed-form pixel
    pattern, so the INFLATE path, all five filter reconstructions
    (n_filter_kinds proves they all ran), and the batch plumbing are
    value-checked cross-engine. This upgrades the 'compressed codecs
    stubbed' boundary: PNG is now a real decode; JPEG/MP3/H.264 still
    require external libraries and keep the honest stub."""
    from mobility_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_png(8 + int(d) % 11, 8 + int(d) % 6, int(d))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_px": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "n_filter_kinds": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img, filters = decode_png(bytes(payload))
                out["doc_id"].append(int(d))
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["n_px"].append(img.shape[0] * img.shape[1])
                out["sum_r"].append(int(img[:, :, 0].sum()))
                out["sum_g"].append(int(img[:, :, 1].sum()))
                out["sum_b"].append(int(img[:, :, 2].sum()))
                out["n_filter_kinds"].append(len(set(filters)))
            yield pd.DataFrame(out)

    # payload crosses a real DataFrame boundary as a binary column
    # (the pointer-not-payload discipline still applies upstream; see
    # multimodal_pointer_load) before an independent decode stage —
    # the same two-stage plumbing as the PPM face
    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return payloads.mapInPandas(
        dec,
        "doc_id long, width int, height int, n_px int, sum_r bigint, "
        "sum_g bigint, sum_b bigint, n_filter_kinds int",
    )


@register(
    "multimodal_ulaw_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 50 + doc_id % 50 AS n
        FROM documents WHERE doc_id < 200
    ),
    samp AS (
        SELECT d.doc_id, ii.i,
               (d.doc_id * 7919 + ii.i * ii.i * 31) % 16001 - 8000 AS s
        FROM dims d
        JOIN generate_series(0, 99) AS ii(i) ON ii.i < d.n
    ),
    comp AS (
        SELECT doc_id, i, s,
               CASE WHEN s < 0 THEN -1 ELSE 1 END AS sgn,
               LEAST(ABS(s), 8159) + 33 AS m
        FROM samp
    ),
    seg AS (
        SELECT doc_id, i, s, sgn, m,
               CASE WHEN m < 64 THEN 0 WHEN m < 128 THEN 1
                    WHEN m < 256 THEN 2 WHEN m < 512 THEN 3
                    WHEN m < 1024 THEN 4 WHEN m < 2048 THEN 5
                    WHEN m < 4096 THEN 6 ELSE 7 END AS e
        FROM comp
    ),
    dec AS (
        SELECT doc_id, s,
               sgn * (((2 * ((m >> (e + 1)) & 15) + 33) << e) - 33) AS d
        FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(SUM(d) AS BIGINT) AS sum_dec,
           CAST(MIN(d) AS BIGINT) AS min_dec,
           CAST(MAX(d) AS BIGINT) AS max_dec,
           CAST(MAX(ABS(d - (CASE WHEN s < -8159 THEN -8159
                                  WHEN s > 8159 THEN 8159
                                  ELSE s END))) AS BIGINT) AS max_abs_err
    FROM dec GROUP BY doc_id
    """,
    tags=("N4", "E39"),
)
def multimodal_ulaw_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-audio decode (G.711-style μ-law companding, 2:1
    lossy, pure integer arithmetic): payloads carry 8-bit logarithmic
    codes for 14-bit linear samples; operators/multimodal.py:
    decode_ulaw expands them with the midpoint reconstruction
    ((2·mantissa + 33) << e) − 33 inside Arrow-batched mapInPandas.
    Because the companding law is closed-form integer math, the DuckDB
    oracle replays encode AND decode per sample in SQL — a value-exact
    cross-engine proof of a lossy codec, including the per-doc
    max_abs_err column, which the segment geometry bounds by
    2^e ≤ 128 (gated in tests/test_multimodal.py). With PNG (DEFLATE
    image) this closes the compressed-decode gap for audio; only
    library-bound codecs (JPEG/MP3/H.264) remain stubbed."""
    from mobility_etl_spark.operators.multimodal import (
        decode_ulaw,
        encode_ulaw,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_ulaw(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "sum_dec": [],
                "min_dec": [], "max_dec": [], "max_abs_err": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(d)
                dec_s = decode_ulaw(bytes(payload))
                n = len(dec_s)
                i = np.arange(n, dtype=np.int64)
                ref = np.clip(
                    (d * 7919 + i * i * 31) % 16001 - 8000, -8159, 8159
                )
                out["doc_id"].append(d)
                out["n_samples"].append(n)
                out["sum_dec"].append(int(dec_s.sum()))
                out["min_dec"].append(int(dec_s.min()))
                out["max_dec"].append(int(dec_s.max()))
                out["max_abs_err"].append(int(np.abs(dec_s - ref).max()))
            yield pd.DataFrame(out)

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return payloads.mapInPandas(
        dec,
        "doc_id long, n_samples int, sum_dec bigint, min_dec bigint, "
        "max_dec bigint, max_abs_err bigint",
    )


@register(
    "multimodal_avi_rle_frames",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               8 + doc_id % 9 AS w,
               6 + doc_id % 5 AS h,
               2 + doc_id % 3 AS nf
        FROM documents WHERE doc_id < 150
    ),
    px AS (
        SELECT d.doc_id, ff.f, d.w, d.h,
               (3 * xs.x + 7 * ys.y + 11 * ff.f + d.doc_id) % 256 AS idx
        FROM dims d
        JOIN generate_series(0, 4) AS ff(f) ON ff.f < d.nf
        JOIN generate_series(0, 16) AS xs(x) ON xs.x < d.w
        JOIN generate_series(0, 10) AS ys(y) ON ys.y < d.h
    )
    SELECT doc_id, CAST(f AS INTEGER) AS frame,
           CAST(COUNT(*) AS INTEGER) AS n_px,
           CAST(SUM((idx * 5 + doc_id) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((idx * 7 + 1) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((idx * 11 + 2) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, f
    """,
    tags=("N4", "E39"),
)
def multimodal_avi_rle_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-video decode, pure stdlib: each doc gets a
    genuine RIFF/AVI container wrapping MS-RLE8 frames (8-bit palette
    indices, run-length scanlines stored bottom-up, EOL/EOD escapes,
    absolute-mode segments on every third row), and
    operators/multimodal.py:decode_avi_rle8 walks the chunk tree,
    validates the BI_RLE8 header, decodes every escape class, and
    palette-maps the indices — inside Arrow-batched mapInPandas with
    the payload crossing a real binary-column boundary. The oracle
    recomputes every per-frame channel sum from the closed-form pixel
    + palette definitions. With PNG (DEFLATE image) and μ-law
    (companded audio), ALL THREE modalities now have a real
    compressed decode; only library-bound codecs (JPEG/MP3/H.264)
    remain stubbed."""
    from mobility_etl_spark.operators.multimodal import (
        decode_avi_rle8,
        encode_avi_rle8,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_avi_rle8(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "frame": [], "n_px": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, pal = decode_avi_rle8(bytes(payload))
                pal = pal.astype(np.int64)
                for f, img in enumerate(frames):
                    rgb = pal[img]
                    out["doc_id"].append(int(d))
                    out["frame"].append(f)
                    out["n_px"].append(img.size)
                    out["sum_r"].append(int(rgb[:, :, 0].sum()))
                    out["sum_g"].append(int(rgb[:, :, 1].sum()))
                    out["sum_b"].append(int(rgb[:, :, 2].sum()))
            yield pd.DataFrame(out)

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return payloads.mapInPandas(
        dec,
        "doc_id long, frame int, n_px int, sum_r bigint, sum_g bigint, "
        "sum_b bigint",
    )


def _adpcm_oracle() -> str:
    from mobility_etl_spark.operators.multimodal import (
        ADPCM_INDEX,
        ADPCM_STEPS,
    )

    st = "[" + ",".join(map(str, ADPCM_STEPS)) + "]"
    ix = "[" + ",".join(map(str, ADPCM_INDEX)) + "]"
    return f"""
    WITH RECURSIVE dims AS (
        SELECT doc_id, 40 + doc_id % 40 AS n
        FROM documents WHERE doc_id < 150
    ),
    ord AS (
        SELECT d.doc_id, ii.i + 1 AS rn,
               ABS((ii.i * 397 + d.doc_id * 13) % 16000 - 8000) - 4000 AS s
        FROM dims d
        JOIN generate_series(0, 79) AS ii(i) ON ii.i < d.n
    ),
    m(doc_id, rn, pred, idx, acc, mx) AS (
        SELECT doc_id, 0, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM dims
        UNION ALL
        SELECT doc_id, rn, new_pred, new_idx, acc, mx FROM (
            SELECT o.doc_id AS doc_id, o.rn AS rn,
                   list_extract({{st}}, h.idx + 1) AS step,
                   o.s - h.pred AS diff0,
                   CASE WHEN diff0 < 0 THEN 1 ELSE 0 END AS sgn,
                   ABS(diff0) AS ad,
                   CASE WHEN ad >= step THEN 1 ELSE 0 END AS b4,
                   ad - b4 * step AS ad2,
                   CASE WHEN ad2 >= step // 2 THEN 1 ELSE 0 END AS b2,
                   ad2 - b2 * (step // 2) AS ad3,
                   CASE WHEN ad3 >= step // 4 THEN 1 ELSE 0 END AS b1,
                   step // 8 + b4 * step + b2 * (step // 2)
                       + b1 * (step // 4) AS d,
                   GREATEST(-32768, LEAST(32767,
                       h.pred + CASE WHEN sgn = 1 THEN -d ELSE d END))
                       AS new_pred,
                   GREATEST(0, LEAST(88, h.idx + list_extract(
                       {{ix}}, b4 * 4 + b2 * 2 + b1 + 1))) AS new_idx,
                   h.acc + new_pred AS acc,
                   GREATEST(h.mx, ABS(new_pred - o.s)) AS mx
            FROM m h JOIN ord o
              ON o.doc_id = h.doc_id AND o.rn = h.rn + 1
        )
    )
    SELECT m.doc_id,
           CAST(d.n AS INTEGER) AS n_samples,
           CAST(m.pred AS BIGINT) AS final_pred,
           CAST(m.idx AS INTEGER) AS final_idx,
           CAST(m.acc AS BIGINT) AS sum_dec,
           CAST(m.mx AS BIGINT) AS max_abs_err
    FROM m JOIN dims d USING (doc_id)
    WHERE m.rn = d.n
    """.replace("{st}", st).replace("{ix}", ix)


@register("multimodal_adpcm_decode", oracle=_adpcm_oracle(), tags=("N4", "E39"))
def multimodal_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DIFFERENTIAL audio compression, decoded and proven
    state-step-exact cross-engine: IMA-ADPCM packs 16-bit samples into
    4-bit nibbles through a quantize-and-adapt state machine
    (predictor integration + step-table walk). The payload crosses a
    binary-column boundary and decodes in mapInPandas; the DuckDB
    oracle replays ENCODE AND DECODE — the entire adaptive state
    machine, step/index tables as SQL array literals — inside one
    RECURSIVE CTE with lateral column aliases, so the hash equality
    pins every predictor clamp, every table walk, and the exact lossy
    error (max_abs_err) of a 4:1 compressed codec. Completes the
    compressed-codec matrix: DEFLATE (PNG), companding (μ-law),
    run-length (MS-RLE8 video), and now differential (ADPCM)."""
    from mobility_etl_spark.operators.multimodal import (
        adpcm_samples,
        decode_adpcm,
        encode_adpcm,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_adpcm(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "final_pred": [],
                "final_idx": [], "sum_dec": [], "max_abs_err": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(d)
                samples, pred, idx = decode_adpcm(bytes(payload))
                src = adpcm_samples(d)
                out["doc_id"].append(d)
                out["n_samples"].append(len(samples))
                out["final_pred"].append(int(pred))
                out["final_idx"].append(int(idx))
                out["sum_dec"].append(int(samples.sum()))
                out["max_abs_err"].append(
                    int(np.abs(samples - src).max())
                )
            yield pd.DataFrame(out)

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return payloads.mapInPandas(
        dec,
        "doc_id long, n_samples int, final_pred bigint, final_idx int, "
        "sum_dec bigint, max_abs_err bigint",
    )


@register(
    "multimodal_gif_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               10 + doc_id % 13 AS w,
               8 + doc_id % 11 AS h
        FROM documents WHERE doc_id < 150
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h,
               (5 * xs.x + 3 * ys.y + d.doc_id) % 256 AS idx
        FROM dims d
        JOIN generate_series(0, 22) AS xs(x) ON xs.x < d.w
        JOIN generate_series(0, 18) AS ys(y) ON ys.y < d.h
    )
    SELECT doc_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(COUNT(*) AS INTEGER) AS n_px,
           CAST(SUM((idx * 5 + doc_id) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((idx * 7 + 1) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((idx * 11 + 2) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id
    """,
    tags=("N4", "E39"),
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DICTIONARY-compressed image decode, pure stdlib: each doc
    gets a genuine GIF87a whose pixel stream is LZW-compressed with
    variable-width codes (9→12 bits, LSB-first packing, CLEAR/EOI,
    KwKwK case, width growth at table fill) — the fifth compression
    family in the matrix after DEFLATE (PNG), companding (μ-law),
    run-length (MS-RLE8) and differential (ADPCM).
    operators/multimodal.py:decode_gif walks the screen descriptor,
    global color table and sub-block chain, then runs the full LZW
    decoder; the payload crosses a binary-column boundary before an
    independent mapInPandas decode stage, and the DuckDB oracle
    recomputes every palette-mapped channel sum from the closed
    forms."""
    from mobility_etl_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    ).select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [encode_gif(int(d)) for d in pdf["doc_id"]],
                }
            )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "n_px": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img, pal = decode_gif(bytes(payload))
                rgb = pal.astype(np.int64)[img]
                out["doc_id"].append(int(d))
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["n_px"].append(img.size)
                out["sum_r"].append(int(rgb[:, :, 0].sum()))
                out["sum_g"].append(int(rgb[:, :, 1].sum()))
                out["sum_b"].append(int(rgb[:, :, 2].sum()))
            yield pd.DataFrame(out)

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return payloads.mapInPandas(
        dec,
        "doc_id long, width int, height int, n_px int, sum_r bigint, "
        "sum_g bigint, sum_b bigint",
    )
