"""Multimodal operator unit tests (SURVEY.md §2.C N4): exact expected
values for the deterministic decode stub, frame sampling arithmetic,
resize bounds, and pointer-load integrity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.operators.multimodal import (
    FRAME_SIZE,
    decode_features,
    fake_decode,
    load_pointer_payloads,
    resize_thumbnails,
    sample_frames,
)


@pytest.fixture()
def payloads(spark):
    rows = [
        (1, b"a" * 1000),          # 4 frames
        (2, b"xyz"),               # 1 frame, partial
        (3, b"b" * (FRAME_SIZE * 9 + 1)),  # 10 frames, last is 1 byte
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_features_deterministic(spark, payloads):
    out = {r.doc_id: r for r in decode_features(payloads).collect()}
    m = fake_decode(b"a" * 1000)
    assert out[1].width == m["width"] and out[1].height == m["height"]
    assert out[1].n_bytes == 1000 and out[1].n_channels == 3
    assert 64 <= out[2].width <= 255


def test_sample_frames_every_4th(spark, payloads):
    rows = sample_frames(payloads, every=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 1000 bytes → frames 0..3, sampled {0}
    assert [r.frame_idx for r in by_doc[1]] == [0]
    assert by_doc[1][0].frame_bytes == FRAME_SIZE
    # doc 2: single partial frame
    assert [(r.frame_idx, r.frame_bytes) for r in by_doc[2]] == [(0, 3)]
    # doc 3: 10 frames → sampled 0,4,8; frame 8 is full
    assert [r.frame_idx for r in sorted(by_doc[3], key=lambda r: r.frame_idx)] == [0, 4, 8]
    assert bytes(by_doc[2][0].frame) == b"xyz"


def test_resize_respects_max_side(spark, payloads):
    rows = resize_thumbnails(payloads, max_side=32).collect()
    for r in rows:
        assert 1 <= max(r.out_width, r.out_height) <= 32


def test_pointer_load_detects_corruption(spark, tmp_path):
    good = tmp_path / "good.bin"
    good.write_bytes(b"payload-bytes")
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"tampered")
    sha = hashlib.sha256(b"payload-bytes").hexdigest()
    pointers = spark.createDataFrame(
        [(1, str(good), sha), (2, str(bad), sha)],
        "doc_id long, uri string, sha256 string",
    )
    out = {r.doc_id: r.hash_ok for r in load_pointer_payloads(pointers).collect()}
    assert out == {1: 1, 2: 0}


def test_ppm_roundtrip_and_resize():
    """decode_ppm is a real parser: encode→decode round-trips the
    pixel buffer exactly; resize_nearest at native size is identity;
    non-PPM payloads fail loudly."""
    import numpy as np
    import pytest

    from mobility_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    img = decode_ppm(encode_ppm(13, 9, 42))
    assert img.shape == (9, 13, 3)
    x = np.arange(13)[None, :]
    y = np.arange(9)[:, None]
    assert (img[:, :, 0] == (3 * x + 7 * y + 42) % 256).all()
    assert (img[:, :, 1] == (x * y + 42) % 256).all()
    assert (img[:, :, 2] == (x + 2 * y) % 256).all()
    assert (resize_nearest(img, 13, 9) == img).all()
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    # nearest-neighbor: every thumb pixel is some source pixel
    assert small[0, 0, 0] == img[0, 0, 0]
    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG\r\n\x1a\nnotappm")


def test_wav_roundtrip_and_chunk_walk():
    """decode_wav must survive extra chunks between fmt and data (the
    generic RIFF walk), word-aligned odd-size chunks, and reject
    non-PCM payloads loudly."""
    import struct

    import numpy as np
    import pytest

    from mobility_etl_spark.operators.multimodal import decode_wav, encode_wav

    for d in (0, 1, 2, 3, 19):
        rate, s = decode_wav(encode_wav(d))
        assert rate == 8000 + (d % 3) * 4000
        assert s.shape == (40 + d % 20, 1 + d % 2)
        i = np.arange(s.shape[0])[:, None]
        c = np.arange(s.shape[1])[None, :]
        assert (s == (d * 31 + i * 17 + c * 7) % 2001 - 1000).all()

    # inject an odd-sized LIST chunk between fmt and data
    raw = encode_wav(4)
    fmt_at = raw.index(b"fmt ")
    data_at = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = raw[:data_at] + extra + raw[data_at:]
    patched = (
        b"RIFF" + struct.pack("<I", len(patched) - 8) + b"WAVE" + patched[12:]
    )
    rate2, s2 = decode_wav(patched)
    assert rate2 == 8000 + (4 % 3) * 4000 and (s2 == decode_wav(raw)[1]).all()
    assert fmt_at < data_at

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)

    # truncated payloads fail loudly, never decode to fewer frames
    with pytest.raises(ValueError, match="truncated data"):
        decode_wav(raw[:-10])
    with pytest.raises(ValueError, match="truncated fmt"):
        fmt_chunk_at = raw.index(b"fmt ")
        decode_wav(
            raw[: fmt_chunk_at + 4] + struct.pack("<I", 8) + raw[fmt_chunk_at + 8 :]
        )


def test_y4m_rejects_unsupported_and_truncated():
    import pytest

    from mobility_etl_spark.operators.multimodal import decode_y4m, encode_y4m

    raw = encode_y4m(3)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFF" + raw)
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(raw.replace(b"C444", b"C420", 1))
    with pytest.raises(ValueError, match="FRAME"):
        # corrupt the first frame marker
        decode_y4m(raw.replace(b"FRAME", b"FRAMX", 1))
    with pytest.raises(ValueError):
        # truncated mid-frame: frombuffer must not silently shrink
        decode_y4m(raw[:-7])


# --------------------------------------------------------------- PNG codec


def test_png_roundtrip_equals_pattern_and_exercises_all_filters():
    """decode(encode(w, h, id)) reproduces the closed-form pixel array
    exactly (same pattern as PPM, so decode_ppm doubles as the
    independent reference), across shapes that hit every filter type
    and the 1-pixel edge case."""
    import numpy as np

    from mobility_etl_spark.operators.multimodal import (
        decode_png,
        decode_ppm,
        encode_png,
        encode_ppm,
    )

    for (w, h, d) in [(8, 8, 0), (13, 9, 5), (1, 1, 7), (19, 13, 123)]:
        img, filters = decode_png(encode_png(w, h, d))
        assert np.array_equal(img, decode_ppm(encode_ppm(w, h, d)))
        assert filters == [y % 5 for y in range(h)]
        assert len(set(filters)) == min(h, 5)


def test_png_decoder_rejects_corruption():
    """A compressed codec must FAIL LOUDLY on bad input: flipped IDAT
    bytes (CRC mismatch), a truncated stream, and a wrong signature
    all raise instead of returning garbage pixels."""
    import pytest

    from mobility_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(8, 8, 3)
    corrupt = bytearray(good)
    corrupt[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(Exception):
        decode_png(good[: len(good) // 2])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + good)


# -------------------------------------------------------------- μ-law codec


def test_ulaw_error_bounded_by_segment_geometry():
    """Companding is lossy but BOUNDED: |decode(encode(s)) − s| ≤ 2^e
    for each sample's segment e (midpoint reconstruction of e+1
    truncated bits), hence ≤ 128 globally; sign and zero are exact."""
    import numpy as np

    from mobility_etl_spark.operators.multimodal import (
        decode_ulaw,
        encode_ulaw,
    )

    for d in (0, 7, 123, 999):
        n = 50 + d % 50
        i = np.arange(n, dtype=np.int64)
        s = np.clip((d * 7919 + i * i * 31) % 16001 - 8000, -8159, 8159)
        dec = decode_ulaw(encode_ulaw(d))
        m = np.minimum(np.abs(s), 8159) + 33
        e = np.searchsorted(64 << np.arange(7, dtype=np.int64), m, "right")
        assert (np.abs(dec - s) <= (1 << e)).all()
        assert np.abs(dec - s).max() <= 128
        nz = s != 0
        assert (np.sign(dec[nz]) == np.sign(s[nz])).all()
        assert (dec[s == 0] == 0).all()
    import pytest

    with pytest.raises(ValueError, match="ULAW"):
        decode_ulaw(b"WAVE" + b"\x00" * 16)


# ----------------------------------------------------------- MS-RLE8 video


def test_avi_rle8_roundtrip_and_rejections():
    """decode(encode(doc)) reproduces every frame's closed-form index
    array and the palette exactly; a hand-built delta escape lands
    pixels where (dx, dy) says; malformed input (run past row end,
    bad magic, missing EOD) raises."""
    import struct

    import numpy as np
    import pytest

    from mobility_etl_spark.operators.multimodal import (
        decode_avi_rle8,
        encode_avi_rle8,
    )

    for d in (0, 5, 13, 777):
        frames, pal = decode_avi_rle8(encode_avi_rle8(d))
        w, h, n = 8 + d % 9, 6 + d % 5, 2 + d % 3
        assert len(frames) == n and frames[0].shape == (h, w)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        for f, img in enumerate(frames):
            assert np.array_equal(
                img, ((3 * x + 7 * y + 11 * f + d) % 256).astype(np.uint8)
            )
        i = np.arange(256)
        assert np.array_equal(pal[:, 0], (i * 5 + d) % 256)

    # delta escape: hand-build a minimal 1-frame AVI whose stream
    # skips (dx=2, dy=1) then paints 3 pixels of index 9
    w, h = 8, 6

    def chunk(tag, body):
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", 0, 0, 0, 0, 1, 0, 1, 0, w, h, 0, 0, 0, 0)
    strf = (
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, 0, 0, 0, 256, 0)
        + bytes(1024)
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strf", strf)))
    stream = bytes([0, 2, 2, 1]) + bytes([3, 9]) + b"\x00\x00\x00\x01"
    movi = lst(b"movi", chunk(b"00dc", stream))
    body = b"AVI " + hdrl + movi
    frames, _ = decode_avi_rle8(b"RIFF" + struct.pack("<I", len(body)) + body)
    img = frames[0]
    assert (img[h - 2, 2:5] == 9).all()  # row 1 bottom-up == h-2 top-down
    assert img.sum() == 3 * 9

    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_rle8(b"RIFFxxxxWAVE")
    bad = bytearray(encode_avi_rle8(3))
    bad[-4] = 200
    with pytest.raises(ValueError):
        decode_avi_rle8(bytes(bad))


# ------------------------------------------------------------- IMA-ADPCM


def test_adpcm_error_bounded_after_warmup_and_rejections():
    """The 4:1 differential codec tracks the slope-bounded triangle
    signal: after the 5-sample warmup, reconstruction error stays
    under 1024 (~13% of the ±4000 range) on every fixture doc; wrong
    magic and truncated nibble streams raise."""
    import numpy as np
    import pytest

    from mobility_etl_spark.operators.multimodal import (
        adpcm_samples,
        decode_adpcm,
        encode_adpcm,
    )

    for d in range(0, 150, 7):
        dec, pred, idx = decode_adpcm(encode_adpcm(d))
        src = adpcm_samples(d)
        assert len(dec) == len(src)
        assert np.abs(dec - src)[5:].max() <= 1024
        assert 0 <= idx <= 88 and -32768 <= pred <= 32767
    with pytest.raises(ValueError, match="ADPC"):
        decode_adpcm(b"WAVE" + b"\x00" * 20)
    good = encode_adpcm(3)
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(good[:10])


# ---------------------------------------------------------------- GIF LZW


def test_gif_decoder_handles_kwkwk_and_rejects_malformed():
    """The KwKwK case (code == next table entry) decodes correctly on
    a crafted run-heavy image; bad signature, clobbered code stream,
    and a truncated sub-block chain raise."""
    import numpy as np
    import pytest

    from mobility_etl_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    # constant image: runs force cScSc patterns, i.e. codes referencing
    # the entry the decoder has not built yet (the KwKwK branch)
    img, _ = decode_gif(encode_gif(7, pixels=[42] * 60, size=(10, 6)))
    assert img.shape == (6, 10) and (img == 42).all()
    # mixed runs and gradients
    px = ([9] * 17 + list(range(40)) + [9] * 23) * 3
    img2, _ = decode_gif(encode_gif(1, pixels=px, size=(48, 5)))
    assert img2.flatten().tolist() == px

    with pytest.raises(ValueError, match="GIF"):
        decode_gif(b"BMP" + bytes(40))
    good = bytearray(encode_gif(3))
    good[-3] ^= 0x55
    with pytest.raises(ValueError):
        decode_gif(bytes(good))
    with pytest.raises(Exception):
        decode_gif(bytes(good[: len(good) // 2]))


def test_gif_decoder_phantom_width_growth_at_byte_boundary():
    """Regression (ADVICE r6): the decoder appends a phantom table
    entry for the encoder's final flush code — an entry the encoder
    never created — and can grow the code width past what the encoder
    used to emit EOI.  When the data-code count since the last CLEAR
    is exactly ``2**width - (2**mcs + 2)`` AND the EOI code ends on
    the trailing byte boundary, the old decoder had no bits left to
    read at the grown width and raised 'missing EOI' on a perfectly
    valid stream.  Self-encoded streams can't hit it (mcs=8 + a single
    leading CLEAR pin the bit totals to 1/2/3 mod 8), so this is a
    hand-built GIF: mcs=3, codes [CLEAR, CLEAR, 1..7, EOI] = 10 codes
    x 4 bits = 40 bits = exactly 5 bytes; the 6th decoder append (on
    the flush code 7) fills the table to 16 = 2**4 and grows width to
    5 with only 4 bits remaining."""
    import struct

    from mobility_etl_spark.operators.multimodal import decode_gif

    codes = [8, 8, 1, 2, 3, 4, 5, 6, 7, 9]  # clear, clear, data x7, eoi
    bits = [(c >> b) & 1 for c in codes for b in range(4)]
    assert len(bits) == 40  # EOI lands exactly on the byte boundary
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    palette = bytearray()
    for i in range(8):
        palette += bytes([i * 30 % 256, i * 50 % 256, i * 70 % 256])
    hdr = b"GIF87a" + struct.pack("<HHBBB", 7, 1, 0x82, 0, 0) + bytes(palette)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 7, 1, 0) + bytes([3])
    payload = hdr + img + bytes([len(data)]) + bytes(data) + b"\x00" + b"\x3b"

    idx, pal = decode_gif(payload)
    assert idx.shape == (1, 7)
    assert idx.flatten().tolist() == [1, 2, 3, 4, 5, 6, 7]
    assert pal.shape == (8, 3)
