"""Property-based fuzz for the binary media parsers — untrusted-bytes
robustness, the failure mode that matters at corpus scale where a
single malformed blob must fail CLEANLY (a typed ValueError the
mapInPandas wrapper can route to a quarantine column), never crash an
executor with IndexError/struct.error/segfault-shaped surprises.

Three properties per format:
1. round-trip: encode → decode is exact for every valid parameter,
2. truncation: every proper prefix of a valid payload either decodes
   (trailing-chunk formats allow it) or raises ValueError — nothing
   else,
3. mutation: flipping bytes anywhere raises ValueError or returns a
   decoded result — never a non-ValueError exception.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mobility_etl_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
)

DECODERS = {
    "ppm": (lambda i: encode_ppm(4 + i % 5, 3 + i % 7, i), decode_ppm),
    "wav": (encode_wav, decode_wav),
    "y4m": (encode_y4m, decode_y4m),
}


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_ppm_roundtrip_pixel_exact(doc_id):
    w, h = 4 + doc_id % 5, 3 + doc_id % 7
    img = decode_ppm(encode_ppm(w, h, doc_id))
    assert img.shape == (h, w, 3) and img.dtype == np.uint8
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    assert (img[:, :, 0] == (3 * x + 7 * y + doc_id) % 256).all()
    assert (img[:, :, 1] == (x * y + doc_id) % 256).all()
    assert (img[:, :, 2] == (x + 2 * y) % 256).all()


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_sample_exact(doc_id):
    rate, samples = decode_wav(encode_wav(doc_id))
    channels = 1 + doc_id % 2
    frames = 40 + doc_id % 20
    assert rate == 8000 + (doc_id % 3) * 4000
    assert samples.shape == (frames, channels) and samples.dtype == np.int16
    i = np.arange(frames, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)[None, :]
    assert (samples == (doc_id * 31 + i * 17 + c * 7) % 2001 - 1000).all()


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip_plane_exact(doc_id):
    w, h = 8 + doc_id % 5, 6 + doc_id % 4
    n_frames = 3 + doc_id % 4
    dw, dh, frames = decode_y4m(encode_y4m(doc_id))
    assert (dw, dh, len(frames)) == (w, h, n_frames)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    for f, planes in enumerate(frames):
        assert planes.shape == (3, h, w) and planes.dtype == np.uint8
        assert (planes[0] == (doc_id * 7 + f * 13 + y * 3 + x) % 256).all()
        assert (planes[1] == (doc_id + f + x * 2 + y) % 256).all()
        assert (planes[2] == (doc_id * 5 + f * 3 + x + y * 4) % 256).all()


@pytest.mark.parametrize("fmt", sorted(DECODERS))
@given(doc_id=st.integers(min_value=0, max_value=500), data=st.data())
@settings(max_examples=60, deadline=None)
def test_truncation_never_escapes_valueerror(fmt, doc_id, data):
    enc, dec = DECODERS[fmt]
    payload = enc(doc_id)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    try:
        dec(payload[:cut])
    except ValueError:
        pass  # the contract: malformed input -> typed, catchable error


@pytest.mark.parametrize("fmt", sorted(DECODERS))
@given(doc_id=st.integers(min_value=0, max_value=500), data=st.data())
@settings(max_examples=60, deadline=None)
def test_mutation_never_escapes_valueerror(fmt, doc_id, data):
    enc, dec = DECODERS[fmt]
    payload = bytearray(enc(doc_id))
    pos = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    val = data.draw(st.integers(min_value=0, max_value=255))
    payload[pos] = val
    try:
        dec(bytes(payload))
    except ValueError:
        pass


def test_decoded_dtypes_arrow_clean():
    """Decoded arrays must carry concrete numeric dtypes Arrow can
    ship zero-copy — never dtype=object (an object-dtype ndarray IS an
    ndarray, so the check must inspect .dtype, not the instance
    type)."""
    rate, samples = decode_wav(encode_wav(7))
    assert isinstance(rate, int)
    assert samples.dtype == np.int16
    img = decode_ppm(encode_ppm(5, 4, 7))
    assert img.dtype == np.uint8
    _, _, frames = decode_y4m(encode_y4m(7))
    assert all(f.dtype == np.uint8 for f in frames)


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=18),
    doc_id=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_fuzz(w, h, doc_id):
    """Any (w, h, id): PNG decode(encode(...)) reproduces the PPM
    reference decode bit-for-bit and reports the expected filter
    cycle — DEFLATE + all five filter reconstructions fuzz-proven."""
    from mobility_etl_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    img, filters = decode_png(encode_png(w, h, doc_id))
    assert np.array_equal(img, decode_ppm(encode_ppm(w, h, doc_id)))
    assert filters == [y % 5 for y in range(h)]


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_ulaw_error_bound_fuzz(doc_id):
    """Any doc: every μ-law sample's reconstruction error is within
    its segment step 2^e and sign is preserved."""
    from mobility_etl_spark.operators.multimodal import (
        decode_ulaw,
        encode_ulaw,
    )

    n = 50 + doc_id % 50
    i = np.arange(n, dtype=np.int64)
    s = np.clip((doc_id * 7919 + i * i * 31) % 16001 - 8000, -8159, 8159)
    dec = decode_ulaw(encode_ulaw(doc_id))
    m = np.minimum(np.abs(s), 8159) + 33
    e = np.searchsorted(64 << np.arange(7, dtype=np.int64), m, "right")
    assert (np.abs(dec - s) <= (1 << e)).all()
    nz = s != 0
    assert (np.sign(dec[nz]) == np.sign(s[nz])).all()


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_avi_rle8_roundtrip_fuzz(doc_id):
    """Any doc id: AVI/MS-RLE8 decode reproduces every frame's
    closed-form index array and the palette exactly."""
    from mobility_etl_spark.operators.multimodal import (
        decode_avi_rle8,
        encode_avi_rle8,
    )

    frames, pal = decode_avi_rle8(encode_avi_rle8(doc_id))
    w, h = 8 + doc_id % 9, 6 + doc_id % 5
    assert len(frames) == 2 + doc_id % 3
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    for f, img in enumerate(frames):
        assert np.array_equal(
            img, ((3 * x + 7 * y + 11 * f + doc_id) % 256).astype(np.uint8)
        )
    i = np.arange(256)
    assert np.array_equal(pal[:, 2], (i * 11 + 2) % 256)


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_adpcm_fuzz_state_and_error_bounds(doc_id):
    """Any doc id: ADPCM state stays in range, decode length matches,
    and post-warmup error is bounded on the slope-limited signal."""
    from mobility_etl_spark.operators.multimodal import (
        adpcm_samples,
        decode_adpcm,
        encode_adpcm,
    )

    dec, pred, idx = decode_adpcm(encode_adpcm(doc_id))
    src = adpcm_samples(doc_id)
    assert len(dec) == len(src)
    assert 0 <= idx <= 88 and -32768 <= pred <= 32767
    # 8-sample warmup: the adapter needs ~8 steps to climb the step
    # table for the worst starting phase (measured worst over the
    # domain: 176 after 8, 2832 after 5)
    assert np.abs(dec - src)[8:].max() <= 512


@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_gif_lzw_roundtrip_fuzz(doc_id):
    """Any doc id: GIF-LZW decode reproduces the closed-form index
    array and palette exactly — variable-width growth, CLEAR/EOI and
    bit packing fuzz-proven."""
    from mobility_etl_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    img, pal = decode_gif(encode_gif(doc_id))
    w, h = 10 + doc_id % 13, 8 + doc_id % 11
    assert img.shape == (h, w)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert np.array_equal(
        img, ((5 * x + 3 * y + doc_id) % 256).astype(np.uint8)
    )
    assert np.array_equal(pal[:, 1], (np.arange(256) * 7 + 1) % 256)
