"""Wave-115 operator pins: base64, hex-HMAC, SHA-256 from scratch."""

from __future__ import annotations

import base64
import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=30))
def test_base64_matches_stdlib(data):
    from basicocr_ray.pipelines.queries import b64_decode, b64_encode

    enc = b64_encode(data)
    assert enc == base64.b64encode(data).decode()
    assert b64_decode(enc) == data


def test_base64_rejects_bad_length():
    from basicocr_ray.pipelines.queries import b64_decode

    with pytest.raises(ValueError):
        b64_decode("abc")


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=100))
def test_sha256_scratch_matches_hashlib(data):
    from basicocr_ray.pipelines.queries import sha256_scratch

    assert sha256_scratch(data) == hashlib.sha256(data).hexdigest()


def test_sha256_scratch_block_boundaries():
    from basicocr_ray.pipelines.queries import sha256_scratch

    for n in (0, 55, 56, 63, 64, 65, 119, 120, 128):
        data = bytes(range(256))[:n] if n <= 256 else b""
        data = (b"a" * n)
        assert sha256_scratch(data) == hashlib.sha256(data).hexdigest()


def test_hmac_hex_variant_keyed():
    """Different keys/messages diverge; construction matches the
    documented two-pass pad form."""
    from basicocr_ray.pipelines.queries import hmac_sha256_hex

    m1 = hmac_sha256_hex("graftsessionkey", "doc:1")
    m2 = hmac_sha256_hex("graftsessionkey", "doc:2")
    m3 = hmac_sha256_hex("otherkey", "doc:1")
    assert len({m1, m2, m3}) == 3
    # reproduce by hand
    kb = "graftsessionkey".encode().ljust(64, b"\x00")
    ipad = "".join(chr(b ^ 0x36) for b in kb)
    opad = "".join(chr(b ^ 0x5C) for b in kb)
    inner = hashlib.sha256((ipad + "doc:1").encode()).hexdigest()
    assert m1 == hashlib.sha256((opad + inner).encode()).hexdigest()
