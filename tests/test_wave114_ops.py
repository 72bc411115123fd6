"""Wave-114 operator pins: Verhoeff, mod 97-10, CRC-32."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st


def test_verhoeff_catches_what_luhn_misses():
    from basicocr_ray.pipelines.queries import verhoeff_check

    # canonical test vector: '236' with check digit 3 -> '2363' valid
    assert verhoeff_check("2363") == 0
    assert verhoeff_check("2364") != 0
    # adjacent transposition always detected
    assert verhoeff_check("2633") != 0


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**9))
def test_verhoeff_generated_digit_validates(n):
    from basicocr_ray.pipelines.queries import (
        _VERHOEFF_D, _VERHOEFF_P, verhoeff_check,
    )

    inv = [0, 4, 3, 2, 1, 5, 6, 7, 8, 9]
    num = "%010d" % n
    c2 = 0
    for k, ch in enumerate(reversed(num), 1):
        c2 = _VERHOEFF_D[c2][_VERHOEFF_P[k % 8][ord(ch) - 48]]
    digit = inv[c2]
    assert verhoeff_check(num + str(digit)) == 0


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**12))
def test_mod97_digitwise_equals_bignum(n):
    num = "%012d" % n
    h = 0
    for ch in num:
        h = (10 * h + (ord(ch) - 48)) % 97
    assert h == int(num) % 97


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=40))
def test_crc32_matches_zlib(data):
    from basicocr_ray.pipelines.queries import crc32_ieee

    assert crc32_ieee(data) == zlib.crc32(data)
