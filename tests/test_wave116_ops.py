"""Wave-116 operator pins: Miller-Rabin, ext-Euclid inverse, CRT."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_prime(n):
    if n < 2:
        return False
    d = 2
    while d * d <= n:
        if n % d == 0:
            return False
        d += 1
    return True


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 3_000_000))
def test_miller_rabin_fuzz(n):
    from basicocr_ray.pipelines.queries import miller_rabin

    assert miller_rabin(n) == brute_prime(n)


def test_miller_rabin_strong_pseudoprimes():
    """Carmichael numbers and base-2 strong pseudoprimes must not
    fool the 4-base deterministic test."""
    from basicocr_ray.pipelines.queries import miller_rabin

    for n in (561, 1105, 1729, 2047, 3277, 4033, 1373653):
        assert not miller_rabin(n)
    for p in (2, 3, 9973, 1_000_003):
        assert miller_rabin(p)


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 9972))
def test_ext_gcd_inverse(a):
    from basicocr_ray.pipelines.queries import ext_gcd

    g, x, _ = ext_gcd(a, 9973)
    assert g == 1
    assert (a * (x % 9973)) % 9973 == 1


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 8632))
def test_crt_roundtrip(x):
    from basicocr_ray.pipelines.queries import ext_gcd

    M1, M2 = 97, 89
    g, u, _ = ext_gcd(M1, M2)
    r1, r2 = x % M1, x % M2
    k = ((r2 - r1) * u) % M2
    assert (r1 + M1 * k) % (M1 * M2) == x
