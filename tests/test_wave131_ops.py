"""Wave-131 operator pins: totient, Collatz, mod-9 audit."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def phi_formula(n):
    out = n
    m = n
    p = 2
    while p * p <= m:
        if m % p == 0:
            while m % p == 0:
                m //= p
            out -= out // p
        p += 1
    if m > 1:
        out -= out // m
    return out


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 2000))
def test_totient_fuzz(n):
    brute = sum(1 for k in range(1, n + 1) if math.gcd(k, n) == 1)
    assert phi_formula(n) == brute


def test_collatz_known():
    def steps(n):
        s = 0
        while n != 1:
            n = n // 2 if n % 2 == 0 else 3 * n + 1
            s += 1
        return s

    assert steps(1) == 0
    assert steps(6) == 8
    assert steps(27) == 111  # the famous long one


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 10**9), max_size=30))
def test_mod9_homomorphism(vals):
    assert sum(vals) % 9 == sum(v % 9 for v in vals) % 9
