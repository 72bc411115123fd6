"""Wave-117 operator pins: Z-algorithm, Fisher-Yates/LCG, binary GCD."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_z(s):
    n = len(s)
    out = [0] * n
    if n:
        out[0] = n
    for i in range(1, n):
        k = 0
        while i + k < n and s[k] == s[i + k]:
            k += 1
        out[i] = k
    return out


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abc", max_size=40))
def test_z_array_fuzz(s):
    from basicocr_ray.pipelines.queries import z_array

    assert z_array(s) == brute_z(s)


def test_fisher_yates_is_permutation_and_seed_sensitive():
    A, C, M = 1103515245, 12345, 1 << 31

    def perm(seed):
        x = seed % M
        arr = list(range(32))
        for k in range(31, 0, -1):
            x = (A * x + C) % M
            j = x % (k + 1)
            arr[k], arr[j] = arr[j], arr[k]
        return arr

    p1, p2 = perm(500), perm(501)
    assert sorted(p1) == list(range(32))
    assert sorted(p2) == list(range(32))
    assert p1 != p2


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 10**9), st.integers(0, 10**6))
def test_binary_gcd_fuzz(a, b):
    from basicocr_ray.pipelines.queries import binary_gcd

    assert binary_gcd(a, b) == math.gcd(a, b)
