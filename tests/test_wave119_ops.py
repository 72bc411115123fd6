"""Wave-119 operator pins: Berlekamp-Massey, Tonelli-Shanks, BSGS."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_lfsr_complexity(bits):
    n = len(bits)
    for L in range(n + 1):
        for mask in range(1 << L):
            ok = True
            for i in range(L, n):
                pred = 0
                for j in range(L):
                    if (mask >> j) & 1 and bits[i - 1 - j]:
                        pred ^= 1
                if pred != bits[i]:
                    ok = False
                    break
            if ok:
                return L
    return n


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 1), max_size=10))
def test_berlekamp_massey_fuzz(bits):
    from basicocr_ray.pipelines.queries import berlekamp_massey

    assert berlekamp_massey(bits) == brute_lfsr_complexity(bits)


def test_berlekamp_massey_known():
    from basicocr_ray.pipelines.queries import berlekamp_massey

    assert berlekamp_massey([0, 0, 0]) == 0
    assert berlekamp_massey([1, 1, 1, 1]) == 1
    assert berlekamp_massey([0, 0, 1]) == 3  # late 1 forces length


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 9972))
def test_tonelli_shanks_fuzz(a):
    from basicocr_ray.pipelines.queries import tonelli_shanks

    P = 9973
    r = tonelli_shanks(a, P)
    residue = any((x * x) % P == a for x in range(P)) if a else True
    if r == -1:
        assert not residue or a == 0 and False or not residue
    else:
        assert (r * r) % P == a
        # smallest root
        assert all((x * x) % P != a for x in range(r))


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 9972))
def test_bsgs_fuzz(h):
    from basicocr_ray.pipelines.queries import bsgs_dlog

    P, G = 9973, 11
    k = bsgs_dlog(G, h, P)
    if k >= 0:
        assert pow(G, k, P) == h
        # smallest exponent
        cur = 1
        for e in range(k):
            assert cur != h
            cur = (cur * G) % P
