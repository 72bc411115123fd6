"""Wave-130 operator pins: Stern-Brocot, continued fractions, Egyptian."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 997), st.integers(1, 997))
def test_stern_brocot_matches_fraction_limit(v, n):
    from basicocr_ray.pipelines.queries import stern_brocot_best

    if v > n:
        v %= n + 1
    p, q = stern_brocot_best(v, n, 50)
    best = Fraction(v, n).limit_denominator(50)
    assert Fraction(p, q) == best


def test_continued_fraction_convergent_identity():
    for a, b in ((355, 113), (17, 29), (100, 7), (6, 4)):
        g = math.gcd(a, b)
        x, y = a, b
        terms = []
        while y:
            terms.append(x // y)
            x, y = y, x % y
        h1, h0, k1, k0 = 1, 0, 0, 1
        for t in terms:
            h1, h0 = t * h1 + h0, h1
            k1, k0 = t * k1 + k0, k1
        assert (h1, k1) == (a // g, b // g)


@settings(max_examples=80, deadline=None)
@given(st.integers(1, 7), st.integers(2, 40))
def test_egyptian_greedy_sums_back(p, q):
    if p >= q:
        p = p % q or 1
    pp, qq = p, q
    denoms = []
    while pp:
        d = -(-qq // pp)
        denoms.append(d)
        pp, qq = pp * d - qq, qq * d
    assert sum(Fraction(1, d) for d in denoms) == Fraction(p, q)
    assert all(
        d2 > d1 for d1, d2 in zip(denoms, denoms[1:])
    )  # strictly increasing => distinct unit fractions
