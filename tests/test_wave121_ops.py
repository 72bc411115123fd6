"""Wave-121 operator pins: simplex, NTT convolution, Floyd cycle."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(st.integers(0, 50), st.integers(0, 50), st.integers(0, 80))
def test_simplex_vs_vertex_enumeration(a, b, c):
    from basicocr_ray.pipelines.queries import simplex_2var_max

    x, y, obj = simplex_2var_max(a, b, c)
    # feasibility
    assert 0 <= x <= a and 0 <= y <= b and x + y <= c
    assert obj == 3 * x + 2 * y
    # optimality vs brute grid
    best = max(
        3 * xx + 2 * yy
        for xx in range(a + 1)
        for yy in range(b + 1)
        if xx + yy <= c
    ) if a <= 50 and b <= 50 else obj
    assert obj == best


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=16),
    st.lists(st.integers(0, 500), min_size=1, max_size=16),
)
def test_ntt_matches_direct_convolution(a, b):
    from basicocr_ray.pipelines.queries import ntt_convolve

    direct = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            direct[i + j] += x * y
    assert ntt_convolve(a, b) == direct


def test_floyd_rho_known():
    """x -> (x*x + 1) mod 255 from 3 has a known rho shape; check
    against explicit orbit recording."""
    M = 1024
    A, C = 69069, 1

    def f(x):
        return (A * x + C) % M

    for seed in (0, 1, 500, 777):
        seen = {}
        x = seed
        t = 0
        while x not in seen:
            seen[x] = t
            x = f(x)
            t += 1
        mu_brute = seen[x]
        lam_brute = t - seen[x]

        tort, hare = f(seed), f(f(seed))
        while tort != hare:
            tort, hare = f(tort), f(f(hare))
        mu = 0
        tort = seed
        while tort != hare:
            tort, hare = f(tort), f(hare)
            mu += 1
        lam = 1
        hare = f(tort)
        while tort != hare:
            hare = f(hare)
            lam += 1
        assert (mu, lam) == (mu_brute, lam_brute)
