"""Wave-126 operator pins: coin change, binomial mod p, Josephus."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 150))
def test_coin_change_dp_vs_enumeration(n):
    ways = [0] * (n + 1)
    ways[0] = 1
    for coin in (1, 5, 10, 25):
        for x in range(coin, n + 1):
            ways[x] += ways[x - coin]
    brute = sum(
        1
        for q in range(n // 25 + 1)
        for d in range((n - 25 * q) // 10 + 1)
        for s in range((n - 25 * q - 10 * d) // 5 + 1)
    )
    assert ways[n] == brute
    # canonical-system greedy = DP minimum
    INF = 1 << 30
    mn = [0] + [INF] * n
    for x in range(1, n + 1):
        for coin in (1, 5, 10, 25):
            if x >= coin:
                mn[x] = min(mn[x], mn[x - coin] + 1)
    greedy = n // 25 + (n % 25) // 10 + ((n % 25) % 10) // 5 + n % 5
    assert mn[n] == greedy


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 600), st.integers(0, 600))
def test_binomial_mod_fuzz(n, k):
    P = 9973

    def binom(n, k):
        if k < 0 or k > n:
            return 0
        r = 1
        for i in range(1, k + 1):
            r = r * ((n - k + i) % P) % P
            r = r * pow(i, P - 2, P) % P
        return r

    assert binom(n, k) == math.comb(n, k) % P if k <= n else binom(
        n, k
    ) == 0


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 80), st.integers(1, 6))
def test_josephus_simulation_vs_recurrence(n, k):
    circle = list(range(n))
    idx = 0
    while len(circle) > 1:
        idx = (idx + k - 1) % len(circle)
        circle.pop(idx)
    pos = 0
    for i in range(2, n + 1):
        pos = (pos + k) % i
    assert circle[0] == pos
