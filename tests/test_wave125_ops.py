"""Wave-125 operator pins: knapsack, LCS substring, min window."""

from __future__ import annotations

import itertools
import random

from hypothesis import given, settings
from hypothesis import strategies as st


def test_knapsack_dp_vs_subsets():
    rnd = random.Random(6)
    for _ in range(30):
        n = rnd.randrange(1, 10)
        w = [rnd.randrange(1, 15) for _ in range(n)]
        v = [rnd.randrange(0, 50) for _ in range(n)]
        cap = rnd.randrange(5, 40)
        dp = [0] * (cap + 1)
        for i in range(n):
            for c in range(cap, w[i] - 1, -1):
                dp[c] = max(dp[c], dp[c - w[i]] + v[i])
        brute = max(
            (
                sum(v[i] for i in range(n) if m >> i & 1)
                for m in range(1 << n)
                if sum(w[i] for i in range(n) if m >> i & 1) <= cap
            ),
            default=0,
        )
        assert dp[cap] == brute


def brute_lcs_sub(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(i + 1, len(a) + 1):
            if a[i:j] in b:
                best = max(best, j - i)
    return best


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abc", max_size=20),
    st.text(alphabet="abc", max_size=20),
)
def test_lcs_substring_fuzz(a, b):
    from basicocr_ray.pipelines.queries import lcs_substring_len

    assert lcs_substring_len(a, b) == brute_lcs_sub(a, b)


def brute_min_window(s, pat):
    from collections import Counter

    need = Counter(pat)
    best = 0
    for i in range(len(s)):
        for j in range(i + 1, len(s) + 1):
            c = Counter(s[i:j])
            if all(c[k] >= v for k, v in need.items()):
                if best == 0 or j - i < best:
                    best = j - i
                break  # longer windows at this i can't be shorter
    return best


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="dat x", max_size=25))
def test_min_window_fuzz(s):
    from basicocr_ray.pipelines.queries import min_window_len

    assert min_window_len(s, "data") == brute_min_window(s, "data")
