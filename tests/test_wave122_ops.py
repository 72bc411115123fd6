"""Wave-122 operator pins: longest AP, Boyer-Moore vote, Fibonacci."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.sets(st.integers(0, 23), min_size=1, max_size=12))
def test_longest_ap_vs_brute(hours):
    s = sorted(hours)
    sset = set(s)
    # kernel (mirrors the query)
    best = (1, 0, s[0])
    for i, a in enumerate(s):
        for b in s[i + 1 :]:
            d = b - a
            L = 2
            cur = b
            while cur + d in sset:
                cur += d
                L += 1
            cand = (L, d, a)
            if cand[0] > best[0] or (
                cand[0] == best[0]
                and (cand[1], cand[2]) < (best[1], best[2])
            ):
                best = cand
    # brute: enumerate all (a, d, L)
    brute = (1, 0, s[0])
    for a in s:
        for d in range(1, 24):
            L = 1
            cur = a
            while cur + d in sset:
                cur += d
                L += 1
            if L >= 2:
                cand = (L, d, a)
                if cand[0] > brute[0] or (
                    cand[0] == brute[0]
                    and (cand[1], cand[2]) < (brute[1], brute[2])
                ):
                    brute = cand
    assert best == brute


def test_boyer_moore_majority_and_remnant():
    def vote(seq):
        cand, cnt = None, 0
        for x in seq:
            if cnt == 0:
                cand, cnt = x, 1
            elif x == cand:
                cnt += 1
            else:
                cnt -= 1
        return cand

    assert vote(["a", "b", "a", "a", "c", "a"]) == "a"  # true majority
    # no majority: remnant is order-dependent but deterministic
    assert vote(["a", "b", "c"]) == "c"
    assert vote(["a", "a", "b", "b", "c"]) == "c"


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**9))
def test_fib_fast_doubling(n):
    from basicocr_ray.pipelines.queries import fib_mod_fast_doubling

    P = 9973
    # iterative reference over n mod pisano(P)
    a, b = 0, 1
    k = 0
    seen = {}
    seq = [0]
    while True:
        a, b = b, (a + b) % P
        k += 1
        seq.append(a)
        if (a, b) == (0, 1):
            pi = k
            break
    assert fib_mod_fast_doubling(n, P) == seq[n % pi]
