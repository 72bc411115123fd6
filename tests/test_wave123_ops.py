"""Wave-123 operator pins: 2D Kadane, sieve, 231 avoidance."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st


def kadane2d(grid):
    n = len(grid)
    best = grid[0][0]
    for r1 in range(n):
        col = [0] * n
        for r2 in range(r1, n):
            for c in range(n):
                col[c] += grid[r2][c]
            cur = None
            for v in col:
                cur = v if cur is None or cur < 0 else cur + v
                best = max(best, cur)
    return best


def brute2d(grid):
    n = len(grid)
    best = None
    for r1 in range(n):
        for r2 in range(r1, n):
            for c1 in range(n):
                for c2 in range(c1, n):
                    s = sum(
                        grid[r][c]
                        for r in range(r1, r2 + 1)
                        for c in range(c1, c2 + 1)
                    )
                    best = s if best is None or s > best else best
    return best


def test_kadane2d_fuzz():
    rnd = random.Random(4)
    for _ in range(25):
        n = rnd.randrange(1, 6)
        g = [
            [rnd.randrange(-9, 10) for _ in range(n)] for _ in range(n)
        ]
        assert kadane2d(g) == brute2d(g)


def test_sieve_known_values():
    N = 100
    sieve = bytearray([1]) * (N + 1)
    sieve[0] = sieve[1] = 0
    p = 2
    while p * p <= N:
        if sieve[p]:
            for q in range(p * p, N + 1, p):
                sieve[q] = 0
        p += 1
    primes = [i for i in range(N + 1) if sieve[i]]
    assert len(primes) == 25  # pi(100)
    assert sum(primes) == 1060


def has_231_kernel(vals):
    stack = []
    third = None
    for v in vals:
        if third is not None and v < third:
            return True
        while stack and stack[-1] < v:
            third = stack.pop()
        stack.append(v)
    return False


def brute_231(vals):
    n = len(vals)
    return any(
        vals[k] < vals[i] < vals[j]
        for i in range(n)
        for j in range(i + 1, n)
        for k in range(j + 1, n)
    )


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(0, 9), max_size=12))
def test_231_detector_fuzz(vals):
    assert has_231_kernel(vals) == brute_231(vals)
