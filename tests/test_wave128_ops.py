"""Wave-128 operator pins: Held-Karp, Konig cover, Euler check."""

from __future__ import annotations

import itertools
import random


def held_karp(pts):
    n = len(pts)

    def d(i, j):
        return (pts[i][0] - pts[j][0]) ** 2 + (
            pts[i][1] - pts[j][1]
        ) ** 2

    INF = 1 << 60
    dp = [[INF] * n for _ in range(1 << n)]
    dp[1][0] = 0
    for mask in range(1 << n):
        for last in range(n):
            if dp[mask][last] == INF or not (mask >> last) & 1:
                continue
            for nxt in range(n):
                if (mask >> nxt) & 1:
                    continue
                nm = mask | (1 << nxt)
                nc = dp[mask][last] + d(last, nxt)
                if nc < dp[nm][nxt]:
                    dp[nm][nxt] = nc
    return min(
        dp[(1 << n) - 1][last] + d(last, 0) for last in range(1, n)
    )


def test_held_karp_vs_brute_tours():
    rnd = random.Random(2)
    for _ in range(8):
        n = 6
        pts = [(rnd.randrange(10), rnd.randrange(10)) for _ in range(n)]

        def d(i, j):
            return (pts[i][0] - pts[j][0]) ** 2 + (
                pts[i][1] - pts[j][1]
            ) ** 2

        brute = min(
            sum(
                d(p[i], p[(i + 1) % n]) for i in range(n)
            )
            for p in (
                (0,) + rest
                for rest in itertools.permutations(range(1, n))
            )
        )
        assert held_karp(pts) == brute


def test_konig_matching_equals_cover():
    rnd = random.Random(8)
    for _ in range(20):
        edges = sorted(
            {
                (rnd.randrange(4), rnd.randrange(4))
                for _ in range(rnd.randrange(1, 10))
            }
        )
        adj = {}
        for l, r in edges:
            adj.setdefault(l, []).append(r)
        match_r = {}

        def augment(u, seen):
            for v in sorted(adj.get(u, ())):
                if v in seen:
                    continue
                seen.add(v)
                if v not in match_r or augment(match_r[v], seen):
                    match_r[v] = u
                    return True
            return False

        matching = sum(
            1 for u in sorted(adj) if augment(u, set())
        )
        # brute min cover: bits 0-3 left, 4-7 right
        best = 8
        for m in range(256):
            if all(
                (m >> l) & 1 or (m >> (r + 4)) & 1 for l, r in edges
            ):
                best = min(best, bin(m).count("1"))
        assert matching == best


def test_euler_conditions():
    # triangle: all degree 2, connected -> circuit
    edges = [(0, 1), (1, 2), (0, 2)]
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(v % 2 == 0 for v in deg.values())
    # path: two odd-degree endpoints -> no circuit
    deg2 = {}
    for a, b in [(0, 1), (1, 2)]:
        deg2[a] = deg2.get(a, 0) + 1
        deg2[b] = deg2.get(b, 0) + 1
    assert sum(1 for v in deg2.values() if v % 2) == 2
