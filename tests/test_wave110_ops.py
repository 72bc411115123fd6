"""Wave-110 operator pins: Kruskal MST, max-flow, Hungarian."""

from __future__ import annotations

import itertools
import random

from hypothesis import given, settings
from hypothesis import strategies as st


def test_hungarian_known_and_fuzz():
    from basicocr_ray.pipelines.queries import hungarian_min_cost

    # classic example
    cost = [
        [4, 1, 3],
        [2, 0, 5],
        [3, 2, 2],
    ]
    # brute: min over 3! permutations
    brute = min(
        sum(cost[i][p[i]] for i in range(3))
        for p in itertools.permutations(range(3))
    )
    assert hungarian_min_cost(cost) == brute == 5

    rnd = random.Random(3)
    for _ in range(50):
        n = rnd.randrange(1, 6)
        c = [[rnd.randrange(0, 50) for _ in range(n)] for _ in range(n)]
        brute = min(
            sum(c[i][p[i]] for i in range(n))
            for p in itertools.permutations(range(n))
        )
        assert hungarian_min_cost(c) == brute


def test_max_flow_hand_case():
    """Classic 4-node diamond: S->a cap 3, S->b cap 2, a->T 2, b->T 2,
    a->b 1: max flow = 4."""
    from collections import defaultdict, deque

    edges = {(0, 1): 3, (0, 2): 2, (1, 3): 2, (2, 3): 2, (1, 2): 1}
    cap = defaultdict(int)
    adj = defaultdict(set)
    for (a, b), c in edges.items():
        cap[(a, b)] += c
        adj[a].add(b)
        adj[b].add(a)
    S, T = 0, 3
    flow = 0
    while True:
        prev = {S: None}
        dq = deque([S])
        while dq and T not in prev:
            v = dq.popleft()
            for w in adj[v]:
                if w not in prev and cap[(v, w)] > 0:
                    prev[w] = v
                    dq.append(w)
        if T not in prev:
            break
        path = []
        v = T
        while prev[v] is not None:
            path.append((prev[v], v))
            v = prev[v]
        aug = min(cap[e] for e in path)
        for a, b in path:
            cap[(a, b)] -= aug
            cap[(b, a)] += aug
        flow += aug
    assert flow == 4


def test_kruskal_unique_mst():
    """Distinct weights: MST weight is unique; verify against brute
    enumeration of spanning trees on a small graph."""
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    w = {e: 1000 * ((e[0] * e[1]) % 97) + i + 1 for i, e in enumerate(edges)}

    # kruskal
    parent = {n: n for n in range(4)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0
    for e in sorted(edges, key=lambda e: w[e]):
        a, b = find(e[0]), find(e[1])
        if a != b:
            parent[a] = b
            total += w[e]

    # brute: all 3-edge subsets that connect 4 nodes
    best = None
    for sub in itertools.combinations(edges, 3):
        p = {n: n for n in range(4)}

        def f(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for a, b in sub:
            p[f(a)] = f(b)
        if len({f(n) for n in range(4)}) == 1:
            c = sum(w[e] for e in sub)
            best = c if best is None or c < best else best
    assert total == best
