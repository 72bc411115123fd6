"""Wave-120 operator pins: stable marriage, Nim/Grundy, Shapley."""

from __future__ import annotations

import itertools
import random


def gale_shapley(lang_pref, q_rank):
    n = len(lang_pref)
    nxt = [0] * n
    engaged = {}
    free = list(range(n - 1, -1, -1))
    while free:
        l = free.pop()
        q = lang_pref[l][nxt[l]]
        nxt[l] += 1
        if q not in engaged:
            engaged[q] = l
        elif q_rank[q][l] < q_rank[q][engaged[q]]:
            free.append(engaged[q])
            engaged[q] = l
        else:
            free.append(l)
    return {l: q for q, l in engaged.items()}


def test_gale_shapley_stable_and_man_optimal():
    rnd = random.Random(9)
    for _ in range(30):
        n = 4
        m = [[rnd.randrange(0, 30) for _ in range(n)] for _ in range(n)]
        lang_pref = [
            sorted(range(n), key=lambda q: (m[l][q], q)) for l in range(n)
        ]
        q_rank = [
            {
                l: r
                for r, l in enumerate(
                    sorted(range(n), key=lambda l: (m[l][q], l))
                )
            }
            for q in range(n)
        ]
        match = gale_shapley(lang_pref, q_rank)
        l_rank = [
            {q: r for r, q in enumerate(lang_pref[l])} for l in range(n)
        ]

        def stable(mm):
            for l in range(n):
                for q in range(n):
                    if (
                        l_rank[l][q] < l_rank[l][mm[l]]
                        and q_rank[q][l]
                        < q_rank[q][next(x for x in mm if mm[x] == q)]
                    ):
                        return False
            return True

        assert stable(match)
        # man-optimal: lexicographically best stable matching
        best = None
        for p in itertools.permutations(range(n)):
            mm = dict(enumerate(p))
            if stable(mm):
                key = tuple(l_rank[l][mm[l]] for l in range(n))
                if best is None or key < best[0]:
                    best = (key, mm)
        assert best[1] == match


def test_grundy_subtraction_134():
    G = [0] * 20
    for n in range(1, 20):
        opts = {G[n - s] for s in (1, 3, 4) if n - s >= 0}
        g = 0
        while g in opts:
            g += 1
        G[n] = g
    # known period-7 pattern of subtraction game {1,3,4}
    assert G[:14] == [0, 1, 0, 1, 2, 3, 2, 0, 1, 0, 1, 2, 3, 2]


def test_shapley_efficiency_axiom():
    """Shapley values (x6) must sum to 6*v(grand coalition)."""
    toks = {
        "en": {"a", "b", "c"},
        "de": {"b", "c", "d"},
        "zh": {"e"},
    }
    langs = sorted(toks)

    def v(S):
        u = set()
        for l in S:
            u |= toks[l]
        return len(u)

    phi6 = {l: 0 for l in langs}
    for order in itertools.permutations(langs):
        seen = []
        for l in order:
            phi6[l] += v(seen + [l]) - v(seen)
            seen.append(l)
    assert sum(phi6.values()) == 6 * v(langs)
    assert phi6["zh"] == 6  # unique contribution: exactly its token
