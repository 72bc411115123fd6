"""Wave-118 operator pins: Bareiss det, Ryser permanent, GF(2) rank."""

from __future__ import annotations

import itertools
import random

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_det(m):
    n = len(m)
    total = 0
    for p in itertools.permutations(range(n)):
        inv = sum(
            1 for i in range(n) for j in range(i + 1, n) if p[i] > p[j]
        )
        prod = 1
        for i in range(n):
            prod *= m[i][p[i]]
        total += (-1) ** inv * prod
    return total


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(-9, 9), min_size=4, max_size=4),
                min_size=4, max_size=4))
def test_bareiss_fuzz(m):
    from basicocr_ray.pipelines.queries import bareiss_det

    assert bareiss_det(m) == brute_det(m)


def test_bareiss_singular_and_pivot():
    from basicocr_ray.pipelines.queries import bareiss_det

    assert bareiss_det([[0, 1, 0, 0], [1, 0, 0, 0],
                        [0, 0, 1, 0], [0, 0, 0, 1]]) == -1  # row swap
    assert bareiss_det([[1, 2, 3, 4], [2, 4, 6, 8],
                        [0, 1, 0, 0], [0, 0, 0, 1]]) == 0  # singular


def test_ryser_equals_brute_permanent():
    rnd = random.Random(5)
    for _ in range(20):
        m = [[rnd.randrange(0, 5) for _ in range(4)] for _ in range(4)]
        brute = sum(
            m[0][p[0]] * m[1][p[1]] * m[2][p[2]] * m[3][p[3]]
            for p in itertools.permutations(range(4))
        )
        n = 4
        total = 0
        for mask in range(1, 1 << n):
            bits = bin(mask).count("1")
            prod = 1
            for i in range(n):
                s = sum(m[i][j] for j in range(n) if mask & (1 << j))
                prod *= s
            total += (-1) ** (n - bits) * prod
        assert total == brute


def test_gf2_rank_basis():
    def rank(rows):
        basis = []
        for v in rows:
            for b in basis:
                v = min(v, v ^ b)
            if v:
                basis.append(v)
                basis.sort(reverse=True)
        return len(basis)

    assert rank([0b001, 0b010, 0b100]) == 3
    assert rank([0b001, 0b010, 0b011]) == 2  # third is the XOR
    assert rank([0, 0, 0]) == 0
    assert rank([0b111, 0b111]) == 1
