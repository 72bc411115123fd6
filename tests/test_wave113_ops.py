"""Wave-113 operator pins: EWMA replay, Simpson audit, bitonic."""

from __future__ import annotations

from bisect import bisect_left

from hypothesis import given, settings
from hypothesis import strategies as st


def bitonic_kernel(vals):
    def lis_at_each(v):
        tails = []
        out = []
        for x in v:
            k = bisect_left(tails, x)
            if k == len(tails):
                tails.append(x)
            else:
                tails[k] = x
            out.append(k + 1)
        return out

    inc = lis_at_each(vals)
    dec = lis_at_each(vals[::-1])[::-1]
    return max(i + d - 1 for i, d in zip(inc, dec))


def brute_bitonic(vals):
    n = len(vals)
    best = 1
    import itertools

    for r in range(1, n + 1):
        for sub in itertools.combinations(range(n), r):
            seq = [vals[i] for i in sub]
            for piv in range(len(seq)):
                ok = all(
                    seq[k] < seq[k + 1] for k in range(piv)
                ) and all(
                    seq[k] > seq[k + 1] for k in range(piv, len(seq) - 1)
                )
                if ok:
                    best = max(best, len(seq))
                    break
    return best


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 8), min_size=1, max_size=9))
def test_bitonic_fuzz(vals):
    assert bitonic_kernel(vals) == brute_bitonic(vals)


def test_bitonic_known():
    assert bitonic_kernel([1, 5, 3, 2]) == 4  # 1,5,3,2
    assert bitonic_kernel([1, 2, 3]) == 3     # pure rise
    assert bitonic_kernel([3, 2, 1]) == 3     # pure fall
    assert bitonic_kernel([2, 2, 2]) == 1     # strictness


def test_ewma_crossing_rule():
    """s: 0 -> 75 (300 cents) crosses? (0+300)/4 = 75 < 100 no;
    then 300 again: (300+225)/4 = 131.25 crosses."""
    s = 0.0
    ups = 0
    for c in (300, 300):
        ns = (float(c) + 3.0 * s) / 4.0
        if s < 100.0 <= ns:
            ups += 1
        s = ns
    assert ups == 1 and abs(s - 131.25) < 1e-12


def test_simpson_sign_logic():
    """Two groups each negatively correlated, pooled positive (the
    canonical paradox shape) must flag."""
    groups = [
        # (n, sx, sy, sxy): within-group cov negative
        (2, 10 + 20, 1, 10),    # x=10 y=1, x=20 y=0 -> cov < 0
        (2, 110 + 120, 1, 110),  # x=110 y=1, x=120 y=0 -> cov < 0
    ]
    signs = []
    for n, sx, sy, sxy in groups:
        num = n * sxy - sx * sy
        signs.append((num > 0) - (num < 0))
    assert signs == [-1, -1]
    tn = sum(g[0] for g in groups)
    tsx = sum(g[1] for g in groups)
    tsy = sum(g[2] for g in groups)
    tsxy = sum(g[3] for g in groups)
    # canonical paradox: within-group negative, high-x group has the
    # higher y baseline -> pooled positive
    # A: (0,1),(10,0); B: (100,1),(100,1),(110,0)
    g2 = [(2, 10, 1, 0), (3, 310, 2, 200)]
    signs2 = []
    for n, sx, sy, sxy in g2:
        num = n * sxy - sx * sy
        signs2.append((num > 0) - (num < 0))
    tn = sum(g[0] for g in g2)
    tsx = sum(g[1] for g in g2)
    tsy = sum(g[2] for g in g2)
    tsxy = sum(g[3] for g in g2)
    pooled2 = tn * tsxy - tsx * tsy
    assert signs2 == [-1, -1] and pooled2 > 0  # the paradox
