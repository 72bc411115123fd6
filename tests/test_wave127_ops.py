"""Wave-127 operator pins: valid parens, min swaps, house robber."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_valid_parens(s):
    best = 0
    for i in range(len(s)):
        bal = 0
        for j in range(i, len(s)):
            bal += 1 if s[j] == "(" else -1
            if bal < 0:
                break
            if bal == 0:
                best = max(best, j - i + 1)
    return best


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="()", max_size=30))
def test_valid_parens_fuzz(s):
    from basicocr_ray.pipelines.queries import longest_valid_parens

    assert longest_valid_parens(s) == brute_valid_parens(s)


def brute_min_swaps(vals):
    arr = list(vals)
    target = sorted(arr)
    swaps = 0
    pos = {v: i for i, v in enumerate(arr)}
    for i in range(len(arr)):
        if arr[i] != target[i]:
            j = pos[target[i]]
            pos[arr[i]] = j
            pos[target[i]] = i
            arr[i], arr[j] = arr[j], arr[i]
            swaps += 1
    return swaps


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=10,
                unique=True))
def test_min_swaps_cycle_identity(vals):
    n = len(vals)
    order = sorted(range(n), key=lambda i: vals[i])
    perm = [0] * n
    for target, src in enumerate(order):
        perm[src] = target
    seen = [False] * n
    cycles = 0
    for i in range(n):
        if not seen[i]:
            cycles += 1
            j = i
            while not seen[j]:
                seen[j] = True
                j = perm[j]
    assert n - cycles == brute_min_swaps(vals)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 200), max_size=15))
def test_house_robber_fuzz(vals):
    take = skip = 0
    for v in vals:
        take, skip = skip + v, max(take, skip)
    dp = max(take, skip)
    brute = max(
        (
            sum(v for i, v in enumerate(vals) if m >> i & 1)
            for m in range(1 << len(vals))
            if (m & (m << 1)) == 0
        ),
        default=0,
    )
    assert dp == brute
