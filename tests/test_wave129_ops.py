"""Wave-129 operator pins: zigzag, distinct subsequences, Gray walk."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_zigzag(vals):
    n = len(vals)
    best = 0
    for r in range(1, n + 1):
        for sub in itertools.combinations(range(n), r):
            seq = [vals[i] for i in sub]
            ok = True
            for k in range(1, len(seq)):
                if seq[k] == seq[k - 1]:
                    ok = False
                    break
                if k >= 2:
                    a = seq[k - 1] - seq[k - 2]
                    b = seq[k] - seq[k - 1]
                    if (a > 0) == (b > 0):
                        ok = False
                        break
            if ok:
                best = max(best, len(seq))
    return best


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=1, max_size=8))
def test_zigzag_dp_fuzz(vals):
    up = down = 1
    for k in range(1, len(vals)):
        if vals[k] > vals[k - 1]:
            up = down + 1
        elif vals[k] < vals[k - 1]:
            down = up + 1
    assert max(up, down) == brute_zigzag(vals)


def brute_distinct_subseq(s):
    subs = set()
    for m in range(1, 1 << len(s)):
        subs.add("".join(s[i] for i in range(len(s)) if m >> i & 1))
    return len(subs)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc", max_size=12))
def test_distinct_subseq_fuzz(s):
    from basicocr_ray.pipelines.queries import count_distinct_subseq

    assert count_distinct_subseq(s) == brute_distinct_subseq(s)


def test_gray_cycle_one_bit_everywhere():
    for off in (0, 7):
        prev = None
        for i in range(33):  # includes the wrap
            j = (i + off) % 32
            g = j ^ (j >> 1)
            if prev is not None:
                assert bin(g ^ prev).count("1") == 1
            prev = g
