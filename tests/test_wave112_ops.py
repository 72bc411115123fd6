"""Wave-112 operator pins: DTW, LZ78, BWT+MTF."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_dtw_dp_known():
    """Series [0,3,3] vs [0,0,3]: DTW aligns elastically to cost 0."""
    a = [0, 3, 3]
    b = [0, 0, 3]
    INF = 1 << 60
    n = 3
    dp = [[INF] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            cost = abs(a[i] - b[j])
            if i == 0 and j == 0:
                dp[i][j] = cost
            else:
                best = INF
                if i > 0:
                    best = min(best, dp[i - 1][j])
                if j > 0:
                    best = min(best, dp[i][j - 1])
                if i > 0 and j > 0:
                    best = min(best, dp[i - 1][j - 1])
                dp[i][j] = best + cost
    assert dp[2][2] == 0
    # rigid alignment (sum |a_i - b_i|) would cost 3


def test_lz78_phrase_parse():
    """'aaabbabaabb': phrases a, aa, b, ba, baa, bb -> 6; the
    trailing-partial convention counts an unfinished buffer."""
    def phrases(seq):
        d = set()
        buf = ""
        k = 0
        for ch in seq:
            w = buf + ch
            if w in d:
                buf = w
            else:
                d.add(w)
                k += 1
                buf = ""
        if buf:
            k += 1
        return k

    assert phrases("aaabbabaabb") == 6
    assert phrases("") == 0
    assert phrases("aaaa") == 3  # a, aa, a(partial)
    assert phrases("abab") == 3  # a, b, ab


def test_bwt_mtf_zero_density_prefers_repetitive():
    """A repetitive string yields far more MTF zeros after BWT than a
    random-ish one of the same length."""
    def mtf_zeros(s):
        s = s + "\x01"
        n = len(s)
        rots = sorted(range(n), key=lambda k: s[k:] + s[:k])
        bwt = "".join(s[(k - 1) % n] for k in rots)
        order = []
        z = 0
        for ch in bwt:
            if order and order[0] == ch:
                z += 1
            else:
                if ch in order:
                    order.remove(ch)
                order.insert(0, ch)
        return z

    rep = mtf_zeros("abcabcabcabcabcabcabc")
    mixed = mtf_zeros("aquickbrownfoxjumpsov")
    assert rep > mixed
    assert rep >= 15  # bwt of periodic text clusters hard
