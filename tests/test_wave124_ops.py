"""Wave-124 operator pins: Hamming(7,4), RAID parity, magic square."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 15), st.integers(0, 6))
def test_hamming74_corrects_any_single_flip(nib, pos):
    from basicocr_ray.pipelines.queries import (
        hamming74_decode, hamming74_encode,
    )

    cw = hamming74_encode(nib)
    assert hamming74_decode(cw) == nib  # clean decode
    assert hamming74_decode(cw ^ (1 << pos)) == nib  # any 1-bit flip


def test_hamming74_codewords_distance3():
    from basicocr_ray.pipelines.queries import hamming74_encode

    cws = [hamming74_encode(n) for n in range(16)]
    for i in range(16):
        for j in range(i + 1, 16):
            d = bin(cws[i] ^ cws[j]).count("1")
            assert d >= 3  # the minimum distance that buys correction


def test_raid_parity_identity():
    vals = [123, 456, 789, 1011]
    parity = 0
    for v in vals:
        parity ^= v
    for erased in range(4):
        recon = parity
        for k, v in enumerate(vals):
            if k != erased:
                recon ^= v
        assert recon == vals[erased]


def test_magic_square_is_magic_and_matches_formula():
    from basicocr_ray.pipelines.queries import siamese_magic

    for off in (0, 37):
        n = 5
        sq = siamese_magic(n, off)
        target = n * (n * n + 1) // 2 + n * off
        for r in range(n):
            assert sum(sq[r]) == target
        for c in range(n):
            assert sum(sq[r][c] for r in range(n)) == target
        assert sum(sq[i][i] for i in range(n)) == target
        assert sum(sq[i][n - 1 - i] for i in range(n)) == target
        assert sorted(v for row in sq for v in row) == list(
            range(1 + off, n * n + 1 + off)
        )
        for i in range(n):
            for j in range(n):
                f = (
                    n * ((i + j + 3) % n)
                    + ((i + 2 * j + 1) % n) + 1 + off
                )
                assert f == sq[i][j]
