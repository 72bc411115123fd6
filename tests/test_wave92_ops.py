"""Wave-92 operator pins: BWT, Elias-Fano, GIF in the image stage."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_bwt_known_vector():
    from basicocr_ray.pipelines.queries import bwt_forward, bwt_inverse

    last, p = bwt_forward("banana")
    assert bwt_inverse(last, p) == "banana"
    # BWT clusters repeats: 'banana' -> 'nnbaaa' at primary 3
    assert sorted(last) == sorted("banana")
    assert last == "nnbaaa"


@settings(max_examples=60, deadline=None)
@given(st.text(min_size=1, max_size=60))
def test_bwt_roundtrip_fuzz(s):
    from basicocr_ray.pipelines.queries import bwt_forward, bwt_inverse

    last, p = bwt_forward(s)
    assert bwt_inverse(last, p) == s


def test_elias_fano_known_and_fuzz():
    from basicocr_ray.pipelines.queries import ef_decode, ef_encode

    ids = [2, 3, 5, 7, 11, 13, 24]
    blob, l = ef_encode(ids, 25)
    assert ef_decode(blob, l, len(ids)) == ids
    # dense list: l = 0 (unary-dominated)
    dense = list(range(10))
    blob, l = ef_encode(dense, 10)
    assert l == 0
    assert ef_decode(blob, l, len(dense)) == dense
    # sparse list: large l
    sparse = [0, 1000, 100000]
    blob, l = ef_encode(sparse, 100001)
    assert l == 15  # floor(log2(100001 // 3)) = floor(log2(33333))
    assert ef_decode(blob, l, len(sparse)) == sparse


@settings(max_examples=40, deadline=None)
@given(st.sets(st.integers(0, 5000), min_size=1, max_size=80))
def test_elias_fano_fuzz(idset):
    from basicocr_ray.pipelines.queries import ef_decode, ef_encode

    ids = sorted(idset)
    blob, l = ef_encode(ids, max(ids) + 1)
    assert ef_decode(blob, l, len(ids)) == ids


def test_image_stage_sniffs_gif():
    from basicocr_ray.core.gif import encode_gif
    from basicocr_ray.stages.multimodal import _real_image_features

    pal = [(0, 0, 0), (255, 255, 255)]
    idx = bytes([0, 1] * 8 * 8)  # 16x8 checker columns
    gif = encode_gif(16, 8, pal, idx)
    w, h, mean, phash = _real_image_features(gif)
    assert (w, h) == (16, 8)
    assert abs(mean - 0.5) < 0.01  # half white
    assert isinstance(phash, int)
    with pytest.raises(ValueError):
        _real_image_features(b"JUNKJUNKJUNK")
