"""GIF codec pins: LZW roundtrips (width growth, KwKwK, 4096 clear),
container parsing (extensions, corrupt inputs), hypothesis fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from basicocr_ray.core.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    parse_gif,
)

PAL4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
PAL256 = [(i, 255 - i, (i * 7) % 256) for i in range(256)]


def test_lzw_kwkwk_case():
    # 'aabbbaabb'-style data drives the code==next_code branch
    data = bytes([0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 0])
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2) == data


def test_lzw_width_growth_and_clear():
    import random

    rnd = random.Random(11)
    data = bytes(rnd.randrange(256) for _ in range(30000))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8) == data  # passes 4096-entry clears


def test_gif_roundtrip_with_extension_block():
    idx = bytes((x * 3 + y) % 4 for y in range(9) for x in range(7))
    g = encode_gif(7, 9, PAL4, idx)
    # splice a graphic-control extension after the color table
    # (header 13 + 4 colors * 3 = 25)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    g2 = g[:25] + ext + g[25:]
    img = parse_gif(g2)
    assert img["width"] == 7 and img["height"] == 9
    assert img["indices"] == idx
    assert img["palette"][1] == (255, 0, 0)


def test_gif_rejects_garbage():
    with pytest.raises(GifError):
        parse_gif(b"NOTAGIF")
    with pytest.raises(GifError):
        parse_gif(b"GIF89a\x01\x00")  # truncated
    g = encode_gif(2, 2, PAL4, bytes([0, 1, 2, 3]))
    with pytest.raises(GifError):
        parse_gif(g[:-10])  # truncated data stream
    with pytest.raises(GifError):
        encode_gif(2, 2, PAL4, bytes([0, 1, 2]))  # wrong pixel count
    with pytest.raises(GifError):
        encode_gif(1, 1, PAL4, bytes([7]))  # index out of palette
    # interlace flag must refuse, not garble
    bad = bytearray(g)
    # image descriptor starts after 13 + 12 palette bytes: 0x2c ...
    assert bad[25] == 0x2C
    bad[25 + 9] |= 0x40
    with pytest.raises(GifError):
        parse_gif(bytes(bad))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    ncol=st.sampled_from([2, 3, 4, 16, 256]),
)
def test_gif_roundtrip_fuzz(w, h, seed, ncol):
    import random

    rnd = random.Random(seed)
    pal = [(rnd.randrange(256),) * 3 for _ in range(ncol)]
    idx = bytes(rnd.randrange(ncol) for _ in range(w * h))
    img = parse_gif(encode_gif(w, h, pal, idx))
    assert img["width"] == w and img["height"] == h
    assert img["indices"] == idx
    assert img["palette"][: len(pal)] == pal
