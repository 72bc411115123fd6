"""Real PNG codec goldens + image stage over hand-built PNGs."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from basicocr_ray.core.png import (
    PNG_SIGNATURE,
    average_hash_64,
    decode_png,
    encode_png,
    to_grayscale,
)


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(3)
    for shape in [(5, 7), (4, 4, 3), (3, 9, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(arr))
        assert out.shape == arr.shape
        assert (out == arr).all()


def _manual_png(rows_with_filters, width, ch, color_type):
    """Build a PNG whose scanlines use EXPLICIT filter types, computing the
    filtered bytes from the reference recurrences of the PNG spec."""
    raw = bytearray()
    prev = np.zeros(width * ch, dtype=np.int64)
    for ftype, row in rows_with_filters:
        row = np.asarray(row, dtype=np.int64).reshape(width * ch)
        filt = np.zeros_like(row)
        for i in range(len(row)):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                pp = a + b - c
                pa_, pb, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            filt[i] = (row[i] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(int(v) for v in filt)
        prev = row

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    h = len(rows_with_filters)
    ihdr = struct.pack(">IIBBBBB", width, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_all_five_filters_decode():
    rng = np.random.default_rng(9)
    w, ch = 6, 3
    rows = [rng.integers(0, 256, size=w * ch) for _ in range(5)]
    png = _manual_png(list(zip([0, 1, 2, 3, 4], rows)), w, ch, color_type=2)
    got = decode_png(png)
    expect = np.stack([r.reshape(w, ch) for r in rows]).astype(np.uint8)
    assert (got == expect).all()


def test_multi_idat_chunks():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = encode_png(arr)
    # split the single IDAT into two chunks byte-by-byte
    sig = png[:8]
    pos, chunks = 8, []
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        ctype = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + ln]
        chunks.append((ctype, payload))
        pos += 12 + ln

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    out = sig
    for ctype, payload in chunks:
        if ctype == b"IDAT":
            half = len(payload) // 2
            out += chunk(b"IDAT", payload[:half]) + chunk(b"IDAT", payload[half:])
        else:
            out += chunk(ctype, payload)
    assert (decode_png(out) == arr).all()


def test_reject_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"JUNK" * 10)
    arr = np.zeros((4, 4), dtype=np.uint8)
    png = bytearray(encode_png(arr))
    png[24] = 16  # bit depth byte in IHDR → 16-bit
    # fix IHDR crc
    ihdr = bytes(png[16:29])
    png[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr[:13] if False else png[12:29]) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        decode_png(bytes(png))


def test_average_hash_properties():
    flat = np.full((16, 16), 100, dtype=np.float64)
    h_flat = average_hash_64(flat)
    half = np.zeros((16, 16), dtype=np.float64)
    half[:, 8:] = 255.0
    h_half = average_hash_64(half)
    assert h_flat != h_half
    # brightness-invariance of average hash: scaling all pixels keeps bits
    assert average_hash_64(half * 0.5) == h_half


def test_grayscale_luma():
    rgb = np.zeros((1, 3, 3), dtype=np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[0, 1] = [0, 255, 0]
    rgb[0, 2] = [0, 0, 255]
    g = to_grayscale(rgb)[0]
    assert abs(g[0] - 0.299 * 255) < 1e-9
    assert abs(g[1] - 0.587 * 255) < 1e-9
    assert abs(g[2] - 0.114 * 255) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_image_stage_decodes_real_png():
    """The actor-pool stage must exercise the REAL codec on PNG payloads
    (and still take the fixture fast path for IMG! payloads)."""
    import ray.data

    from basicocr_ray.stages.multimodal import (
        ImageFeatureExtractor,
        make_image_payload,
    )

    rng = np.random.default_rng(21)
    img0 = rng.integers(0, 256, size=(12, 17), dtype=np.uint8)
    img1 = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    rows = [
        {"item_id": 0, "payload": encode_png(img0)},
        {"item_id": 1, "payload": encode_png(img1)},
        {"item_id": 2, "payload": make_image_payload(2, 32, 24)},
        {"item_id": 3, "payload": b"not an image"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(ImageFeatureExtractor, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    assert list(out["ok"]) == [True, True, True, False]
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (17, 12)
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (5, 9)
    assert abs(
        out.loc[0, "mean_pixel"] - round(float(img0.mean()) / 255.0, 6)
    ) < 1e-9
    g1 = to_grayscale(img1)
    assert out.loc[1, "phash"] == average_hash_64(g1)
    assert (out.loc[2, "width"], out.loc[2, "height"]) == (32, 24)


@pytest.mark.usefixtures("ray_session")
def test_video_frame_sampler_real_decode():
    import ray.data

    from basicocr_ray.core.png import average_hash_64, to_grayscale
    from basicocr_ray.stages.multimodal import (
        VideoFrameSampler,
        make_video_payload,
    )

    rows = [
        {"item_id": 0, "payload": make_video_payload(0, n_frames=6)},
        {"item_id": 1, "payload": make_video_payload(1, n_frames=3)},
        {"item_id": 2, "payload": b"not video"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(VideoFrameSampler, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values(["item_id", "frame_index"])
        .reset_index(drop=True)
    )
    good = out[out["ok"]]
    bad = out[~out["ok"]]
    # every 2nd frame sampled: item 0 → frames 0,2,4; item 1 → 0,2
    assert list(good[good["item_id"] == 0]["frame_index"]) == [0, 2, 4]
    assert list(good[good["item_id"] == 1]["frame_index"]) == [0, 2]
    assert (good["width"] == 16).all() and (good["height"] == 12).all()
    assert len(bad) == 1 and "ValueError" in bad.iloc[0]["error"]
    # mean/phash come from the REAL png decode of the known gradient frame
    import numpy as np

    base = (0 * 31 + 0 * 7) % 200
    arr = ((np.arange(12)[:, None] + np.arange(16)[None, :] + base) % 256).astype(np.uint8)
    g = to_grayscale(arr)
    row0 = good[(good["item_id"] == 0) & (good["frame_index"] == 0)].iloc[0]
    assert row0["phash"] == average_hash_64(g)
    assert abs(row0["mean_pixel"] - round(float(g.mean()) / 255.0, 6)) < 1e-9


# ---------------------------------------------------------------------------
# property fuzzing (round-5: same treatment as the GIF fuzz that found a
# real encoder bug)
# ---------------------------------------------------------------------------

import struct as _struct
import zlib as _zlib

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_fuzz(w, h, ch, seed):
    rnd = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    arr = rnd.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


def _forward_filter(img2d, ch, ftypes):
    """Independent spec-side forward filtering (PNG 15.2.6), used to
    build raw scanline streams the encoder never produces (it always
    writes filter 0) so the decoder's Sub/Up/Average/Paeth paths are
    exercised against ground truth."""
    h, stride = img2d.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        x = img2d[y].astype(np.int32)
        ft = ftypes[y]
        f = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = int(x[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
            f[i] = (x[i] - pred) & 0xFF
        out.append(ft)
        out.extend(f.astype(np.uint8).tobytes())
        prev = x
    return bytes(out)


def _png_chunk(ctype, payload):
    crc = _zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return _struct.pack(">I", len(payload)) + ctype + payload + _struct.pack(">I", crc)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_png_all_filters_decode_fuzz(w, h, ch, seed):
    """Hand-built PNGs whose rows use RANDOM filter types 0-4 must
    reconstruct the exact image (the encoder only emits filter 0, so
    this is the only coverage of the Sub/Average/Paeth decode paths on
    arbitrary content)."""
    rnd = np.random.default_rng(seed)
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    shape = (h, w) if ch == 1 else (h, w, ch)
    arr = rnd.integers(0, 256, size=shape, dtype=np.uint8)
    ftypes = rnd.integers(0, 5, size=h).tolist()
    raw = _forward_filter(arr.reshape(h, w * ch), ch, ftypes)
    data = (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == arr.shape and (out == arr).all()


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_png_garbage_rejected_or_decoded(data):
    """Arbitrary blobs (with and without a valid signature prefix) must
    either decode or raise ValueError — any other exception type leaks
    past the failed-path contract."""
    for payload in (data, PNG_SIGNATURE + data):
        try:
            decode_png(payload)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31), nmut=st.integers(1, 8))
def test_png_mutation_rejected_or_decoded(seed, nmut):
    rnd = np.random.default_rng(seed)
    arr = rnd.integers(0, 256, size=(5, 7), dtype=np.uint8)
    good = bytearray(encode_png(arr))
    for _ in range(nmut):
        op = rnd.integers(0, 3)
        if op == 0 and len(good) > 1:
            good = good[: rnd.integers(1, len(good))]
        elif op == 1:
            good[rnd.integers(0, len(good))] = rnd.integers(0, 256)
        else:
            good += bytes(rnd.integers(0, 256, size=4).tolist())
    try:
        decode_png(bytes(good))
    except ValueError:
        pass
