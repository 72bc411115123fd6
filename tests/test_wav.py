"""Real WAV codec goldens + audio stage over hand-built WAVs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from basicocr_ray.core.wav import decode_wav, encode_wav, frame_features


def test_roundtrip_16bit_pcm():
    rate = 8000
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    r2, y = decode_wav(encode_wav(rate, x))
    assert r2 == rate
    assert len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization error bound


def test_8bit_and_float32_formats():
    rate = 4000
    x = np.linspace(-1, 1, 100)
    # hand-build an 8-bit unsigned PCM file
    pcm8 = np.round((x * 127.0) + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    wav8 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm8)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm8)) + pcm8)
    r, y = decode_wav(wav8)
    assert r == rate and np.abs(y - x).max() < 1 / 64

    f32 = x.astype("<f4").tobytes()
    fmtf = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    wavf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtf) + 8 + len(f32)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmtf)) + fmtf
            + b"data" + struct.pack("<I", len(f32)) + f32)
    r, y = decode_wav(wavf)
    assert r == rate and np.abs(y - x).max() < 1e-6


def test_stereo_mixdown():
    rate = 1000
    left = np.full(50, 0.5)
    right = np.full(50, -0.5)
    inter = np.empty(100)
    inter[0::2], inter[1::2] = left, right
    pcm = np.round(inter * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, rate, rate * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(pcm)) + pcm)
    r, y = decode_wav(wav)
    assert len(y) == 50
    assert np.abs(y).max() < 1e-4  # L+R cancel


def test_reject_non_wav_and_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"garbage")
    # ADPCM format code 2 → unsupported
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_wav(wav)


def test_frame_features_shape_and_determinism():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(16000) * 0.1
    n_frames, feats = frame_features(x, 16000, 0.5, 8)
    assert n_frames == 2
    assert len(feats) == 16
    assert feats == frame_features(x, 16000, 0.5, 8)[1]
    # silent audio → zero energy features
    nf, fz = frame_features(np.zeros(8000), 16000, 0.5, 8)
    assert nf == 1 and all(v == 0.0 for v in fz)


@pytest.mark.usefixtures("ray_session")
def test_audio_stage_decodes_real_wav():
    import ray.data

    from basicocr_ray.stages.multimodal import AudioFrameSampler, make_audio_payload

    rate = 8000
    t = np.arange(rate * 2) / rate
    wav = encode_wav(rate, 0.3 * np.sin(2 * np.pi * 220 * t))
    rows = [
        {"item_id": 0, "payload": wav},
        {"item_id": 1, "payload": make_audio_payload(1, 16000, 1.0)},
        {"item_id": 2, "payload": b"junk"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(AudioFrameSampler, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    assert list(out["ok"]) == [True, True, False]
    assert out.loc[0, "sample_rate"] == rate
    assert out.loc[0, "n_frames"] == 4  # 2 s / 0.5 s hop
    assert len(out.loc[0, "features"]) == 4 * 8
    assert "ValueError" in out.loc[2, "error"]


@pytest.mark.usefixtures("ray_session")
def test_audio_resampler_stage():
    """Real WAV → linear resample to a new rate → re-encode: output is a
    decodable WAV at the target rate with ~rate-ratio sample count and
    preserved waveform shape (a 220 Hz sine stays a 220 Hz sine);
    corrupt payloads route to ok=False."""
    import ray.data

    from basicocr_ray.stages.multimodal import AudioResampler

    rate = 16000
    t = np.arange(int(rate * 0.5)) / rate
    x = 0.3 * np.sin(2 * np.pi * 220 * t)
    rows = [
        {"item_id": 0, "payload": encode_wav(rate, x)},
        {"item_id": 1, "payload": b"not audio"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(
            AudioResampler,
            fn_constructor_kwargs={"target_rate": 8000},
            batch_format="pyarrow",
            concurrency=1,
            batch_size=8,
        )
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    assert out["ok"].tolist() == [True, False]
    r2, y = decode_wav(out["payload"][0])
    assert r2 == 8000
    assert abs(len(y) - len(x) // 2) <= 1
    # waveform preserved: correlate the resampled signal against an
    # 8 kHz reference sine of the same frequency/phase
    t2 = np.arange(len(y)) / 8000
    ref = 0.3 * np.sin(2 * np.pi * 220 * t2)
    err = np.abs(y - ref).max()
    assert err < 0.02, err


# ---------------------------------------------------------------------------
# property fuzzing (round-5: the GIF fuzz found a real encoder bug; same
# treatment for the remaining from-scratch codecs)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    n=st.integers(0, 400),
    seed=st.integers(0, 2**31),
)
def test_wav_roundtrip_fuzz(rate, n, seed):
    """encode→decode roundtrip for arbitrary float signals: rate exact,
    length exact, samples within the 16-bit quantization bound. Encode
    scales by 32767, decode normalizes by 32768 (the int16-full-scale
    convention), so the worst case is |x|/32768 + 0.5/32768 — NOT half
    an encode step."""
    rnd = np.random.default_rng(seed)
    x = rnd.uniform(-1.3, 1.3, size=n)  # beyond [-1,1] → encoder clips
    r2, y = decode_wav(encode_wav(rate, x))
    assert r2 == rate and len(y) == n
    assert np.all(np.abs(np.clip(x, -1, 1) - y) <= 1.5 / 32768.0 + 1e-12)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_wav_garbage_rejected_or_decoded(data):
    """Arbitrary byte blobs must either decode or raise ValueError — the
    failed-path contract; any other exception type is a codec bug."""
    try:
        decode_wav(data)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31), nmut=st.integers(1, 8))
def test_wav_mutation_rejected_or_decoded(seed, nmut):
    """Byte-level mutations of a VALID file must never escape the
    ValueError contract (truncations, flipped sizes, corrupt chunk ids)."""
    rnd = np.random.default_rng(seed)
    good = bytearray(encode_wav(8000, rnd.uniform(-1, 1, size=50)))
    for _ in range(nmut):
        op = rnd.integers(0, 3)
        if op == 0 and len(good) > 1:
            good = good[: rnd.integers(1, len(good))]  # truncate
        elif op == 1:
            good[rnd.integers(0, len(good))] = rnd.integers(0, 256)
        else:
            good += bytes(rnd.integers(0, 256, size=4).tolist())
    try:
        decode_wav(bytes(good))
    except ValueError:
        pass
