"""Minimal real WAV/PCM codec — stdlib only (struct + numpy).

Completes the multimodal de-stubbing (PNG in `core.png`, PDF in
`core.pdf_text`): RIFF/WAVE files with integer PCM (8/16/32-bit) or
IEEE-float32 samples are decodable with ``struct`` alone. Unsupported
codecs (ADPCM, µ-law, extensible beyond PCM) raise ``ValueError`` →
routed to the failed path like any corrupt payload.

Reference analogue: none in the reference (it is image-only); this is
task-brief multimodal surface ("audio ... decode / feature-extract /
frame-sample as actor-pool map_batches stages").
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float64 mono samples in [-1, 1])."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            samples = body
    if fmt is None or samples is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt == 1:  # integer PCM
        dt = _PCM_DTYPES.get(bits)
        if dt is None:
            raise ValueError(f"unsupported PCM bit depth {bits}")
        arr = np.frombuffer(samples, dtype=np.dtype(dt).newbyteorder("<"))
        if bits == 8:  # 8-bit WAV is unsigned
            x = (arr.astype(np.float64) - 128.0) / 128.0
        else:
            x = arr.astype(np.float64) / float(1 << (bits - 1))
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(samples, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {audio_fmt}/{bits}bit")
    if n_ch > 1:  # mono mixdown, deterministic mean
        usable = (len(x) // n_ch) * n_ch
        x = x[:usable].reshape(-1, n_ch).mean(axis=1)
    return rate, x


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """float samples in [-1, 1] → 16-bit PCM mono WAV (test helper)."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def frame_features(
    x: np.ndarray, rate: int, frame_hop_s: float, n_features: int
) -> tuple[int, list[float]]:
    """Real per-frame features: each hop-sized frame yields ``n_features``
    values — RMS energy, zero-crossing rate, peak, then mean |x| over
    ``n_features - 3`` equal sub-bands of the frame (time-domain proxy for
    a band profile; rounded for cross-platform determinism)."""
    hop = max(1, int(rate * frame_hop_s))
    n_frames = max(1, int(np.ceil(len(x) / hop))) if len(x) else 1
    feats: list[float] = []
    for f in range(n_frames):
        fr = x[f * hop : (f + 1) * hop]
        if len(fr) == 0:
            fr = np.zeros(1)
        rms = float(np.sqrt(np.mean(fr * fr)))
        zcr = float(np.mean(np.signbit(fr[1:]) != np.signbit(fr[:-1]))) if len(fr) > 1 else 0.0
        peak = float(np.max(np.abs(fr)))
        vals = [rms, zcr, peak]
        n_bands = max(0, n_features - 3)
        if n_bands:
            bounds = np.linspace(0, len(fr), n_bands + 1).astype(int)
            for b in range(n_bands):
                seg = fr[bounds[b] : bounds[b + 1]]
                vals.append(float(np.mean(np.abs(seg))) if len(seg) else 0.0)
        feats.extend(round(v, 6) for v in vals[:n_features])
    return n_frames, feats
