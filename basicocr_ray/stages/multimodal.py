"""Multimodal column stages — image/audio payloads as opaque binary.

Task-brief requirement: treat image/audio/video as ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
actor-pool `map_batches` stages. Both decode kernels are REAL: PNG images
via the stdlib codec in `core.png` (zlib inflate, scanline defiltering,
luma, 8×8 average hash) and WAV/PCM audio via `core.wav` (RIFF parse,
8/16/32-bit + float32, mono mixdown, per-frame RMS/ZCR/band features).
The deterministic ``IMG!``/``AUD!`` fixture conventions remain the
hash-stable fast paths for oracle-checked queries; payloads that are
neither fixture nor a supported real format route to the failed path.

Fixture payload conventions (deterministic fakes):
  * image: b"IMG!" + width:uint16le + height:uint16le + pixel-seed bytes
  * audio: b"AUD!" + sample_rate:uint32le + n_samples:uint32le + seed bytes
Anything else → routed to the failed path (ok=False), mirroring the
corrupt-skip behavior of `contrib/crnn/dataset.py:53-55` and the payload
probe of `tool/tolmdb.py:10-22` (`checkImageIsValid`).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

IMAGE_MAGIC = b"IMG!"
AUDIO_MAGIC = b"AUD!"

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("mean_pixel", pa.float64()),
        ("phash", pa.uint64()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
    ]
)


def _real_image_features(data: bytes) -> tuple[int, int, float, int]:
    """REAL decode path, magic-sniffed: stdlib PNG codec (`core.png`)
    or GIF/LZW codec (`core.gif`) → genuine pixel statistics + 8×8
    average hash. Other payloads raise (→ failed path); an imaging
    library, if ever present, would slot in here."""
    from basicocr_ray.core.png import average_hash_64, decode_png, to_grayscale

    if data[:4] == b"GIF8":
        from basicocr_ray.core.gif import parse_gif

        img = parse_gif(data)
        pal = np.asarray(img["palette"], dtype=np.uint8)
        idx = np.frombuffer(img["indices"], dtype=np.uint8)
        arr = pal[idx].reshape(img["height"], img["width"], 3)
    else:
        arr = decode_png(data)  # raises ValueError for non-PNG/unsupported
    gray = to_grayscale(arr)
    h, w = gray.shape
    return w, h, round(float(gray.mean()) / 255.0, 6), average_hash_64(gray)


class ImageFeatureExtractor:
    """Actor-pool stage: binary image column → typed feature columns.

    ``__init__`` is where a real deployment loads its vision model once per
    actor (the A1 pattern); ``__call__`` processes an Arrow batch. Use
    small ``batch_size`` for large payloads (SURVEY §4 memory row)."""

    def __init__(self, payload_column: str = "payload", id_column: str = "item_id"):
        self.payload_column = payload_column
        self.id_column = id_column
        # model-load placeholder: deterministic hash-derived "embedding"
        self.seed = 0x5EED

    def _features(self, data: bytes) -> tuple[int, int, float, int]:
        if not data or not data.startswith(IMAGE_MAGIC):
            return _real_image_features(data)
        w, h = struct.unpack("<HH", data[4:8])
        seed = zlib.crc32(data[8:]) ^ self.seed
        rng = np.random.default_rng(seed)
        # deterministic fake pixel statistics + 64-bit perceptual-hash stand-in
        mean_pixel = float(rng.random())
        phash = int(rng.integers(0, 1 << 63, dtype=np.int64))
        return w, h, mean_pixel, phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        ws, hs, means, phs, oks, errs = [], [], [], [], [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                w, h, m, p = self._features(data if data is not None else b"")
                ws.append(w); hs.append(h); means.append(m); phs.append(p)
                oks.append(True); errs.append("")
            except Exception as exc:
                ws.append(0); hs.append(0); means.append(0.0); phs.append(0)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_pixel": pa.array(means, pa.float64()),
                "phash": pa.array(phs, pa.uint64()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


class AudioFrameSampler:
    """Actor-pool stage: binary audio column → fixed-rate frame features
    (n_frames × n_mels stand-in as a list<float> column)."""

    def __init__(
        self,
        payload_column: str = "payload",
        id_column: str = "item_id",
        frame_hop_s: float = 0.5,
        n_features: int = 8,
    ):
        self.payload_column = payload_column
        self.id_column = id_column
        self.frame_hop_s = frame_hop_s
        self.n_features = n_features

    def _frames(self, data: bytes) -> tuple[int, int, list[float]]:
        if not data or not data.startswith(AUDIO_MAGIC):
            # REAL path: stdlib WAV/PCM codec (core.wav) → genuine frame
            # features; non-WAV payloads raise ValueError → failed path
            from basicocr_ray.core.wav import decode_wav, frame_features

            rate, x = decode_wav(data if data is not None else b"")
            n_frames, feats = frame_features(
                x, rate, self.frame_hop_s, self.n_features
            )
            return rate, n_frames, feats
        rate, n_samples = struct.unpack("<II", data[4:12])
        duration = n_samples / max(1, rate)
        n_frames = max(1, int(duration / self.frame_hop_s))
        rng = np.random.default_rng(zlib.crc32(data[12:]))
        feats = rng.random(n_frames * self.n_features).round(6).tolist()
        return rate, n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        rates, nfs, feats, oks, errs = [], [], [], [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                r, nf, f = self._frames(data if data is not None else b"")
                rates.append(r); nfs.append(nf); feats.append(f)
                oks.append(True); errs.append("")
            except Exception as exc:
                rates.append(0); nfs.append(0); feats.append([])
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_frames": pa.array(nfs, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


VIDEO_MAGIC = b"VID!"


class VideoFrameSampler:
    """Actor-pool stage: binary video column → sampled, DECODED frames.

    Container format (documented fixture convention — no real video codec
    exists as a stdlib): ``VID!`` + fps:uint16le + n_frames:uint16le,
    then per frame uint32le byte-length + a REAL PNG image. Every k-th
    frame (``sample_every``) is decoded through the real `core.png` codec
    and reduced to (frame_index, width, height, mean_pixel, phash) rows —
    the decode / frame-sample / feature-extract chain of the task brief
    with genuine per-frame compute. Output is one row per SAMPLED frame
    (flat_map shape); corrupt containers/frames route to ok=False."""

    def __init__(
        self,
        payload_column: str = "payload",
        id_column: str = "item_id",
        sample_every: int = 2,
    ):
        self.payload_column = payload_column
        self.id_column = id_column
        self.sample_every = max(1, sample_every)

    def _frames(self, data: bytes):
        from basicocr_ray.core.png import average_hash_64, decode_png, to_grayscale

        if not data or not data.startswith(VIDEO_MAGIC):
            raise ValueError("not a VID! container")
        fps, n_frames = struct.unpack("<HH", data[4:8])
        pos = 8
        out = []
        for idx in range(n_frames):
            if pos + 4 > len(data):
                raise ValueError(f"truncated container at frame {idx}")
            (ln,) = struct.unpack("<I", data[pos : pos + 4])
            frame = data[pos + 4 : pos + 4 + ln]
            pos += 4 + ln
            if idx % self.sample_every:
                continue
            gray = to_grayscale(decode_png(frame))
            h, w = gray.shape
            out.append(
                (idx, w, h, round(float(gray.mean()) / 255.0, 6),
                 average_hash_64(gray))
            )
        return fps, n_frames, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, fpss, nfs, fidx, ws, hs, means, phs, oks, errs = (
            [], [], [], [], [], [], [], [], [], []
        )
        for item_id, data in zip(
            batch[self.id_column].to_pylist(),
            batch[self.payload_column].to_pylist(),
        ):
            try:
                fps, n_frames, frames = self._frames(
                    data if data is not None else b""
                )
                for (idx, w, h, m, p) in frames:
                    ids_out.append(item_id); fpss.append(fps)
                    nfs.append(n_frames); fidx.append(idx)
                    ws.append(w); hs.append(h); means.append(m); phs.append(p)
                    oks.append(True); errs.append("")
            except Exception as exc:
                ids_out.append(item_id); fpss.append(0); nfs.append(0)
                fidx.append(-1); ws.append(0); hs.append(0); means.append(0.0)
                phs.append(0); oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids_out, pa.int64()),
                "fps": pa.array(fpss, pa.int32()),
                "n_frames": pa.array(nfs, pa.int32()),
                "frame_index": pa.array(fidx, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mean_pixel": pa.array(means, pa.float64()),
                "phash": pa.array(phs, pa.uint64()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


def make_video_payload(
    item_id: int, n_frames: int = 8, fps: int = 24, width: int = 16, height: int = 12
) -> bytes:
    """Deterministic fixture video: per-frame REAL PNGs with id/frame-seeded
    gradient pixels (decodable by `core.png`, so the sampler exercises the
    genuine codec)."""
    import numpy as np

    from basicocr_ray.core.png import encode_png

    body = struct.pack("<HH", fps, n_frames)
    for f in range(n_frames):
        base = (item_id * 31 + f * 7) % 200
        arr = (
            (np.arange(height)[:, None] + np.arange(width)[None, :] + base) % 256
        ).astype(np.uint8)
        png = encode_png(arr)
        body += struct.pack("<I", len(png)) + png
    return VIDEO_MAGIC + body


def make_image_payload(item_id: int, width: int = 32, height: int = 24) -> bytes:
    """Deterministic fixture image payload."""
    body = struct.pack("<HH", width, height) + str(item_id).encode() * 3
    return IMAGE_MAGIC + body


def make_audio_payload(item_id: int, rate: int = 16000, seconds: float = 2.0) -> bytes:
    body = struct.pack("<II", rate, int(rate * seconds)) + str(item_id).encode() * 3
    return AUDIO_MAGIC + body


class ImageResizer:
    """Actor-pool image RESIZE stage (the task brief's third multimodal
    verb): decode a real PNG payload, resample to (target_w, target_h),
    re-encode PNG. Two deterministic kernels:

      * ``mode="nearest"`` — pure floor-index sampling
        (src = (dst·src_len) // dst_len), any scale factor.
      * ``mode="box"`` — integer box-average (mean over each w/tw × h/th
        block, round half up); requires the source dims to be exact
        multiples of the target (raises → failed path otherwise), which
        makes it bit-reproducible across platforms.

    Stateless per call but shaped as a callable class for the actor-pool
    contract (reference analogue: `contrib/crnn/dataset.py`
    resizeNormalize runs inside the loader workers; here the pool is the
    worker set). Small batch_size — payloads are the wide column."""

    def __init__(
        self,
        target_w: int,
        target_h: int,
        mode: str = "nearest",
        payload_column: str = "payload",
        id_column: str = "item_id",
    ):
        if mode not in ("nearest", "box"):
            raise ValueError(f"unknown resize mode {mode!r}")
        self.tw, self.th = int(target_w), int(target_h)
        self.mode = mode
        self.payload_column = payload_column
        self.id_column = id_column

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape[:2]
        if self.mode == "nearest":
            ys = (np.arange(self.th, dtype=np.int64) * h) // self.th
            xs = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
            return arr[ys][:, xs]
        if h % self.th or w % self.tw:
            raise ValueError(
                f"box resize needs integral factors: {w}x{h} -> "
                f"{self.tw}x{self.th}"
            )
        fy, fx = h // self.th, w // self.tw
        a = arr.reshape(self.th, fy, self.tw, fx, -1).astype(np.float64)
        m = a.mean(axis=(1, 3))
        return np.floor(m + 0.5).astype(np.uint8).reshape(
            self.th, self.tw, arr.shape[2] if arr.ndim == 3 else 1
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.png import decode_png, encode_png

        ids = batch[self.id_column].to_pylist()
        payloads, ws, hs, oks, errs = [], [], [], [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                arr = decode_png(data if data is not None else b"")
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                out = self._resize(arr)
                if out.shape[2] == 1:
                    out = out[:, :, 0]
                payloads.append(encode_png(out))
                ws.append(self.tw); hs.append(self.th)
                oks.append(True); errs.append("")
            except Exception as exc:
                payloads.append(b"")
                ws.append(0); hs.append(0)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


class AudioResampler:
    """Actor-pool audio RESAMPLE stage: decode a real WAV payload
    (core.wav), linearly interpolate the mono signal onto the target
    sample grid, re-encode 16-bit PCM. Linear interpolation at exact
    rational positions (``np.interp`` over float64) is deterministic
    across platforms — no FFT, no windowed sinc — which keeps the stage
    bit-reproducible; callers needing audiophile resampling swap the
    kernel, not the plumbing. Non-WAV payloads route to the failed path
    (ok=False), the S1 corrupt-skip discipline."""

    def __init__(
        self,
        target_rate: int,
        payload_column: str = "payload",
        id_column: str = "item_id",
    ):
        if target_rate <= 0:
            raise ValueError("target_rate must be positive")
        self.target_rate = int(target_rate)
        self.payload_column = payload_column
        self.id_column = id_column

    def _resample(self, rate: int, x: np.ndarray) -> np.ndarray:
        if rate == self.target_rate or len(x) == 0:
            return x
        n_out = max(1, int(round(len(x) * self.target_rate / rate)))
        # sample positions in source index space, endpoints aligned
        pos = np.arange(n_out, dtype=np.float64) * (rate / self.target_rate)
        return np.interp(pos, np.arange(len(x), dtype=np.float64), x)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.wav import decode_wav, encode_wav

        ids = batch[self.id_column].to_pylist()
        payloads, rates, ns, oks, errs = [], [], [], [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                rate, x = decode_wav(data if data is not None else b"")
                y = self._resample(rate, x)
                payloads.append(encode_wav(self.target_rate, y))
                rates.append(self.target_rate)
                ns.append(len(y))
                oks.append(True); errs.append("")
            except Exception as exc:
                payloads.append(b"")
                rates.append(0); ns.append(0)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


class ImageMetadataExtractor:
    """Actor-pool stage: PNG binary column → tEXt metadata WITHOUT pixel
    decode (`core.png.png_text_chunks` walks chunk headers and skips IDAT
    bodies — kilobytes read per image, not the image). One row per image
    with the requested keywords as string columns (missing → NULL);
    non-PNG/corrupt payloads route to ok=False like every decode stage."""

    def __init__(
        self,
        keywords: list[str],
        payload_column: str = "payload",
        id_column: str = "item_id",
    ):
        self.keywords = list(keywords)
        self.payload_column = payload_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.png import png_text_chunks

        ids = batch[self.id_column].to_pylist()
        cols: dict[str, list] = {kw: [] for kw in self.keywords}
        oks, errs = [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                meta = png_text_chunks(data if data is not None else b"")
                for kw in self.keywords:
                    cols[kw].append(meta.get(kw))
                oks.append(True); errs.append("")
            except Exception as exc:
                for kw in self.keywords:
                    cols[kw].append(None)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        out = {"item_id": pa.array(ids, pa.int64())}
        for kw in self.keywords:
            out[kw] = pa.array(cols[kw], pa.string())
        out["ok"] = pa.array(oks, pa.bool_())
        out["error"] = pa.array(errs, pa.string())
        return pa.table(out)


class AudioSilenceSegmenter:
    """Actor-pool stage: WAV binary column → voice-activity segmentation
    (the VAD pre-pass of every speech-corpus pipeline): real PCM decode,
    per-hop RMS, frames above ``threshold`` are active, and maximal runs
    of active frames are SEGMENTS. Emits one row per payload with
    (n_frames, n_active_frames, n_segments); corrupt audio → ok=False."""

    def __init__(
        self,
        payload_column: str = "payload",
        id_column: str = "item_id",
        frame_hop_s: float = 0.05,
        threshold: float = 0.05,
    ):
        self.payload_column = payload_column
        self.id_column = id_column
        self.frame_hop_s = frame_hop_s
        self.threshold = threshold

    def _segments(self, data: bytes) -> tuple[int, int, int]:
        from basicocr_ray.core.wav import decode_wav

        rate, x = decode_wav(data)
        hop = max(1, int(rate * self.frame_hop_s))
        n_frames = max(1, -(-len(x) // hop)) if len(x) else 1
        pad = np.zeros(n_frames * hop, dtype=np.float64)
        pad[: len(x)] = x
        rms = np.sqrt((pad.reshape(n_frames, hop) ** 2).mean(axis=1))
        active = rms > self.threshold
        starts = int(active[0]) + int(
            (active[1:] & ~active[:-1]).sum()
        ) if n_frames else 0
        return n_frames, int(active.sum()), starts

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        nf, na, ns, oks, errs = [], [], [], [], []
        for data in batch[self.payload_column].to_pylist():
            try:
                f, a, s = self._segments(data if data is not None else b"")
                nf.append(f); na.append(a); ns.append(s)
                oks.append(True); errs.append("")
            except Exception as exc:
                nf.append(0); na.append(0); ns.append(0)
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:120])
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "n_active_frames": pa.array(na, pa.int64()),
                "n_segments": pa.array(ns, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
            }
        )


def make_tone_wav(item_id: int, rate: int = 8000, seconds: float = 2.0,
                  n_slots: int = 10) -> bytes:
    """Deterministic REAL WAV: a frequency-hopping tone — ``n_slots``
    equal time slots, slot frequency 400 + (md5(id:slot) % 440)·8 Hz
    (8 Hz grid ≥ the 1024-point FFT's 7.8 Hz bin width, so distinct grid
    values land in distinct peak bins; top of grid 3912 Hz < the 4 kHz
    Nyquist limit — a 60-value coarse grid produced landmark collisions
    between unrelated sources at 500-doc corpus scale). The audio
    analogue of `make_image_payload`, but producing genuine PCM the full
    decode/FFT path runs on — the fingerprint fixture for clip-to-source
    matching."""
    import hashlib

    from basicocr_ray.core.wav import encode_wav

    n = int(rate * seconds)
    t = np.arange(n) / rate
    x = np.zeros(n)
    sl = n // n_slots
    for s in range(n_slots):
        h = int.from_bytes(
            hashlib.md5(f"{item_id}:{s}".encode()).digest()[:4], "little"
        )
        f = 400 + (h % 440) * 8
        seg = slice(s * sl, (s + 1) * sl)
        x[seg] = np.sin(2 * np.pi * f * t[seg])
    return encode_wav(rate, 0.8 * x)


class AudioFingerprinter:
    """Actor-pool stage: WAV payload → CONSTELLATION fingerprints (the
    Shazam-style landmark scheme, Wang 2003, rebuilt from the public
    algorithm): per FFT frame take the peak spectral bin, pair each
    frame's peak with the peak ``fan`` frames ahead, and hash the pair —
    (id, t, fhash) rows, one per landmark. Matching is then pure
    relational work: join clip hashes against corpus hashes and score
    (clip, source) pairs by their maximal count of time-ALIGNED matches
    (a true sub-clip yields one dominant t_source − t_clip offset).
    FFT/argmax are bit-deterministic for identical PCM, so fingerprints
    are partition/retry-invariant. Setup cost lives in __init__ (actor
    pool), per-batch work is numpy-vectorized over frames."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "item_id", frame: int = 1024,
                 hop: int = 512, fan: int = 3, min_bin: int = 4):
        self.payload_column = payload_column
        self.id_column = id_column
        self.frame = frame
        self.hop = hop
        self.fan = fan
        self.min_bin = min_bin

    def _landmarks(self, data: bytes) -> list[tuple[int, int]]:
        from basicocr_ray.core.wav import decode_wav

        _, x = decode_wav(data)
        nfr = (len(x) - self.frame) // self.hop + 1
        if nfr <= self.fan:
            return []
        # all frames in one strided view → one vectorized rfft
        idx = (
            np.arange(nfr)[:, None] * self.hop
            + np.arange(self.frame)[None, :]
        )
        mag = np.abs(np.fft.rfft(x[idx], axis=1))
        peaks = np.argmax(mag[:, self.min_bin:], axis=1) + self.min_bin
        hashes = (peaks[:-self.fan] << 16) | peaks[self.fan:]
        return list(zip(range(nfr - self.fan), hashes.tolist()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts, hs = [], [], []
        for iid, data in zip(
            batch[self.id_column].to_pylist(),
            batch[self.payload_column].to_pylist(),
        ):
            for t, h in self._landmarks(data if data is not None else b""):
                ids.append(iid)
                ts.append(t)
                hs.append(h)
        return pa.table(
            {
                self.id_column: pa.array(ids, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "fhash": pa.array(hs, pa.int64()),
            }
        )
