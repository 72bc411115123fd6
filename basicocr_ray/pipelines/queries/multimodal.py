"""Multimodal columns: image/audio/video decode, features, perceptual dedup (LLM-data brief).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._shared import (
    _read,
)


def q33_image_features(sf_dir: str):
    """Multimodal plumbing end-to-end: synthesize deterministic binary
    image payloads per embeddings row, run the ImageFeatureExtractor actor
    pool, return the SQL-checkable columns (decode kernel is the fixture
    stub — see stages/multimodal.py)."""
    from basicocr_ray.stages.multimodal import (
        ImageFeatureExtractor,
        make_image_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_image_payload(i, 32 + (i % 16), 24 + (i % 8)) for i in ids],
                    pa.large_binary(),
                ),
            }
        )

    feats = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=2,
    )
    return feats.select_columns(["item_id", "width", "height", "ok"])


def q43_video_frames(sf_dir: str):
    """Video frame-sampling end-to-end: deterministic VID! containers of
    REAL PNG frames per embeddings row, the VideoFrameSampler actor pool
    (every-2nd-frame decode through the real codec), and the
    SQL-checkable frame-index arithmetic. Pixel stats (mean/phash) are
    pytest-verified (tests/test_png.py); the hash covers the sampling
    contract."""
    from basicocr_ray.stages.multimodal import (
        VideoFrameSampler,
        make_video_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        make_video_payload(i, n_frames=4 + (i % 5))
                        for i in ids
                    ],
                    pa.large_binary(),
                ),
            }
        )

    sampled = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": batch["item_id"],
                "fps": pc.cast(batch["fps"], pa.int64()),
                "n_frames": pc.cast(batch["n_frames"], pa.int64()),
                "frame_index": pc.cast(batch["frame_index"], pa.int64()),
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
            }
        )

    return sampled.map_batches(project, batch_format="pyarrow")


def q41_audio_frames(sf_dir: str):
    """Audio frame-sampling plumbing end-to-end: deterministic AUD!
    payloads per embeddings row (rate/duration derived from the id), the
    AudioFrameSampler actor pool, and the SQL-checkable integer columns
    (sample_rate, n_frames, n_features). The real WAV path is exercised
    by tests/test_wav.py; this query hashes the fixture path's frame
    arithmetic."""
    from basicocr_ray.stages.multimodal import (
        AudioFrameSampler,
        make_audio_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        make_audio_payload(
                            i, 8000 + (i % 8) * 1000, 1.0 + (i % 5) * 0.5
                        )
                        for i in ids
                    ],
                    pa.large_binary(),
                ),
            }
        )

    sampled = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        AudioFrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": batch["item_id"],
                "sample_rate": pc.cast(batch["sample_rate"], pa.int64()),
                "n_frames": pc.cast(batch["n_frames"], pa.int64()),
                "n_features": pc.cast(
                    pc.list_value_length(batch["features"]), pa.int64()
                ),
            }
        )

    return sampled.map_batches(project, batch_format="pyarrow")


def q121_image_phash_dup(sf_dir: str):
    """PERCEPTUAL image dedup — the multimodal near-dup byte hashing
    can't do: each corpus image (deterministic per-id noise, real PNG)
    gets a clone that is brightness-shifted (+1 on every pixel, aHash
    is invariant to uniform shifts) AND re-encoded at a different zlib
    level, so the clone matches in NEITHER bytes NOR pixels — only the
    8×8 average hash pairs them. Decode + hash run on the
    ImageFeatureExtractor actor pool (real stdlib PNG codec), the
    groupby moves 16-char hash hexes (never image bytes), and every
    (i, i+10000) clone pair must come back exactly — recall AND
    precision 1.0 by construction, which is what the analytic oracle
    asserts."""
    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import ImageFeatureExtractor
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i))
            arr = rng.integers(0, 200, size=(24, 32)).astype(np.uint8)
            ids.append(i)
            blobs.append(encode_png(arr, level=6))
            ids.append(i + 10000)  # clone: +1 brightness, re-encoded
            blobs.append(encode_png(arr + 1, level=9))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    feats = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageFeatureExtractor, batch_format="pyarrow",
            batch_size=256, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for _, grp in df.groupby("ph"):
            ids = sorted(grp["item_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out1.append(ids[i])
                    out2.append(ids[j])
        return pd.DataFrame(
            {"id1": pd.array(out1, dtype="int64"),
             "id2": pd.array(out2, dtype="int64")}
        )

    return coarse_group_reduce(feats, "ph", pairs)


def q127_video_scene_cuts(sf_dir: str):
    """Video SCENE-CUT detection via per-frame perceptual hashes — the
    shot-boundary pass a video-curation pipeline runs before sampling
    keyframes: each fixture video has 12 real-PNG frames in
    n_shots = 2 + (id % 3) shots; WITHIN a shot frames differ in both
    bytes and pixels (alternating +1 brightness, re-encoded) but share
    the aHash (uniform-shift invariance, the q121 property), ACROSS
    shots the noise content changes the hash. Cuts = adjacent-frame
    hash changes, counted per item in an ordered in-group reduce —
    frame hashes ride the exchange, frames never do. The oracle is the
    analytic shot structure: n_cuts = 1 + (id % 3)."""
    import struct as _struct

    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import (
        VIDEO_MAGIC,
        VideoFrameSampler,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    N_FRAMES = 12
    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def make_shot_video(item_id: int) -> bytes:
        n_shots = 2 + (item_id % 3)
        bounds = [round(s * N_FRAMES / n_shots) for s in range(n_shots + 1)]
        body = _struct.pack("<HH", 24, N_FRAMES)
        for shot in range(n_shots):
            rng = np.random.default_rng(item_id * 100 + shot)
            base = rng.integers(0, 199, size=(12, 16)).astype(np.uint8)
            for f in range(bounds[shot], bounds[shot + 1]):
                png = encode_png(base + (f % 2), level=6 + (f % 2))
                body += _struct.pack("<I", len(png)) + png
        return VIDEO_MAGIC + body

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_shot_video(i) for i in ids], pa.large_binary()
                ),
            }
        )

    frames = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            VideoFrameSampler,
            fn_constructor_kwargs={"sample_every": 1},
            batch_format="pyarrow", batch_size=64, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "frame_index": b["frame_index"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def count_cuts(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for item, grp in df.groupby("item_id"):
            grp = grp.sort_values("frame_index", kind="mergesort")
            hs = grp["ph"].tolist()
            cuts = sum(1 for a, b in zip(hs, hs[1:]) if a != b)
            rows.append((item, len(hs), cuts))
        return pd.DataFrame(
            {
                "item_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_frames": pd.array([r[1] for r in rows], dtype="int64"),
                "n_cuts": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(frames, "item_id", count_cuts)


def q132_png_metadata(sf_dir: str):
    """Image METADATA extraction WITHOUT pixel decode (the provenance/
    EXIF pass a crawl pipeline runs on every image before deciding what
    to decode): fixture PNGs carry real tEXt chunks (Software = cam<id%5>,
    Comment on even ids only), `ImageMetadataExtractor` walks chunk
    headers and skips IDAT bodies entirely — kilobytes read per image —
    and the rollup counts images and comment-bearing images per software
    tag. The oracle is the analytic chunk-content contract."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import ImageMetadataExtractor

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i))
            arr = rng.integers(0, 200, size=(16, 16)).astype(np.uint8)
            meta = {"Software": f"cam{i % 5}"}
            if i % 2 == 0:
                meta["Comment"] = f"shot {i}"
            ids.append(i)
            blobs.append(encode_png(arr, text_chunks=meta))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    meta = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageMetadataExtractor,
            fn_constructor_kwargs={"keywords": ["Software", "Comment"]},
            batch_format="pyarrow", batch_size=256, concurrency=2,
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_images"] = 1
        df["n_with_comment"] = df["Comment"].notna().astype("int64")
        g = df.groupby("Software", as_index=False)[
            ["n_images", "n_with_comment"]
        ].sum()
        return pa.Table.from_pandas(
            g.rename(columns={"Software": "software"}), preserve_index=False
        )

    out = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby("software")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_with_comment", alias_name="n_with_comment"),
        )
        .to_pandas()
    )
    for c in ("n_images", "n_with_comment"):
        out[c] = out[c].astype("int64")
    return out


def q133_audio_silence(sf_dir: str):
    """Audio SILENCE segmentation (the VAD pre-pass of a speech-corpus
    pipeline): fixture WAVs interleave 0.1 s silence gaps with
    n = 1 + id % 4 active 0.1 s square-wave bursts (real 16-bit PCM),
    the `AudioSilenceSegmenter` actor pool decodes, takes per-50 ms-hop
    RMS, thresholds, and counts maximal active runs. Segment boundaries
    align to hop boundaries by construction, so the frame/segment
    arithmetic is exact and the oracle is analytic:
    n_frames = 2 + 4n, active = 2n, segments = n."""
    from basicocr_ray.core.wav import encode_wav
    from basicocr_ray.stages.multimodal import AudioSilenceSegmenter

    RATE, BLK = 8000, 800  # 0.1 s blocks; hop 0.05 s = 400 samples
    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            n_seg = 1 + (i % 4)
            burst = 0.25 * (1.0 - 2.0 * (np.arange(BLK) % 2))
            sil = np.zeros(BLK)
            parts = [sil]
            for _ in range(n_seg):
                parts.extend((burst, sil))
            ids.append(i)
            blobs.append(encode_wav(RATE, np.concatenate(parts)))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    seg = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            AudioSilenceSegmenter,
            fn_constructor_kwargs={"frame_hop_s": 0.05, "threshold": 0.05},
            batch_format="pyarrow", batch_size=128, concurrency=2,
        )
    )
    return seg.map_batches(
        lambda b: b.select(
            ["item_id", "n_frames", "n_active_frames", "n_segments"]
        ),
        batch_format="pyarrow",
    )


def q150_thumbnail_dedup(sf_dir: str):
    """END-TO-END image pipeline — q121's perceptual-dedup contract
    pushed through the PRODUCTION resize stage (decode → box-resample →
    re-encode → decode → aHash → dedup, three chained actor-pool
    stages): 32×32 originals and their +1-brightness re-encoded clones
    both thumbnail to 16×16 through `ImageResizer(mode="box")`, whose
    integer round-half-up mean commutes with a uniform +1 shift
    (⌊m+1+½⌋ = ⌊m+½⌋+1 — no clipping, pixels < 200), so the clone pair
    survives the WHOLE chain and the 8×8 average hash pairs exactly
    (i, i+10000) — recall and precision 1.0 by construction, which the
    analytic oracle asserts. Hash strings ride the only exchange;
    image bytes never do."""
    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import (
        ImageFeatureExtractor,
        ImageResizer,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i) + 5)
            arr = rng.integers(0, 200, size=(32, 32)).astype(np.uint8)
            ids.append(i)
            blobs.append(encode_png(arr, level=6))
            ids.append(i + 10000)
            blobs.append(encode_png(arr + 1, level=9))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    feats = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageResizer,
            fn_constructor_kwargs={
                "target_w": 16, "target_h": 16, "mode": "box",
            },
            batch_format="pyarrow", batch_size=128, concurrency=2,
        )
        .map_batches(
            ImageFeatureExtractor, batch_format="pyarrow",
            batch_size=256, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for _, grp in df.groupby("ph"):
            ids = sorted(grp["item_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out1.append(ids[i])
                    out2.append(ids[j])
        return pd.DataFrame(
            {"id1": pd.array(out1, dtype="int64"),
             "id2": pd.array(out2, dtype="int64")}
        )

    return coarse_group_reduce(feats, "ph", pairs)


def q164_audio_fp_match(sf_dir: str):
    """AUDIO CLIP-TO-SOURCE MATCHING — Shazam-style constellation
    fingerprints (Wang 2003) over REAL WAV PCM, end to end: every
    embeddings row becomes a deterministic frequency-hopping tone
    (`make_tone_wav`, genuine 16-bit PCM); rows ≡ 0 mod 4 also emit a
    1-second CLIP cut at sample 4096 (re-encoded — quantization
    commutes with slicing, so clip frames are byte-identical to the
    source's) under id+10000. `AudioFingerprinter` actor pools turn
    both corpora into (id, t, fhash) landmark rows — audio never rides
    a shuffle, only int64 landmarks do. ONE bucketed hash join on fhash
    meets clips with sources; per (clip, source) the coarse reduce
    scores the maximal count of time-ALIGNED matches (one dominant
    t_src−t_clip offset identifies a true sub-clip) and keeps score ≥ 7.
    Analytic contract: exactly the planted (v+10000, v) pairs — measured
    over all 500 sources, true-pair score is 11 vs ≤ 3 for non-pairs, so
    the threshold sits mid-gap (the q24/q150 discipline)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.multimodal import (
        AudioFingerprinter,
        make_tone_wav,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    START, CLIP_N, THRESH = 4096, 8000, 7

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def tone_payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_tone_wav(i) for i in ids], pa.large_binary()
                ),
            }
        )

    def clip_payloads(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.wav import decode_wav, encode_wav

        out_id, out_p = [], []
        for i in batch["vec_id"].to_pylist():
            if i % 4 != 0:
                continue
            rate, x = decode_wav(make_tone_wav(i))
            out_id.append(i + 10000)
            out_p.append(encode_wav(rate, x[START:START + CLIP_N]))
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "payload": pa.array(out_p, pa.large_binary()),
            }
        )

    def fp(payloads, id_out):
        rows = payloads.map_batches(
            AudioFingerprinter,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        return rows.map_batches(
            lambda b: pa.table(
                {
                    "fhash": b["fhash"],
                    id_out: b["item_id"],
                    f"t_{id_out}": b["t"],
                }
            ),
            batch_format="pyarrow",
        )

    src_fp = fp(
        ds.map_batches(tone_payloads, batch_format="pyarrow"), "orig_id"
    )
    clip_fp = fp(
        ds.map_batches(clip_payloads, batch_format="pyarrow"), "clip_id"
    )

    joined = bucketed_hash_join(
        clip_fp, src_fp, key="fhash",
        left_columns=["clip_id", "t_clip_id"],
        right_columns=["orig_id", "t_orig_id"],
    )

    def offsets(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": pc.cast(b["clip_id"], pa.int64()),
                "orig_id": pc.cast(b["orig_id"], pa.int64()),
                "off": pc.subtract(
                    pc.cast(b["t_orig_id"], pa.int64()),
                    pc.cast(b["t_clip_id"], pa.int64()),
                ),
            }
        )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["clip_id", "orig_id", "off"])
            .size()
            .groupby(["clip_id", "orig_id"])
            .max()
            .reset_index(name="best")
        )
        g = g[g["best"] >= THRESH]
        return g[["clip_id", "orig_id"]].astype("int64")

    return coarse_group_reduce(
        joined.map_batches(offsets, batch_format="pyarrow"),
        ["clip_id", "orig_id"],
        score,
    )


def q342_gif_roundtrip(sf_dir: str):
    """GIF/LZW CODEC CONFORMANCE — the third stdlib-free image codec
    (PNG q33 / WAV q41 sibling, `core/gif.py`): per doc a 16×16
    4-color indexed image with pixels (x+y+doc_id) mod 4 is ENCODED
    (variable-width LZW, sub-blocks) and immediately PARSED back
    inside one map_batches; the index sum and zero-count must match
    the closed form — any bit-packing, width-growth or KwKwK bug
    breaks the hash."""
    from basicocr_ray.core.gif import encode_gif, parse_gif

    PAL = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def roundtrip(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_w, out_h, out_sum, out_zero = [], [], [], [], []
        for i in ids:
            i = int(i)
            idx = bytes(
                (x + y + i) % 4 for y in range(16) for x in range(16)
            )
            img = parse_gif(encode_gif(16, 16, PAL, idx))
            if img["indices"] != idx:
                raise ValueError("GIF roundtrip mismatch")
            out_id.append(i)
            out_w.append(img["width"])
            out_h.append(img["height"])
            out_sum.append(sum(img["indices"]))
            out_zero.append(sum(1 for v in img["indices"] if v == 0))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "width": pa.array(out_w, pa.int64()),
                "height": pa.array(out_h, pa.int64()),
                "idx_sum": pa.array(out_sum, pa.int64()),
                "n_zero": pa.array(out_zero, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


__all__ = [
    "q33_image_features",
    "q41_audio_frames",
    "q43_video_frames",
    "q121_image_phash_dup",
    "q127_video_scene_cuts",
    "q132_png_metadata",
    "q133_audio_silence",
    "q150_thumbnail_dedup",
    "q164_audio_fp_match",
    "q342_gif_roundtrip",
]


QUERIES = {
    "q33_image_features": q33_image_features,
    "q41_audio_frames": q41_audio_frames,
    "q43_video_frames": q43_video_frames,
    "q121_image_phash_dup": q121_image_phash_dup,
    "q127_video_scene_cuts": q127_video_scene_cuts,
    "q132_png_metadata": q132_png_metadata,
    "q133_audio_silence": q133_audio_silence,
    "q150_thumbnail_dedup": q150_thumbnail_dedup,
    "q164_audio_fp_match": q164_audio_fp_match,
    "q342_gif_roundtrip": q342_gif_roundtrip,
}


ORACLE_SQL = {
    "q33_image_features": """
        SELECT vec_id AS item_id,
               CAST(32 + (vec_id % 16) AS INTEGER) AS width,
               CAST(24 + (vec_id % 8) AS INTEGER) AS height,
               TRUE AS ok
        FROM embeddings
    """,
    "q41_audio_frames": """
        -- mirrors make_audio_payload's derivation + AudioFrameSampler's
        -- fixture frame arithmetic: rate = 8000 + (id%8)*1000,
        -- n_samples = int(rate * (1 + (id%5)*0.5)) (exact: halves),
        -- n_frames = max(1, int((n_samples/rate) / 0.5)), 8 feats/frame
        SELECT vec_id AS item_id,
               CAST(8000 + (vec_id % 8) * 1000 AS BIGINT) AS sample_rate,
               GREATEST(1, CAST(FLOOR(
                 (CAST(CAST((8000 + (vec_id % 8) * 1000)
                        * (1.0 + (vec_id % 5) * 0.5) AS BIGINT) AS DOUBLE)
                  / (8000 + (vec_id % 8) * 1000)) / 0.5
               ) AS BIGINT)) AS n_frames,
               GREATEST(1, CAST(FLOOR(
                 (CAST(CAST((8000 + (vec_id % 8) * 1000)
                        * (1.0 + (vec_id % 5) * 0.5) AS BIGINT) AS DOUBLE)
                  / (8000 + (vec_id % 8) * 1000)) / 0.5
               ) AS BIGINT)) * 8 AS n_features
        FROM embeddings
    """,
    "q43_video_frames": """
        -- mirrors make_video_payload(n_frames = 4 + id%5) + the sampler's
        -- every-2nd-frame contract over 16x12 PNG frames at 24 fps
        SELECT vec_id AS item_id,
               CAST(24 AS BIGINT) AS fps,
               CAST(4 + vec_id % 5 AS BIGINT) AS n_frames,
               CAST(unnest(range(0, 4 + vec_id % 5, 2)) AS BIGINT)
                 AS frame_index,
               CAST(16 AS BIGINT) AS width,
               CAST(12 AS BIGINT) AS height
        FROM embeddings
    """,
    "q121_image_phash_dup": """
        -- analytic contract: every (i, i+10000) brightness-shifted
        -- re-encoded clone pair, and ONLY those pairs (recall and
        -- precision 1.0 for the 8x8 average hash by construction)
        SELECT vec_id AS id1, CAST(vec_id + 10000 AS BIGINT) AS id2
        FROM embeddings
    """,
    "q127_video_scene_cuts": """
        -- analytic shot structure: 12 frames in 2 + (id % 3) shots,
        -- within-shot frames share only the perceptual hash
        SELECT vec_id AS item_id,
               CAST(12 AS BIGINT) AS n_frames,
               CAST(1 + vec_id % 3 AS BIGINT) AS n_cuts
        FROM embeddings
    """,
    "q132_png_metadata": """
        -- analytic tEXt contract: Software = cam(id % 5) on every image,
        -- Comment only on even ids
        SELECT 'cam' || CAST(vec_id % 5 AS VARCHAR) AS software,
               count(*) AS n_images,
               CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_comment
        FROM embeddings GROUP BY 1
    """,
    "q133_audio_silence": """
        -- analytic VAD contract: n = 1 + id % 4 bursts, hop-aligned
        SELECT vec_id AS item_id,
               CAST(2 + 4 * (1 + vec_id % 4) AS BIGINT) AS n_frames,
               CAST(2 * (1 + vec_id % 4) AS BIGINT) AS n_active_frames,
               CAST(1 + vec_id % 4 AS BIGINT) AS n_segments
        FROM embeddings
    """,
    "q150_thumbnail_dedup": """
        -- analytic contract: every (i, i+10000) clone pair survives the
        -- decode -> box-resize -> re-encode -> aHash chain, and ONLY
        -- those pairs (round-half-up mean commutes with the +1 shift)
        SELECT vec_id AS id1, CAST(vec_id + 10000 AS BIGINT) AS id2
        FROM embeddings
    """,
    "q164_audio_fp_match": """
        -- analytic contract: every planted 1-second clip (v+10000, cut
        -- from v's tone at sample 4096) matches its source and ONLY it
        -- (measured aligned-match score over all 500 sources: 11 for
        -- true pairs, <=3 else; threshold 7 sits mid-gap)
        SELECT CAST(vec_id + 10000 AS BIGINT) AS clip_id,
               vec_id AS orig_id
        FROM embeddings WHERE vec_id % 4 = 0
    """,
    "q342_gif_roundtrip": """
        -- closed form of the synthesized pixel grid (x+y+doc_id) % 4
        WITH xy AS (
          SELECT x.x, y.y
          FROM (SELECT unnest(range(0, 16)) AS x) x,
               (SELECT unnest(range(0, 16)) AS y) y
        )
        SELECT d.doc_id, CAST(16 AS BIGINT) AS width,
               CAST(16 AS BIGINT) AS height,
               CAST(sum((xy.x + xy.y + d.doc_id) % 4) AS BIGINT)
                 AS idx_sum,
               CAST(sum(CASE WHEN (xy.x + xy.y + d.doc_id) % 4 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        FROM documents d, xy
        GROUP BY d.doc_id
    """,
}
