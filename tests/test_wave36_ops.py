"""Wave-36 operator pins: quantization recall audit, feature-hash
collision histogram, calibration bins."""

from __future__ import annotations

import hashlib
import struct
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0]


def _write_docs(tmp_path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": langs,
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return df


@pytest.mark.usefixtures("ray_session")
def test_quant_recall_vs_brute(tmp_path):
    """Random float32 vectors: n_hits per query equals a brute rebuild
    of both rankings (float cosine vs floor(1e3·x) integer dot), and
    coarse quantization provably degrades recall below 10 somewhere."""
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(21)
    n, d = 60, 16
    V32 = rng.normal(scale=0.02, size=(n, d)).astype(np.float32)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in V32], pa.list_(pa.float32())
            ),
            "label": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    got = (
        QUERIES["q182_quant_recall"](str(tmp_path))
        .to_pandas().sort_values("query_id").reset_index(drop=True)
    )

    V = V32.astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Vq = np.floor(V * 1e3).astype(np.int64)
    ids = np.arange(n)
    exp_hits = {}
    for qid in range(0, n, 10):
        ok = ids != qid
        sims = Vn[ok] @ Vn[qid]
        dots = Vq[ok] @ Vq[qid]
        e10 = ids[ok][np.lexsort((ids[ok], -sims))[:10]]
        q10 = ids[ok][np.lexsort((ids[ok], -dots))[:10]]
        exp_hits[qid] = len(set(e10) & set(q10))
    assert dict(zip(got["query_id"], got["n_hits"])) == exp_hits
    # scale 0.02 → quantized coords mostly in {-1, 0}: recall must drop
    assert min(exp_hits.values()) < 10


@pytest.mark.usefixtures("ray_session")
def test_feature_hash_histogram_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [f"tok{i} tok{i + 1} tok{i + 2}" for i in range(0, 90, 3)]
    _write_docs(tmp_path, texts)
    got = QUERIES["q183_feature_hash_collisions"](str(tmp_path)).to_pandas()

    feats = set()
    for t in texts:
        toks = t.lower().split()
        feats.update(toks)
        feats.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    occ = Counter(_md5_low64(f) % 64 for f in feats)
    hist = Counter(occ.values())
    assert dict(zip(got["k"], got["n_buckets"])) == dict(hist)
    # occupancy mass adds back up to the distinct feature count
    assert sum(k * c for k, c in zip(got["k"], got["n_buckets"])) == len(feats)


@pytest.mark.usefixtures("ray_session")
def test_calibration_bins_vs_brute(tmp_path):
    """Bins rebuilt brute-force from hashed_linear_score, including a
    clamped extreme-score document (|score| > 1024) and a non-'en' doc
    that must not count as positive."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.pipelines.queries import QUERIES

    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(64)]
    # find tokens with strongly positive / negative weight
    pos_tok = next(
        t for t in (f"p{i}" for i in range(1000))
        if weights[_md5_low64(t) % 64] >= 8
    )
    neg_tok = next(
        t for t in (f"n{i}" for i in range(1000))
        if weights[_md5_low64(t) % 64] <= -8
    )
    texts = [
        " ".join([pos_tok] * 300),   # score >= 2400 → clamps to 1023
        " ".join([neg_tok] * 300),   # score <= -2400 → clamps to -1024
        "hello world",
        "hola mundo",
    ]
    _write_docs(tmp_path, texts, langs=["en", "en", "en", "es"])
    got = (
        QUERIES["q184_calibration_bins"](str(tmp_path))
        .to_pandas().sort_values("bin").reset_index(drop=True)
    )

    acc = {}
    for t, lang in zip(texts, ["en", "en", "en", "es"]):
        s = hashed_linear_score(t.lower().split(), weights)
        b = (min(max(s, -1024), 1023) + 1024) // 16
        a = acc.setdefault(b, [0, 0, 0])
        a[0] += 1
        a[1] += 1 if lang == "en" else 0
        a[2] += s
    assert len(got) == len(acc)
    for _, r in got.iterrows():
        n, npos, ss = acc[int(r["bin"])]
        assert (int(r["n"]), int(r["n_pos"]), int(r["sum_score"])) == (
            n, npos, ss
        )
    assert 127 in acc and 0 in acc  # both clamp bins exercised
