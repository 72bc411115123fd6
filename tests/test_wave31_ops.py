"""Wave-31 operator pins: Morton z-order codes, shingle containment,
margin-based neighbor mining."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _morton_vectorized(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """The q168 kernel, extracted verbatim (numpy shifts)."""
    z = np.zeros(len(x), dtype=np.int64)
    for i in range(8):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_interleave_matches_naive():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, size=500).astype(np.int64)
    y = rng.integers(0, 256, size=500).astype(np.int64)
    got = _morton_vectorized(x, y)

    def naive(a: int, b: int) -> int:
        out = 0
        for i in range(8):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    assert got.tolist() == [naive(int(a), int(b)) for a, b in zip(x, y)]
    # locality: a 2x2 block of (x, y) spans exactly 4 consecutive codes
    z00 = naive(10, 20)
    assert sorted(
        naive(10 + dx, 20 + dy) for dx in (0, 1) for dy in (0, 1)
    ) == [z00, z00 + 1, z00 + 2, z00 + 3]
    # bijectivity over the full 8-bit x 8-bit grid
    gx, gy = np.meshgrid(np.arange(256, dtype=np.int64),
                         np.arange(256, dtype=np.int64))
    allz = _morton_vectorized(gx.ravel(), gy.ravel())
    assert len(np.unique(allz)) == 65536
    assert allz.min() == 0 and allz.max() == 65535


def test_shingle_containment_subset_doc(ray_session):
    """A short doc fully embedded in a long one: containment 1.0 in the
    embed direction, below threshold in the reverse; an unrelated doc
    never pairs."""
    import ray

    from basicocr_ray.stages.dedup import shingle_containment

    words_a = [f"w{i}" for i in range(10)]  # 6 distinct 5-gram shingles
    text_a = " ".join(words_a)
    # b = a plus 20 extra words -> S(a) subset of S(b), |S(b)| = 26
    text_b = text_a + " " + " ".join(f"x{i}" for i in range(20))
    text_c = " ".join(f"z{i}" for i in range(30))

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([text_a, text_b, text_c], pa.string()),
    }))
    out = shingle_containment(ds, threshold=0.5).to_pandas()
    rows = {
        (r.src_id, r.sup_id): (r.n_inter, r.n_src, r.containment)
        for r in out.itertuples(index=False)
    }
    # a -> b: all 6 of a's shingles appear in b
    assert rows == {(1, 2): (6, 6, 1.0)}
    # reverse direction (6/26 = 0.23) and the unrelated doc are absent
    assert (2, 1) not in rows and (3, 2) not in rows


def test_margin_mining_matches_bruteforce(ray_session, tmp_path):
    """q167 on a synthetic embeddings table == a direct numpy
    transcription of the Artetxe-Schwenk ratio margin."""
    from basicocr_ray.pipelines.queries import q167_margin_mining

    rng = np.random.default_rng(11)
    n, d = 60, 8
    V = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(np.int32)  # label 0: 20 sources
    tab = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(
            [row.astype(np.float32) for row in V],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    got = q167_margin_mining(str(tmp_path)).to_pandas()
    got = got.sort_values(["src_id", "cand_id"]).reset_index(drop=True)

    # brute force (float64 path mirrors the kernel: cast then normalize)
    Vd = np.asarray(
        [np.asarray(r, dtype=np.float64)
         for r in tab["embedding"].to_pylist()]
    )
    Vn = Vd / np.linalg.norm(Vd, axis=1, keepdims=True)
    a_idx = np.flatnonzero(labels == 0)
    b_idx = np.flatnonzero(labels != 0)
    S = Vn[b_idx] @ Vn[a_idx].T  # (nb, na)
    K = 4
    exp = []
    for j, ai in enumerate(a_idx):
        col = S[:, j]
        order = np.lexsort((b_idx, -col))[:K]
        aa = float(np.mean(np.sort(col[order])[::-1]))
        for oi in order:
            bi = b_idx[oi]
            row_sims = S[oi, :]
            ab = float(np.mean(np.sort(row_sims)[-K:]))
            m = col[oi] / ((aa + ab) / 2.0)
            exp.append((int(ai), int(bi), round(float(m), 6)))
    exp_df = (
        pa.table({
            "src_id": pa.array([e[0] for e in exp], pa.int64()),
            "cand_id": pa.array([e[1] for e in exp], pa.int64()),
            "margin": pa.array([e[2] for e in exp], pa.float64()),
        }).to_pandas().sort_values(["src_id", "cand_id"])
        .reset_index(drop=True)
    )
    assert got["src_id"].tolist() == exp_df["src_id"].tolist()
    assert got["cand_id"].tolist() == exp_df["cand_id"].tolist()
    assert got["margin"].to_numpy() == pytest.approx(
        exp_df["margin"].to_numpy(), abs=1e-6
    )
