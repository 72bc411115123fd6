"""Wave-72 operator pins: Gram matrix partials, snake-draft balance,
min-plus APSP squaring."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_gram_matrix_matches_dense(tmp_path):
    """Distributed upper-triangle partials equal the dense V^T V."""
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.RandomState(3)
    V = rng.uniform(-1, 1, size=(40, 5)).astype(np.float32)
    _write(
        tmp_path,
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [v for v in V],
                "label": np.zeros(40, dtype=np.int32),
            }
        ),
    )
    Q = np.floor(V.astype(np.float64) * 1e3).astype(np.int64)
    G = Q.T @ Q
    got = QUERIES["q288_gram_matrix"](str(tmp_path)).to_pandas()
    assert len(got) == 15  # 5*6/2
    for _, r in got.iterrows():
        assert int(r["gram"]) == int(G[r["i"] - 1, r["j"] - 1])


@pytest.mark.usefixtures("ray_session")
def test_snake_draft_assignment(tmp_path):
    """9 hosts (ids 0..8, demands 9..1 by rank): forward deal 0..7,
    then rank 8 snakes BACK to shard 7 -> shard 7 holds ranks 7 and 8."""
    from basicocr_ray.pipelines.queries import QUERIES

    # host h gets (9 - h) docs -> demand rank order = host order
    ids = []
    next_id = 0
    for h in range(9):
        for _ in range(9 - h):
            # doc_id % 64 == h
            ids.append(h + 64 * next_id)
            next_id += 1
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": ids,
                "text": ["t"] * len(ids),
                "lang": ["en"] * len(ids),
                "source": ["s"] * len(ids),
                "n_chars": [1] * len(ids),
            }
        ),
    )
    got = (
        QUERIES["q289_snake_draft_shards"](str(tmp_path))
        .sort_values("shard").reset_index(drop=True)
    )
    # demands by rank: 9,8,7,6,5,4,3,2,1 -> shards 0..7 then 7 again
    assert got["n_hosts"].tolist() == [1, 1, 1, 1, 1, 1, 1, 2]
    assert got["total_demand"].tolist() == [9, 8, 7, 6, 5, 4, 3, 2 + 1]


@pytest.mark.usefixtures("ray_session")
def test_minplus_apsp_matches_dense_squaring(tmp_path):
    """Three join squarings equal three dense (min,+) squarings — the
    exact ≤8-edge shortest-path semiring semantics (NOT unbounded
    Floyd–Warshall: a lighter path may use more than 8 edges)."""
    from basicocr_ray.pipelines.queries import QUERIES

    H = 64
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(200),  # all 64 residues present
                "text": ["t"] * 200,
                "lang": ["en"] * 200,
                "source": ["s"] * 200,
                "n_chars": [1] * 200,
            }
        ),
    )
    INF = 10**9
    D = np.full((H, H), INF, dtype=np.int64)
    np.fill_diagonal(D, 0)
    for u in range(H):
        for v in ((3 * u + 1) % H, (5 * u + 2) % H, (7 * u + 4) % H):
            D[u, v] = min(D[u, v], 1 + (u + v) % 5)

    def minplus_square(A):
        return (A[:, :, None] + A[None, :, :]).min(axis=1)

    for _ in range(3):
        D = minplus_square(D)
    assert D.max() < INF  # everything reachable within 8 edges

    got = QUERIES["q290_minplus_apsp"](str(tmp_path)).to_pandas()
    assert len(got) == H * H
    M = np.full((H, H), -1, dtype=np.int64)
    M[got["u"], got["v"]] = got["dist"]
    assert (M == D).all()
