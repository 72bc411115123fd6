"""Wave-69 operator pins: HITS integer iterations, per-lang LIS,
distributed unpivot."""

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


def _docs(tmp_path, rows):
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": ["s"] * len(rows),
                "n_chars": [r[3] for r in rows],
            }
        ),
    )


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_dense_reference(tmp_path):
    """Two un-normalized rounds from the mass seed equal the dense
    numpy iteration on the same derived graph."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 150  # doc_ids 0..149 -> hosts 0..63 all present, uneven mass
    _docs(tmp_path, [(i, "t", "en", 1) for i in range(n)])

    H = 64
    mass = np.bincount(np.arange(n) % H, minlength=H).astype(np.int64)
    A = np.zeros((H, H), dtype=np.int64)  # A[u, v] = multiplicity u->v
    for u in range(H):
        if mass[u] == 0:
            continue
        for v in ((3 * u + 1) % H, (5 * u + 2) % H, (7 * u + 4) % H):
            if mass[v] > 0:
                A[u, v] += 1
    hub = mass.copy()
    for _ in range(2):
        auth = A.T @ hub
        hub = A @ auth

    got = (
        QUERIES["q279_hits_scores"](str(tmp_path)).to_pandas()
        .sort_values("h").reset_index(drop=True)
    )
    assert got["h"].tolist() == list(range(H))
    assert got["mass"].to_numpy().tolist() == mass.tolist()
    assert got["hub"].to_numpy().tolist() == hub.tolist()
    assert got["auth"].to_numpy().tolist() == auth.tolist()


@pytest.mark.usefixtures("ray_session")
def test_lis_strict_and_per_lang(tmp_path):
    """en: 1,3,2,4,4 -> LIS 3 (1,3,4 / 1,2,4; the repeat doesn't
    extend, strictness); de: 5,4,3 -> LIS 1."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [
        (0, "t", "en", 1),
        (1, "t", "en", 3),
        (2, "t", "en", 2),
        (3, "t", "en", 4),
        (4, "t", "en", 4),
        (5, "t", "de", 5),
        (6, "t", "de", 4),
        (7, "t", "de", 3),
    ]
    _docs(tmp_path, rows)
    got = QUERIES["q280_lis_per_lang"](str(tmp_path)).to_pandas()
    d = dict(zip(got["lang"], got["lis_len"]))
    assert d == {"en": 3, "de": 1}


@pytest.mark.usefixtures("ray_session")
def test_unpivot_three_rows_exact_values(tmp_path):
    """'héllo wörld' -> 11 codepoints, 13 utf-8 bytes, 1 space."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(tmp_path, [(7, "héllo wörld", "en", 11), (8, "", "en", 0)])
    got = (
        QUERIES["q281_unpivot_metrics"](str(tmp_path)).to_pandas()
        .sort_values(["doc_id", "metric"]).reset_index(drop=True)
    )
    assert len(got) == 6
    m7 = got[got["doc_id"] == 7].set_index("metric")["value"].to_dict()
    assert m7 == {"chars": 11, "bytes": 13, "spaces": 1}
    m8 = got[got["doc_id"] == 8].set_index("metric")["value"].to_dict()
    assert m8 == {"chars": 0, "bytes": 0, "spaces": 0}
