"""Wave-53 operator pins: two-hop path counts, norm histogram,
sessionized path mining."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_two_hop_paths_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    n = 60
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [1] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q231_two_hop_paths"](str(tmp_path))
        .to_pandas().set_index("src")
    )
    eset = set()
    for i in range(n):
        for d in ((i + 1) % n, (i + 2) % n, (3 * i + 1) % n):
            eset.add((i, d))
    outdeg: Counter = Counter(u for u, _ in eset)
    for v in range(n):
        exp = sum(outdeg[m] for (u, m) in eset if u == v)
        assert int(got.loc[v, "n_2paths"]) == exp, v


@pytest.mark.usefixtures("ray_session")
def test_norm_histogram_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(41)
    n, d = 200, 8
    V32 = rng.normal(scale=5.0, size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in V32], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    got = QUERIES["q232_norm_histogram"](str(tmp_path)).to_pandas()
    gm = {
        (int(l), int(b)): int(c)
        for l, b, c in zip(got["label"], got["bucket"], got["n"])
    }
    exp: Counter = Counter()
    Q = np.floor(V32.astype(np.float64) * 1e3).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)
    for lb, v in zip(labels, n2):
        exp[(int(lb), int(v // 100_000))] += 1
    assert gm == dict(exp)
    assert len({b for _, b in gm}) > 1  # the spectrum actually spreads


@pytest.mark.usefixtures("ray_session")
def test_session_paths_respect_boundaries(tmp_path):
    """A path must not straddle a session gap; counts match a brute
    session walk."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-08-01")
    rows, eid = [], 0

    def ev(u, minutes, typ):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(minutes=minutes),
             "user_id": u, "event_type": typ, "value": 1.0, "props": "{}"}
        )
        eid += 1

    # user 1, session A: a b c d → paths a>b>c, b>c>d
    for m, t in ((0, "a"), (5, "b"), (10, "c"), (15, "d")):
        ev(1, m, t)
    # gap > 30 min → session B: a b c → path a>b>c (again)
    for m, t in ((60, "a"), (61, "b"), (62, "c")):
        ev(1, m, t)
    # user 2: only 2 events in a session → no path; then a fresh
    # session with 3 events c c c
    ev(2, 0, "x"); ev(2, 1, "y")
    for m in (100, 101, 102):
        ev(2, m, "c")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q233_session_paths"](str(tmp_path)).to_pandas()
    gm = dict(zip(got["path"], got["n"].astype(int)))
    assert gm["a>b>c"] == 2
    assert gm["b>c>d"] == 1
    assert gm["c>c>c"] == 1
    # the boundary-straddling path d>a>b must NOT exist
    assert "d>a>b" not in gm
    assert "x>y>c" not in gm
