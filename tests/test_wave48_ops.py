"""Wave-48 operator pins: weighted Jaccard, graph reciprocity,
histogram drift."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_weighted_jaccard_vs_brute(tmp_path):
    """Σmin / totals equal a brute multiset computation, and the
    derived Σmax identity holds (T_a + T_b − Σmin = Σ max)."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        ("s1", "a a a b c"),
        ("s1", "b d"),
        ("s2", "a b b e"),
        ("s3", "zz"),          # disjoint from s1/s2
        ("s3", "a"),           # ...except one shared token
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t for _, t in texts],
            "lang": ["en"] * len(texts),
            "source": [s for s, _ in texts],
            "n_chars": [len(t) for _, t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q216_weighted_jaccard"](str(tmp_path)).to_pandas()

    bags: dict = {}
    for s, t in texts:
        bags.setdefault(s, Counter()).update(t.split())
    gm = {
        (a, b): (int(m), int(ta), int(tb))
        for a, b, m, ta, tb in zip(
            got["source_a"], got["source_b"], got["sum_min"],
            got["t_a"], got["t_b"],
        )
    }
    for a in bags:
        for b in bags:
            if a >= b:
                continue
            smin = sum(
                min(bags[a][t], bags[b][t]) for t in bags[a] if t in bags[b]
            )
            if smin == 0:
                assert (a, b) not in gm
                continue
            m, ta, tb = gm[(a, b)]
            assert m == smin
            assert ta == sum(bags[a].values())
            assert tb == sum(bags[b].values())
            smax = sum(
                max(bags[a][t], bags[b][t])
                for t in set(bags[a]) | set(bags[b])
            )
            assert ta + tb - m == smax  # the identity the query relies on


@pytest.mark.usefixtures("ray_session")
def test_graph_reciprocity_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    n = 40
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"doc {i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [6] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q217_graph_reciprocity"](str(tmp_path)).to_pandas()

    eset = set()
    for i in range(n):
        eset.add((f"site{i % 7}", f"site{(3 * i + 1) % 7}"))
        eset.add((f"site{i % 7}", f"site{(5 * i + 2) % 7}"))
    outdeg: Counter = Counter(u for u, _ in eset)
    indeg: Counter = Counter(v for _, v in eset)
    n_recip = sum(1 for u, v in eset if (v, u) in eset)
    degprod = sum(outdeg[u] * indeg[v] for u, v in eset)
    assert int(got["n_edges"].iloc[0]) == len(eset)
    assert int(got["n_recip"].iloc[0]) == n_recip
    assert int(got["sum_degprod"].iloc[0]) == degprod


@pytest.mark.usefixtures("ray_session")
def test_histogram_drift_planted_shift(tmp_path):
    """A planted mean shift between halves shows up as mass moving
    buckets; counts and |Δ| match a brute split."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    rows = []
    # first half: values ~ [0, 50); second half: values ~ [100, 150)
    for i in range(100):
        rows.append(
            {"event_id": i, "ts": base + pd.Timedelta(minutes=i),
             "user_id": 1, "event_type": "x",
             "value": float(i % 50), "props": "{}"}
        )
    for i in range(100):
        rows.append(
            {"event_id": 100 + i,
             "ts": base + pd.Timedelta(days=2, minutes=i),
             "user_id": 1, "event_type": "x",
             "value": 100.0 + float(i % 50), "props": "{}"}
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q218_histogram_drift"](str(tmp_path))
        .to_pandas().set_index("bucket")
    )
    assert int(got.loc[0, "n_first"]) == 100
    assert int(got.loc[0, "n_second"]) == 0
    assert int(got.loc[2, "n_second"]) == 100
    assert int(got.loc[0, "abs_diff"]) == 100
    assert int(got.loc[2, "abs_diff"]) == 100
