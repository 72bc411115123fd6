"""Wave-51 operator pins: association rules, Jain fairness evidence,
erasure plan."""

from __future__ import annotations

import hashlib
import struct
from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0] & (
        (1 << 63) - 1
    )


@pytest.mark.usefixtures("ray_session")
def test_assoc_rules_vs_brute(tmp_path):
    """Directed rules appear iff support >= 20; confidence evidence
    matches a brute basket scan; repeated tokens in a doc count once."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = []
    # 25 baskets with {x, y}: rule survives
    texts += ["x y y x filler%d" % (i % 3) for i in range(25)]
    # 10 baskets with {x, z}: below support
    texts += ["x z"] * 10
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q225_assoc_rules"](str(tmp_path)).to_pandas()
    gm = {
        (a, c): (int(n), int(na))
        for a, c, n, na in zip(
            got["ant"], got["cons"], got["n_ab"], got["n_ant"]
        )
    }

    baskets = [set(t.split()) for t in texts]
    pair_n: Counter = Counter()
    df_n: Counter = Counter()
    for bk in baskets:
        df_n.update(bk)
        for a, b in combinations(sorted(bk), 2):
            pair_n[(a, b)] += 1
    exp = {}
    for (a, b), n in pair_n.items():
        if n >= 20:
            exp[(a, b)] = (n, df_n[a])
            exp[(b, a)] = (n, df_n[b])
    assert gm == exp
    assert ("x", "y") in gm and gm[("x", "y")] == (25, 35)
    assert ("x", "z") not in gm  # below support


@pytest.mark.usefixtures("ray_session")
def test_fairness_evidence(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    eid = 0
    # hosts 0..3 with loads 10, 10, 10, 70 → unfair
    for h, load in ((0, 10), (1, 10), (2, 10), (3, 70)):
        for _ in range(load):
            rows.append(
                {"event_id": eid, "ts": pd.Timestamp("2024-01-01"),
                 "user_id": h, "event_type": "x", "value": 1.0,
                 "props": "{}"}
            )
            eid += 1
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q226_fairness_evidence"](str(tmp_path)).to_pandas()
    r = got.iloc[0]
    assert int(r["n_hosts"]) == 4
    assert int(r["sum_x"]) == 100
    assert int(r["sum_x2"]) == 100 + 100 + 100 + 4900
    jain = 100 ** 2 / (4 * 5200)
    assert 0.4 < jain < 0.5  # the unfairness is visible in the evidence


@pytest.mark.usefixtures("ray_session")
def test_erasure_plan_cascade(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    n = 250
    docs = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"body {i}" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [6] * n,
        }
    )
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(400), pa.int64()),
            "embedding": pa.array(
                [[0.0] * 4] * 400, pa.list_(pa.float32())
            ),
            "label": pa.array(np.zeros(400, dtype=np.int32), pa.int32()),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    got = (
        QUERIES["q227_erasure_plan"](str(tmp_path))
        .to_pandas().set_index("tbl")
    )
    doc_ids = [i for i in range(n) if i % 101 == 0]        # 0, 101, 202
    vec_ids = [i for i in range(400) if i % 101 == 0]       # 0..303
    assert int(got.loc["documents", "n_rows"]) == len(doc_ids)
    assert int(got.loc["embeddings", "n_rows"]) == len(vec_ids)
    chk_d = 0
    for i in doc_ids:
        chk_d ^= _md5_low63(f"{i}:body {i}")
    chk_e = 0
    for i in vec_ids:
        chk_e ^= _md5_low63(str(i))
    assert int(got.loc["documents", "chk"]) == chk_d
    assert int(got.loc["embeddings", "chk"]) == chk_e
