"""Wave-38 operator pins: longest streak, language overlap matrix,
consistent-hash resharding churn."""

from __future__ import annotations

import hashlib
import struct
from collections import defaultdict

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
def test_longest_streak_known_patterns(tmp_path):
    """Hand-built day patterns: multi-day runs, singletons, a gap that
    splits a would-be streak, and same-day duplicate events."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-05-01")
    rows, eid = [], 0

    def day(u, d, times=1):
        nonlocal eid
        for k in range(times):
            rows.append(
                {
                    "event_id": eid,
                    "ts": base + pd.Timedelta(days=d, minutes=k),
                    "user_id": u, "event_type": "x", "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1

    # user 1: days 0,1,2, gap, 5,6 → longest 3, active 5
    for d in (0, 1, 2, 5, 6):
        day(1, d, times=2)  # duplicates inside a day must not inflate
    # user 2: isolated days 0, 2, 4 → longest 1, active 3
    for d in (0, 2, 4):
        day(2, d)
    # user 3: one day
    day(3, 7)
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q188_longest_streak"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 2, 3]
    assert got["n_active_days"].tolist() == [5, 3, 1]
    assert got["longest_streak"].tolist() == [3, 1, 1]


@pytest.mark.usefixtures("ray_session")
def test_lang_overlap_matrix_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        ("en", "shared word alpha"),
        ("en", "only english beta"),
        ("de", "shared word gamma"),
        ("de", "nur deutsch"),
        ("fr", "shared mot"),
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t for _, t in texts],
            "lang": [l for l, _ in texts],
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for _, t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q189_lang_overlap_matrix"](str(tmp_path)).to_pandas()
    gm = {
        (a, b): int(n)
        for a, b, n in zip(got["lang_a"], got["lang_b"], got["n_common"])
    }

    feats = defaultdict(set)
    for lang, t in texts:
        toks = t.lower().split()
        feats[lang].update(toks)
        feats[lang].update(
            " ".join(toks[i:i + 2]) for i in range(len(toks) - 1)
        )
    langs = sorted(feats)
    exp = {}
    for i, a in enumerate(langs):
        exp[(a, a)] = len(feats[a])
        for b in langs[i + 1:]:
            inter = len(feats[a] & feats[b])
            if inter:
                exp[(a, b)] = inter
    assert gm == exp
    assert gm[("de", "en")] == len(feats["de"] & feats["en"])
    assert gm[("en", "fr")] == 1  # only "shared"


@pytest.mark.usefixtures("ray_session")
def test_reshard_churn_vs_brute(tmp_path):
    """Owner assignment matches a brute ring walk; mod churn is large,
    ring churn is near n/17 and only ever moves keys ONTO node 16."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 400
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [5] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q190_reshard_churn"](str(tmp_path)).to_pandas()

    def ring(nodes):
        pts = sorted(
            (_md5_low63(f"node:{i}:{v}"), i)
            for i in range(nodes) for v in range(8)
        )
        return pts

    r16, r17 = ring(16), ring(17)

    def owner(pts, h):
        for p, node in pts:
            if p >= h:
                return node
        return pts[0][1]

    moved_mod = moved_ring = 0
    for d in range(n):
        h = _md5_low63(str(d))
        if h % 16 != h % 17:
            moved_mod += 1
        o16, o17 = owner(r16, h), owner(r17, h)
        if o16 != o17:
            moved_ring += 1
            assert o17 == 16  # consistent hashing only moves keys to
            # the new node
    assert int(got["n_total"].iloc[0]) == n
    assert int(got["n_moved_mod"].iloc[0]) == moved_mod
    assert int(got["n_moved_ring"].iloc[0]) == moved_ring
    assert moved_ring < moved_mod / 4  # the point of the ring
