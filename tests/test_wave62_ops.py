"""Wave-62 operator pins: split leakage, encoding weight,
co-engagement matrix."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


def _split_of(doc_id: int) -> str:
    p = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    return "train" if p < 80 else ("val" if p < 90 else "test")


@pytest.mark.usefixtures("ray_session")
def test_split_leakage_counts_cross_split_bow_groups(tmp_path):
    """A BOW dup pair split across train/test is flagged; a dup pair
    inside ONE split is not."""
    from basicocr_ray.pipelines.queries import QUERIES

    # find one train id and one test id deterministically
    train_ids = [i for i in range(1, 400) if _split_of(i) == "train"]
    test_ids = [i for i in range(1, 400) if _split_of(i) == "test"]
    a, b = train_ids[0], test_ids[0]
    c, d = train_ids[1], train_ids[2]
    _write(tmp_path, "documents", pd.DataFrame(
        {
            "doc_id": [a, b, c, d],
            "text": [
                "leak me now", "now me leak",          # cross-split dup
                "same split pair", "pair split same",  # same-split dup
            ],
        }
    ))
    got = QUERIES["q258_split_leakage"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["split_a"], r["split_b"]) == ("test", "train")
    assert r["n_leaky_groups"] == 1
    assert r["n_docs_a"] == 1 and r["n_docs_b"] == 1


@pytest.mark.usefixtures("ray_session")
def test_encoding_weight_multibyte(tmp_path):
    """CJK chars weigh 3 bytes, ASCII 1 — chars vs bytes diverge."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "documents", pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["abcd", "中文好"],   # 4 ascii; 3 CJK
            "lang": ["en", "zh"],
        }
    ))
    got = (
        QUERIES["q259_encoding_weight"](str(tmp_path))
        .to_pandas().set_index("lang")
    )
    assert got.loc["en"].tolist() == [1, 4, 4]
    assert got.loc["zh"].tolist() == [1, 3, 9]


@pytest.mark.usefixtures("ray_session")
def test_co_engagement_min_strength(tmp_path):
    """Pair strength is min of the two per-user counts, summed over
    users doing both; users doing one type contribute nothing."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0

    def ev(u, t, k):
        nonlocal eid
        for _ in range(k):
            rows.append({"event_id": eid, "ts": base, "user_id": u,
                         "event_type": t})
            eid += 1

    ev(1, "click", 3); ev(1, "view", 5)       # min 3
    ev(2, "click", 2); ev(2, "view", 1)       # min 1
    ev(3, "click", 7)                          # solo -> nothing
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = QUERIES["q260_co_engagement"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("click", "view")
    assert r["n_users"] == 2
    assert r["strength"] == 4
