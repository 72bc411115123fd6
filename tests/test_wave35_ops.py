"""Wave-35 operator pins: Merkle range-digest diff, next-fit compaction
planning, skip-gram window pairs."""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little") & (
        (1 << 63) - 1
    )


def _write_docs(tmp_path, df: pd.DataFrame):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_merkle_bucket_diff_planted(tmp_path):
    """doc_ids 0..199 → buckets 0..3; the diff must flag exactly the
    buckets containing a mod-101 delete (0, 101) or a mod-97 rewrite
    (97, 194), with digests matching an independent rebuild."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 200
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [f"doc {i} body" for i in range(n)],
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [10] * n,
        }
    )
    _write_docs(tmp_path, df)
    got = (
        QUERIES["q179_merkle_bucket_diff"](str(tmp_path))
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    )

    # independent rebuild
    exp_rows = []
    for bucket in range(4):
        ids = [i for i in range(n) if i // 64 == bucket]
        n_old = len(ids)
        chk_old = 0
        for i in ids:
            chk_old ^= _md5_low63(f"{i}:doc {i} body")
        new_ids = [i for i in ids if i % 101 != 0]
        chk_new = 0
        for i in new_ids:
            t = f"doc {i} body" + (" v2" if i % 97 == 0 else "")
            chk_new ^= _md5_low63(f"{i}:{t}")
        if n_old != len(new_ids) or chk_old != chk_new:
            exp_rows.append((bucket, n_old, len(new_ids), chk_old, chk_new))
    exp = pd.DataFrame(
        exp_rows, columns=["bucket", "n_old", "n_new", "chk_old", "chk_new"]
    )
    # buckets 0 (delete id 0), 1 (rewrite 97, delete 101), 3 (rewrite 194)
    assert exp["bucket"].tolist() == [0, 1, 3]
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    for c in ["n_old", "n_new", "chk_old", "chk_new"]:
        assert got[c].tolist() == exp[c].tolist(), c
    # bucket 2 (ids 128..191, untouched) must NOT be flagged
    assert 2 not in set(got["bucket"])


@pytest.mark.usefixtures("ray_session")
def test_compaction_plan_next_fit(tmp_path):
    """Bins follow the next-fit rule (exclusive prefix // 65536) and are
    contiguous id-ordered part ranges; totals add up per language."""
    from basicocr_ray.pipelines.queries import QUERIES

    # 40 parts of 16 docs each for one lang: each part 16*1500 = 24000
    # bytes → prefix crosses 65536 every ceil(65536/24000) ≈ 3 parts
    n = 40 * 16
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [1500] * n,
        }
    )
    _write_docs(tmp_path, df)
    got = (
        QUERIES["q180_compaction_plan"](str(tmp_path))
        .to_pandas().sort_values(["lang", "bin"]).reset_index(drop=True)
    )

    # brute next-fit over the parts manifest
    part_bytes = {p: 16 * 1500 for p in range(40)}
    prefix, bins = 0, {}
    for p in sorted(part_bytes):
        b = prefix // 65536
        bins.setdefault(b, []).append(p)
        prefix += part_bytes[p]
    assert got["bin"].tolist() == sorted(bins)
    for _, row in got.iterrows():
        members = bins[int(row["bin"])]
        assert int(row["n_parts"]) == len(members)
        assert int(row["part_lo"]) == members[0]
        assert int(row["part_hi"]) == members[-1]
        assert int(row["tot_bytes"]) == sum(part_bytes[p] for p in members)
    # bins partition the id-ordered manifest contiguously
    his = got["part_hi"].tolist()
    los = got["part_lo"].tolist()
    assert all(los[i + 1] == his[i] + 1 for i in range(len(his) - 1))
    assert int(got["tot_bytes"].sum()) == n * 1500


@pytest.mark.usefixtures("ray_session")
def test_skipgram_pairs_vs_brute(tmp_path):
    """Window-3 unordered pair counts equal a brute enumeration,
    including the min/max pair-key normalization and same-token pairs."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        "b a c a b",
        "z y",
        "a a a",
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    _write_docs(tmp_path, df)
    got = QUERIES["q181_skipgram_pairs"](str(tmp_path)).to_pandas()

    cnt: Counter = Counter()
    for t in texts:
        toks = t.split()
        for d in (1, 2, 3):
            for a, b in zip(toks[:-d], toks[d:]):
                cnt[" ".join(sorted((a, b)))] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert list(zip(got["pair"], got["cnt"])) == [
        (p, c) for p, c in exp
    ]
    assert cnt["a a"] >= 2  # same-token pairs counted
