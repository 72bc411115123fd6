"""Wave-52 operator pins: familiarity score, distributed RLE estimate,
Tukey outlier fences."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": langs or ["en"] * n,
            "source": sources or ["s"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return df


@pytest.mark.usefixtures("ray_session")
def test_familiarity_score_vs_brute(tmp_path):
    """Docs full of common bigrams score high mass; a unique doc's
    bigrams each count once."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = ["the common phrase here"] * 10 + ["totally novel wording"]
    _write_docs(tmp_path, texts)
    got = (
        QUERIES["q228_familiarity_score"](str(tmp_path))
        .to_pandas().set_index("doc_id")
    )
    cc: Counter = Counter()
    for t in texts:
        toks = t.split()
        cc.update(" ".join(toks[i:i + 2]) for i in range(len(toks) - 1))
    for did, t in enumerate(texts):
        toks = t.split()
        bgs = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        assert int(got.loc[did, "n_bigrams"]) == len(bgs)
        assert int(got.loc[did, "mass"]) == sum(cc[g] for g in bgs)
    assert int(got.loc[0, "mass"]) == 30    # 3 bigrams × 10 dups
    assert int(got.loc[10, "mass"]) == 2    # unique bigrams count once


@pytest.mark.usefixtures("ray_session")
def test_rle_estimate_vs_brute(tmp_path):
    """Run count over a crafted lang sequence equals the brute scan —
    including runs crossing 64-id bucket boundaries."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 300
    langs = []
    for i in range(n):
        # long runs of 50 (crossing the 64 boundary), then alternating
        if i < 200:
            langs.append(f"l{i // 50}")
        else:
            langs.append(f"l{i % 2}")
    _write_docs(tmp_path, ["x"] * n, langs=langs)
    res = QUERIES["q229_rle_estimate"](str(tmp_path))
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res).iloc[0]
    runs = 1 + sum(1 for a, b in zip(langs, langs[1:]) if a != b)
    assert int(got["n_rows"]) == n
    assert int(got["n_runs"]) == runs


@pytest.mark.usefixtures("ray_session")
def test_tukey_outliers_planted(tmp_path):
    """A planted extreme outlier is counted above the fence; a tight
    cluster yields zero outliers."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts, sources = [], []
    # source A: 99 docs of length ~100, one of length 5000
    for i in range(99):
        texts.append("a" * (95 + i % 10))
        sources.append("A")
    texts.append("a" * 5000)
    sources.append("A")
    # source B: uniform lengths → no outliers
    for i in range(50):
        texts.append("b" * 200)
        sources.append("B")
    _write_docs(tmp_path, texts, sources=sources)
    got = (
        QUERIES["q230_tukey_outliers"](str(tmp_path))
        .to_pandas().set_index("source")
    )
    assert int(got.loc["A", "n"]) == 100
    assert int(got.loc["A", "n_high"]) >= 1   # the planted outlier
    assert int(got.loc["A", "n_low"]) == 0
    assert int(got.loc["B", "n_high"]) == 0
    assert int(got.loc["B", "n_low"]) == 0
    # quartiles are the doubled exact order statistics
    xs = sorted(2 * len(t) for t, s in zip(texts, sources) if s == "A")
    import math
    assert int(got.loc["A", "q1_2x"]) == xs[math.ceil(0.25 * 100) - 1]
    assert int(got.loc["A", "q3_2x"]) == xs[math.ceil(0.75 * 100) - 1]
