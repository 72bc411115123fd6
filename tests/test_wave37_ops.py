"""Wave-37 operator pins: weighted range splits, classifier agreement,
AUC rank-sum evidence."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0]


def _write_docs(tmp_path, df: pd.DataFrame):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_range_splits_skewed_weights(tmp_path):
    """Heavily skewed weights: parts are contiguous id ranges, follow
    the exclusive-prefix rule exactly, and cover every row once."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 500
    rng = np.random.default_rng(3)
    wt = rng.integers(1, 50, size=n).astype(np.int64)
    wt[::97] = 5000  # heavy rows
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": wt,
        }
    )
    _write_docs(tmp_path, df)
    got = (
        QUERIES["q185_range_splits"](str(tmp_path))
        .to_pandas().sort_values("part").reset_index(drop=True)
    )

    W = int(wt.sum())
    target = (W + 7) // 8
    pre = np.cumsum(wt) - wt
    part = pre // target
    exp = (
        pd.DataFrame({"part": part, "wt": wt, "doc_id": range(n)})
        .groupby("part", as_index=False)
        .agg(n_docs=("doc_id", "size"), tot_weight=("wt", "sum"),
             id_lo=("doc_id", "min"), id_hi=("doc_id", "max"))
    )
    assert got["part"].tolist() == exp["part"].tolist()
    for c in ["n_docs", "tot_weight", "id_lo", "id_hi"]:
        assert got[c].tolist() == exp[c].tolist(), c
    # contiguity + full coverage
    assert int(got["n_docs"].sum()) == n
    his, los = got["id_hi"].tolist(), got["id_lo"].tolist()
    assert los[0] == 0 and his[-1] == n - 1
    assert all(los[i + 1] == his[i] + 1 for i in range(len(his) - 1))
    # balance: every part except possibly the last stays under
    # target + max row weight (the next-fit overfill bound)
    assert (got["tot_weight"].iloc[:-1] < target + wt.max()).all()


@pytest.mark.usefixtures("ray_session")
def test_classifier_agreement_vs_brute(tmp_path):
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.pipelines.queries import QUERIES

    w_a = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(64)]
    w_b = [_md5_low64(f"v:{b}") % 21 - 10 for b in range(64)]
    rng = np.random.default_rng(13)
    texts = [
        " ".join(f"t{rng.integers(0, 200)}" for _ in range(20))
        for _ in range(150)
    ]
    langs = [("en", "de", "fr")[i % 3] for i in range(150)]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)), "text": texts, "lang": langs,
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    _write_docs(tmp_path, df)
    got = QUERIES["q186_classifier_agreement"](str(tmp_path)).to_pandas()

    exp: dict = {}
    for t, lang in zip(texts, langs):
        toks = t.lower().split()
        ka = 1 if hashed_linear_score(toks, w_a) > 0 else 0
        kb = 1 if hashed_linear_score(toks, w_b) > 0 else 0
        exp.setdefault(lang, [0, 0, 0, 0])[2 * ka + kb] += 1
    for _, r in got.iterrows():
        e = exp[r["lang"]]
        assert [r["n00"], r["n01"], r["n10"], r["n11"]] == e, r["lang"]
    # the two classifiers genuinely disagree somewhere
    assert sum(e[1] + e[2] for e in exp.values()) > 0


@pytest.mark.usefixtures("ray_session")
def test_auc_evidence_vs_pairwise(tmp_path):
    """u2 / (2·n_pos·n_neg) equals the brute pairwise AUC (ties get
    half credit), on a set with deliberate score ties across labels."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.pipelines.queries import QUERIES

    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(64)]
    rng = np.random.default_rng(31)
    texts, langs = [], []
    vocab = [f"t{i}" for i in range(30)]  # small vocab → score ties
    for i in range(160):
        texts.append(" ".join(rng.choice(vocab, size=5)))
        langs.append("en" if i % 2 == 0 else "de")
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)), "text": texts, "lang": langs,
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    _write_docs(tmp_path, df)
    got = QUERIES["q187_auc_evidence"](str(tmp_path)).to_pandas()

    scores = np.array(
        [hashed_linear_score(t.lower().split(), weights) for t in texts]
    )
    pos = scores[np.array(langs) == "en"]
    neg = scores[np.array(langs) != "en"]
    # deliberate ties must exist for the half-credit path to matter
    assert len(np.intersect1d(pos, neg)) > 0
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    assert int(got["n_pos"].iloc[0]) == len(pos)
    assert int(got["n_neg"].iloc[0]) == len(neg)
    assert int(got["u2"].iloc[0]) == 2 * int(wins) + int(ties)
