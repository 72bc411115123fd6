"""Wave-49 operator pins: encoding advisor, next-event baseline,
dedup savings."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_encoding_advisor_vs_brute(tmp_path):
    """A low-cardinality column picks dict, a unique-text column picks
    plain; costs match the brute formulas."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 200
    texts = [f"unique body text number {i}" for i in range(n)]
    langs = ["en" if i % 2 == 0 else "de" for i in range(n)]
    # long repeated values: the case where dictionary coding pays
    sources = [f"a-very-long-repeated-source-name-{i % 4}" for i in range(n)]
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    res = QUERIES["q219_encoding_advisor"](str(tmp_path))
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
    got = got.set_index("col")

    for col, vals in (("text", texts), ("lang", langs),
                      ("source", sources)):
        plain = sum(len(v) for v in vals)
        dist = set(vals)
        dist_chars = sum(len(v) for v in dist)
        dict_cost = dist_chars + 4 * n
        r = got.loc[col]
        assert int(r["n"]) == n
        assert int(r["plain_chars"]) == plain
        assert int(r["n_distinct"]) == len(dist)
        assert int(r["dist_chars"]) == dist_chars
        assert int(r["dict_cost"]) == dict_cost
        assert int(r["use_dict"]) == (1 if dict_cost < plain else 0)
    # short 2-char langs: 4-byte codes cost more than the plain values
    assert int(got.loc["lang", "use_dict"]) == 0
    assert int(got.loc["source", "use_dict"]) == 1  # long repeats pay
    assert int(got.loc["text", "use_dict"]) == 0    # unique never pays


@pytest.mark.usefixtures("ray_session")
def test_next_event_baseline_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-06-01")
    # user 1: a→b, b→a, a→b, b→c ; user 2: a→b
    seqs = {1: ["a", "b", "a", "b", "c"], 2: ["a", "b"]}
    rows, eid = [], 0
    for u, seq in seqs.items():
        for i, t in enumerate(seq):
            rows.append(
                {"event_id": eid, "ts": base + pd.Timedelta(minutes=i),
                 "user_id": u, "event_type": t, "value": 1.0,
                 "props": "{}"}
            )
            eid += 1
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q220_next_event_baseline"](str(tmp_path))
        .to_pandas().set_index("cur")
    )
    trans: Counter = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    for cur in {a for a, _ in trans}:
        tot = sum(n for (a, _), n in trans.items() if a == cur)
        best = max(n for (a, _), n in trans.items() if a == cur)
        assert int(got.loc[cur, "n_total"]) == tot, cur
        assert int(got.loc[cur, "n_correct"]) == best, cur
    # 'a' → always 'b' (3/3); 'b' → {a:1, b→a? no: b→a ×1, b→c ×1, b→b? }:
    assert int(got.loc["a", "n_correct"]) == 3
    assert int(got.loc["b", "n_total"]) == 2
    assert int(got.loc["b", "n_correct"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_dedup_savings_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    texts = (
        ["three tokens here"] * 4      # 4 dups × 3 tokens
        + ["two tokens"] * 2           # 2 dups × 2 tokens
        + ["solo"]                     # 1 × 1 token
        + [""]                         # empty text → 0 tokens
    )
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
    got = QUERIES["q221_dedup_savings"](str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_docs"]) == 8
    assert int(got["n_unique"]) == 4
    assert int(got["tokens_all"]) == 4 * 3 + 2 * 2 + 1 + 0
    assert int(got["tokens_unique"]) == 3 + 2 + 1 + 0
