"""Wave-41 operator pins: Gini mean difference, last-touch attribution,
KWIC concordance."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_gini_identity_vs_pairwise(tmp_path):
    """The sorted-order identity equals the brute pairwise sum,
    including heavy ties; a constant stratum gives gini_num 0."""
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(23)
    rows, did = [], 0
    vals = {"en": rng.integers(10, 1000, size=80).tolist(),
            "de": [500] * 40,                       # constant → 0
            "fr": [1, 1, 1, 1000, 1000, 5000]}      # ties + outlier
    for lang, xs in vals.items():
        for x in xs:
            rows.append((did, "t", lang, "s", int(x)))
            did += 1
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q197_gini_evidence"](str(tmp_path))
        .to_pandas().set_index("lang")
    )
    for lang, xs in vals.items():
        brute = sum(
            abs(a - b) for a, b in itertools.combinations(xs, 2)
        )
        assert int(got.loc[lang, "gini_num"]) == brute, lang
        assert int(got.loc[lang, "n"]) == len(xs)
        assert int(got.loc[lang, "sum_x"]) == sum(xs)
    assert int(got.loc["de", "gini_num"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_attribution_edges(tmp_path):
    """Exact-ts click counts; equal-ts click tie → highest event_id;
    lookback boundary (exactly 7 days attributes, beyond doesn't);
    purchases with no click → -1."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-02-01")
    rows = []

    def ev(eid, u, dt, typ):
        rows.append(
            {"event_id": eid, "ts": base + dt, "user_id": u,
             "event_type": typ, "value": 1.0, "props": "{}"}
        )

    Z = pd.Timedelta(0)
    # user 1: two clicks at the SAME ts, purchase at the same ts too →
    # exact match allowed, tie → event_id 3
    ev(2, 1, Z, "click")
    ev(3, 1, Z, "click")
    ev(4, 1, Z, "purchase")
    # user 2: click exactly 7 days before the purchase → attributed
    ev(5, 2, Z, "click")
    ev(6, 2, pd.Timedelta(days=7), "purchase")
    # user 3: click 7 days + 1 s before → NOT attributed
    ev(7, 3, Z, "click")
    ev(8, 3, pd.Timedelta(days=7, seconds=1), "purchase")
    # user 4: purchase with no clicks at all
    ev(9, 4, Z, "purchase")
    # user 5: two clicks, purchase between them → earlier one wins
    ev(10, 5, Z, "click")
    ev(11, 5, pd.Timedelta(hours=2), "purchase")
    ev(12, 5, pd.Timedelta(hours=3), "click")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q198_attribution"](str(tmp_path))
        .to_pandas().sort_values("purchase_id").reset_index(drop=True)
    )
    gm = {
        int(p): (int(c), int(g))
        for p, c, g in zip(got["purchase_id"], got["click_id"], got["gap_s"])
    }
    assert gm[4] == (3, 0)
    assert gm[6] == (5, 7 * 86400)
    assert gm[8] == (-1, -1)
    assert gm[9] == (-1, -1)
    assert gm[11] == (10, 7200)


@pytest.mark.usefixtures("ray_session")
def test_kwic_contexts_edges(tmp_path):
    """Keyword at doc start/end → empty contexts; short contexts near
    boundaries; multiple occurrences per doc."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        "kw alpha beta",          # kw at start: left '', right 2 toks
        "alpha kw",               # left 1 tok, right ''
        "a b kw c d kw",          # two occurrences, one at doc end
        "kw kw kw",               # dominant keyword, adjacent repeats
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
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q199_kwic_contexts"](str(tmp_path))
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    rows = set(
        zip(got["doc_id"], got["pos"], got["left_ctx"], got["right_ctx"])
    )
    assert (0, 0, "", "alpha beta") in rows
    assert (1, 1, "alpha", "") in rows
    assert (2, 2, "a b", "c d") in rows
    assert (2, 5, "c d", "") in rows
    assert (3, 0, "", "kw kw") in rows
    assert (3, 1, "kw", "kw") in rows
    assert (3, 2, "kw kw", "") in rows
    assert len(got) == 7
