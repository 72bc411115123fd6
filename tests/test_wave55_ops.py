"""Wave-55 operator pins: max drawdown, series correlation evidence,
keyness terms."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_max_drawdown_vs_brute(tmp_path):
    """A rally → crash → partial recovery series: drawdown is measured
    from the running peak, realized at the trough's FIRST hit."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-09-01")
    vals = [10.0, 50.0, 30.0, 5.0, 5.0, 40.0, 20.0]
    rows = [
        {"event_id": i, "ts": base + pd.Timedelta(minutes=i),
         "user_id": 1, "event_type": "x", "value": v, "props": "{}"}
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q237_max_drawdown"](str(tmp_path)).to_pandas().iloc[0]
    # cents: peak 5000 at i=1; trough 500 at i=3 (first) → dd 4500
    assert int(got["max_dd"]) == 4500
    assert int(got["at_event"]) == 3     # first realization, not i=4
    assert int(got["peak_cents"]) == 5000


@pytest.mark.usefixtures("ray_session")
def test_series_corr_evidence_vs_brute(tmp_path):
    """Two co-moving types and one anti-moving type: the moment sums
    match a brute aligned-grid computation."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-09-01")
    rows, eid = [], 0

    def burst(t, hour, k):
        nonlocal eid
        for i in range(k):
            rows.append(
                {"event_id": eid,
                 "ts": base + pd.Timedelta(hours=hour, minutes=i),
                 "user_id": 1, "event_type": t, "value": 1.0,
                 "props": "{}"}
            )
            eid += 1

    pattern = [5, 1, 4, 2]
    for h, k in enumerate(pattern):
        burst("a", h, k)
        burst("b", h, k)            # identical to a
        burst("c", h, 6 - k)        # anti-phase
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q238_series_corr_evidence"](str(tmp_path)).to_pandas()
    gm = {
        (a, b): r
        for (a, b), r in zip(
            zip(got["type_a"], got["type_b"]),
            got.to_dict("records"),
        )
    }
    va = np.array(pattern)
    vc = 6 - va
    ab = gm[("a", "b")]
    assert ab["n_cells"] == 4
    assert ab["sab"] == int((va * va).sum())
    ac = gm[("a", "c")]
    assert ac["sab"] == int((va * vc).sum())
    assert ac["sa"] == int(va.sum()) and ac["sb"] == int(vc.sum())
    # derived correlations: identical → 1, anti-phase → negative
    def corr(r):
        n = r["n_cells"]
        cov = n * r["sab"] - r["sa"] * r["sb"]
        da = n * r["saa"] - r["sa"] ** 2
        db = n * r["sbb"] - r["sb"] ** 2
        return cov / np.sqrt(da * db)
    assert corr(ab) == pytest.approx(1.0)
    assert corr(ac) < -0.9


@pytest.mark.usefixtures("ray_session")
def test_keyness_terms_vs_brute(tmp_path):
    """A token exclusive to one language dominates its keyness list;
    a uniform token ranks below it."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        ("en", "shared shared distinctive"),
        ("en", "shared distinctive distinctive"),
        ("de", "shared shared gemeinsam"),
        ("de", "shared gemeinsam gemeinsam"),
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
    got = QUERIES["q239_keyness_terms"](str(tmp_path)).to_pandas()

    # brute
    cnt: Counter = Counter()
    for l, t in texts:
        for tok in t.split():
            cnt[(l, tok)] += 1
    t_in = {l: sum(n for (ll, _), n in cnt.items() if ll == l)
            for l in ("en", "de")}
    T = sum(t_in.values())
    tok_tot: Counter = Counter()
    for (_, tok), n in cnt.items():
        tok_tot[tok] += n
    for lang in ("en", "de"):
        sub = got[got["lang"] == lang].reset_index(drop=True)
        exp = []
        for (ll, tok), n_in in cnt.items():
            if ll != lang:
                continue
            n_out = tok_tot[tok] - n_in
            score = n_in * (T - t_in[lang]) - n_out * t_in[lang]
            exp.append((tok, n_in, n_out, score))
        exp.sort(key=lambda r: (-r[3], r[0]))
        exp = exp[:5]
        assert sub["token"].tolist() == [e[0] for e in exp], lang
        assert sub["score"].tolist() == [e[3] for e in exp], lang
    # the exclusive token tops its language
    assert got[got["lang"] == "en"]["token"].iloc[0] == "distinctive"
    assert got[got["lang"] == "de"]["token"].iloc[0] == "gemeinsam"
