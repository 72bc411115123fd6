"""Wave-61 operator pins: BM25 evidence, freshness report, daily
value bands."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_bm25_probe_selection_and_components(tmp_path):
    """Probe = top-3 by tf with token-asc ties; df counts documents
    not occurrences; lang mass covers ALL tokens, not just probes."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "documents", pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "apple apple banana cherry",
                "apple banana banana date",
                "zz yy xx ww",
            ],
            "lang": ["en", "en", "fr"],
        }
    ))
    got = QUERIES["q255_bm25_evidence"](str(tmp_path))
    en = got[got["lang"] == "en"].set_index("term")
    # tf: apple 3, banana 3, cherry 1, date 1 -> top3 = apple, banana,
    # cherry (tie apple/banana broken asc; cherry beats date asc)
    assert list(en.index) == ["apple", "banana", "cherry"]
    assert en.loc["apple"].tolist() == ["en", 3, 2, 2, 8]
    assert en.loc["cherry"].tolist() == ["en", 1, 1, 2, 8]
    fr = got[got["lang"] == "fr"]
    assert len(fr) == 3 and fr["lang_docs"].iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_freshness_gaps_cross_hour_boundaries(tmp_path):
    """The max gap is found even when it spans hour buckets (boundary
    merge); single-event types report -1; lag is vs the corpus max."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-01")
    rows = []
    # type a: events at 0min, 10min, then 3h10min -> max gap = 3h
    for i, m in enumerate((0, 10, 190)):
        rows.append({"event_id": i, "ts": base + pd.Timedelta(minutes=m),
                     "user_id": 1, "event_type": "a"})
    # type b: single event at 1h -> gap -1, lag = corpus max - 1h
    rows.append({"event_id": 9, "ts": base + pd.Timedelta(hours=1),
                 "user_id": 1, "event_type": "b"})
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = (
        QUERIES["q256_freshness_report"](str(tmp_path))
        .set_index("event_type")
    )
    assert got.loc["a"].tolist() == [3, 0, 10800]
    assert got.loc["b"].tolist() == [1, (190 - 60) * 60, -1]


@pytest.mark.usefixtures("ray_session")
def test_daily_bands_exact_order_stats(tmp_path):
    """p50/p90 are the ceil(n/2)/ceil(9n/10) order statistics of the
    floored cents — for n=10 values 10..100 that's the 5th and 9th."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-02")
    df = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(10)],
            "user_id": [1] * 10,
            "event_type": ["x"] * 10,
            "value": [(i + 1) * 0.1 for i in range(10)],  # 0.1..1.0
        }
    )
    _write(tmp_path, "events", df)
    got = QUERIES["q257_daily_value_bands"](str(tmp_path))
    assert len(got) == 1
    r = got.iloc[0]
    # cents = 10..100 (floor of i*0.1*100, exact-ish; floor(0.3*100)=30
    # in both engines since the same double rounds the same way)
    assert r["n_events"] == 10
    assert r["p50_cents"] == 50
    assert r["p90_cents"] == 90
