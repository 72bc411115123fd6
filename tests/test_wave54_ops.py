"""Wave-54 operator pins: type distance matrix, seasonality peaks,
char-class profile."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_type_distance_matrix_vs_brute(tmp_path):
    """L1 distances over aligned histograms — a shifted distribution is
    far, a matching one is at distance |n_a − n_b| only."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows, eid = [], 0

    def ev(t, v):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": pd.Timestamp("2024-01-01"),
             "user_id": 1, "event_type": t, "value": v, "props": "{}"}
        )
        eid += 1

    for _ in range(50):
        ev("a", 10.0)       # bucket 0
    for _ in range(50):
        ev("b", 10.0)       # bucket 0 → identical to a
    for _ in range(50):
        ev("c", 260.0)      # bucket 5 → disjoint
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q234_type_distance_matrix"](str(tmp_path)).to_pandas()
    gm = {
        (a, b): int(l)
        for a, b, l in zip(got["type_a"], got["type_b"], got["l1"])
    }
    assert gm[("a", "b")] == 0
    assert gm[("a", "c")] == 100
    assert gm[("b", "c")] == 100


@pytest.mark.usefixtures("ray_session")
def test_seasonality_peak_known_cells(tmp_path):
    """Known timestamps land in the right (dow, hour) cells; 2024-01-01
    is a Monday (dow 1 under the Thursday-epoch convention... verify
    numerically), and the peak picks the densest cell."""
    from basicocr_ray.pipelines.queries import QUERIES

    # 2024-01-01 00:00 UTC: epoch day 19723; (19723 + 4) % 7 == 1
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows, eid = [], 0

    def ev(hours, t="a"):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(hours=hours),
             "user_id": 1, "event_type": t, "value": 1.0, "props": "{}"}
        )
        eid += 1

    for _ in range(5):
        ev(9)            # Monday 09:00 × 5 → the peak
    ev(10)
    ev(24 + 9)           # Tuesday 09:00
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q235_seasonality_peak"](str(tmp_path)).to_pandas()
    r = got.iloc[0]
    assert int(r["peak_dow"]) == 1      # Monday
    assert int(r["peak_hour"]) == 9
    assert int(r["peak_n"]) == 5
    assert int(r["total"]) == 7


@pytest.mark.usefixtures("ray_session")
def test_char_profile_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    texts = ["Abc 123 x!?", "ZZ  zz9"]
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
    got = QUERIES["q236_char_profile"](str(tmp_path)).to_pandas().iloc[0]
    joined = "".join(t.lower() for t in texts)
    n_letters = sum(c.isalpha() and "a" <= c <= "z" for c in joined)
    n_digits = sum(c.isdigit() for c in joined)
    n_spaces = joined.count(" ")
    assert int(got["n_chars"]) == len(joined)
    assert int(got["n_letters"]) == n_letters
    assert int(got["n_digits"]) == n_digits
    assert int(got["n_spaces"]) == n_spaces
    assert int(got["n_other"]) == (
        len(joined) - n_letters - n_digits - n_spaces
    )
    assert int(got["n_other"]) == 2  # '!' and '?'
