"""Wave-39 operator pins: distributed inverse-CDF weighted draws, TWAP
integer evidence, burst-rate window max."""

from __future__ import annotations

import hashlib
import struct

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
def test_weighted_draws_vs_brute(tmp_path):
    """Draws resolve to the exact inverse-CDF rows; zero-weight rows
    are never drawn; heavy rows dominate."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 300
    rng = np.random.default_rng(17)
    wt = rng.integers(1, 20, size=n).astype(np.int64)
    wt[7] = 0          # zero-weight: empty interval, never selected
    wt[100] = 50_000   # heavy row
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["x"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": wt,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q191_weighted_draws"](str(tmp_path))
        .to_pandas().sort_values("draw_id").reset_index(drop=True)
    )
    assert len(got) == 100

    pre = np.cumsum(wt) - wt
    W = int(wt.sum())
    exp = {}
    for t in range(100):
        u = _md5_low63(f"draw:{t}") % W
        i = int(np.searchsorted(pre, u, side="right")) - 1
        exp[t] = (i, u)
    assert {
        int(t): (int(d), int(u))
        for t, d, u in zip(got["draw_id"], got["doc_id"], got["u"])
    } == exp
    assert 7 not in set(got["doc_id"])
    # the heavy row carries ~90% of the mass → most draws hit it
    assert (got["doc_id"] == 100).sum() > 50


@pytest.mark.usefixtures("ray_session")
def test_twap_evidence_known_series(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-06-01")
    rows = [
        # user 1: values 2.5 (10 s), 1.25 (5 s), 7.0 (last → 0)
        {"event_id": 1, "ts": base, "user_id": 1,
         "event_type": "x", "value": 2.5, "props": "{}"},
        {"event_id": 2, "ts": base + pd.Timedelta(seconds=10),
         "user_id": 1, "event_type": "x", "value": 1.25, "props": "{}"},
        {"event_id": 3, "ts": base + pd.Timedelta(seconds=15),
         "user_id": 1, "event_type": "x", "value": 7.0, "props": "{}"},
        # user 2: sub-second gap floors to 0 seconds
        {"event_id": 4, "ts": base, "user_id": 2,
         "event_type": "x", "value": 9.0, "props": "{}"},
        {"event_id": 5, "ts": base + pd.Timedelta(milliseconds=800),
         "user_id": 2, "event_type": "x", "value": 3.0, "props": "{}"},
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q192_twap_evidence"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    u1 = got.iloc[0]
    assert int(u1["span_s"]) == 15
    assert int(u1["qv_dt"]) == 2500 * 10 + 1250 * 5  # 31250
    u2 = got.iloc[1]
    assert int(u2["span_s"]) == 0
    assert int(u2["qv_dt"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_burst_rate_peers_and_windows(tmp_path):
    """Equal-ts peers count together (RANGE semantics); a cluster of
    events inside 60 s sets the max; isolated events give burst 1."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-07-01")
    rows, eid = [], 0

    def ev(u, seconds):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(seconds=seconds),
             "user_id": u, "event_type": "x", "value": 1.0, "props": "{}"}
        )
        eid += 1

    # user 1: 4 events within one minute, then a lone one far away
    for s in (0, 10, 30, 60):  # 60 is INSIDE the trailing window of 60
        ev(1, s)
    ev(1, 1000)
    # user 2: two events at the SAME timestamp → both see burst 2
    ev(2, 5)
    ev(2, 5)
    # user 3: spaced > 60 s apart → burst 1
    for s in (0, 100, 200):
        ev(3, s)
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q193_burst_rate"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["max_burst"].tolist() == [4, 2, 1]
    assert got["n_events"].tolist() == [5, 2, 3]
