"""Wave-43 operator pins: OHLC candles, politeness scheduling via the
prefix-max identity, dyadic-kernel smoothing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_ohlc_candles_cross_batch(tmp_path):
    """Open/close resolve by (ts, event_id) even with equal timestamps;
    candles spanning partition boundaries fold exactly."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    rows = []

    def ev(eid, minutes, v, et="a"):
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(minutes=minutes),
             "user_id": 1, "event_type": et, "value": v, "props": "{}"}
        )

    # bucket 0 (0..4 h): open tie at t=0 → event_id 1 wins; close at
    # t=230; high/low inside
    ev(2, 0, 5.0)
    ev(1, 0, 3.0)     # same ts, lower id → the true open
    ev(3, 60, 9.5)
    ev(4, 120, 0.5)
    ev(5, 230, 4.25)
    # bucket 1 (4..8 h): single event
    ev(6, 300, 7.0)
    # second type in bucket 0
    ev(7, 10, 2.0, et="b")
    _write_events(tmp_path, rows)
    got = (
        QUERIES["q201_ohlc_candles"](str(tmp_path))
        .to_pandas().sort_values(["event_type", "bucket"])
        .reset_index(drop=True)
    )
    buck0 = int(base.value // 1000)  # epoch us of the aligned base
    a0 = got[(got["event_type"] == "a") & (got["bucket"] == buck0)].iloc[0]
    assert a0["open"] == 3.0 and a0["close"] == 4.25
    assert a0["high"] == 9.5 and a0["low"] == 0.5 and a0["n"] == 5
    a1 = got[(got["event_type"] == "a")
             & (got["bucket"] == buck0 + 4 * 3_600_000_000)].iloc[0]
    assert a1["open"] == a1["close"] == 7.0 and a1["n"] == 1
    b0 = got[got["event_type"] == "b"].iloc[0]
    assert b0["open"] == b0["close"] == 2.0


@pytest.mark.usefixtures("ray_session")
def test_politeness_prefix_max_equals_recurrence(tmp_path):
    """The window identity reproduces the sequential recurrence
    t_i = max(arrival_i, t_{i-1} + gap) on bursty arrivals."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    # two hosts (users 0 and 32 share host 0; user 1 is host 1)
    arrivals = {
        0: [0, 0, 0, 1, 10, 10],        # burst at t=0 → queueing
        32: [2],                          # same host 0, arrives mid-queue
        1: [0, 5],                        # host 1, no contention
    }
    for u, secs in arrivals.items():
        for s in secs:
            rows.append(
                {"event_id": eid, "ts": base + pd.Timedelta(seconds=s),
                 "user_id": u, "event_type": "x", "value": 1.0,
                 "props": "{}"}
            )
            eid += 1
    _write_events(tmp_path, rows)
    got = (
        QUERIES["q202_politeness_schedule"](str(tmp_path))
        .to_pandas().sort_values(["host", "fetch_us", "event_id"])
        .reset_index(drop=True)
    )

    # brute recurrence per host
    ev = pd.DataFrame(rows)
    ev["host"] = ev["user_id"] % 32
    ev["arr"] = ev["ts"].astype("datetime64[us]").astype("int64")
    exp = {}
    for h, g in ev.groupby("host"):
        g = g.sort_values(["arr", "event_id"])
        t = None
        for _, r in g.iterrows():
            t = max(int(r["arr"]), (t + 2_000_000) if t is not None
                    else int(r["arr"]))
            exp[int(r["event_id"])] = t
    for _, r in got.iterrows():
        assert int(r["fetch_us"]) == exp[int(r["event_id"])], r["event_id"]
    # the burst actually queued: delays are 0, 2, 4, ... on host 0
    h0 = got[got["host"] == 0]
    assert int(h0["delay_s"].max()) >= 4


@pytest.mark.usefixtures("ray_session")
def test_smoothed_series_boundaries(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    vals = [1.0, 10.0, 100.0, 1000.0]
    rows = [
        {"event_id": i, "ts": base + pd.Timedelta(minutes=i),
         "user_id": 1, "event_type": "x", "value": v, "props": "{}"}
        for i, v in enumerate(vals)
    ]
    rows.append(
        {"event_id": 99, "ts": base, "user_id": 2, "event_type": "x",
         "value": 7.0, "props": "{}"}
    )
    _write_events(tmp_path, rows)
    got = (
        QUERIES["q203_smoothed_series"](str(tmp_path))
        .to_pandas().sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # reflect-pad: first row uses itself as prev, last as next
    exp = [
        (1.0 + 2 * 1.0) + 10.0,
        (1.0 + 2 * 10.0) + 100.0,
        (10.0 + 2 * 100.0) + 1000.0,
        (100.0 + 2 * 1000.0) + 1000.0,
        (7.0 + 2 * 7.0) + 7.0,  # singleton series
    ]
    assert got["smooth4"].tolist() == exp
