"""Wave-63 operator pins: retention plan, top movers, band
migration."""

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


def _events_on_days(days):
    rows = []
    for i, d in enumerate(days):
        rows.append(
            {"event_id": i, "ts": pd.Timestamp(d) + pd.Timedelta(hours=1),
             "user_id": 1, "event_type": "x", "value": 1.0}
        )
    return pd.DataFrame(rows)


@pytest.mark.usefixtures("ray_session")
def test_retention_policy_priorities(tmp_path):
    """Daily beats weekly beats monthly; Sundays beyond the last 4
    weeks and mid-week old days drop."""
    from basicocr_ray.pipelines.queries import QUERIES

    days = pd.date_range("2024-01-20", "2024-03-05", freq="D")
    _write(tmp_path, "events", _events_on_days(days))
    got = QUERIES["q261_retention_plan"](str(tmp_path))
    got["date"] = pd.to_datetime(got["day"] * 86_400_000_000_000)
    act = got.set_index(got["date"].dt.strftime("%Y-%m-%d"))["action"]
    # last 7 days are daily (incl. Feb 29 month-closer and Mar 3 Sunday)
    for d in ("2024-02-28", "2024-02-29", "2024-03-03", "2024-03-05"):
        assert act[d] == "daily"
    # Sundays in the last 4 ISO weeks but older than 7 days
    assert act["2024-02-25"] == "weekly"
    assert act["2024-02-18"] == "weekly"
    # January's month-closer survives as monthly
    assert act["2024-01-31"] == "monthly"
    # a Sunday beyond the last 4 weeks drops; so does a mid-week day
    assert act["2024-02-04"] == "drop"
    assert act["2024-02-01"] == "drop"


@pytest.mark.usefixtures("ray_session")
def test_topk_movers_dense_grid(tmp_path):
    """Missing calendar days count 0; |delta| ranks with earliest-day
    ties."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-05-01")
    rows = []
    eid = 0
    for day, k in ((0, 1), (1, 5), (3, 2)):   # day 2 missing -> 0
        for _ in range(k):
            rows.append(
                {"event_id": eid, "ts": base + pd.Timedelta(days=day),
                 "user_id": 1, "event_type": "x", "value": 1.0}
            )
            eid += 1
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = QUERIES["q262_topk_movers"](str(tmp_path)).sort_values("day")
    # deltas: d1 +4, d2 -5, d3 +2 -> all three in top-3
    assert got["delta"].tolist() == [4, -5, 2]
    assert got["prev_n"].tolist() == [1, 5, 0]
    assert got["n"].tolist() == [5, 0, 2]


@pytest.mark.usefixtures("ray_session")
def test_band_migration_matrix(tmp_path):
    """Terciles are per-window among active users; inactive windows
    band as -1."""
    from basicocr_ray.pipelines.queries import QUERIES

    d0 = pd.Timestamp("2024-07-01")   # days 0..9 -> split at day 5
    d8 = d0 + pd.Timedelta(days=8)
    d9 = d0 + pd.Timedelta(days=9)
    rows = []
    eid = 0

    def ev(u, ts, v):
        nonlocal eid
        rows.append({"event_id": eid, "ts": ts, "user_id": u,
                     "event_type": "x", "value": v})
        eid += 1

    ev(1, d0, 1.0); ev(1, d8, 3.0)    # w1=100 band0, w2=300 band2
    ev(2, d0, 2.0); ev(2, d8, 2.0)    # w1=200 band1, w2=200 band1
    ev(3, d0, 3.0); ev(3, d8, 1.0)    # w1=300 band2, w2=100 band0
    ev(4, d0, 0.5)                     # w1=50 band0, w2 inactive
    ev(5, d9, 0.0)                     # pins hi=day9 (w2 active, 0c)
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = (
        QUERIES["q263_band_migration"](str(tmp_path))
        .to_pandas().set_index(["band_w1", "band_w2"])["n_users"]
    )
    # w1 active: {50,100,200,300} -> t1=100, t2=200
    # w2 active: {0,100,200,300} -> t1=100, t2=200
    assert got.loc[(0, 2)] == 1      # u1
    assert got.loc[(1, 1)] == 1      # u2
    assert got.loc[(2, 0)] == 1      # u3
    assert got.loc[(0, -1)] == 1     # u4
    assert got.loc[(-1, 0)] == 1     # u5
    assert got.sum() == 5
