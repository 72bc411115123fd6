"""Wave-79 operator pins: dense-grid peaks, dow profile, Lorenz points."""

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
def test_peaks_dense_grid_and_prominence(tmp_path):
    """Counts per day 1,5,1 on days 0,1,2 with day 3 missing then day
    4 has 1: peak at day 1 (5 vs 1/1, prom 4); the missing day-3 zero
    makes day 4 NOT a peak (1 vs 0/edge). A prom-1 bump (2 vs 1/1) is
    rejected."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-04")  # a Monday
    rows = []
    eid = 0

    def day(d, n, t="a"):
        nonlocal eid
        for _ in range(n):
            rows.append(
                {"event_id": eid, "user_id": 1, "event_type": t,
                 "ts": base + pd.Timedelta(days=d)}
            )
            eid += 1

    day(0, 1), day(1, 5), day(2, 1), day(4, 1)
    # type b: 1,2,1 -> prominence 1, rejected
    day(0, 1, "b"), day(1, 2, "b"), day(2, 1, "b")
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = (
        QUERIES["q306_peak_detection"](str(tmp_path)).to_pandas()
        .set_index("event_type")
    )
    assert got.loc["a"].tolist() == [5, 1]   # days 0..4 dense
    assert got.loc["b"].tolist() == [3, 0]


@pytest.mark.usefixtures("ray_session")
def test_dow_monday_maps_to_one(tmp_path):
    """(epoch_day + 4) % 7 puts Thursday at 4, i.e. 0=Sunday:
    2024-03-04 (Monday) -> 1; +5 days (Saturday) -> 6."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-04")
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": [0, 1, 2],
                "user_id": [1] * 3,
                "event_type": ["a", "a", "a"],
                "ts": [base, base + pd.Timedelta(days=5), base],
            }
        ),
    )
    got = QUERIES["q307_dow_profile"](str(tmp_path)).to_pandas()
    d = dict(zip(got["dow"], got["n"]))
    assert d == {1: 2, 6: 1}


@pytest.mark.usefixtures("ray_session")
def test_lorenz_cumulative_and_tiles(tmp_path):
    """12 users spending 1..12 -> first two deciles get 2 users each
    (n=12, k=10); cum_cents is monotone and ends at the total."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    for u in range(1, 13):
        rows.append(
            {"event_id": u, "user_id": u, "event_type": "x",
             "value": float(u)}
        )
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = (
        QUERIES["q308_lorenz_points"](str(tmp_path))
        .sort_values("decile").reset_index(drop=True)
    )
    assert got["n_users"].tolist() == [2, 2] + [1] * 8
    # decile 1 = users spending 1,2 -> 300 cents
    assert got["cents"].tolist() == [300, 700] + [
        (u) * 100 for u in range(5, 13)
    ]
    assert got["cum_cents"].iloc[-1] == sum(u * 100 for u in range(1, 13))
    assert got["cum_cents"].is_monotonic_increasing
