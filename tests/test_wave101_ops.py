"""Wave-101 operator pins: Lindley queue, Kadane, onion layers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["props"] = "{}"
    tab = pa.Table.from_pandas(df, preserve_index=False)
    tab = tab.set_column(
        tab.schema.get_field_index("ts"), "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_fifo_queue_waits(tmp_path):
    """Service 90s. Arrivals at 0s, 30s, 200s:
    job1 wait 0 (busy until 90); job2 waits 90-30=60s; finishes 180;
    job3 at 200 waits 0."""
    from basicocr_ray.pipelines.queries import QUERIES

    M = 1_000_000
    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 30 * M, 1, "view", 1.0),
        (2, 200 * M, 1, "view", 1.0),
    ]
    _events(tmp_path, rows)
    got = QUERIES["q369_fifo_queue_wait"](str(tmp_path))
    assert got.values.tolist() == [[1, 3, 60 * M, 60 * M]]


@pytest.mark.usefixtures("ray_session")
def test_kadane_negative_and_burst(tmp_path):
    """Series (cents-100): [-50, +200, -30, +100, -500, +10]:
    best = 200-30+100 = 270; all-negative user -> best single."""
    from basicocr_ray.pipelines.queries import QUERIES

    vals1 = [0.50, 3.00, 0.70, 2.00, -4.00, 1.10]
    rows = [
        (i, i * 1000, 1, "view", v) for i, v in enumerate(vals1)
    ]
    rows += [
        (10 + i, i * 1000, 2, "view", v)
        for i, v in enumerate([0.10, 0.20])  # -90, -80
    ]
    _events(tmp_path, rows)
    got = (
        QUERIES["q370_max_subarray"](str(tmp_path))
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["max_subarray"].tolist() == [270, -80]


@pytest.mark.usefixtures("ray_session")
def test_onion_layers_peeling(tmp_path):
    """Points (per user u, sum cents s, count n): construct three
    nested dominance shells; only universe-sampled users count, so use
    user ids whose md5 starts with 0-3."""
    import hashlib

    from basicocr_ray.pipelines.queries import QUERIES

    # find user ids in the sampled universe
    uids = [
        u for u in range(1, 400)
        if hashlib.md5(str(u).encode()).hexdigest()[0] in "0123"
    ][:4]
    # u0: (300,3) dominates u1: (200,2) dominates u2: (100,1); u3 (90,1)
    plan = {
        uids[0]: [1.0, 1.0, 1.0],       # 300 cents, 3 events
        uids[1]: [1.0, 1.0],            # 200, 2
        uids[2]: [1.0],                 # 100, 1
        uids[3]: [0.90],                # 90, 1
    }
    rows = []
    eid = 0
    for u, vals in plan.items():
        for v in vals:
            rows.append((eid, eid * 1000, u, "view", v))
            eid += 1
    _events(tmp_path, rows)
    got = QUERIES["q371_onion_layers"](str(tmp_path)).set_index("user_id")
    assert got.loc[uids[0], "layer"] == 1
    assert got.loc[uids[1], "layer"] == 2
    assert got.loc[uids[2], "layer"] == 3
    assert got.loc[uids[3], "layer"] == 0  # peeled past 3 layers
