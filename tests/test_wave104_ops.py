"""Wave-104 operator pins: alias table, grid neighbors, interval pack."""

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
def test_alias_table_reconstructs_weights(tmp_path):
    """counts click=6, view=2, error=1 (K=3, total=9): slot thresholds
    + alias inflow reconstruct each type's K*w exactly."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    eid = 0
    for et, n in [("click", 6), ("view", 2), ("error", 1)]:
        for _ in range(n):
            rows.append((eid, eid * 1000, 1, et, 1.0))
            eid += 1
    _events(tmp_path, rows)
    got = QUERIES["q378_alias_table"](str(tmp_path))
    total = 9
    K = 3
    w = {"click": 6, "view": 2, "error": 1}
    # reconstruction: own threshold + sum over other slots of
    # (total - threshold) where alias == me
    recon = {}
    for _, r in got.iterrows():
        recon[r["slot"]] = recon.get(r["slot"], 0) + int(r["threshold"])
        if r["alias"] != r["slot"]:
            recon[r["alias"]] = (
                recon.get(r["alias"], 0) + total - int(r["threshold"])
            )
    assert recon == {t: K * v for t, v in w.items()}
    # every slot's threshold is within [0, total]
    assert ((got["threshold"] >= 0) & (got["threshold"] <= total)).all()


@pytest.mark.usefixtures("ray_session")
def test_interval_pack_merges_and_breaks(tmp_path):
    """Same-type events 5min apart merge (10min slices overlap);
    a type change or an 11-minute gap breaks the island."""
    from basicocr_ray.pipelines.queries import QUERIES

    M = 60_000_000
    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 5 * M, 1, "view", 1.0),     # overlap: merge
        (2, 12 * M, 1, "view", 1.0),    # within 10 of prev(5): merge
        (3, 23 * M, 1, "view", 1.0),    # gap 11 min: new island
        (4, 24 * M, 1, "click", 1.0),   # type change: new island
    ]
    _events(tmp_path, rows)
    got = (
        QUERIES["q380_interval_pack"](str(tmp_path))
        .sort_values("start_us")
        .reset_index(drop=True)
    )
    assert got["n_slices"].tolist() == [3, 1, 1]
    assert got["start_us"].tolist() == [0, 23 * M, 24 * M]
    assert got["end_us"].tolist() == [22 * M, 33 * M, 34 * M]
    assert got["event_type"].tolist() == ["view", "view", "click"]


def test_grid_neighbor_ownership_no_double_count():
    """Two points straddling a cell boundary within R count each other
    exactly once each."""
    from collections import defaultdict

    R, CELL = 2000, 2048
    rows = [(1, 2047, 0), (2, 2049, 0)]  # adjacent cells, distance 2
    cells = defaultdict(list)
    for u, x, y in rows:
        cells[(x // CELL, y // CELL)].append((u, x, y))
    counts = {}
    for u, x, y in rows:
        cx, cy = x // CELL, y // CELL
        c = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for v, px, py in cells.get((cx + dx, cy + dy), ()):
                    if v != u and abs(px - x) <= R and abs(py - y) <= R:
                        c += 1
        counts[u] = c
    assert counts == {1: 1, 2: 1}
