"""Wave-96 operator pins: range-frame window, rank/select, galloping
intersection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


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
def test_range_frame_includes_boundary_and_peers(tmp_path):
    """Events at 0, exactly 30min, 30min+1us; tied pair at 60min."""
    from basicocr_ray.pipelines.queries import QUERIES

    M = 60_000_000
    rows = [
        (0, 0, 1, "view", 1.00),
        (1, 30 * M, 1, "view", 1.00),          # exactly -30min: in
        (2, 30 * M + 1, 1, "view", 1.00),      # event 0 now out
        (3, 60 * M, 1, "view", 1.00),          # tied pair: peers
        (4, 60 * M, 1, "view", 1.00),
    ]
    _events(tmp_path, rows)
    got = (
        QUERIES["q354_range_frame_sum"](str(tmp_path))
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # events 3,4 frame = [30min, 60min]: events 1,2,3,4 (not 0)
    assert got["n_window"].tolist() == [1, 2, 2, 4, 4]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=300))
def test_rank_select_fuzz(bits):
    from basicocr_ray.pipelines.queries import RankSelectBitvector

    bv = RankSelectBitvector(np.array(bits, dtype=bool))
    pref = np.concatenate([[0], np.cumsum(np.array(bits, dtype=int))])
    for i in range(0, len(bits) + 1, 7):
        assert bv.rank1(i) == pref[i]
    ones = [i for i, b in enumerate(bits) if b]
    for k in (1, 2, len(ones), len(ones) + 1):
        exp = ones[k - 1] if 1 <= k <= len(ones) else -1
        assert bv.select1(k) == exp


def test_galloping_matches_set_intersection():
    """Exercise the galloping path directly via the query kernel shape:
    asymmetric lists with runs."""
    from bisect import bisect_left

    a = [5, 100, 101, 4000]
    b = sorted(set(range(0, 5000, 3)))

    hits = []
    lo = 0
    for x in a:
        step = 1
        hi = lo
        while hi < len(b) and b[hi] < x:
            lo = hi
            hi = min(hi + step, len(b))
            step *= 2
        j = bisect_left(b, x, lo, min(hi + 1, len(b)))
        if j < len(b) and b[j] == x:
            hits.append(x)
        lo = j
    assert hits == sorted(set(a) & set(b))
