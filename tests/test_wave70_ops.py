"""Wave-70 operator pins: local-dominance matching, histogram-descent
global k-th, two-sample KS integer evidence."""

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


def _events(tmp_path, pairs):
    """pairs: list of (user_id, event_type) rows (multiplicity = weight)."""
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(pairs)),
                "user_id": [u for u, _ in pairs],
                "event_type": [t for _, t in pairs],
            }
        ),
    )


@pytest.mark.usefixtures("ray_session")
def test_matching_handshake_and_round2(tmp_path):
    """Round 1 matches only the edge that is best for BOTH endpoints
    (u1-a); u2's tie breaks to type 'a' which prefers u1, so u2 waits
    for round 2 after u1/a leave."""
    from basicocr_ray.pipelines.queries import QUERIES

    pairs = (
        [(1, "a")] * 5 + [(1, "b")] * 3
        + [(2, "a")] * 4 + [(2, "b")] * 4
        + [(3, "b")] * 2
    )
    _events(tmp_path, pairs)
    got = (
        QUERIES["q282_greedy_matching"](str(tmp_path))
        .sort_values("round").reset_index(drop=True)
    )
    assert got.values.tolist() == [[1, "a", 5, 1], [2, "b", 4, 2]]


@pytest.mark.usefixtures("ray_session")
def test_global_kth_descends_and_picks_lower_median(tmp_path):
    """n=4 -> k=2; a 10^6-cent range forces >= 2 histogram descents."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame({"l_extendedprice": [100000.0, 1.0, 3.0, 2.0]}),
    )
    got = QUERIES["q283_global_kth_value"](str(tmp_path))
    assert got.iloc[0].tolist() == [4, 2, 200]


@pytest.mark.usefixtures("ray_session")
def test_ks_numerator_exact(tmp_path):
    """a: {1,2,3}, b: {2,3,4} -> max |cum1*n2 - cum2*n1| = 3 (D=1/3)."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0)]
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "user_id": [1] * len(rows),
                "event_type": [t for t, _ in rows],
                "value": [v for _, v in rows],
            }
        ),
    )
    got = QUERIES["q284_ks_statistic"](str(tmp_path))
    r = got.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n1"], r["n2"], r["d_num"]) == (3, 3, 3)
