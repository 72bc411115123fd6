"""Wave-50 operator pins: FD discovery, join-stat moments, JSON
profiling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_fd_discovery_planted(tmp_path):
    """A planted FD (source → lang) holds; its reverse fails with the
    exact violation count."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    # source determines lang; lang does NOT determine source
    plan = [("s1", "en"), ("s2", "en"), ("s3", "de")]
    did = 0
    for s, l in plan:
        for k in range(5):
            rows.append((did, "t", l, s, 100 + 100 * (did % 2)))
            did += 1
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    res = QUERIES["q222_fd_discovery"](str(tmp_path))
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
    gm = {
        (a, b): (int(h), int(v))
        for a, b, h, v in zip(
            got["lhs"], got["rhs"], got["fd_holds"], got["violations"]
        )
    }
    assert gm[("source", "lang")] == (1, 0)       # planted FD holds
    # lang 'en' maps to two sources → 1 extra pair
    assert gm[("lang", "source")] == (0, 1)
    assert len(gm) == 6


@pytest.mark.usefixtures("ray_session")
def test_join_stats_moments_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    okeys = [1, 2, 2, 3]
    lkeys = [1, 1, 2, 9, 9, 9]
    orders = pd.DataFrame(
        {
            "o_orderkey": okeys, "o_custkey": 1, "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1",
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": lkeys, "l_partkey": 1, "l_suppkey": 1,
            "l_linenumber": range(len(lkeys)), "l_quantity": 1.0,
            "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0,
            "l_returnflag": "N", "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(lineitem, preserve_index=False),
                   str(tmp_path / "lineitem.parquet"))
    got = (
        QUERIES["q223_join_stats_moments"](str(tmp_path))
        .to_pandas().set_index("side")
    )
    # orders: counts {1:1, 2:2, 3:1} → F0 3, F1 4, F2 1+4+1=6
    assert got.loc["orders"].tolist() == [3, 4, 6]
    # lineitem: {1:2, 2:1, 9:3} → F0 3, F1 6, F2 4+1+9=14
    assert got.loc["lineitem"].tolist() == [3, 6, 14]
    # cross: keys 1 (1·2) + 2 (2·1) → f0 2 matched keys, f2 = 4
    assert got.loc["cross"].tolist() == [2, 0, 4]


@pytest.mark.usefixtures("ray_session")
def test_json_profile_mixed_types(tmp_path):
    """Ints count and sum; strings/floats/bools/nulls are present but
    not integer-typed; malformed JSON rows are skipped."""
    from basicocr_ray.pipelines.queries import QUERIES

    props = [
        '{"k": 87, "s": "x"}',
        '{"k": -3, "f": 1.5}',
        '{"k": 0, "b": true}',
        '{"s": "y"}',
        "not json at all",
        None,
    ]
    rows = [
        {"event_id": i, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "x", "value": 1.0, "props": p}
        for i, p in enumerate(props)
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q224_json_profile"](str(tmp_path))
        .to_pandas().set_index("key")
    )
    assert got.loc["k"].tolist() == [3, 3, 84]   # 87 - 3 + 0
    assert got.loc["s"].tolist() == [2, 0, 0]
    assert got.loc["f"].tolist() == [1, 0, 0]
    assert got.loc["b"].tolist() == [1, 0, 0]    # bool is NOT an int
