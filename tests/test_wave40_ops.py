"""Wave-40 operator pins: Benford digit audit, k-anonymity histogram,
exact join-size statistic."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_benford_digits_vs_brute(tmp_path):
    """Digit extraction on decade boundaries, sub-0.01 values (dropped),
    and negatives (dropped) matches the integer-division rebuild."""
    from basicocr_ray.pipelines.queries import QUERIES

    vals = [10.0, 9.99, 0.004, 0.01, 1.0, 99.99, 100.0, 560.21, 0.0,
            -5.0, 3.3, 7.7, 7.7]
    rows = [
        {"event_id": i, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
         "event_type": "a" if i % 2 == 0 else "b", "value": v,
         "props": "{}"}
        for i, v in enumerate(vals)
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q194_benford_audit"](str(tmp_path)).to_pandas()
    gm = {
        (t, int(d)): int(n)
        for t, d, n in zip(got["event_type"], got["digit"], got["n"])
    }

    exp: Counter = Counter()
    for i, v in enumerate(vals):
        x = int(np.floor(v * 100))
        if x <= 0:
            continue
        while x >= 10:
            x //= 10
        exp[("a" if i % 2 == 0 else "b", x)] += 1
    assert gm == dict(exp)
    # decade boundary: 10.0 → iv 1000 → digit 1; 9.99 → 999 → digit 9
    assert gm[("a", 1)] >= 1
    assert exp[("b", 9)] == gm[("b", 9)]


@pytest.mark.usefixtures("ray_session")
def test_k_anonymity_histogram(tmp_path):
    """Classes of size 1 (a singleton that k-anonymity must flag), 3,
    and 5 produce exactly the expected histogram."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    did = 0

    def add(lang, source, n_chars, times):
        nonlocal did
        for _ in range(times):
            rows.append((did, "t", lang, source, n_chars))
            did += 1

    add("en", "s1", 150, 5)   # class (en, s1, 1) size 5
    add("en", "s1", 250, 3)   # class (en, s1, 2) size 3
    add("de", "s2", 50, 1)    # singleton → k = 1
    add("de", "s2", 199, 3)   # class (de, s2, 1) size 3
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q195_k_anonymity"](str(tmp_path))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert dict(zip(got["k"], got["n_classes"])) == {1: 1, 3: 2, 5: 1}


@pytest.mark.usefixtures("ray_session")
def test_join_size_exact_vs_brute(tmp_path):
    """Join cardinality with known per-key fanouts, keys on one side
    only (excluded), and the max-fanout hot key."""
    from basicocr_ray.pipelines.queries import QUERIES

    # orders: key 1 ×1, key 2 ×2, key 3 ×1, key 9 ×1 (no lineitem)
    okeys = [1, 2, 2, 3, 9]
    orders = pd.DataFrame(
        {
            "o_orderkey": okeys,
            "o_custkey": [1] * len(okeys),
            "o_orderstatus": ["O"] * len(okeys),
            "o_totalprice": [1.0] * len(okeys),
            "o_orderdate": [pd.Timestamp("2024-01-01")] * len(okeys),
            "o_orderpriority": ["1-URGENT"] * len(okeys),
        }
    )
    # lineitem: key 1 ×3, key 2 ×4, key 7 ×2 (no order)
    lkeys = [1, 1, 1, 2, 2, 2, 2, 7, 7]
    lineitem = pd.DataFrame(
        {
            "l_orderkey": lkeys,
            "l_partkey": [1] * len(lkeys),
            "l_suppkey": [1] * len(lkeys),
            "l_linenumber": range(len(lkeys)),
            "l_quantity": [1.0] * len(lkeys),
            "l_extendedprice": [1.0] * len(lkeys),
            "l_discount": [0.0] * len(lkeys),
            "l_tax": [0.0] * len(lkeys),
            "l_returnflag": ["N"] * len(lkeys),
            "l_linestatus": ["O"] * len(lkeys),
            "l_shipdate": [pd.Timestamp("2024-01-01")] * len(lkeys),
        }
    )
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(lineitem, preserve_index=False),
                   str(tmp_path / "lineitem.parquet"))
    got = QUERIES["q196_join_size_exact"](str(tmp_path)).to_pandas()
    # matched keys: 1 (1×3=3), 2 (2×4=8); keys 3, 9, 7 excluded
    assert int(got["n_keys"].iloc[0]) == 2
    assert int(got["join_rows"].iloc[0]) == 11
    assert int(got["max_key_fanout"].iloc[0]) == 8
