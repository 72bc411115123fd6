"""Wave-82 operator pins: universe sampling, isotonic PAVA, butterflies."""

from __future__ import annotations

import hashlib

import duckdb
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
        tab.schema.get_field_index("ts"),
        "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_universe_sample_join_preservation(tmp_path):
    """Sampled-side join equals join-then-sample: every surviving
    lineitem's order is in the sampled universe by construction."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 400
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, n + 1),
            "o_orderstatus": ["O" if k % 2 else "F" for k in range(1, n + 1)],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(1, n + 1)) * 2,
            "l_extendedprice": [10.0] * (2 * n),
            "l_discount": [0.5] * (2 * n),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(orders, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(li, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    got = QUERIES["q315_universe_sample"](str(tmp_path))
    in_uni = [
        k
        for k in range(1, n + 1)
        if hashlib.md5(str(k).encode()).hexdigest()[0] == "0"
    ]
    exp = pd.DataFrame(
        {
            "status": ["F", "O"],
            "n_lineitems": [
                2 * sum(1 for k in in_uni if k % 2 == 0),
                2 * sum(1 for k in in_uni if k % 2 == 1),
            ],
        }
    )
    got = got.sort_values("status").reset_index(drop=True)
    assert got["n_lineitems"].tolist() == exp["n_lineitems"].tolist()
    # 1000 cents * 50 pct-units = 50000 units = 5.0 currency per item
    assert got["revenue"].tolist() == [
        round(5.0 * v, 2) for v in got["n_lineitems"]
    ]


@pytest.mark.usefixtures("ray_session")
def test_isotonic_pava_merges_violators(tmp_path):
    """Rates by hour [1.0, 0.0, 0.5] (violating) -> PAVA pools all
    three into 0.5 when counts are equal; a rising tail stays apart."""
    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    rows = []
    eid = 0

    def add(hour, vals):
        nonlocal eid
        for v in vals:
            rows.append((eid, hour * 3_600_000_000, eid % 7, "view", v))
            eid += 1

    add(0, [100.0, 100.0])   # rate 1.0
    add(1, [1.0, 1.0])       # rate 0.0
    add(2, [100.0, 1.0])     # rate 0.5
    add(3, [100.0, 100.0])   # rate 1.0 (stays its own pool)
    _events(tmp_path, rows)
    got = (
        QUERIES["q316_isotonic_calibration"](str(tmp_path))
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert got["fit"].tolist() == [0.5, 0.5, 0.5, 1.0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "events.parquet")
    )
    exp = (
        con.execute(ORACLE_SQL["q316_isotonic_calibration"])
        .df()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert got["fit"].tolist() == exp["fit"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_butterfly_count_matches_brute_force(tmp_path):
    """3 users share {click,view} -> C(3,2)=3 butterflies; a pair seen
    by one user only has 0."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for t in ("click", "view", "view"):  # dup edge must not double
            rows.append((eid, eid, u, t, 1.0))
            eid += 1
    rows.append((eid, eid, 1, "error", 1.0))
    _events(tmp_path, rows)
    got = QUERIES["q317_butterfly_count"](str(tmp_path))
    got = got.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    assert got.values.tolist() == [
        ["click", "error", 1, 0],
        ["click", "view", 3, 3],
        ["error", "view", 1, 0],
    ]
