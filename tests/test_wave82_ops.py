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




