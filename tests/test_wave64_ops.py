"""Wave-64 operator pins: trade flows, brand profit top-k, domestic
share."""

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


def _dims(tmp_path):
    _write(tmp_path, "nation", pd.DataFrame(
        {"n_nationkey": [0, 1, 2], "n_name": ["AAA", "BBB", "CCC"],
         "n_regionkey": [0, 0, 1]}))
    _write(tmp_path, "region", pd.DataFrame(
        {"r_regionkey": [0, 1], "r_name": ["WEST", "EAST"]}))
    _write(tmp_path, "customer", pd.DataFrame(
        {"c_custkey": [10, 11, 12], "c_nationkey": [0, 1, 2]}))
    _write(tmp_path, "supplier", pd.DataFrame(
        {"s_suppkey": [5, 6], "s_nationkey": [0, 1]}))


@pytest.mark.usefixtures("ray_session")
def test_trade_flows_cross_border_only(tmp_path):
    """Domestic lines drop; cross-border pairs keep exact cents per
    ship year."""
    from basicocr_ray.pipelines.queries import QUERIES

    _dims(tmp_path)
    d = pd.Timestamp("1996-03-01")
    _write(tmp_path, "orders", pd.DataFrame(
        {"o_orderkey": [100, 101], "o_custkey": [10, 11],
         "o_orderdate": [d, d]}))
    # order 100 (cust nation 0): supp 5 (nation 0, domestic -> drop),
    # supp 6 (nation 1 -> AAA<-BBB). order 101 (cust nation 1): supp 5
    # (nation 0 -> BBB<-AAA) twice across two years.
    _write(tmp_path, "lineitem", pd.DataFrame(
        {"l_orderkey": [100, 100, 101, 101],
         "l_suppkey": [5, 6, 5, 5],
         "l_shipdate": [d, d, d, pd.Timestamp("1997-05-01")],
         "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
         "l_discount": [0.0, 0.5, 0.0, 0.25]}))
    got = (
        QUERIES["q264_trade_flows"](str(tmp_path)).to_pandas()
        .set_index(["cust_nation", "supp_nation", "ship_year"])
    )
    assert len(got) == 3
    assert got.loc[("AAA", "BBB", 1996), "revenue_cents"] == 1000
    assert got.loc[("BBB", "AAA", 1996), "revenue_cents"] == 3000
    assert got.loc[("BBB", "AAA", 1997), "revenue_cents"] == 3000
    assert got["n_lines"].sum() == 3


@pytest.mark.usefixtures("ray_session")
def test_brand_profit_topk_and_name_filter(tmp_path):
    """Non-widget parts are excluded; top-3 per brand, profit ties
    break to the lower partkey."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "part", pd.DataFrame(
        {"p_partkey": [1, 2, 3, 4, 5],
         "p_name": ["big widget", "small widget", "odd widget",
                    "tiny widget", "red bolt"],
         "p_brand": ["B1", "B1", "B1", "B1", "B1"],
         "p_retailprice": [1.0, 1.0, 1.0, 1.0, 1.0]}))
    # profit per line = rev_cents - 100 * qty
    _write(tmp_path, "lineitem", pd.DataFrame(
        {"l_partkey": [1, 2, 3, 4, 5],
         "l_quantity": [1.0, 1.0, 1.0, 1.0, 1.0],
         "l_extendedprice": [9.0, 5.0, 5.0, 2.0, 99.0],
         "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0]}))
    got = QUERIES["q265_brand_profit_topk"](str(tmp_path)).to_pandas()
    got = got.sort_values("rnk").reset_index(drop=True)
    # profits: p1=800, p2=400, p3=400, p4=100; bolt p5 excluded
    assert got["p_partkey"].tolist() == [1, 2, 3]
    assert got["profit_cents"].tolist() == [800, 400, 400]
    assert got["rnk"].tolist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_domestic_share_by_region_year(tmp_path):
    """Same-nation supplier cents land in domestic_cents; regions roll
    up through the customer's nation."""
    from basicocr_ray.pipelines.queries import QUERIES

    _dims(tmp_path)
    _write(tmp_path, "orders", pd.DataFrame(
        {"o_orderkey": [100, 101, 102],
         "o_custkey": [10, 11, 12],
         "o_orderdate": [pd.Timestamp("1996-03-01"),
                         pd.Timestamp("1996-07-01"),
                         pd.Timestamp("1997-01-01")]}))
    d = pd.Timestamp("1996-03-05")
    # cust 10 (nation 0 / WEST): supp 5 domestic, supp 6 foreign
    # cust 11 (nation 1 / WEST): supp 6 domestic
    # cust 12 (nation 2 / EAST): supp 5 foreign
    _write(tmp_path, "lineitem", pd.DataFrame(
        {"l_orderkey": [100, 100, 101, 102],
         "l_suppkey": [5, 6, 6, 5],
         "l_shipdate": [d, d, d, d],
         "l_extendedprice": [10.0, 20.0, 40.0, 80.0],
         "l_discount": [0.0, 0.0, 0.0, 0.0]}))
    got = (
        QUERIES["q266_domestic_share"](str(tmp_path)).to_pandas()
        .set_index(["r_name", "order_year"])
    )
    assert got.loc[("WEST", 1996), "domestic_cents"] == 1000 + 4000
    assert got.loc[("WEST", 1996), "total_cents"] == 7000
    assert got.loc[("EAST", 1997), "domestic_cents"] == 0
    assert got.loc[("EAST", 1997), "total_cents"] == 8000
    assert got["n_lines"].sum() == 4
