"""Wave-58 operator pins: promo revenue share (Q14), slow-order
priority audit (Q4 EXISTS), supplier diversity (Q16 distinct-count)."""

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
def test_promo_share_months_and_floor(tmp_path):
    """Promo cents only count PROMO-type parts; cents are floored
    AFTER the discount multiply; months separate."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "part", pd.DataFrame(
        {"p_partkey": [1, 2], "p_type": ["PROMO", "LARGE"]}
    ))
    _write(tmp_path, "lineitem", pd.DataFrame(
        {
            "l_partkey": [1, 2, 1],
            "l_shipdate": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-02-01"]
            ),
            # 10.555 * (1-0.1) * 100 = 949.95 -> floor 949
            "l_extendedprice": [10.555, 20.0, 5.0],
            "l_discount": [0.1, 0.0, 0.0],
        }
    ))
    got = (
        QUERIES["q246_promo_revenue_share"](str(tmp_path))
        .to_pandas().set_index("ship_month").sort_index()
    )
    assert got.loc[202401].tolist() == [949, 949 + 2000, 2]
    assert got.loc[202402].tolist() == [500, 500, 1]


@pytest.mark.usefixtures("ray_session")
def test_slow_orders_strict_90_day_boundary(tmp_path):
    """EXISTS semantics: one qualifying line is enough, a line shipped
    EXACTLY 90 days after the order date does not qualify (strict >),
    and orders count once no matter how many slow lines."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "orders", pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
            "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
        }
    ))
    _write(tmp_path, "lineitem", pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_shipdate": pd.to_datetime(
                # order 1: two slow lines (counts once); order 2:
                # exactly +90d (NOT slow); order 3: +91d (slow)
                ["2024-04-15", "2024-05-01", "2024-03-31", "2024-04-01"]
            ),
        }
    ))
    got = (
        QUERIES["q247_slow_orders"](str(tmp_path))
        .to_pandas().set_index("o_orderpriority")
    )
    assert got.loc["1-URGENT"].tolist() == [1, 1]
    assert got.loc["5-LOW"].tolist() == [1, 3]
    assert "2-HIGH" not in got.index


@pytest.mark.usefixtures("ray_session")
def test_supplier_diversity_excludes_and_dedups(tmp_path):
    """Credit-watch suppliers (acctbal < 1000) are excluded; repeated
    (part, supplier) lines count the supplier once."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "part", pd.DataFrame(
        {"p_partkey": [1, 2], "p_brand": ["B1", "B1"], "p_size": [5, 9]}
    ))
    _write(tmp_path, "supplier", pd.DataFrame(
        {"s_suppkey": [10, 11, 12], "s_acctbal": [5000.0, 999.99, 2000.0]}
    ))
    _write(tmp_path, "lineitem", pd.DataFrame(
        {
            "l_partkey": [1, 1, 1, 1, 2],
            "l_suppkey": [10, 10, 11, 12, 10],  # 11 excluded, 10 dup
        }
    ))
    got = (
        QUERIES["q248_supplier_diversity"](str(tmp_path))
        .to_pandas().set_index(["p_brand", "p_size"])["n_supp"]
    )
    assert got.loc[("B1", 5)] == 2   # suppliers 10, 12
    assert got.loc[("B1", 9)] == 1   # supplier 10
