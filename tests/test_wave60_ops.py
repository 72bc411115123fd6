"""Wave-60 operator pins: RFM segmentation, neighborhood purity@10,
DQ constraint suite."""

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
def test_rfm_tercile_buckets(tmp_path):
    """Three customers spanning the tercile boundaries land in three
    distinct cells; thresholds are ceil(n/3)/ceil(2n/3) order stats
    with <= bucketing."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "orders", pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5, 6],
            "o_custkey": [1, 1, 1, 2, 2, 3],
            "o_orderdate": pd.to_datetime(
                ["2024-01-09", "2024-01-10", "2024-01-11",
                 "2024-01-05", "2024-01-06", "2024-01-01"]
            ),
            "o_totalprice": [10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
        }
    ))
    # R: cust1=0, cust2=5, cust3=10 -> t1=0, t2=5 -> segs 0/1/2
    # F: cust1=3, cust2=2, cust3=1 -> t1=1, t2=2 -> segs 2/1/0
    # M: cust1=3000, cust2=2000, cust3=1000   -> segs 2/1/0
    got = (
        QUERIES["q252_rfm_segments"](str(tmp_path))
        .to_pandas()
        .set_index(["r_seg", "f_seg", "m_seg"])["n_customers"]
    )
    assert got.loc[(0, 2, 2)] == 1
    assert got.loc[(1, 1, 1)] == 1
    assert got.loc[(2, 0, 0)] == 1
    assert got.sum() == 3


@pytest.mark.usefixtures("ray_session")
def test_neighborhood_purity_counts_and_k_used(tmp_path):
    """Purity counts label matches among the (here <10) neighbors;
    k_used reports the actual neighborhood size."""
    from basicocr_ray.pipelines.queries import QUERIES

    tab = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.9, 0.0], [0.8, 0.0], [0.7, 0.0]],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([1, 1, 2, 1], pa.int32()),
        }
    )
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    got = (
        QUERIES["q253_neighborhood_purity"](str(tmp_path))
        .to_pandas().set_index("query_id")
    )
    assert got.loc[0]["n_same_label"] == 2   # vecs 1 and 3 share label 1
    assert got.loc[0]["k_used"] == 3


@pytest.mark.usefixtures("ray_session")
def test_dq_suite_planted_violations(tmp_path):
    """Each rule reports its planted offender with the earliest id;
    uniqueness counts every row of a duplicated key."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 4],          # dup id 4 (2 rows)
            "ts": [base] * 5,
            "user_id": [1] * 5,
            "event_type": ["click", "weird", "view", "view", "view"],
            "value": [1.0, 301.0, 2.0, 3.0, 4.0],  # 301 out of range
            "props": ['{"k": 1}', "x", None, "{}", "{}"],
        }
    )
    _write(tmp_path, "events", df)
    got = (
        QUERIES["q254_dq_constraint_suite"](str(tmp_path))
        .set_index("rule")
    )
    assert got.loc["completeness_props"].tolist() == [5, 1, 3]
    assert got.loc["range_value_0_300"].tolist() == [5, 1, 2]
    assert got.loc["pattern_props_object"].tolist() == [5, 1, 2]
    assert got.loc["set_event_type"].tolist() == [5, 1, 2]
    assert got.loc["unique_event_id"].tolist() == [5, 2, 4]
