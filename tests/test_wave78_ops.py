"""Wave-78 operator pins: histogram intersection, Wasserstein-1
evidence."""

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


def _events(tmp_path, rows):
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


@pytest.mark.usefixtures("ray_session")
def test_histogram_intersection_exact(tmp_path):
    """a: {1,1,2}, b: {1,2,2,3} -> min at v=100: 1? a has two 1s, b one
    -> min 1; v=200: min(1,2)=1; v=300: min(0,1)=0 -> inter=2."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [("a", 1.0), ("a", 1.0), ("a", 2.0),
            ("b", 1.0), ("b", 2.0), ("b", 2.0), ("b", 3.0)]
    _events(tmp_path, rows)
    got = QUERIES["q304_histogram_intersection"](str(tmp_path))
    r = got.iloc[0]
    assert (r["n1"], r["n2"], r["inter"]) == (3, 4, 2)


@pytest.mark.usefixtures("ray_session")
def test_wasserstein_point_mass_distance(tmp_path):
    """a all at 1.00, b all at 3.00 (equal n): EMD = distance between
    the point masses -> emd_num = n1*n2*(300-100); adding a shared
    middle value keeps exactness vs hand computation."""
    from basicocr_ray.pipelines.queries import QUERIES

    _events(tmp_path, [("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 3.0)])
    got = QUERIES["q305_wasserstein_evidence"](str(tmp_path))
    r = got.iloc[0]
    # values 100, 300: |cum1*n2-cum2*n1| at 100 = |2*2-0| = 4, gap 200
    assert (r["n1"], r["n2"], r["emd_num"]) == (2, 2, 800)

    _events(
        tmp_path,
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)],
    )
    got = QUERIES["q305_wasserstein_evidence"](str(tmp_path))
    r = got.iloc[0]
    # values 100,200,300; diffs: at 100 |1*2-0|=2 gap 100; at 200
    # |2*2-1*2|=2 gap 100 -> 400
    assert (r["n1"], r["n2"], r["emd_num"]) == (2, 2, 400)
