"""Wave-74 operator pins: value-ordered global rank, ntile assignment,
Spearman evidence."""

from __future__ import annotations

import numpy as np
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
def test_value_rank_matches_lexsort():
    """pos is exactly ROW_NUMBER() OVER (ORDER BY value, id) - 1,
    including duplicate values tie-broken by id across buckets."""
    import ray.data

    from basicocr_ray.stages.sample import value_rank

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 50, size=400).astype(np.int64)  # heavy ties
    ids = rng.permutation(400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"c": pa.array(vals), "id": pa.array(ids)})
    )
    out = value_rank(ds, "c", "id", num_buckets=8).to_pandas()
    order = np.lexsort((ids, vals))
    expect = {
        (int(vals[i]), int(ids[i])): pos
        for pos, i in enumerate(order)
    }
    got = {
        (int(r["c"]), int(r["id"])): int(r["pos"])
        for _, r in out.iterrows()
    }
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_ntile_first_tiles_larger(tmp_path):
    """n=13, k=10 -> three 2-row tiles then seven 1-row tiles, in
    value order."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(13),
                "user_id": [1] * 13,
                "event_type": ["x"] * 13,
                "value": [float(13 - i) for i in range(13)],  # 13..1
            }
        ),
    )
    got = (
        QUERIES["q293_ntile_assign"](str(tmp_path)).to_pandas()
        .sort_values("tile").reset_index(drop=True)
    )
    assert got["n_rows"].tolist() == [2, 2, 2, 1, 1, 1, 1, 1, 1, 1]
    # tile 1 holds the two smallest cents (100, 200)
    assert got.iloc[0][["min_c", "max_c"]].tolist() == [100, 200]
    assert got.iloc[9][["min_c", "max_c"]].tolist() == [1300, 1300]


@pytest.mark.usefixtures("ray_session")
def test_spearman_perfect_and_tied(tmp_path):
    """Values increasing with time -> sum_d2 = 0 (rho = 1); then with
    all-equal values every x-rank is the tie-average -> exact d^2 and
    tie term n^3 - n."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-06-01")

    def events(vals):
        _write(
            tmp_path,
            "events",
            pd.DataFrame(
                {
                    "event_id": range(len(vals)),
                    "user_id": [1] * len(vals),
                    "event_type": ["x"] * len(vals),
                    "ts": [
                        base + pd.Timedelta(minutes=i)
                        for i in range(len(vals))
                    ],
                    "value": vals,
                }
            ),
        )

    events([1.0, 2.0, 3.0, 4.0])
    got = QUERIES["q294_spearman_evidence"](str(tmp_path))
    assert got.iloc[0].tolist() == [4, 0, 0, 0]

    events([5.0, 5.0, 5.0])  # x-ranks all (2*0 + 3 + 1) = 4 = 2*avg(2)
    got = QUERIES["q294_spearman_evidence"](str(tmp_path))
    r = got.iloc[0]
    # y-r2 = 2, 4, 6 (doubled ranks 1..3); x-r2 = 4 for all three ->
    # d^2 = (4-2)^2 + 0 + (4-6)^2 = 8
    assert r.tolist() == [3, 8, 3 ** 3 - 3, 0]
