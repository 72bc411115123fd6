"""Wave-77 operator pins: type bitmask histogram, degree assortativity
moments, numeric field mining."""

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
def test_type_bitmask_histogram(tmp_path):
    """codes: a=0, b=1, c=2. u1 {a,b}=3, u2 {a,b}=3 (dup events fold),
    u3 {c}=4."""
    from basicocr_ray.pipelines.queries import QUERIES

    pairs = [
        (1, "a"), (1, "b"), (1, "a"),
        (2, "b"), (2, "a"),
        (3, "c"), (3, "c"),
    ]
    _events(tmp_path, pairs)
    got = QUERIES["q301_type_bitmask"](str(tmp_path)).to_pandas()
    d = dict(zip(got["mask"], got["n_users"]))
    assert d == {3: 2, 4: 1}


@pytest.mark.usefixtures("ray_session")
def test_assortativity_moments(tmp_path):
    """edges: (1,a),(1,b),(2,a) -> du(1)=2, du(2)=1; dt(a)=2, dt(b)=1.
    moments: |E|=3, sum_du=2+2+1=5, sum_dt=2+1+2=5,
    sum_dudt=4+2+2=8, sum_du2=4+4+1=9, sum_dt2=4+1+4=9."""
    from basicocr_ray.pipelines.queries import QUERIES

    _events(tmp_path, [(1, "a"), (1, "b"), (2, "a"), (1, "a")])
    got = QUERIES["q302_degree_assortativity"](str(tmp_path))
    assert got.iloc[0].tolist() == [3, 5, 5, 8, 9, 9]


@pytest.mark.usefixtures("ray_session")
def test_number_mining_runs_and_fence(tmp_path):
    """'a12b003c' -> runs 12, 003 -> n=2 sum=15; a 13-digit run is
    fenced out on both sides; no digits -> 0/0."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a12b003c", "x" + "9" * 13 + "y7", "nodigits"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": [8, 16, 8],
            }
        ),
    )
    got = (
        QUERIES["q303_number_mining"](str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got.values.tolist() == [[0, 2, 15], [1, 1, 7], [2, 0, 0]]
