"""Wave-83 operator pins: trimmed mean, weighted interval scheduling,
schema-evolution union."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, langs_chars):
    n = len(langs_chars)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(n),
                    "text": ["x"] * n,
                    "lang": [l for l, _ in langs_chars],
                    "source": ["s"] * n,
                    "n_chars": [c for _, c in langs_chars],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


def _events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["props"] = "{}"
    tab = pa.Table.from_pandas(df, preserve_index=False)
    tab = tab.set_column(
        tab.schema.get_field_index("ts"), "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_boundary_splits_tie_class(tmp_path):
    """10 values of which 3 are tied at the low boundary: lo=1 drops
    exactly ONE member of the tied class; sum is tie-invariant."""
    from basicocr_ray.pipelines.queries import QUERIES

    vals = [5, 5, 5, 10, 20, 30, 40, 50, 60, 1000]  # n=10, lo=1, hi=9
    _docs(tmp_path, [("en", v) for v in vals])
    got = QUERIES["q318_trimmed_mean"](str(tmp_path))
    assert got["n_total"].tolist() == [10]
    assert got["n_kept"].tolist() == [8]
    # keep ranks 2..9: two of the 5s, then 10..60
    assert got["sum_kept"].tolist() == [5 + 5 + 10 + 20 + 30 + 40 + 50 + 60]
    assert got["trimmed_mean"].tolist() == [round(220 / 8, 9)]


@pytest.mark.usefixtures("ray_session")
def test_interval_scheduling_dp(tmp_path):
    """Three overlapping intervals where skipping the greedy-best pair
    is optimal, plus a disjoint fourth.

    event_id 4 -> dur (1+4%5)*60s = 300s. Layout (user 1):
      A [0, 300) w=100 ; B [200, 500) w=100 ; C [400, 700) w=100
      A+C feasible (200) > any single (100) > A+B/B+C infeasible.
      D [10000, ...) w=7 always packs. Best = 207.
    """
    from basicocr_ray.pipelines.queries import QUERIES

    M = 1_000_000
    rows = [
        (4, 0 * M, 1, "view", 1.00),
        (9, 200 * M, 1, "view", 1.00),
        (14, 400 * M, 1, "view", 1.00),
        (19, 10_000 * M, 1, "view", 0.07),
    ]
    _events(tmp_path, rows)
    got = QUERIES["q319_interval_scheduling"](str(tmp_path))
    assert got.values.tolist() == [[1, 4, 207]]


@pytest.mark.usefixtures("ray_session")
def test_union_by_name_pads_and_rejects():
    import ray

    from basicocr_ray.stages.wide import union_by_name

    a = ray.data.from_arrow(pa.table({"k": [1, 2], "x": ["a", "b"]}))
    b = ray.data.from_arrow(pa.table({"k": [3], "y": [9]}))
    got = union_by_name([a, b]).to_pandas().sort_values("k")
    assert got["k"].tolist() == [1, 2, 3]
    assert got["x"].tolist()[:2] == ["a", "b"] and got["x"].isna().tolist()[2]
    assert got["y"].isna().tolist()[:2] == [True, True]
    assert got["y"].tolist()[2] == 9

    c = ray.data.from_arrow(pa.table({"k": ["clash"]}))
    with pytest.raises(TypeError):
        union_by_name([a, c])
