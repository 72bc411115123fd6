"""Wave-88 operator pins: hive partition roundtrip, Wilson CI, band join."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                rows, columns=["doc_id", "lang", "n_chars"]
            ).assign(text="x", source="s"),
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
def test_hive_partition_roundtrip_preserves_rows(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(
        tmp_path,
        [(0, "en", 10), (1, "zh", 20), (2, "en", 30), (3, "de", 5)],
    )
    got = (
        QUERIES["q333_hive_partition_roundtrip"](str(tmp_path))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["de", 1, 5], ["en", 2, 40], ["zh", 1, 20]
    ]




@pytest.mark.usefixtures("ray_session")
def test_band_join_bucket_boundary(tmp_path):
    """Pairs straddling a W=64 bucket boundary must count exactly once:
    view 63 cents with purchases at 60, 65, 68 (|d|<=5 -> 60, 65, 68?
    68-63=5 ok) and 70 (excluded)."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [
        (0, 1000, 1, "view", 0.63),
        (1, 2000, 1, "purchase", 0.60),
        (2, 3000, 1, "purchase", 0.65),
        (3, 4000, 1, "purchase", 0.68),
        (4, 5000, 1, "purchase", 0.70),
        (5, 6000, 1, "click", 0.63),  # wrong type: ignored
    ]
    _events(tmp_path, rows)
    got = QUERIES["q335_band_join"](str(tmp_path))
    assert got["n_pairs"].tolist() == [3]
    assert got["sum_absdiff"].tolist() == [3 + 2 + 5]
