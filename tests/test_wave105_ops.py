"""Wave-105 operator pins: repeated median, Hilbert, anchor chaining."""

from __future__ import annotations

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
        tab.schema.get_field_index("ts"), "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_repeated_median_resists_outlier(tmp_path):
    """y = 100, 200, 300, 400, 5000: OLS is wrecked by the outlier,
    the repeated median stays at 100 cents/step."""
    from basicocr_ray.pipelines.queries import QUERIES

    vals = [1.0, 2.0, 3.0, 4.0, 50.0]
    rows = [(i, i * 1000, 1, "view", v) for i, v in enumerate(vals)]
    _events(tmp_path, rows)
    got = QUERIES["q381_repeated_median_slope"](str(tmp_path))
    assert got["slope"].tolist() == [100.0]


def test_hilbert_locality_and_bijection():
    from basicocr_ray.pipelines.queries import hilbert_xy2d

    # bijection over the 16x16 grid
    ds = {hilbert_xy2d(16, x, y) for x in range(16) for y in range(16)}
    assert ds == set(range(256))
    # adjacency: consecutive d differ by one grid step
    inv = {}
    for x in range(16):
        for y in range(16):
            inv[hilbert_xy2d(16, x, y)] = (x, y)
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    # known corner: d=0 at origin
    assert hilbert_xy2d(16, 0, 0) == 0


@pytest.mark.usefixtures("ray_session")
def test_anchor_chain_detects_translocation(tmp_path):
    """A 60-char unique-4mer text: the translocated block breaks
    co-linearity, so the chain covers only the larger consistent part
    (identity would be 57 anchors; the move caps it lower)."""
    from basicocr_ray.pipelines.queries import QUERIES

    text = "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKLMNOPQRSTUVW"
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [0],
                    "text": [text],
                    "lang": ["en"],
                    "source": ["s"],
                    "n_chars": [len(text)],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = QUERIES["q383_anchor_chain"](str(tmp_path)).to_pandas()
    # text is 59 chars: co-linear prefix run has 17 anchors (i 0..16),
    # the moved-past-block suffix run 26 (i 30..55); chain = 43, well
    # below the 56-anchor identity ceiling
    assert got["chain_len"].tolist() == [43]
