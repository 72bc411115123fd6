"""Wave-90 operator pins: explode/reassemble, quantile map, ALS rank-1."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "n_chars"]
            ).assign(source="s"),
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
def test_explode_reassemble_preserves_spacing(tmp_path):
    """Double spaces produce empty tokens that must survive the
    shuffle and rejoin to identical bytes."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = ["a  b c", " lead", "trail ", "single"]
    _docs(
        tmp_path,
        [(i, t, "en", len(t)) for i, t in enumerate(texts)],
    )
    got = (
        QUERIES["q339_explode_reassemble"](str(tmp_path))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == texts
    assert got["n_tokens"].tolist() == [4, 2, 2, 1]


@pytest.mark.usefixtures("ray_session")
def test_quantile_map_interpolation_and_clamps(tmp_path):
    """en values 10..100 (step 10), zh values 1010..1100: the map is a
    +1000 shift on the decile lattice; below-min clamps to zh decile 1."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    did = 0
    for v in range(10, 101, 10):
        rows.append((did, "x", "en", v))
        did += 1
    for v in range(1010, 1101, 10):
        rows.append((did, "x", "zh", v))
        did += 1
    rows.append((did, "x", "en", 5))  # below decile 1 -> clamp
    _docs(tmp_path, rows)
    got = QUERIES["q340_quantile_map"](str(tmp_path)).to_pandas()
    got = got.set_index("doc_id")
    # en deciles at ranks ceil(k*11/10): values 20..100 -> shifted
    inner = got.loc[[2, 5]]  # v=30, v=60 sit on the lattice
    assert inner.loc[2, "mapped"] == 1030.0
    assert inner.loc[5, "mapped"] == 1060.0
    assert got.loc[did, "mapped"] == got["mapped"].min()  # clamped


@pytest.mark.usefixtures("ray_session")
def test_als_rank1_closed_form(tmp_path):
    """User 1: 100 cents on click (v=1), 200 cents on view (v=5):
    u = (100*1 + 200*5) / (1 + 25) = 1100/26."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [
        (0, 1000, 1, "click", 1.00),
        (1, 2000, 1, "view", 2.00),
    ]
    _events(tmp_path, rows)
    got = QUERIES["q341_als_rank1"](str(tmp_path))
    assert got.values.tolist() == [[1, 1100, 26, round(1100 / 26, 9)]]
