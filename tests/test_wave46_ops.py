"""Wave-46 operator pins: strict-order funnel, per-source datasheet,
incremental rollup maintenance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_ordered_funnel_order_matters(tmp_path):
    """A purchase with a view BEFORE its click must not qualify; the
    window binds per hop; same-ts ordering follows event_id."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-01")
    rows = []

    def ev(eid, u, hours, typ):
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(hours=hours),
             "user_id": u, "event_type": typ, "value": 1.0, "props": "{}"}
        )

    # user 1: click(0) → view(1) → purchase(2): qualified
    ev(1, 1, 0, "click"); ev(2, 1, 1, "view"); ev(3, 1, 2, "purchase")
    # user 2: view(0) → click(1) → purchase(2): view precedes click →
    # NOT qualified (order matters)
    ev(4, 2, 0, "view"); ev(5, 2, 1, "click"); ev(6, 2, 2, "purchase")
    # user 3: click(0) → view(30h): hop window exceeded → view not
    # qualified → purchase(31h) not qualified
    ev(7, 3, 0, "click"); ev(8, 3, 30, "view"); ev(9, 3, 31, "purchase")
    # user 4: same-ts chain ordered by event_id: click(10) < view(11)
    # < purchase(12) all at t=0 → qualified
    ev(10, 4, 0, "click"); ev(11, 4, 0, "view"); ev(12, 4, 0, "purchase")
    # user 5: purchase with no prior events
    ev(13, 5, 0, "purchase")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q210_ordered_funnel"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    gm = {
        int(u): (int(p), int(q))
        for u, p, q in zip(
            got["user_id"], got["n_purchases"], got["n_qualified"]
        )
    }
    assert gm == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 1), 5: (1, 0)}


@pytest.mark.usefixtures("ray_session")
def test_datasheet_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        ("s1", "en", "same text"),
        ("s1", "en", "same text"),      # dup within s1
        ("s1", "de", "other"),
        ("s2", "en", "same text"),      # same text, different source →
        ("s2", "fr", "unique here"),    # counts for s2 separately
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": [t for _, _, t in texts],
            "lang": [l for _, l, _ in texts],
            "source": [s for s, _, _ in texts],
            "n_chars": [len(t) for _, _, t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q211_datasheet"](str(tmp_path))
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    s1 = got[got["source"] == "s1"].iloc[0]
    assert int(s1["n_docs"]) == 3
    assert int(s1["sum_chars"]) == len("same text") * 2 + len("other")
    assert int(s1["n_en"]) == 2
    assert int(s1["n_uniq"]) == 2
    s2 = got[got["source"] == "s2"].iloc[0]
    assert (int(s2["n_docs"]), int(s2["n_en"]), int(s2["n_uniq"])) \
        == (2, 1, 2)


@pytest.mark.usefixtures("ray_session")
def test_incremental_rollup_equals_scratch(tmp_path):
    """The fold-onto-stored path equals a from-scratch rollup over both
    waves, including hours where the waves overlap."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-04-01")
    rows = []
    # events spanning > 36 h so wave-2 (+36 h) hours OVERLAP wave-1's
    for i in range(200):
        rows.append(
            {"event_id": i, "ts": base + pd.Timedelta(minutes=30 * i),
             "user_id": i % 7, "event_type": ("a", "b")[i % 2],
             "value": float(i) * 1.25, "props": "{}"}
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q212_incremental_rollup"](str(tmp_path))
        .sort_values(["event_type", "hour_us"]).reset_index(drop=True)
    )

    # scratch rebuild over both waves
    df = pd.DataFrame(rows)
    t1 = df["ts"].astype("datetime64[us]").astype("int64")
    frames = []
    for shift in (0, 36 * 3_600_000_000):
        frames.append(
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "hour_us": (t1 + shift) - (t1 + shift) % 3_600_000_000,
                    "cents": np.floor(
                        df["value"].to_numpy() * 100).astype("int64"),
                }
            )
        )
    allw = pd.concat(frames)
    exp = (
        allw.groupby(["event_type", "hour_us"], as_index=False)
        .agg(n=("cents", "size"), sum_cents=("cents", "sum"))
        .sort_values(["event_type", "hour_us"]).reset_index(drop=True)
    )
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["hour_us"].tolist() == exp["hour_us"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["sum_cents"].tolist() == exp["sum_cents"].tolist()
    # overlap actually happened: some hour has contributions from both
    per_hour = allw.groupby("hour_us").size()
    assert (exp.groupby("hour_us")["n"].sum() > per_hour.min()).any()
