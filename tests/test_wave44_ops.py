"""Wave-44 operator pins: Roaring container planning, peak-concurrency
sweep, vocabulary 90%-coverage point."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_roaring_plan_threshold(tmp_path):
    """Containers straddling the 48-value threshold pick the right
    encoding and byte cost."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    # container 0 for type a: 60 ids (bitmap); container 1: 10 (array)
    eids = list(range(60)) + list(range(256, 266))
    for e in eids:
        rows.append(
            {"event_id": e, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
             "event_type": "a", "value": 1.0, "props": "{}"}
        )
    # type b: exactly 48 in container 0 → bitmap boundary
    for e in range(48):
        rows.append(
            {"event_id": e, "ts": pd.Timestamp("2024-01-01"), "user_id": 1,
             "event_type": "b", "value": 1.0, "props": "{}"}
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q204_roaring_plan"](str(tmp_path)).to_pandas()
    gm = {
        (t, int(c)): (int(n), int(ct), int(by))
        for t, c, n, ct, by in zip(
            got["event_type"], got["container"], got["n"],
            got["ctype"], got["bytes"],
        )
    }
    assert gm[("a", 0)] == (60, 1, 32)
    assert gm[("a", 1)] == (10, 0, 20)
    assert gm[("b", 0)] == (48, 1, 32)


@pytest.mark.usefixtures("ray_session")
def test_peak_concurrency_vs_brute(tmp_path):
    """Max concurrency + earliest time vs a brute per-microsecond check
    on crafted overlapping intervals (incl. touching end==start which
    must NOT overlap under half-open semantics)."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    # dur_s = (event_id % 3600) + 60; craft ids for exact durations
    rows = []

    def iv(eid, start_s):
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(seconds=start_s),
             "user_id": 1, "event_type": "x", "value": 1.0, "props": "{}"}
        )

    # eid 0 → 60 s duration
    iv(0, 0)      # [0, 60)
    iv(3600, 30)  # [30, 90)   (eid 3600 → 60 s)
    iv(7200, 59)  # [59, 119)  → at t=59: 3 concurrent
    iv(10800, 60)  # [60, 120) starts exactly when iv0 ends → no overlap
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = QUERIES["q205_peak_concurrency"](str(tmp_path)).to_pandas()
    assert int(got["max_concurrency"].iloc[0]) == 3
    exp_at = int(
        (base + pd.Timedelta(seconds=59)).value // 1000
    )
    assert int(got["at_us"].iloc[0]) == exp_at

    # brute check over second boundaries
    ivs = [(0, 60), (30, 90), (59, 119), (60, 120)]
    best = max(
        sum(1 for s, e in ivs if s <= t < e) for t in range(0, 130)
    )
    assert best == 3


@pytest.mark.usefixtures("ray_session")
def test_coverage_k90_vs_brute(tmp_path):
    """k90 equals the brute top-k walk, including a boundary where a
    partial count group is needed."""
    from basicocr_ray.pipelines.queries import QUERIES

    # 'en': one dominant token (90 occurrences) + 10 singletons →
    # T = 100, 90% = 90 → k90 = 1
    en_text = " ".join(["big"] * 90 + [f"u{i}" for i in range(10)])
    # 'de': 10 tokens × 10 each → T = 100, need 90 → k90 = 9
    de_text = " ".join(
        tok for i in range(10) for tok in [f"w{i}"] * 10
    )
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [en_text, de_text],
            "lang": ["en", "de"],
            "source": ["s", "s"],
            "n_chars": [len(en_text), len(de_text)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q206_coverage_k90"](str(tmp_path))
        .to_pandas().set_index("lang")
    )
    assert int(got.loc["en", "total_tokens"]) == 100
    assert int(got.loc["en", "vocab"]) == 11
    assert int(got.loc["en", "k90"]) == 1
    assert int(got.loc["de", "k90"]) == 9
