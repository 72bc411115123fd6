"""Wave-45 operator pins: zone-map pruning audit, term-support lattice,
user growth curve."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_pruning_audit_vs_brute(tmp_path):
    """Crafted groups: all-below (pruned), straddling (scanned, some
    match), all-above (scanned, all match)."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    # group 0 (ids 0..255): values < 500 → pruned
    for e in range(100):
        rows.append((e, 100.0))
    # group 1 (256..): straddles: 30 below, 20 above
    for k in range(30):
        rows.append((256 + k, 450.0))
    for k in range(20):
        rows.append((286 + k, 550.0))
    # group 2 (512..): all above
    for k in range(10):
        rows.append((512 + k, 510.0))
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": "x",
            "value": [r[1] for r in rows],
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = QUERIES["q207_pruning_audit"](str(tmp_path)).to_pandas().iloc[0]
    assert int(got["n_groups"]) == 3
    assert int(got["n_pruned"]) == 1
    assert int(got["rows_scanned"]) == 50 + 10
    assert int(got["rows_matched"]) == 20 + 10


@pytest.mark.usefixtures("ray_session")
def test_term_lattice_masks(tmp_path):
    """Known top-3 tokens; masks cover every subset incl. the empty
    one (a doc with none of the terms) and repeated tokens counting
    once."""
    from basicocr_ray.pipelines.queries import QUERIES

    # frequencies: t0 > t1 > t2 > everything else
    texts = [
        "t0 t0 t0 t1 t2",   # mask 7
        "t0 t1 t1",          # mask 3
        "t0 t0",             # mask 1
        "t2 zz",             # mask 4
        "zz yy",             # mask 0
        "t0 t1 t2 extra",    # mask 7
        "t1 t0",             # mask 3 (t1 freq boost)
        "t0",                # mask 1 (t0 stays top)
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q208_term_lattice"](str(tmp_path)).to_pandas()
    gm = dict(zip(got["mask"].astype(int), got["n_docs"].astype(int)))
    # top-3 by count: t0 (9), t1 (5), t2 (3) → bits 1, 2, 4
    assert gm == {7: 2, 3: 2, 1: 2, 4: 1, 0: 1}


@pytest.mark.usefixtures("ray_session")
def test_user_growth_curve(tmp_path):
    """First-seen attribution: a user active on many days counts once,
    on their first day; cumulative is monotone and ends at the
    distinct-user total."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    rows, eid = [], 0

    def ev(u, d):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(days=d),
             "user_id": u, "event_type": "x", "value": 1.0, "props": "{}"}
        )
        eid += 1

    ev(1, 0); ev(1, 1); ev(1, 5)      # first seen day 0
    ev(2, 0)                           # day 0
    ev(3, 1); ev(3, 1)                 # day 1
    ev(4, 5)                           # day 5
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q209_user_growth"](str(tmp_path))
        .to_pandas().sort_values("day").reset_index(drop=True)
    )
    day0 = int(base.value // 1000) // 86_400_000_000
    assert got["day"].tolist() == [day0, day0 + 1, day0 + 5]
    assert got["new_users"].tolist() == [2, 1, 1]
    assert got["cum_users"].tolist() == [2, 3, 4]
