"""Wave-65 operator pins: k-core peeling, next-greater-element,
water-filling allocation."""

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
def test_kcore_matches_reference_peel(tmp_path):
    """Engine peel equals a straight single-process peel of the same
    generated graph (N=12, k=3, 3 rounds)."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 12
    _write(tmp_path, "documents", pd.DataFrame({"doc_id": range(n)}))

    edges = set()
    for i in range(n):
        for j in ((i + 1) % n, (i + 2) % n, (3 * i + 1) % n):
            if i != j:
                edges.add((min(i, j), max(i, j)))
    cur = set(edges)
    alive = set(range(n))
    for _ in range(3):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= 3}
        cur = {(a, b) for a, b in cur if a in alive and b in alive}
    deg3 = {v: 0 for v in alive}
    for a, b in cur:
        deg3[a] += 1
        deg3[b] += 1

    got = (
        QUERIES["q267_kcore_peel"](str(tmp_path)).to_pandas()
        .set_index("v")["residual_deg"].to_dict()
    )
    assert got == deg3
    assert len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_next_higher_stack_semantics(tmp_path):
    """Strictly-higher only (equal values don't count); -1 when no
    later higher value exists; distance is in sequence steps."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    vals = [3.0, 1.0, 1.0, 2.0, 5.0, 4.0]
    rows = [
        {"event_id": i, "ts": base + pd.Timedelta(minutes=i),
         "user_id": 7, "event_type": "x", "value": v}
        for i, v in enumerate(vals)
    ]
    _write(tmp_path, "events", pd.DataFrame(rows))
    got = (
        QUERIES["q268_next_higher"](str(tmp_path)).to_pandas()
        .sort_values("event_id")["steps_to_higher"].tolist()
    )
    # 3.0 -> 5.0 at +4; 1.0 -> 2.0 at +2; 1.0 -> 2.0 at +1;
    # 2.0 -> 5.0 at +1; 5.0 -> none; 4.0 -> none
    assert got == [4, 2, 1, 1, -1, -1]


@pytest.mark.usefixtures("ray_session")
def test_waterfill_level_and_remainder(tmp_path):
    """Level maximizes within budget; remainder units go to the
    lowest-numbered unsatisfied hosts; total equals the budget."""
    from basicocr_ray.pipelines.queries import QUERIES

    # demands: host 0 -> 1 doc, host 1 -> 4, host 2 -> 7 (total 12,
    # budget 6): L=2 fills 1+2+2=5, rem 1 -> host 1 gets 3
    ids = [0] + [1 + 64 * i for i in range(4)] + [2 + 64 * i for i in range(7)]
    _write(tmp_path, "documents", pd.DataFrame({"doc_id": ids}))
    got = (
        QUERIES["q269_waterfill_alloc"](str(tmp_path))
        .set_index("host")
    )
    assert got.loc[0, "alloc"] == 1
    assert got.loc[1, "alloc"] == 3
    assert got.loc[2, "alloc"] == 2
    assert int(got["alloc"].sum()) == 6
    assert bool((got["alloc"] <= got["demand"]).all())
