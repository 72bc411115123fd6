"""Wave-47 operator pins: CUSUM via the prefix-min identity, sequence
disorder, autocorrelation evidence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )


def _ev(eid, u, minutes, v, base=pd.Timestamp("2024-05-01")):
    return {
        "event_id": eid, "ts": base + pd.Timedelta(minutes=minutes),
        "user_id": u, "event_type": "x", "value": v, "props": "{}",
    }


@pytest.mark.usefixtures("ray_session")
def test_cusum_identity_vs_recurrence(tmp_path):
    """The prefix-min unrolling equals the clamped recurrence on a
    series that dips below zero (the clamp must bind) and spikes."""
    from basicocr_ray.pipelines.queries import QUERIES

    # cents = 100*v; d = cents - 28000
    vals = [100.0, 100.0, 500.0, 600.0, 100.0, 650.0, 640.0]
    rows = [_ev(i, 1, i, v) for i, v in enumerate(vals)]
    _write_events(tmp_path, rows)
    got = QUERIES["q213_cusum_drift"](str(tmp_path)).to_pandas().iloc[0]

    s = 0
    peak, at, hist = -1, None, []
    for i, v in enumerate(vals):
        d = int(np.floor(v * 100)) - 28000
        s = max(0, s + d)
        hist.append(s)
        if s > peak:
            peak, at = s, i
    assert int(got["peak"]) == peak
    assert int(got["at_event"]) == at
    assert int(got["final"]) == hist[-1]
    assert min(hist) == 0  # the clamp actually bound


@pytest.mark.usefixtures("ray_session")
def test_sequence_disorder_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    # user 1: strictly decreasing → all pairs inverted
    rows = [_ev(i, 1, i, float(10 - i)) for i in range(5)]
    # user 2: sorted → 0 inversions
    rows += [_ev(10 + i, 2, i, float(i)) for i in range(4)]
    # user 3: ties everywhere → 0 inversions (ties uncounted)
    rows += [_ev(20 + i, 3, i, 7.0) for i in range(3)]
    _write_events(tmp_path, rows)
    got = (
        QUERIES["q214_sequence_disorder"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert got["inversions"].tolist() == [10, 0, 0]
    assert got["n_pairs"].tolist() == [10, 6, 3]


@pytest.mark.usefixtures("ray_session")
def test_autocorr_evidence_vs_brute(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    vals = [1.0, 2.0, 3.0, 5.0, 8.0]
    rows = [_ev(i, 1, i, v) for i, v in enumerate(vals)]
    _write_events(tmp_path, rows)
    got = QUERIES["q215_autocorr_evidence"](str(tmp_path)).to_pandas()
    r = got.iloc[0]
    c = [int(v * 100) for v in vals]
    assert int(r["n"]) == 5
    assert int(r["s1"]) == sum(c)
    assert int(r["s2"]) == sum(x * x for x in c)
    assert int(r["lag_sum"]) == sum(
        c[i] * c[i + 1] for i in range(len(c) - 1)
    )
