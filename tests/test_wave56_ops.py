"""Wave-56 operator pins: debounce audit, repartition manifest,
frequency spectrum."""

from __future__ import annotations

import hashlib
import struct
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0] & (
        (1 << 63) - 1
    )


@pytest.mark.usefixtures("ray_session")
def test_debounce_audit_lag_semantics(tmp_path):
    """The lag formulation: within a burst every event after the first
    is suppressed if its gap to the PREVIOUS event is <= 5 min (not to
    the last kept one); different types don't interfere."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-10-01")
    rows, eid = [], 0

    def ev(u, minutes, t):
        nonlocal eid
        rows.append(
            {"event_id": eid, "ts": base + pd.Timedelta(minutes=minutes),
             "user_id": u, "event_type": t, "value": 1.0, "props": "{}"}
        )
        eid += 1

    # user 1, type a: 0, 3, 6, 20 → lags 3, 3, 14 → suppressed 2
    for m in (0, 3, 6, 20):
        ev(1, m, "a")
    # user 1, type b interleaved: 1, 30 → not suppressed
    ev(1, 1, "b"); ev(1, 30, "b")
    # user 2, type a: single event
    ev(2, 0, "a")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q240_debounce_audit"](str(tmp_path))
        .to_pandas().set_index("event_type")
    )
    assert got.loc["a"].tolist() == [5, 2, 1]   # events, suppressed, users
    assert got.loc["b"].tolist() == [2, 0, 0]


@pytest.mark.usefixtures("ray_session")
def test_repartition_manifest_digests(tmp_path):
    """Per-part digests equal the XOR over exactly the planned member
    rows; parts cover all rows once."""
    from basicocr_ray.pipelines.queries import QUERIES

    n = 400
    rng = np.random.default_rng(7)
    wt = rng.integers(1, 100, size=n).astype(np.int64)
    texts = [f"body {i}" for i in range(n)]
    df = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": wt,
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = (
        QUERIES["q241_repartition_manifest"](str(tmp_path))
        .to_pandas().sort_values("part").reset_index(drop=True)
    )

    W = int(wt.sum())
    target = (W + 7) // 8
    pre = np.cumsum(wt) - wt
    part = pre // target
    for p in sorted(set(part)):
        m = part == p
        row = got[got["part"] == p].iloc[0]
        assert int(row["n_docs"]) == int(m.sum())
        assert int(row["tot_weight"]) == int(wt[m].sum())
        chk = 0
        for i in np.flatnonzero(m):
            chk ^= _md5_low63(f"{i}:{texts[i]}")
        assert int(row["chk"]) == chk, p
    assert int(got["n_docs"].sum()) == n


@pytest.mark.usefixtures("ray_session")
def test_freq_spectrum_vs_brute(tmp_path):
    """Octave bucketing at exact powers of two (1, 2, 4, 8) lands each
    count in bit_length−1; types and mass add up."""
    from basicocr_ray.pipelines.queries import QUERIES

    # token u appears 1×, v 2×, w 4×, x 8×, y 3× (octave 1)
    text = " ".join(
        ["u"] + ["v"] * 2 + ["w"] * 4 + ["x"] * 8 + ["y"] * 3
    )
    df = pd.DataFrame(
        {
            "doc_id": [0],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q242_freq_spectrum"](str(tmp_path)).to_pandas()
    gm = {
        int(o): (int(t), int(m))
        for o, t, m in zip(got["octave"], got["n_types"], got["mass"])
    }
    assert gm[0] == (1, 1)        # u
    assert gm[1] == (2, 5)        # v (2) + y (3)
    assert gm[2] == (1, 4)        # w
    assert gm[3] == (1, 8)        # x
    assert sum(m for _, m in gm.values()) == 18
