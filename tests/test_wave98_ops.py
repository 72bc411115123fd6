"""Wave-98 operator pins: LEB128 varints, hash ring, proration."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


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


def test_leb128_known_vectors():
    from basicocr_ray.pipelines.queries import leb128_decode, leb128_encode

    assert leb128_encode([0]) == b"\x00"
    assert leb128_encode([127]) == b"\x7f"
    assert leb128_encode([128]) == b"\x80\x01"
    assert leb128_encode([300]) == b"\xac\x02"  # the DWARF spec example
    with pytest.raises(ValueError):
        leb128_decode(b"\x80")  # truncated
    with pytest.raises(ValueError):
        leb128_encode([-1])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**60), max_size=30))
def test_leb128_fuzz(vals):
    from basicocr_ray.pipelines.queries import leb128_decode, leb128_encode

    assert leb128_decode(leb128_encode(vals)) == vals


def test_hash_ring_deterministic_and_wraps():
    """The successor rule with wrap: a key hashing above every vnode
    position must land on the globally smallest vnode."""
    import bisect
    import hashlib

    NODES = ["node0", "node1", "node2", "node3"]
    ring = sorted(
        (hashlib.md5(("%s#%d" % (n, v)).encode()).hexdigest(), n)
        for n in NODES
        for v in range(16)
    )
    keys = [r[0] for r in ring]
    # synth a key beyond the last vnode
    top = "f" * 32
    j = bisect.bisect_left(keys, top)
    assert j == len(keys) or keys[j] >= top
    # wrap rule picks ring[0]
    wrapped = ring[0][1] if j == len(keys) else ring[j][1]
    assert wrapped in NODES


@pytest.mark.usefixtures("ray_session")
def test_prorate_splits_across_hours(tmp_path):
    """Event at 59min30s with event_id 0 (dur 60s), 100 cents: 30s in
    hour 0, 30s in hour 1 -> 50 cents each."""
    from basicocr_ray.pipelines.queries import QUERIES

    H = 3_600_000_000
    rows = [(0, 59 * 60 * 1_000_000 + 30_000_000, 1, "view", 1.00)]
    _events(tmp_path, rows)
    got = (
        QUERIES["q362_prorate_hours"](str(tmp_path))
        .sort_values("hour")
        .reset_index(drop=True)
    )
    assert got["hour"].tolist() == [0, 1]
    assert got["prorated_cents"].tolist() == [50.0, 50.0]
    assert got["n_pieces"].tolist() == [1, 1]
