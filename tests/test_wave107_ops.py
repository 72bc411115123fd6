"""Wave-107 operator pins: poly hash, selectivity audit, GCRA."""

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


def test_poly_hash_horner_identity():
    MOD = (1 << 61) - 1
    B = 131
    t = "hello 世界"
    h = 0
    for ch in t:
        h = (h * B + ord(ch)) % MOD
    # sum-of-terms identity
    n = len(t)
    s = sum(ord(c) * pow(B, n - 1 - i, MOD) for i, c in enumerate(t)) % MOD
    assert h == s


@pytest.mark.usefixtures("ray_session")
def test_gcra_allows_within_burst_then_denies(tmp_path):
    """T=120s, tau=240s. Requests at 0, 1, 2, 3s: the first three ride
    the burst tolerance, the fourth hits TAT-tau and is denied; a
    request much later is allowed again."""
    from basicocr_ray.pipelines.queries import QUERIES

    S = 1_000_000
    rows = [
        (0, 0, 1, "view", 1.0),
        (1, 1 * S, 1, "view", 1.0),
        (2, 2 * S, 1, "view", 1.0),
        (3, 3 * S, 1, "view", 1.0),
        (4, 2000 * S, 1, "view", 1.0),
    ]
    _events(tmp_path, rows)
    got = QUERIES["q389_gcra_limiter"](str(tmp_path))
    # replay: tat0=120; t=1 > 120-240 ok tat=240; t=2 > 0? 240-240=0,
    # 2>0 ok tat=360; t=3 > 120? no -> denied; t=2000 allowed
    assert got.values.tolist() == [[1, 4, 1]]


@pytest.mark.usefixtures("ray_session")
def test_selectivity_audit_counts(tmp_path):
    """2 of 4 are views, 2 of 4 are big, 2 are both (correlated) ->
    est 1.0 underestimates actual 2."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [
        (0, 0, 1, "view", 200.0),
        (1, 1, 1, "view", 150.0),
        (2, 2, 1, "click", 1.0),
        (3, 3, 1, "click", 2.0),
    ]
    _events(tmp_path, rows)
    got = QUERIES["q388_selectivity_audit"](str(tmp_path))
    assert got["actual"].tolist() == [2]
    assert got["est_independent"].tolist() == [1.0]
    assert got["underestimates"].tolist() == [True]
