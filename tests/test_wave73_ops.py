"""Wave-73 operator pins: rendezvous placement churn, Mann-Whitney U."""

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
def test_rendezvous_churn_matches_reference(tmp_path):
    """HRW assignments and both churn counters equal the direct
    python computation; HRW growth churn is a strict subset of keys
    (only winners of the new node move)."""
    from basicocr_ray.core.textstats import md5_low64
    from basicocr_ray.pipelines.queries import QUERIES

    n = 120
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["t"] * n,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": [1] * n,
            }
        ),
    )
    moved_hrw = moved_mod = 0
    for d in range(n):
        hs = [md5_low64(f"{d}:{k}") for k in range(9)]
        if int(np.argmax(hs[:8])) != int(np.argmax(hs)):
            moved_hrw += 1
        if d % 8 != d % 9:
            moved_mod += 1
    got = QUERIES["q291_rendezvous_placement"](str(tmp_path))
    assert got.iloc[0].tolist() == [n, moved_hrw, moved_mod]
    # HRW moves only keys the new node wins (~1/9); mod moves most
    assert moved_hrw < moved_mod


@pytest.mark.usefixtures("ray_session")
def test_mannwhitney_u_exact(tmp_path):
    """a: {1,1,3}, b: {1,2}: pairs a>b = (3>1)+(3>2) = 2, ties
    (1=1)x2 = 2 -> u2 = 2*2 + 2 = 6."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [("a", 1.0), ("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 2.0)]
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "user_id": [1] * len(rows),
                "event_type": [t for t, _ in rows],
                "value": [v for _, v in rows],
            }
        ),
    )
    got = QUERIES["q292_mannwhitney_u"](str(tmp_path))
    r = got.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n1"], r["n2"], r["u2"]) == (3, 2, 6)
