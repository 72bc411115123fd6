"""Wave-76 operator pins: MERGE upsert outcomes, rolling deque extrema,
two-stage cluster sample."""

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


def _docs(tmp_path, ids):
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": ids,
                "text": ["t"] * len(ids),
                "lang": ["en"] * len(ids),
                "source": ["s"] * len(ids),
                "n_chars": [1] * len(ids),
            }
        ),
    )


@pytest.mark.usefixtures("ray_session")
def test_merge_outcomes_and_delete_precedence(tmp_path):
    """ids 0..99: %13==0 deleted (8, incl. 0 and 91 which are also %7
    -> delete wins), %7==0 minus those updated (14-2=12... compute),
    5 inserted, final = 100 - 8 + 5."""
    from basicocr_ray.pipelines.queries import QUERIES

    ids = list(range(100))
    _docs(tmp_path, ids)
    n_del = sum(1 for i in ids if i % 13 == 0)          # 0,13,...,91 -> 8
    n_upd = sum(1 for i in ids if i % 7 == 0 and i % 13 != 0)
    got = QUERIES["q298_merge_upsert"](str(tmp_path))
    d = dict(zip(got["outcome"], got["n_rows"]))
    assert d == {
        "deleted": n_del,
        "updated": n_upd,
        "inserted": 5,
        "unchanged": 100 - n_del - n_upd,
        "final": 100 - n_del + 5,
    }


@pytest.mark.usefixtures("ray_session")
def test_rolling_extrema_window3(tmp_path):
    """values 5,1,4,2 -> rmin 5,1,1,1; rmax 5,5,5,4."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-07-01")
    vals = [5.0, 1.0, 4.0, 2.0]
    _write(
        tmp_path,
        "events",
        pd.DataFrame(
            {
                "event_id": range(4),
                "user_id": [1] * 4,
                "event_type": ["x"] * 4,
                "ts": [base + pd.Timedelta(minutes=i) for i in range(4)],
                "value": vals,
            }
        ),
    )
    got = (
        QUERIES["q299_rolling_extrema"](str(tmp_path)).to_pandas()
        .sort_values("event_id").reset_index(drop=True)
    )
    assert got["rmin"].tolist() == [500, 100, 100, 100]
    assert got["rmax"].tolist() == [500, 500, 500, 400]


@pytest.mark.usefixtures("ray_session")
def test_cluster_sample_ranks_and_bounds(tmp_path):
    """At most 8 hosts and 5 docs/host; ranks are 1..k dense; the kept
    hosts/docs equal the direct md5 computation."""
    from basicocr_ray.core.textstats import md5_low64
    from basicocr_ray.pipelines.queries import QUERIES

    ids = list(range(300))
    _docs(tmp_path, ids)
    got = QUERIES["q300_cluster_sample"](str(tmp_path)).to_pandas()
    hosts = sorted(set(i % 64 for i in ids))
    kept = set(sorted(hosts, key=lambda h: (md5_low64(f"h:{h}"), h))[:8])
    assert set(got["host"]) == kept
    for h, g in got.groupby("host"):
        docs_h = [i for i in ids if i % 64 == h]
        exp = sorted(docs_h, key=lambda d: (md5_low64(f"d:{d}"), d))[:5]
        g = g.sort_values("rank_in_host")
        assert g["doc_id"].tolist() == exp
        assert g["rank_in_host"].tolist() == list(range(1, len(exp) + 1))
