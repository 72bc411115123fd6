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




