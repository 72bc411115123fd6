"""Wave-75 operator pins: chi-square contingency, id-gap audit, global
dictionary encoding."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


def _docs(tmp_path, rows):
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": ["t"] * len(rows),
                "lang": [r[1] for r in rows],
                "source": [r[2] for r in rows],
                "n_chars": [1] * len(rows),
            }
        ),
    )


@pytest.mark.usefixtures("ray_session")
def test_chi2_deviations_exact(tmp_path):
    """2x2 table [[2,1],[1,2]]: n=6, every cell has r=c=3 so e=1.5 and
    n*o - r*c = 6o-9 -> dev2 = 9 for all four cells."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = (
        [(i, "en", "a") for i in range(2)]
        + [(2, "en", "b")]
        + [(3, "de", "a")]
        + [(i, "de", "b") for i in range(4, 6)]
    )
    _docs(tmp_path, rows)
    got = QUERIES["q295_chi2_contingency"](str(tmp_path))
    assert len(got) == 4
    assert set(got["dev2"]) == {9}
    assert set(got["r"]) == {3} and set(got["c"]) == {3}
    en_a = got[(got["lang"] == "en") & (got["source"] == "a")].iloc[0]
    assert en_a["o"] == 2


@pytest.mark.usefixtures("ray_session")
def test_id_gaps_within_span(tmp_path):
    """Bucket 0 holds {1,2,5} -> span 5, present 3, missing 2 (3,4);
    bucket 1 is dense."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(
        tmp_path,
        "orders",
        pd.DataFrame({"o_orderkey": [1, 2, 5, 1000, 1001, 1002]}),
    )
    got = (
        QUERIES["q296_id_gap_audit"](str(tmp_path)).to_pandas()
        .sort_values("bkt").reset_index(drop=True)
    )
    assert got.values.tolist() == [[0, 3, 2], [1, 3, 0]]


@pytest.mark.usefixtures("ray_session")
def test_dict_encode_dense_sorted(tmp_path):
    """Codes are dense ranks of the SORTED dictionary; null langs drop."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(
        tmp_path,
        [(0, "fr", "s"), (1, "de", "s"), (2, "fr", "s"), (3, "en", "s")],
    )
    got = QUERIES["q297_dict_encode"](str(tmp_path)).to_pandas()
    d = dict(zip(got["doc_id"], got["lang_code"]))
    assert d == {0: 2, 1: 0, 2: 2, 3: 1}  # de=0, en=1, fr=2
