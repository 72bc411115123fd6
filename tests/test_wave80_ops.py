"""Wave-80 operator pins: casefold collisions, control-char audit,
token period (KMP)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, texts):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["s"] * len(texts),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_casefold_collisions_and_winner(tmp_path):
    """'The the THE the' -> class 'the': 4 total, 3 forms, winner
    'the' (2 > 1,1); 'solo' has one form -> excluded."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(tmp_path, ["The the THE the solo", "Word word"])
    got = (
        QUERIES["q309_casefold_collisions"](str(tmp_path))
        .sort_values("lower").reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["the", 4, 3, "the"],
        ["word", 2, 2, "Word"],
    ]


@pytest.mark.usefixtures("ray_session")
def test_control_char_audit_classes(tmp_path):
    """One doc with \\x01, ZWSP, and U+FFFD; tab/newline do NOT count;
    a clean doc is omitted (sparse output)."""
    from basicocr_ray.pipelines.queries import QUERIES

    dirty = "a\x01b​c�� d\te\nf"
    _docs(tmp_path, [dirty, "clean text"])
    got = QUERIES["q310_control_char_audit"](str(tmp_path))
    assert len(got) == 1
    assert got.iloc[0].tolist() == [0, 1, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_token_period_kmp_vs_sql(tmp_path):
    """'a b a b a b' -> period 2, repeats 3; 'a a a' -> 1/3; aperiodic
    'x y z' -> period 3 repeats 1; also cross-check vs the SQL twin."""
    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    _docs(
        tmp_path,
        ["a b a b a b", "a a a", "x y z", "one", "a b a b a"],
    )
    got = (
        QUERIES["q311_token_period"](str(tmp_path)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # doc 3 ('one') has < 2 tokens -> excluded
    assert got["doc_id"].tolist() == [0, 1, 2, 4]
    assert got["period"].tolist() == [2, 1, 3, 2]
    assert got["repeats"].tolist() == [3, 3, 1, 2]

    con = duckdb.connect()
    path = str(tmp_path / "documents.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    sql = con.execute(ORACLE_SQL["q311_token_period"]).df()
    sql = sql.sort_values("doc_id").reset_index(drop=True)
    assert sql.values.tolist() == got.values.tolist()
