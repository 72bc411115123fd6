"""Wave-57 operator pins: first-relevant rank, time-in-state,
catalog digest."""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0] & (
        (1 << 63) - 1
    )


def _write_embeddings(tmp_path, rows):
    tab = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_first_relevant_rank_ties_and_miss(tmp_path):
    """Hand-ranked fixture: rank counts ALL candidates ahead of the
    champion relevant one (ties on cand_id asc), and a query whose
    label never recurs reports -1."""
    from basicocr_ray.pipelines.queries import QUERIES

    # query 0 (label 1, axis-x): candidates ranked by dot on x
    #   id1 (lab 2, 0.9) > id3 (lab 2, 0.6) > {id2, id4} (lab 1, 0.5 tie)
    #   champion = id2 (tie -> min id); ahead = id1, id3 -> rank 3
    # query 10 (label 9, axis-y): no other label 9 -> -1
    _write_embeddings(
        tmp_path,
        [
            (0, [1.0, 0.0], 1),
            (10, [0.0, 1.0], 9),
            (1, [0.9, 0.0], 2),
            (2, [0.5, 0.0], 1),
            (3, [0.6, 0.0], 2),
            (4, [0.5, 0.0], 1),
        ],
    )
    got = (
        QUERIES["q243_first_relevant_rank"](str(tmp_path))
        .set_index("query_id")["first_rel_rank"]
    )
    assert got.loc[0] == 3
    assert got.loc[10] == -1


@pytest.mark.usefixtures("ray_session")
def test_time_in_state_attribution(tmp_path):
    """Gap goes to the CURRENT event's type; last events add 0; the
    fractional part of a gap is floored away."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-10-01")
    rows = [
        # user 1: a@0s -> b@10.7s -> a@25s (last)
        {"event_id": 0, "ts": base, "user_id": 1, "event_type": "a"},
        {"event_id": 1, "ts": base + pd.Timedelta(seconds=10.7),
         "user_id": 1, "event_type": "b"},
        {"event_id": 2, "ts": base + pd.Timedelta(seconds=25),
         "user_id": 1, "event_type": "a"},
        # user 2: a single b event -> nothing
        {"event_id": 3, "ts": base, "user_id": 2, "event_type": "b"},
    ]
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        str(tmp_path / "events.parquet"),
    )
    got = (
        QUERIES["q244_time_in_state"](str(tmp_path))
        .to_pandas().set_index("event_type")
    )
    assert got.loc["a"].tolist() == [1, 10]   # 10.7s floored
    assert got.loc["b"].tolist() == [1, 14]   # 25 - 10.7 = 14.3 -> 14


@pytest.mark.usefixtures("ray_session")
def test_catalog_digest_counts_and_schema_hash(tmp_path):
    """Row/column counts are exact and the digest is the md5-low-63 of
    the comma-joined column names in file order."""
    from basicocr_ray.pipelines.queries import QUERIES

    tables = {
        "documents": pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]}),
        "events": pa.table({"event_id": [1], "ts": [1]}),
        "embeddings": pa.table({"vec_id": [1, 2], "embedding": [[0.1], [0.2]]}),
        "orders": pa.table({"o_orderkey": [1]}),
        "lineitem": pa.table({"l_orderkey": [1], "l_qty": [2], "l_tax": [0.0]}),
    }
    for name, tab in tables.items():
        pq.write_table(tab, str(tmp_path / f"{name}.parquet"))

    got = QUERIES["q245_catalog_digest"](str(tmp_path)).set_index("tbl")
    assert got.loc["documents"]["n_rows"] == 3
    assert got.loc["documents"]["n_cols"] == 2
    assert got.loc["documents"]["schema_chk"] == _md5_low63("doc_id,text")
    assert got.loc["lineitem"]["n_cols"] == 3
    assert got.loc["lineitem"]["schema_chk"] == _md5_low63(
        "l_orderkey,l_qty,l_tax"
    )
