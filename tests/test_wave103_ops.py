"""Wave-103 operator pins: team draft, h-index, IPF raking."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "n_chars"]
            ).assign(source="s"),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_team_draft_alternates_and_skips_taken(tmp_path):
    """A ranks by n_chars desc; if B's top pick is already taken it
    must take its next-best."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = [(i, "x", "en", 1000 - i) for i in range(30)]
    _docs(tmp_path, rows)
    got = QUERIES["q375_team_draft"](str(tmp_path))
    assert got["team"].tolist() == ["A", "B"] * 5
    picks = got["doc_id"].tolist()
    assert len(set(picks)) == 10  # no doc picked twice
    assert picks[0] == 0  # A's top by n_chars


@pytest.mark.usefixtures("ray_session")
def test_h_index_definition(tmp_path):
    """en counts: the*4, of*4, a*2, b*1 -> h=3? sorted desc
    [4,4,2,1]: r1 c4>=1, r2 c4>=2, r3 c2<3 -> h=2."""
    from basicocr_ray.pipelines.queries import QUERIES

    text = "the the the the of of of of a a b"
    _docs(tmp_path, [(0, text, "en", len(text))])
    got = QUERIES["q376_h_index"](str(tmp_path))
    assert got.values.tolist() == [["en", 4, 2]]


@pytest.mark.usefixtures("ray_session")
def test_ipf_margins_after_sweeps(tmp_path):
    """After the row-then-column sweep, COLUMN margins hit the uniform
    target exactly (the last-fitted margin always does)."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    did = 0
    # skew: lang en heavy on dow 0, zh heavy on dow 1 (doc_id % 7)
    for _ in range(8):
        rows.append((did * 7, "x", "en", 10)); did += 1
    for _ in range(4):
        rows.append((did * 7 + 1, "x", "zh", 10)); did += 1
    _docs(tmp_path, rows)
    got = QUERIES["q377_ipf_raking"](str(tmp_path))
    tot = 12
    col = got.groupby("dow")["weight"].sum()
    nd = got["dow"].nunique()
    for v in col:
        assert abs(v - tot / nd) < 1e-6
