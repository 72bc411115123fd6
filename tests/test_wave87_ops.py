"""Wave-87 operator pins: de-hyphenation, ligature fold, record fusion."""

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
def test_dehyphenate_roundtrip_counts(tmp_path):
    """doc 0: word index 0 ('station', len 7) breaks; CJK run breaks
    too; repair restores bytes exactly."""
    from basicocr_ray.pipelines.queries import QUERIES

    t0 = "station short ab 数据查询引擎流批向量"
    t1 = "tiny words only here"  # doc 1: j+1 % 7 == 0 at j=6 (absent)
    _docs(tmp_path, [(0, t0, "en", len(t0)), (1, t1, "en", len(t1))])
    got = (
        QUERIES["q330_dehyphenate"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == [t0, t1]
    # doc 0: words at j=0 ('station') and j=7 (none, only 4 words);
    # j=0 qualifies; the CJK run at j=3 len 10 -> (3+0)%7 != 0
    assert got["n_breaks"].tolist() == [1, 0]


@pytest.mark.usefixtures("ray_session")
def test_ligature_fold_roundtrip(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    t = "finally inflate fifl offline"
    _docs(tmp_path, [(0, t, "en", len(t))])
    got = QUERIES["q331_ligature_fold"](str(tmp_path)).to_pandas()
    assert got["text"].tolist() == [t]
    # fi: finally, fifl, (offline has 'ffl' -> fl only); fl: inflate,
    # fifl, offline
    assert got["n_ligatures"].tolist() == [2 + 3]


