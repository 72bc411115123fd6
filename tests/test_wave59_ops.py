"""Wave-59 operator pins: bag-of-words dup groups, readability
evidence, order cadence."""

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


@pytest.mark.usefixtures("ray_session")
def test_bow_dup_groups_order_and_multiplicity_insensitive(tmp_path):
    """Docs with the same token SET group together regardless of token
    order and repetition; singletons are not reported."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "documents", pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat",
                "sat the cat the cat",   # same set as doc 1
                "a different doc",       # singleton
                "CAT the sat",           # lowercased -> same set again
            ],
        }
    ))
    got = QUERIES["q249_bow_dup_groups"](str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["n_docs"] == 3
    assert got.iloc[0]["first_doc"] == 1


@pytest.mark.usefixtures("ray_session")
def test_readability_components(tmp_path):
    """Words split on whitespace, sentences on [.!?]+ runs (empty
    segments dropped), vowel groups are maximal [aeiou]+ runs on the
    lowercased text."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "documents", pd.DataFrame(
        {
            "doc_id": [1, 2],
            # "beautiful" -> eau+i+u = 3 groups; "Hi there!?" -> 1
            # sentence (trailing empties dropped)
            "text": ["beautiful day. it is!", "Hi there!? Ok."],
            "lang": ["en", "en"],
        }
    ))
    got = (
        QUERIES["q250_readability_evidence"](str(tmp_path))
        .to_pandas().set_index("lang")
    )
    # words: 4 + 3 (punctuation stays attached); sentences: 2 + 2
    assert got.loc["en"]["n_docs"] == 2
    assert got.loc["en"]["n_words"] == 7
    assert got.loc["en"]["n_sentences"] == 4
    # doc1: eau,i,u | a | i,i -> 6 ; doc2: i | e,e | o -> 4
    assert got.loc["en"]["n_vowel_groups"] == 10


@pytest.mark.usefixtures("ray_session")
def test_order_cadence_lower_median(tmp_path):
    """Even gap counts take the LOWER median; single-order customers
    report -1; cents floor per order then sum."""
    from basicocr_ray.pipelines.queries import QUERIES

    _write(tmp_path, "orders", pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_custkey": [7, 7, 7, 7, 8],
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-13", "2024-01-14",
                 "2024-06-01"]
            ),
            "o_totalprice": [10.999, 20.0, 30.0, 40.0, 5.5],
        }
    ))
    got = (
        QUERIES["q251_order_cadence"](str(tmp_path))
        .to_pandas().set_index("custkey")
    )
    # gaps for cust 7: [2, 10, 1] -> sorted [1, 2, 10] -> median 2
    assert got.loc[7].tolist() == [4, 1099 + 2000 + 3000 + 4000, 2]
    assert got.loc[8].tolist() == [1, 550, -1]
