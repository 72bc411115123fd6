"""Wave-106 operator pins: Merkle tree, FFD packing, Atom feed."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_merkle_root_known():
    from basicocr_ray.pipelines.queries import (
        merkle_proof, merkle_root, merkle_verify,
    )

    leaves = [_md5(str(i)) for i in range(5)]  # odd promotes
    root, depth = merkle_root(leaves)
    # hand-fold: [h01, h23, l4] -> [h(h01+h23), l4] -> root
    h01 = _md5(leaves[0] + leaves[1])
    h23 = _md5(leaves[2] + leaves[3])
    top = _md5(h01 + h23)
    assert root == _md5(top + leaves[4])
    assert depth == 3
    assert merkle_root([]) == ("", 0)
    assert merkle_root([leaves[0]]) == (leaves[0], 0)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 33),
    idx_frac=st.floats(0, 0.999),
)
def test_merkle_proof_verifies_and_rejects(n, idx_frac):
    from basicocr_ray.pipelines.queries import (
        merkle_proof, merkle_root, merkle_verify,
    )

    leaves = [_md5("leaf%d" % i) for i in range(n)]
    root, _ = merkle_root(leaves)
    idx = int(idx_frac * n)
    proof = merkle_proof(leaves, idx)
    assert merkle_verify(leaves[idx], proof, root)
    # a tampered leaf must fail (proof may be empty only when n == 1)
    if n > 1:
        assert not merkle_verify(_md5("tampered"), proof, root)


def test_ffd_first_fit_order():
    """cap 10, items [10, 6, 5, 4, 3]: 10 | 6+4 | 5+3 -> 3 bins,
    waste 0 + 0 + 2."""
    items = [10, 6, 5, 4, 3]
    cap = 10
    bins = []
    for w in items:
        for k in range(len(bins)):
            if bins[k] >= w:
                bins[k] -= w
                break
        else:
            bins.append(cap - w)
    assert len(bins) == 3
    assert sum(bins) == 2


@pytest.mark.usefixtures("ray_session")
def test_atom_feed_attr_and_text_fields(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basicocr_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [7, 23],
                    "text": ["x", "y"],
                    "lang": ["en", "zh"],
                    "source": ["s", "s"],
                    "n_chars": [1, 1],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        QUERIES["q386_atom_feed"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["title"].tolist() == ["Doc & 7", "Doc & 23"]
    assert got["href"].tolist() == [
        "https://example.org/7?l=en",
        "https://example.org/23?l=zh",
    ]
    assert got["updated"].tolist() == ["2024-08-01", "2024-12-01"]
