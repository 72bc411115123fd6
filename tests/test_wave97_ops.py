"""Wave-97 operator pins: Thompson NFA, shuffle audit, FM-index."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_nfa_core_semantics():
    from basicocr_ray.pipelines.queries import ThompsonNFA

    assert ThompsonNFA("da.a").search("xx data yy")
    assert ThompsonNFA("da.a").search("daxa")
    assert not ThompsonNFA("da.a").search("da")
    assert ThompsonNFA("(th|qu)e").search("queue")
    assert ThompsonNFA("(th|qu)e").search("the")
    assert not ThompsonNFA("(th|qu)e").search("thy quiz")
    assert ThompsonNFA("jo*in").search("jin")   # zero o's
    assert ThompsonNFA("jo*in").search("jooooin")
    assert not ThompsonNFA("jo*in").search("jon")
    # star on a group; empty-matching pattern matches everything
    assert ThompsonNFA("(ab)*c").search("ababc")
    assert ThompsonNFA("a*").search("zzz")  # empty match
    with pytest.raises(ValueError):
        ThompsonNFA("(ab")
    with pytest.raises(ValueError):
        ThompsonNFA("*a")


@settings(max_examples=60, deadline=None)
@given(
    pat=st.sampled_from(
        ["ab*a", "(a|b)c", "a.c", "(ab|ba)*z", "a(b|c)*d"]
    ),
    text=st.text(alphabet="abcdz", max_size=16),
)
def test_nfa_fuzz_vs_re(pat, text):
    from basicocr_ray.pipelines.queries import ThompsonNFA

    assert ThompsonNFA(pat).search(text) == bool(re.search(pat, text))


def test_fm_count_matches_str_count():
    from basicocr_ray.pipelines.queries import q359_fm_search  # noqa
    import basicocr_ray.pipelines.queries as qq

    # reach the inner kernel through a local reimplementation contract:
    # verify via the query on a tiny fixture instead
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        texts = ["dada dandy da", "no match here", "d", ""]
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
            os.path.join(d, "documents.parquet"),
        )
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local", num_cpus=4, include_dashboard=False,
                ignore_reinit_error=True,
            )
        got = (
            qq.QUERIES["q359_fm_search"](d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["n_occ"].tolist() == [4, 0, 0, 0]
