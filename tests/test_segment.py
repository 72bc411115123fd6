"""Forward-maximum-matching segmenter goldens (M14, HanLP analogue —
reference: contrib/acautomata/.../Test.java:20-53) + distributed stage."""

from __future__ import annotations

import pytest

from basicocr_ray.core.segment import FmmSegmenter


def test_fmm_longest_match_wins():
    seg = FmmSegmenter(["中国", "中国人", "人民", "民主"])
    # FMM takes 中国人 (len 3) before 中国 (len 2); remaining 民主 matches
    assert seg.segment("中国人民主") == ["中国人", "民主"]


def test_fmm_oov_single_char_fallback():
    seg = FmmSegmenter(["数据", "引擎"])
    assert seg.segment("数据大引擎") == ["数据", "大", "引擎"]
    # no dictionary hit at all → every char on its own
    assert seg.segment("abc") == ["a", "b", "c"]


def test_fmm_classic_ambiguity_is_greedy():
    # the canonical FMM pitfall: greedy longest-match commits to 研究生
    # even when 研究/生命 would be the linguistic split — deterministic,
    # documented behavior of the algorithm (not a bug)
    seg = FmmSegmenter(["研究", "研究生", "生命", "命"])
    assert seg.segment("研究生命") == ["研究生", "命"]


def test_fmm_empty_and_degenerate():
    seg = FmmSegmenter([])
    assert seg.segment("") == []
    assert seg.segment("xy") == ["x", "y"]
    assert FmmSegmenter(["abc"]).segment("ababc") == ["a", "b", "abc"]


@pytest.mark.usefixtures("ray_session")
def test_segment_stage_roundtrip():
    """Bijective glyph corpus through the actor-pool stage: segmentation
    must recover the original token sequence exactly (the q40 property)."""
    import ray
    import ray.data

    from basicocr_ray.stages.segment import segment_documents

    vocab = ["alpha", "beta", "gamma", "delta"]
    mapping = {
        t: chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1)
        for i, t in enumerate(vocab)
    }
    docs = [
        {"doc_id": 0, "tokens": ["alpha", "beta", "alpha"]},
        {"doc_id": 1, "tokens": ["delta"]},
        {"doc_id": 2, "tokens": []},
        {"doc_id": 3, "tokens": ["gamma", "gamma", "beta", "delta"]},
    ]
    rows = [
        {"doc_id": d["doc_id"], "text": "".join(mapping[t] for t in d["tokens"])}
        for d in docs
    ]
    out = (
        segment_documents(ray.data.from_items(rows), sorted(mapping.values()))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    inv = {v: k for k, v in mapping.items()}
    for d, segs, n, nd in zip(
        docs, out["segments"], out["n_segments"], out["n_distinct_segments"]
    ):
        assert [inv[s] for s in segs] == d["tokens"]
        assert n == len(d["tokens"])
        assert nd == len(set(d["tokens"]))
