"""Connected components, sampling determinism, artifact partial-merge."""

from __future__ import annotations

import pytest

from basicocr_ray.state.artifacts import load_artifact_partial, save_artifact


@pytest.mark.usefixtures("ray_session")
def test_assign_components():
    import ray.data

    from basicocr_ray.stages.dedup import assign_components

    # components: {1,2,3,9} via chain 1-2, 2-3, 3-9 ; {5,7} ; singleton pairs none
    pairs = ray.data.from_items(
        [
            {"id_a": 2, "id_b": 3},
            {"id_a": 1, "id_b": 2},
            {"id_a": 3, "id_b": 9},
            {"id_a": 5, "id_b": 7},
        ]
    )
    out = assign_components(pairs).to_pandas().sort_values("id")
    got = dict(zip(out["id"], out["rep"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}


@pytest.mark.usefixtures("ray_session")
def test_minhash_to_components_end_to_end():
    import ray.data

    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the windowsill in the afternoon sun every single day again"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra"},
        {"doc_id": 3, "text": base + " extra more"},
        {"doc_id": 4, "text": "completely unrelated database engine text"},
    ]
    ds = ray.data.from_items(rows)
    pairs = minhash_candidate_pairs(ds, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard(
        pairs, {r["doc_id"]: r["text"] for r in rows}, threshold=0.8
    )
    comps = assign_components(verified).to_pandas()
    got = dict(zip(comps["id"], comps["rep"]))
    assert got == {1: 1, 2: 1, 3: 1}  # 4 has no near-dup → not labeled


@pytest.mark.usefixtures("ray_session")
def test_sampling_deterministic():
    import ray.data

    from basicocr_ray.stages.sample import block_sample, sampled, shuffled

    ds = lambda: ray.data.range(1000)
    a = shuffled(ds(), seed=7).take_all()
    b = shuffled(ds(), seed=7).take_all()
    assert a == b
    s1 = sampled(ds(), 0.1, seed=3).count()
    s2 = sampled(ds(), 0.1, seed=3).count()
    assert s1 == s2 and 40 < s1 < 200
    # stride restarts per batch, so expect ~N/k with ≤ one extra per block
    sys_rows = block_sample(ds(), 10).count()
    assert 100 <= sys_rows <= 120
    assert block_sample(ds(), 10).count() == sys_rows  # deterministic


def test_artifact_partial_merge(tmp_path):
    p = str(tmp_path / "ckpt" / "scorer.json")
    save_artifact(p, {"min_chars": 20, "obsolete_knob": 1})
    merged = load_artifact_partial(
        p, {"min_chars": 10, "max_link_density": 0.35}
    )
    # present key overrides, unknown key ignored, missing key keeps default
    assert merged == {"min_chars": 20, "max_link_density": 0.35}
    # no artifact → defaults untouched
    assert load_artifact_partial(str(tmp_path / "none.json"), {"a": 1}) == {"a": 1}


def test_hll_accuracy_and_merge():
    from basicocr_ray.core.sketches import HyperLogLog

    h = HyperLogLog()
    h.update(f"tok{i}" for i in range(50000))
    assert abs(h.count() - 50000) / 50000 < 0.03
    a = HyperLogLog().update(f"x{i}" for i in range(3000))
    b = HyperLogLog().update(f"x{i}" for i in range(1500, 4500))
    merged = a.merge(b)
    assert abs(merged.count() - 4500) / 4500 < 0.05
    # tiny cardinalities hit the linear-counting branch exactly enough
    small = HyperLogLog().update(["a", "b", "c"])
    assert round(small.count()) == 3
    rt = HyperLogLog.deserialize(merged.serialize())
    assert rt.count() == merged.count()


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_vs_exact():
    import ray.data

    from basicocr_ray.stages.wide import approx_distinct, count_terms, token_items

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    exact = count_terms(
        ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        ),
        "text", token_items,
    ).count()
    est = approx_distinct(ds, "text", token_items)
    assert abs(est - exact) / exact < 0.05
