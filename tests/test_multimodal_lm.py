"""Multimodal actor stages (stub kernels, real plumbing) + bigram LM."""

from __future__ import annotations

import pytest

from basicocr_ray.pipelines.lm import BigramLM
from basicocr_ray.stages.multimodal import (
    AudioFrameSampler,
    ImageFeatureExtractor,
    make_audio_payload,
    make_image_payload,
)


@pytest.mark.usefixtures("ray_session")
def test_image_feature_stage():
    import ray.data

    rows = [
        {"item_id": i, "payload": make_image_payload(i, 32 + i, 24)}
        for i in range(20)
    ]
    rows.append({"item_id": 99, "payload": b"not an image"})
    out = (
        ray.data.from_items(rows)
        .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                     batch_size=8, concurrency=2)
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    good = out[out["item_id"] < 99]
    assert good["ok"].all()
    assert good["width"].tolist() == [32 + i for i in range(20)]
    bad = out[out["item_id"] == 99].iloc[0]
    # non-IMG! payloads now hit the REAL PNG codec; junk bytes fail its
    # signature check and route to the failed path
    assert not bad["ok"] and "ValueError" in bad["error"]


@pytest.mark.usefixtures("ray_session")
def test_image_features_deterministic():
    import ray.data

    rows = [{"item_id": i, "payload": make_image_payload(i)} for i in range(10)]
    run = lambda bs: (
        ray.data.from_items(rows)
        .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                     batch_size=bs, concurrency=1)
        .to_pandas().sort_values("item_id").reset_index(drop=True)
    )
    assert run(3).equals(run(10))  # batch-size invariance of stub features


@pytest.mark.usefixtures("ray_session")
def test_audio_frame_stage():
    import ray.data

    rows = [
        {"item_id": i, "payload": make_audio_payload(i, 16000, 2.0)}
        for i in range(5)
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(AudioFrameSampler, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out["ok"].all()
    assert (out["n_frames"] == 4).all()  # 2.0 s / 0.5 s hop
    assert all(len(f) == 4 * 8 for f in out["features"])


def test_bigram_lm_scoring():
    lm = BigramLM(
        {"the": 3, "cat": 2, "sat": 1}, {"the cat": 2, "cat sat": 1}
    )
    seen = lm.score(["the", "cat", "sat"])
    unseen = lm.score(["sat", "the", "unknownword"])
    assert seen > unseen
    assert lm.score([]) == 0.0
    # determinism
    assert lm.score(["the", "cat"]) == lm.score(["the", "cat"])


@pytest.mark.usefixtures("ray_session")
def test_lm_distributed_fit_and_score():
    import ray.data

    from basicocr_ray.pipelines.lm import fit_bigram_lm, score_documents

    docs = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the cat sat on the mat"},
        {"doc_id": 2, "text": "zebra quantum flux"},
    ]
    ds = ray.data.from_items(docs)
    lm = fit_bigram_lm(ds)
    scored = score_documents(ds, lm, concurrency=1).to_pandas()
    scored = scored.sort_values("doc_id").reset_index(drop=True)
    assert scored["lm_score"][0] == scored["lm_score"][1]
    assert scored["lm_score"][0] > scored["lm_score"][2]
