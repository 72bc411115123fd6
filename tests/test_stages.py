"""Actor-pool stages, dedup/similarity operators, wide ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_trie_corrector_actor():
    import ray.data

    from basicocr_ray.stages.correct import TrieCorrector

    ds = ray.data.from_items(
        [{"main_text": "helo world"}, {"main_text": "word hello"}]
    )
    out = ds.map_batches(
        TrieCorrector,
        fn_constructor_kwargs={
            "entries": [("hello", 10), ("world", 5), ("word", 3)],
        },
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert out["corrected_text"].tolist() == ["hello world", "word hello"]


@pytest.mark.usefixtures("ray_session")
def test_ac_stripper_actor():
    import ray.data

    from basicocr_ray.stages.correct import ACStripper

    ds = ray.data.from_items([{"main_text": "keep cookie settings this"}])
    out = ds.map_batches(
        ACStripper,
        fn_constructor_kwargs={"phrases": ["cookie settings"]},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert out["stripped_text"].tolist() == ["keep  this"]


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup():
    import ray.data

    from basicocr_ray.stages.dedup import exact_dedup_groups

    ds = ray.data.from_items(
        [
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
        ]
    )
    out = (
        exact_dedup_groups(ds, "doc_id", "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_dups"].tolist() == [2, 1]


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_finds_neardups():
    import ray.data

    from basicocr_ray.stages.dedup import (
        minhash_candidate_pairs,
        verify_pairs_jaccard,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm windowsill in the afternoon sun every single day"
    )
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " extra"},
        {"doc_id": 3, "text": "totally different content about query engines"},
    ]
    ds = ray.data.from_items(rows)
    pairs = minhash_candidate_pairs(ds, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard(
        pairs, {r["doc_id"]: r["text"] for r in rows}, threshold=0.8
    ).to_pandas()
    assert {(a, b) for a, b in zip(verified["id_a"], verified["id_b"])} == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_simhash_exact_dup_pairs():
    import ray.data

    from basicocr_ray.stages.dedup import simhash_exact_dup_pairs

    rows = [
        {"doc_id": 1, "text": "identical content here"},
        {"doc_id": 2, "text": "identical content here"},
        {"doc_id": 3, "text": "other content entirely different"},
    ]
    out = simhash_exact_dup_pairs(
        ray.data.from_items(rows), "doc_id", "text"
    ).to_pandas()
    assert {(a, b) for a, b in zip(out["id_a"], out["id_b"])} == {(1, 2)}


@pytest.mark.usefixtures("ray_session")
def test_ann_topk_matches_numpy():
    import ray.data

    from basicocr_ray.stages.embed import ann_topk

    rng = np.random.default_rng(0)
    m = rng.standard_normal((50, 8))
    q = rng.standard_normal(8)
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(50)]
    got = ann_topk(
        ray.data.from_items(rows), q, k=5, exclude_ids=frozenset({0})
    ).to_pandas()
    sims = (m @ (q / np.linalg.norm(q))) / np.linalg.norm(m, axis=1)
    order = np.lexsort((np.arange(50), -sims))
    want = [i for i in order if i != 0][:5]
    assert got["vec_id"].tolist() == want


@pytest.mark.usefixtures("ray_session")
def test_cosine_lsh_finds_exact_dups():
    import ray.data

    from basicocr_ray.stages.embed import cosine_lsh_pairs

    rng = np.random.default_rng(1)
    m = rng.standard_normal((30, 64))
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(30)]
    rows += [{"vec_id": 100 + i, "embedding": m[i].tolist()} for i in range(30)]
    out = cosine_lsh_pairs(ray.data.from_items(rows)).to_pandas()
    found = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    assert {(i, 100 + i) for i in range(30)} <= found


@pytest.mark.usefixtures("ray_session")
def test_wordfreq_partial_final():
    import ray.data

    from basicocr_ray.stages.wide import count_terms, token_items, top_k

    ds = ray.data.from_items(
        [{"text": "a b a"}, {"text": "b a"}, {"text": "c"}]
    )
    counts = count_terms(ds, "text", token_items)
    top = top_k(counts, 2, "cnt", "token").to_pandas()
    assert top["token"].tolist() == ["a", "b"]
    assert top["cnt"].tolist() == [3, 2]


@pytest.mark.usefixtures("ray_session")
def test_pdf_parser_actor():
    import ray.data

    from basicocr_ray.stages.pdf import PdfParser

    ds = ray.data.from_items(
        [
            {"url": "u1", "html": b"%PDF-FAKE\npdf text body", "lang": "en"},
            {"url": "u2", "html": b"%PDF-0000garbage", "lang": "en"},
        ]
    )
    out = (
        ds.map_batches(PdfParser, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("url")
    )
    assert out["main_text"].tolist()[0] == "pdf text body"
    assert not out["ok"].tolist()[1]  # real-PDF parse unavailable → failed row


@pytest.mark.usefixtures("ray_session")
def test_ivf_trained_centroids_recall():
    """IVF with kmeans-trained centroids: full-probe equals brute force,
    and on a clearly clustered corpus a 1-probe search already finds the
    true top-k (the recall win trained cells buy)."""
    import numpy as np
    import ray.data

    from basicocr_ray.stages.embed import ann_topk, ivf_topk_trained

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 64)) * 5
    rows = []
    for i in range(400):
        c = i % 4
        rows.append(
            {"vec_id": i, "embedding": (centers[c] + rng.standard_normal(64) * 0.05).tolist()}
        )
    ds = ray.data.from_items(rows)
    q = centers[2] + rng.standard_normal(64) * 0.01

    brute = ann_topk(ds, q, k=5).to_pandas()
    full = ivf_topk_trained(ds, q, k=5, n_clusters=4, n_probe=4).to_pandas()
    assert list(full["vec_id"]) == list(brute["vec_id"])

    probed = ivf_topk_trained(ds, q, k=5, n_clusters=4, n_probe=1).to_pandas()
    assert list(probed["vec_id"]) == list(brute["vec_id"])


def test_quantize_vec_half_up():
    """quantize_vec rounds half AWAY from zero for positives and matches
    floor(x*1e6+0.5) for negatives (DuckDB floor semantics)."""
    from basicocr_ray.stages.embed import quantize_vec

    q = quantize_vec(np.array([[0.0000015, -0.0000015, 0.25, -0.25]]))
    assert q.tolist() == [[2, -1, 250000, -250000]]
    assert q.dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_int_exact_and_pruned():
    """Integer IVF: full probe equals the exact int64 brute-force top-k;
    a pruned probe only returns vectors assigned to probed cells."""
    import ray.data

    from basicocr_ray.stages.embed import ivf_topk_int, quantize_vec

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = []
    for i in range(200):
        vecs.append(centers[i % 4] + rng.standard_normal(16) * 0.1)
    m = np.array(vecs)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(m)]
    )
    cents_q = quantize_vec(centers)
    qv = quantize_vec(m[2:3])[0]  # query = vector 2 (cluster 2)

    full = ivf_topk_int(
        ds, qv, cents_q, k=5, n_probe=4, exclude_ids=frozenset({2})
    ).to_pandas()
    # exact integer brute force
    mq = quantize_vec(m)
    dots = mq @ qv
    order = np.lexsort((np.arange(len(mq)), -dots))
    expect = [i for i in order if i != 2][:5]
    assert list(full["vec_id"]) == expect

    pruned = ivf_topk_int(
        ds, qv, cents_q, k=5, n_probe=1, exclude_ids=frozenset({2})
    ).to_pandas()
    # cluster-2 query on a well-separated corpus: 1-probe finds the same
    assert list(pruned["vec_id"]) == expect
    assert set(pruned["cell"]) == {2}


@pytest.mark.usefixtures("ray_session")
def test_cosine_lsh_multi_table_recall():
    """OR-amplification: multi-table LSH finds a superset of single-table
    pairs and strictly improves recall on borderline near-dups."""
    import numpy as np
    import ray.data

    from basicocr_ray.stages.embed import cosine_lsh_pairs

    rng = np.random.default_rng(17)
    rows = []
    n_pairs = 120
    # planted near-dup pairs right at the threshold region (~0.955 cosine)
    for i in range(n_pairs):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        w = rng.standard_normal(64)
        w -= (w @ v) * v
        w /= np.linalg.norm(w)
        u = 0.955 * v + np.sqrt(1 - 0.955**2) * w  # exact cosine 0.955
        rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
        rows.append({"vec_id": 2 * i + 1, "embedding": u.tolist()})
    ds = ray.data.from_items(rows)

    def pairset(n_tables):
        df = cosine_lsh_pairs(
            ds, threshold=0.95, n_tables=n_tables
        ).to_pandas()
        return set(zip(df["id_a"], df["id_b"]))

    one = pairset(1)
    eight = pairset(8)
    planted = {(2 * i, 2 * i + 1) for i in range(n_pairs)}
    # all emitted pairs are genuine (exact verify inside buckets)
    assert one <= eight
    assert (one & planted) < (eight & planted)  # strictly better recall
    # per-table p = (1 - acos(.955)/pi)^16 ~ 0.20 -> 8-table recall
    # 1-(1-p)^8 ~ 0.83; assert comfortably under the expectation
    assert len(eight & planted) / n_pairs > 0.7
