"""Wave-13 operators: bloom prefilter, PNG tEXt metadata, audio silence
segmentation, duplicated-span merging."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_png_text_chunks_roundtrip():
    from basicocr_ray.core.png import decode_png, encode_png, png_text_chunks

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    meta = {"Software": "cam3", "Comment": "héllo"}  # latin-1 exercises
    data = encode_png(arr, text_chunks=meta)
    assert png_text_chunks(data) == meta
    # metadata chunks must not disturb the pixel stream
    assert np.array_equal(decode_png(data), arr)
    # no metadata → empty dict
    assert png_text_chunks(encode_png(arr)) == {}
    # corrupt tEXt CRC: walk stops, nothing invented
    pos = data.find(b"tEXt")
    broken = bytearray(data)
    broken[pos + 20] ^= 0xFF  # flip a CRC/payload byte
    out = png_text_chunks(bytes(broken))
    assert "Comment" not in out or out != meta
    with pytest.raises(ValueError):
        png_text_chunks(b"not a png")


def test_png_text_keyword_validation():
    from basicocr_ray.core.png import encode_png

    arr = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_png(arr, text_chunks={"": "x"})
    with pytest.raises(ValueError):
        encode_png(arr, text_chunks={"a" * 80: "x"})
    with pytest.raises(ValueError):
        encode_png(arr, text_chunks={"a\x00b": "x"})


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_no_false_negatives_and_fp_bounded():
    import ray.data

    from basicocr_ray.stages.joins import bloom_prefilter

    rng = np.random.default_rng(7)
    build = pd.DataFrame({"k": rng.choice(10_000, 300, replace=False)})
    probe = pd.DataFrame(
        {"k": rng.integers(0, 10_000, 5_000), "v": np.arange(5_000)}
    )
    kept = bloom_prefilter(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        "k", m=1 << 13, k=2,
    ).to_pandas()

    true_mask = probe["k"].isin(set(build["k"]))
    # NO false negatives: every true match survives
    assert set(probe[true_mask]["v"]) <= set(kept["v"])
    # false-positive tax bounded: m = 8192 bits over 300 keys, k=2 →
    # p ≈ (600/8192)^2 ≈ 0.54%; allow generous slack
    n_fp = len(kept) - int(true_mask.sum())
    n_neg = len(probe) - int(true_mask.sum())
    assert n_fp / max(1, n_neg) < 0.05

    # string keys go through the same path
    buildS = pd.DataFrame({"k": [f"u{i}" for i in range(50)]})
    probeS = pd.DataFrame({"k": [f"u{i}" for i in range(0, 2000, 3)]})
    keptS = bloom_prefilter(
        ray.data.from_pandas(probeS), ray.data.from_pandas(buildS),
        "k", m=1 << 12, k=2,
    ).to_pandas()
    assert set(probeS[probeS["k"].isin(set(buildS["k"]))]["k"]) <= set(
        keptS["k"]
    )


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_then_semi_join_equals_exact_semi_join():
    import ray.data

    from basicocr_ray.stages.joins import bloom_prefilter, bucketed_hash_join

    rng = np.random.default_rng(13)
    build = pd.DataFrame({"k": rng.choice(3_000, 200, replace=False)})
    probe = pd.DataFrame(
        {"k": rng.integers(0, 3_000, 2_000), "v": np.arange(2_000)}
    )
    pre = bloom_prefilter(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        "k", m=1 << 12, k=2,
    )
    got = bucketed_hash_join(
        pre, ray.data.from_pandas(build[["k"]]), "k", ["v"], [],
        num_buckets=8, join_type="left semi",
    ).to_pandas().sort_values("v").reset_index(drop=True)
    want = (
        probe[probe["k"].isin(set(build["k"]))]
        .sort_values("v").reset_index(drop=True)[["k", "v"]]
    )
    pd.testing.assert_frame_equal(got[["k", "v"]], want)


def test_bloom_positions_k_hashes_differ():
    from basicocr_ray.stages.joins import _bloom_positions

    keys = np.arange(1_000, dtype=np.int64)
    pos = _bloom_positions(keys, 1 << 16, 2)
    # splitmix remix: the two hash rows must disagree almost everywhere
    assert (pos[0] != pos[1]).mean() > 0.99


def test_audio_silence_segmenter_counts_runs():
    import pyarrow as pa

    from basicocr_ray.core.wav import encode_wav
    from basicocr_ray.stages.multimodal import AudioSilenceSegmenter

    rate, blk = 8000, 800
    burst = 0.25 * (1.0 - 2.0 * (np.arange(blk) % 2))
    sil = np.zeros(blk)
    # silence + 3 bursts with gaps
    x = np.concatenate([sil, burst, sil, burst, sil, burst, sil])
    seg = AudioSilenceSegmenter(frame_hop_s=0.05, threshold=0.05)
    out = seg(pa.table({
        "item_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_wav(rate, x)], pa.large_binary()),
    }))
    assert out["n_segments"].to_pylist() == [3]
    assert out["n_active_frames"].to_pylist() == [6]
    assert out["n_frames"].to_pylist() == [14]
    # all-silence and all-active edge cases
    out2 = seg(pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array(
            [encode_wav(rate, sil), encode_wav(rate, burst)],
            pa.large_binary(),
        ),
    }))
    assert out2["n_segments"].to_pylist() == [0, 1]
    # corrupt payload routes to failed path
    out3 = seg(pa.table({
        "item_id": pa.array([9], pa.int64()),
        "payload": pa.array([b"nope"], pa.large_binary()),
    }))
    assert out3["ok"].to_pylist() == [False]


def test_duplicate_span_merge_referee():
    """The gaps-and-islands merge in q134 against a brute-force interval
    union, including the adjacent-interval (gap == W) merge case."""
    W = 5

    def spans_from_positions(ps):
        ps = np.sort(np.asarray(ps))
        brk = np.ones(len(ps), dtype=np.int64)
        brk[1:] = (np.diff(ps) > W).astype(np.int64)
        sid = np.cumsum(brk)
        n_spans = int(sid[-1])
        covered = 0
        for s in range(1, n_spans + 1):
            sel = ps[sid == s]
            covered += int(sel[-1] + W - sel[0])
        return n_spans, covered

    def referee(ps):
        ivs = sorted((p, p + W) for p in ps)
        merged = []
        for a, b in ivs:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        return len(merged), sum(b - a for a, b in merged)

    rng = np.random.default_rng(3)
    for _ in range(200):
        ps = np.unique(rng.integers(0, 60, rng.integers(1, 12)))
        assert spans_from_positions(ps) == referee(ps)
    # adjacency: positions exactly W apart merge into one span
    assert spans_from_positions([0, 5]) == (1, 10)
    assert spans_from_positions([0, 6]) == (2, 10)


@pytest.mark.usefixtures("ray_session")
def test_spec_ops_wave14():
    """Wave-14 operators reachable through the spec surface (S5):
    bloom_prefilter, priority_dedup, duplicate_spans, winnow,
    quality_gate."""
    import duckdb

    from basicocr_ray.pipelines.spec import run_spec

    sf = "/root/testdata/sf0.001"

    # bloom_prefilter: a superset of the exact semi-join, never a miss
    pre = run_spec(
        {
            "input": {"table": "orders",
                      "columns": ["o_custkey", "o_orderkey"]},
            "steps": [
                {"op": "bloom_prefilter", "right": "customer",
                 "right_columns": ["c_custkey"], "key": "o_custkey",
                 "right_rename": {"c_custkey": "o_custkey"},
                 "m": 4096, "k": 2},
            ],
        },
        sf,
    ).to_pandas()
    n_true = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{sf}/orders.parquet') o "
        f"WHERE EXISTS (SELECT 1 FROM "
        f"parquet_scan('{sf}/customer.parquet') c "
        f"WHERE c.c_custkey = o.o_custkey)"
    ).fetchone()[0]
    assert len(pre) >= n_true

    # priority_dedup: one winner per distinct text
    pd_out = run_spec(
        {
            "input": {"table": "documents",
                      "columns": ["doc_id", "text", "n_chars"]},
            "steps": [
                {"op": "priority_dedup", "priority_column": "n_chars"},
            ],
        },
        sf,
    ).to_pandas()
    n_distinct = duckdb.sql(
        f"SELECT count(DISTINCT md5(coalesce(text,''))) FROM "
        f"parquet_scan('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert len(pd_out) == n_distinct
    assert set(pd_out.columns) == {"doc_id", "n_chars", "n_dups"}

    # duplicate_spans + winnow emit their relations
    spans = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "duplicate_spans", "width": 5}],
        },
        sf,
    ).to_pandas()
    assert (spans["n_dup_words"] >= 5 * spans["n_dup_spans"]).all()

    fps = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "winnow", "k": 8, "w": 4}],
        },
        sf,
    ).to_pandas()
    assert len(fps) > 0 and fps["fp"].str.len().eq(32).all()

    # quality_gate: kept rows all score above threshold
    gated = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [
                {"op": "quality_gate",
                 "weights": [1 if i % 3 else -2 for i in range(64)],
                 "threshold": 0},
            ],
        },
        sf,
    ).to_pandas()
    assert (gated["score"] > 0).all() and 0 < len(gated) < 500


@pytest.mark.usefixtures("ray_session")
def test_priority_dedup_prefers_priority_then_id():
    import ray.data

    from basicocr_ray.stages.dedup import priority_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["a", "a", "a", "b", "b"],
            "prio": [5, 9, 9, 1, 1],
        }
    )
    out = (
        priority_dedup(
            ray.data.from_pandas(df), "doc_id", "text", "prio"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # text 'a': prio 9 tie between ids 2,3 → id 2; text 'b': id 4
    assert out["doc_id"].tolist() == [2, 4]
    assert out["n_dups"].tolist() == [3, 2]
    assert out["prio"].tolist() == [9, 1]


def test_cdc_chunk_lengths_referee():
    """CDC boundary rule vs a brute-force referee; edit-locality: a
    prefix edit must leave all chunks after the next boundary intact."""
    from basicocr_ray.core.sketches import cdc_chunk_lengths
    from basicocr_ray.core.textstats import md5_low64

    rng = np.random.default_rng(5)
    alpha = "abcdefgh "
    for _ in range(50):
        t = "".join(rng.choice(list(alpha), rng.integers(0, 200)))
        lens = cdc_chunk_lengths(t, k=8, divisor=16)
        assert sum(lens) == len(t)
        assert all(x > 0 for x in lens) or lens == [0]
        # referee: recompute cuts directly
        cuts = [
            i + 7
            for i in range(1, max(len(t) - 7, 0) + 1)
            if i + 7 < len(t)
            and md5_low64(t[i - 1 : i + 7]) % 16 == 0
        ]
        assert len(lens) == len(cuts) + 1
    # empty text: one zero-length chunk (oracle ends=[0]/starts=[0])
    assert cdc_chunk_lengths("", k=8, divisor=16) == [0]

    # edit locality: chunks strictly after the first post-edit boundary
    # are identical (the CDC property fixed-width chunking lacks)
    base = "".join(rng.choice(list(alpha), 500))
    edited = "X" + base
    a = cdc_chunk_lengths(base, k=8, divisor=16)
    b = cdc_chunk_lengths(edited, k=8, divisor=16)
    # tails re-align after at most two boundaries
    assert a[-max(1, len(a) - 3):] == b[-max(1, len(a) - 3):]


@pytest.mark.usefixtures("ray_session")
def test_spec_op_cdc_chunk_roundtrip():
    from basicocr_ray.pipelines.spec import run_spec

    out = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "cdc_chunk", "k": 8, "divisor": 64}],
        },
        "/root/testdata/sf0.001",
    ).to_pandas()
    # chunk lengths per doc sum to the doc length
    import duckdb

    want = duckdb.sql(
        "SELECT doc_id, length(text) AS L FROM "
        "parquet_scan('/root/testdata/sf0.001/documents.parquet') "
        "WHERE text IS NOT NULL"
    ).df()
    got = out.groupby("doc_id", as_index=False)["chunk_len"].sum()
    m = got.merge(want, on="doc_id")
    assert (m["chunk_len"] == m["L"]).all()
    assert out["fp"].str.len().eq(32).all()


def test_winnowing_shared_substring_guarantee():
    """The winnowing THEOREM (Schleimer et al. §3): any substring shared
    by two texts with length >= k + w - 1 contributes at least one
    shared fingerprint — regardless of what surrounds it."""
    from basicocr_ray.core.sketches import winnow_fingerprints

    rng = np.random.default_rng(11)
    alpha = list("abcdefghij ")
    for trial in range(100):
        common = "".join(rng.choice(alpha, 11 + rng.integers(0, 30)))
        pre_a = "".join(rng.choice(alpha, rng.integers(0, 50)))
        suf_a = "".join(rng.choice(alpha, rng.integers(0, 50)))
        pre_b = "".join(rng.choice(alpha, rng.integers(0, 50)))
        suf_b = "".join(rng.choice(alpha, rng.integers(0, 50)))
        _, fa = winnow_fingerprints(pre_a + common + suf_a, k=8, w=4)
        _, fb = winnow_fingerprints(pre_b + common + suf_b, k=8, w=4)
        assert set(fa) & set(fb), f"trial {trial}: guarantee violated"


@pytest.mark.usefixtures("ray_session")
def test_new_dedup_ops_salt_invariant():
    """Family convention: coarse-salt fan-out must not change results —
    duplicate_spans and priority_dedup at S=2 vs S=64 are identical."""
    import ray.data

    from basicocr_ray.stages.dedup import duplicate_spans, priority_dedup

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    shared = " ".join(rng.choice(vocab, 9))
    for i in range(40):
        left = " ".join(rng.choice(vocab, rng.integers(0, 10)))
        right = " ".join(rng.choice(vocab, rng.integers(0, 10)))
        texts.append(f"{left} {shared} {right}" if i % 4 == 0
                     else " ".join(rng.choice(vocab, 12)))
    df = pd.DataFrame(
        {"doc_id": np.arange(40, dtype=np.int64), "text": texts,
         "prio": (np.arange(40) * 7 % 13).astype(np.int64)}
    )

    def canon(out):
        return out.sort_values(list(out.columns)).reset_index(drop=True)

    a = canon(duplicate_spans(
        ray.data.from_pandas(df), "doc_id", "text", 5, num_salt=2
    ).to_pandas())
    b = canon(duplicate_spans(
        ray.data.from_pandas(df), "doc_id", "text", 5, num_salt=64
    ).to_pandas())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 10  # the planted shared span was found

    c = canon(priority_dedup(
        ray.data.from_pandas(df), "doc_id", "text", "prio", num_salt=2
    ).to_pandas())
    d = canon(priority_dedup(
        ray.data.from_pandas(df), "doc_id", "text", "prio", num_salt=64
    ).to_pandas())
    pd.testing.assert_frame_equal(c, d)
