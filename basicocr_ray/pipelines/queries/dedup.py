"""Deduplication family: exact, MinHash-LSH, SimHash, spans, incremental (LLM-data brief; SURVEY §2.7 D3).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import make_ngram_items
from basicocr_ray.stages.wide import token_items

from ._shared import (
    _TOKS,
    _read,
)


def q10_dedup_exact(sf_dir: str):
    """Exact dedup (D3): content hash → per-group representative."""
    from basicocr_ray.stages.dedup import exact_dedup_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_groups(ds, "doc_id", "text")


def q11_fingerprint(sf_dir: str):
    """Document fingerprinting: md5 content hash (matches DuckDB md5())."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp": pa.array(
                    [md5_hex(t or "") for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def q22_minhash_neardup(sf_dir: str):
    """MinHash-LSH near-duplicate pairs over the REAL documents corpus
    (which contains planted near-dups): shingle→minhash per batch → band
    buckets (32 bands × 2 rows: P(miss | J=0.8) = (1-0.8^2)^32 ≈ 6e-15) →
    candidate pairs → exact 5-gram-Jaccard verify ≥ 0.8, texts fetched via
    the BUCKETED-JOIN verify (no full-corpus driver materialization — the
    round-1 formulation broadcast an id→text dict built with take_all()).
    Oracle = DuckDB brute-force pairwise Jaccard — the LSH path must
    reproduce it exactly."""
    from basicocr_ray.stages.dedup import (
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # hot_bucket_mode="full": q22's contract is the EXACT pair set of the
    # brute-force oracle, so a >max_bucket_size bucket must expand all its
    # pairs — the default "star" economization is for component-style
    # consumers (q42) and would silently drop true near-dup pairs here.
    pairs = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=32, hot_bucket_mode="full"
    )
    verified = verify_pairs_jaccard_join(
        pairs, ds, "doc_id", "text", threshold=0.8
    )
    return verified.select_columns(["id_a", "id_b"])


def q23_simhash_dup(sf_dir: str):
    """Exact-duplicate detection via SimHash bucketing: documents ∪ exact
    copies (doc_id + 10000); identical-signature buckets propose
    candidates, md5 text-equality verifies (signature collisions of
    merely-similar docs are filtered out). Every (d, d+10000) pair must
    surface — and nothing else (the corpus has no exact dups)."""
    from basicocr_ray.stages.dedup import simhash_exact_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(batch["doc_id"], 10000),
                "text": batch["text"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))
    return simhash_exact_dup_pairs(both, "doc_id", "text")


def q51_jaccard_join_exact(sf_dir: str):
    """EXACT shingle-set similarity self-join at Jaccard ≥ 0.6 via AllPairs
    prefix filtering (`stages.simjoin.jaccard_set_join`) — the
    exact-contract sibling of q22's probabilistic MinHash banding: every
    qualifying pair is emitted, none invented, and the candidate space is
    pruned by df-ordered prefixes + the size filter instead of hashing.
    Sets are word-TRIGRAM shingles (unigram token sets are near-identical
    across this corpus's shared vocabulary — shingles make set identity
    mean textual identity, the MinHash literature's standard choice).
    Integer output (n_inter, n_union) keeps the driver hash float-free;
    the threshold comparison is the same IEEE expression on both sides."""
    from basicocr_ray.stages.simjoin import jaccard_set_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return jaccard_set_join(
        ds, "doc_id", "text", threshold=0.6, items_fn=make_ngram_items(3)
    )


def q68_edit1_fuzzy_pairs(sf_dir: str):
    """Edit-distance-≤1 fuzzy self-join over the corpus vocabulary ∪ the
    source-label dictionary (the spell-correction candidate-discovery
    task — A2's trie corrector finds dictionary matches for ONE word via
    a broadcast trie; this finds EVERY fuzzy-matching pair with the
    dictionary distributed): SymSpell/FastSS deletion-neighborhood
    candidates → exact Levenshtein verify (`stages.simjoin.
    edit1_vocab_join`). The vocab feed is per-batch locally distinct
    only — global duplicates collapse inside the join's own candidate
    groups and pair dedup, so no separate distinct stage is needed."""
    from basicocr_ray.stages.simjoin import edit1_vocab_join

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def local_vocab(b: pa.Table) -> pa.Table:
        s: set[str] = set()
        for t in b["text"].to_pylist():
            if t:
                s.update(token_items(t))
        for src in b["source"].to_pylist():
            if src:
                s.add(src)
        s.discard("")
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    vocab = ds.map_batches(local_vocab, batch_format="pyarrow")
    return edit1_vocab_join(vocab)


def q76_chunk_dedup(sf_dir: str):
    """Corpus-wide chunk-level exact dedup with reassembly (the CCNet
    paragraph-dedup shape, Wenzek et al. 2020 §4.1, at fixed 10-word
    chunk granularity): each distinct chunk keeps only its first
    (doc_id, idx) occurrence corpus-wide, then surviving chunks
    string-agg back into documents. Two coarse-grouped shuffles — by
    chunk-hash salt (dedup) then doc-hash salt (reassembly)."""
    from basicocr_ray.stages.decontam import chunk_dedup_reassemble

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_dedup_reassemble(docs, chunk_words=10)


def q42_neardup_components(sf_dir: str):
    """Near-dup clusters end-to-end: MinHash-LSH candidates → exact
    Jaccard verify (bucketed join) → JOIN-BASED connected components
    (distributed min-label propagation, `stages.dedup.assign_components`).
    The DuckDB twin computes the same components from the brute-force
    pair set with a recursive transitive closure."""
    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard_join(
        pairs, ds, "doc_id", "text", threshold=0.8
    )
    comps = assign_components(verified.select_columns(["id_a", "id_b"]))
    return comps.map_batches(
        lambda b: pa.table(
            {
                "id": pc.cast(b["id"], pa.int64()),
                "rep": pc.cast(b["rep"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q91_neardup_survivors(sf_dir: str):
    """END-TO-END near-duplicate DEDUP — the flagship LLM-corpus operator:
    MinHash-LSH candidates → exact-Jaccard verify (bucketed join) →
    join-based connected components → drop every non-representative member
    → per-language survivor rollup. Composes q22's discovery, q42's
    clustering and the anti-join in one pipeline; `sum_doc_id` is exact
    integer evidence of WHICH docs survived, not just how many. The
    text relation never materializes on the driver; the removal set rides
    a bucketed left-anti join (both-sides-large NOT EXISTS)."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )
    from basicocr_ray.stages.joins import bucketed_hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    ids_text = docs.select_columns(["doc_id", "text"])
    pairs = minhash_candidate_pairs(ids_text, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard_join(
        pairs, ids_text, "doc_id", "text", threshold=0.8
    )
    comps = assign_components(verified.select_columns(["id_a", "id_b"]))

    def removed_only(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["id"], b["rep"])
        return pa.table(
            {"doc_id": pc.cast(b.filter(keep)["id"], pa.int64())}
        )

    removed = comps.map_batches(removed_only, batch_format="pyarrow")
    survivors = bucketed_hash_join(
        docs.select_columns(["doc_id", "lang"]),
        removed,
        key="doc_id",
        left_columns=["lang"],
        right_columns=[],
        join_type="left anti",
    )
    out = (
        survivors.groupby("lang")
        .aggregate(
            Count(alias_name="n_kept"),
            Sum("doc_id", alias_name="sum_doc_id"),
        )
        .to_pandas()
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_doc_id"] = out["sum_doc_id"].astype("int64")
    return out


def q109_lsh_calibration(sf_dir: str):
    """LSH CALIBRATION AUDIT — the measurement that justifies a banding
    choice before burning 100 TB of compute on it: for every candidate
    pair surfaced by (B=8, r=2) MinHash banding, how many bands matched
    vs the pair's EXACT Jaccard. Uses an md5-based MinHash
    (mh_p = min over shingles of md5(f"{p}:{shingle}")) precisely so the
    whole sketch is SQL-expressible and the audit itself is
    oracle-checkable — integers end to end (per-bands-matched pair
    counts and exact Σinter/Σunion). Distributed shape: signatures per
    batch (zero shuffle), band-key groups coarse-salted, per-pair band
    counts in key-hash groups, shingle sets fetched back by TWO bucketed
    joins (text never rides the band shuffle), tiny final rollup."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    P, R = 16, 2
    B = P // R
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_set(text: str) -> list[str]:
        toks = token_items(text)
        return sorted(
            {
                " ".join(toks[i : i + 3])
                for i in range(len(toks) - 2)
            }
        )

    def sets_batch(b: pa.Table) -> pa.Table:
        # the set rides joins as ONE \\x1f-joined string (Acero doesn't
        # take list<> payload columns), split again at the verify
        ids, sets = [], []
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            s = shingle_set(t or "")
            if s:
                ids.append(i)
                sets.append("\x1f".join(s))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(sets, pa.string()),
            }
        )

    sets_ds = ds.map_batches(sets_batch, batch_format="pyarrow").materialize()

    def band_rows(b: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for i, joined in zip(b["doc_id"].to_pylist(), b["s"].to_pylist()):
            s = joined.split("\x1f")
            mh = [
                min(md5_hex(f"{p}:{sh}") for sh in s) for p in range(P)
            ]
            for band in range(B):
                ids.append(i)
                bands.append(band)
                keys.append("|".join(mh[band * R : band * R + R]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int64()),
                "key": pa.array(keys, pa.string()),
            }
        )

    bands_ds = sets_ds.map_batches(band_rows, batch_format="pyarrow")

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for (_, _), grp in df.groupby(["band", "key"]):
            ids = sorted(grp["doc_id"].tolist())
            for a, c in combinations(ids, 2):
                out1.append(a)
                out2.append(c)
        return pd.DataFrame(
            {
                "id1": pd.array(out1, dtype="int64"),
                "id2": pd.array(out2, dtype="int64"),
            }
        )

    pair_rows = coarse_group_reduce(bands_ds, "key", pairs_in_group)

    # bands_matched per pair: count the per-band pair emissions inside
    # pair-hash coarse groups (a pair never spans groups → exact)
    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id1", "id2"], as_index=False).agg(
            bands_matched=("id1", "size")
        )
        return g.astype(
            {"id1": "int64", "id2": "int64", "bands_matched": "int64"}
        )

    pairs = (
        coarse_group_reduce(pair_rows, ["id1", "id2"], count_pairs)
        .map_batches(
            lambda b: pa.table(
                {
                    "id1": pc.cast(b["id1"], pa.int64()),
                    "id2": pc.cast(b["id2"], pa.int64()),
                    "bands_matched": pc.cast(b["bands_matched"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    s1 = sets_ds.map_batches(
        lambda b: pa.table({"id1": b["doc_id"], "s1": b["s"]}),
        batch_format="pyarrow",
    )
    s2 = sets_ds.map_batches(
        lambda b: pa.table({"id2": b["doc_id"], "s2": b["s"]}),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        pairs, s1, key="id1",
        left_columns=["id2", "bands_matched"], right_columns=["s1"],
    )
    j2 = bucketed_hash_join(
        j1, s2, key="id2",
        left_columns=["bands_matched", "s1"], right_columns=["s2"],
    )

    def verify(b: pa.Table) -> pa.Table:
        bm, inter, uni = [], [], []
        for m, a, c in zip(
            b["bands_matched"].to_pylist(),
            b["s1"].to_pylist(),
            b["s2"].to_pylist(),
        ):
            sa, sc = set(a.split("\x1f")), set(c.split("\x1f"))
            n_i = len(sa & sc)
            bm.append(m)
            inter.append(n_i)
            uni.append(len(sa) + len(sc) - n_i)
        return pa.table(
            {
                "bands_matched": pa.array(bm, pa.int64()),
                "inter": pa.array(inter, pa.int64()),
                "uni": pa.array(uni, pa.int64()),
            }
        )

    df = (
        j2.map_batches(verify, batch_format="pyarrow")
        .groupby("bands_matched")
        .aggregate(
            Count(alias_name="n_pairs"),
            Sum("inter", alias_name="sum_inter"),
            Sum("uni", alias_name="sum_union"),
        )
        .to_pandas()
    )
    for c in ("bands_matched", "n_pairs", "sum_inter", "sum_union"):
        df[c] = df[c].astype("int64")
    return df


def q123_simhash_hamming(sf_dir: str):
    """SimHash near-dup at a HAMMING RADIUS (Manku et al., WWW 2007 —
    the web-crawl near-dup algorithm q23's exact-signature match can't
    do): 32-bit md5-based SimHash per doc (bit i sum of ±occurrence
    over tokens, >0 → 1; exact integers, SQL-reconstructible), split
    into 4 × 8-bit bands — by PIGEONHOLE any pair within hamming ≤ 3
    agrees exactly on ≥1 band, so band-bucket candidates are a
    superset of the answer and the exact popcount(xor) verify inside
    the bucket is complete. The corpus is doubled with one-token-
    appended clones (doc_id+10000) whose distance is usually small but
    NOT zero — the radius search is doing real work. Shuffles carry
    (band value, id, 32-bit sig) — never text. The production scale
    path is `stages/dedup.py:simhash_pairs` (64-bit signature, same
    pigeonhole bucketing, bit-matrix popcount verify); this query is
    its ORACLE-AUDITABLE twin (the q109 discipline: md5 signature the
    SQL twin reconstructs bit-for-bit)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def signatures(batch: pa.Table) -> pa.Table:
        out_band, out_bv, out_id, out_sig = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                # oracle lockstep: NULL text yields no tokens on either
                # side (list_filter(NULL) / NULL || ' zzz' are both NULL)
                continue
            for docid, text in ((did, t), (did + 10000, f"{t} zzz")):
                toks = token_items(text)
                if not toks:
                    # token-less doc: the SQL twin has no row in `sig`
                    # for it (unnest of an empty list emits nothing)
                    continue
                hs = np.array(
                    [_md5_low64(tok) & 0xFFFFFFFF for tok in toks],
                    dtype=np.uint32,
                ).reshape(-1, 1)
                # ±1 per occurrence per bit, summed vectorized
                bits = ((hs >> np.arange(32, dtype=np.uint32)) & 1)
                sums = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                sig = int(((sums > 0) << np.arange(32)).sum())
                for b in range(4):
                    out_band.append(b)
                    out_bv.append((sig >> (b * 8)) & 255)
                    out_id.append(docid)
                    out_sig.append(sig)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int64()),
                "bv": pa.array(out_bv, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "sig": pa.array(out_sig, pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        o1, o2, hd = [], [], []
        for _, grp in df.groupby(["band", "bv"]):
            rows = sorted(zip(grp["doc_id"], grp["sig"]))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = int(rows[i][1] ^ rows[j][1]).bit_count()
                    if d <= 3:
                        o1.append(rows[i][0])
                        o2.append(rows[j][0])
                        hd.append(d)
        return pd.DataFrame(
            {"id_a": pd.array(o1, dtype="int64"),
             "id_b": pd.array(o2, dtype="int64"),
             "hamming": pd.array(hd, dtype="int64")}
        )

    cands = coarse_group_reduce(
        ds.map_batches(signatures, batch_format="pyarrow"),
        ["band", "bv"],
        bucket_pairs,
    )

    # a pair found in k bands appears k times — distinct via one more
    # bounded coarse-group pass on the pair key
    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return coarse_group_reduce(cands, ["id_a", "id_b"], distinct)


def q134_duplicate_spans(sf_dir: str):
    """Cross-document DUPLICATED-SPAN detection — the span-level exact
    substring dedup of Lee et al. 2022 ('Deduplicating Training Data
    Makes Language Models Better') re-expressed for Ray Data: every
    stride-1 word 5-gram emits (md5 fp, doc_id, pos) — the fp exchange
    holds ALL occurrences of a gram, so the ≥2-distinct-docs test is
    exact and text never rides a shuffle; duplicated positions come
    back to doc-keyed coarse groups where overlapping/adjacent gram
    intervals [pos, pos+5) merge into MAXIMAL spans (the
    gaps-and-islands reduce). Output per affected doc: span count and
    words covered — the measurement that decides whether span-level
    cutting is worth running on a corpus. Kernel single-sourced in
    `stages/dedup.py:duplicate_spans` (shared with the spec op)."""
    from basicocr_ray.stages.dedup import duplicate_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_spans(ds, id_column="doc_id", text_column="text",
                           width=5)


def q135_priority_dedup(sf_dir: str):
    """Keep-BEST-source exact dedup — the multi-corpus union resolution
    (curated > web > crawl) where q10's min-id pick is arbitrary: each
    source gets a deterministic integer priority (md5-low64(source) %
    100, a stand-in for a curation-quality rank with the same execution
    shape) and per distinct text the highest-priority row wins (tie →
    lowest doc_id), with the multiplicity alongside. Kernel
    single-sourced in `stages/dedup.py:priority_dedup` (shared with the
    spec op): the shuffle carries (id, priority, fp) — text never moves."""
    from basicocr_ray.stages.dedup import priority_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def add_prio(batch: pa.Table) -> pa.Table:
        # NULL source → priority of '' (oracle: coalesce(source, ''))
        prio = [
            _md5_low64(s if s is not None else "") % 100
            for s in batch["source"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "prio": pa.array(prio, pa.int64()),
            }
        )

    return priority_dedup(
        ds.map_batches(add_prio, batch_format="pyarrow"),
        id_column="doc_id", text_column="text", priority_column="prio",
    )


def q136_winnow_fingerprints(sf_dir: str):
    """Document FINGERPRINTING by winnowing (Schleimer et al., SIGMOD
    2003 — the MOSS algorithm): md5 of every char 8-gram, window-of-4
    minima, distinct selected hashes per doc. Winnowing guarantees any
    shared substring of length ≥ k+w−1 = 11 chars yields a shared
    fingerprint while storing only ~2/(w+1) of the grams — the
    plagiarism-detection-grade dedup sketch between exact md5 (q11) and
    MinHash (q22). Zero-shuffle scan (the fingerprint SET stays
    per-doc); output is the (doc_id, n_grams, n_fps) profile the
    storage sizing of a fingerprint index needs. md5 keeps the window
    minima SQL-reconstructible — the oracle replays the same selection
    with a window-function MIN."""
    from basicocr_ray.core.sketches import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def winnow(batch: pa.Table) -> pa.Table:
        out_id, out_g, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None or len(t) < 8:
                continue  # oracle lockstep: length(text) >= 8 filter
            n_grams, fps = winnow_fingerprints(t, k=8, w=4)
            if not fps:
                continue  # no full window → no row on either side
            out_id.append(did)
            out_g.append(n_grams)
            out_f.append(len(fps))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_grams": pa.array(out_g, pa.int64()),
                "n_fps": pa.array(out_f, pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


def q139_cdc_chunks(sf_dir: str):
    """CONTENT-DEFINED CHUNKING (the LBFS/rsync/restic primitive a crawl-
    snapshot store runs so one edit reshifts one chunk boundary instead
    of every fixed-width boundary after it — the storage-dedup
    complement of q76's fixed chunks): cut after a character whenever
    the md5-low64 of the 8-char window ending there ≡ 0 (mod 64) —
    expected ~64-char chunks. Zero-shuffle scan (boundaries are a pure
    per-doc function); output per doc: chunk count and max chunk
    length, the sizing profile a chunk store needs. Kernel
    single-sourced in `core/sketches.py:cdc_chunk_lengths` (shared with
    the `cdc_chunk` spec op); md5 keeps every boundary
    SQL-reconstructible."""
    from basicocr_ray.core.sketches import cdc_chunk_lengths

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_mx = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                continue  # oracle lockstep: WHERE text IS NOT NULL
            lens = cdc_chunk_lengths(t, k=8, divisor=64)
            out_id.append(did)
            out_n.append(len(lens))
            out_mx.append(max(lens) if lens else 0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "max_len": pa.array(out_mx, pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def q140_sorted_neighborhood(sf_dir: str):
    """SORTED-NEIGHBORHOOD dedup blocking (Hernández & Stolfo 1995 —
    the entity-resolution family LSH doesn't cover: sort by a blocking
    key, compare only rows within a window): rank every doc by
    (n_chars, doc_id) with the range-partition window machinery (no
    global sort in one task), pair each rank with ranks +1/+2 in
    rank-keyed coarse groups (rank rows carry (rn, id) only), fetch
    texts for the survivors via TWO bucketed hash joins (text never
    rides the rank shuffle — the verify_pairs_jaccard_join discipline),
    and keep pairs with exact word-set Jaccard ≥ 1/2 as the integer
    cross-multiplication 2·inter ≥ uni. The oracle replays rank,
    window and list_intersect algebra exactly."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        grouped_window_rank,
    )

    # materialized once: this narrow projection is consumed three times
    # (rank input + both text-join sides) — without this the parquet
    # read would re-execute per consumer (the q145/q137 discipline)
    docs = _read(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"]
    ).materialize()

    ranked = grouped_window_rank(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "g": pa.array([0] * b.num_rows, pa.int64()),
                    "doc_id": b["doc_id"],
                    "n_chars": b["n_chars"],
                }
            ),
            batch_format="pyarrow",
        ),
        "g", "n_chars", "doc_id", 1,
    ).map_batches(
        lambda b: b.select(["doc_id", "rn"]), batch_format="pyarrow"
    )

    W = 2  # window: compare rank r with r+1 .. r+W

    def fan_out(b: pa.Table) -> pa.Table:
        rn = b["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        anchors = np.concatenate([rn - d for d in range(W + 1)])
        return pa.table(
            {
                "a": pa.array(anchors, pa.int64()),
                "rn": pa.array(np.tile(rn, W + 1), pa.int64()),
                "doc_id": pa.array(np.tile(ids, W + 1), pa.int64()),
            }
        )

    def window_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for a, grp in df.groupby("a"):
            anchor = grp[grp["rn"] == a]
            if anchor.empty:
                continue
            aid = int(anchor["doc_id"].iloc[0])
            for _, row in grp[grp["rn"] > a].iterrows():
                out_a.append(aid)
                out_b.append(int(row["doc_id"]))
        return pd.DataFrame(
            {"id_a": pd.array(out_a, dtype="int64"),
             "id_b": pd.array(out_b, dtype="int64")}
        )

    cand = coarse_group_reduce(
        ranked.map_batches(fan_out, batch_format="pyarrow"),
        "a", window_pairs,
    )

    texts = docs.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
    )

    def rename(key, name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({key: b["doc_id"], name: b["text"]})

        return fn

    with_a = bucketed_hash_join(
        cand,
        texts.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        key="id_a", left_columns=["id_b"], right_columns=["text_a"],
    )
    with_both = bucketed_hash_join(
        with_a,
        texts.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        key="id_b", left_columns=["id_a", "text_a"],
        right_columns=["text_b"],
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_i, out_u = [], [], [], []
        for a, b_, ta, tb in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            sa = set(token_items(ta)) if ta else set()
            sb = set(token_items(tb)) if tb else set()
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            if uni > 0 and 2 * inter >= uni:
                out_a.append(a)
                out_b.append(b_)
                out_i.append(inter)
                out_u.append(uni)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "inter": pa.array(out_i, pa.int64()),
                "uni": pa.array(out_u, pa.int64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


def q141_snapshot_chunk_reuse(sf_dir: str):
    """Cross-SNAPSHOT chunk-store savings — the measurement
    content-defined chunking exists for (LBFS §3): wave 1 re-crawls
    every doc, a third of them with a one-char prefix edit; both waves
    chunk with the q139 CDC rule IN THE SAME TASK (no second corpus
    scan) and only (fp, wave, id, len) rows ride the fp-keyed exchange,
    where a wave-1 chunk is REUSED iff its fp already exists in wave 0.
    Because CDC boundaries resynchronize after an edit, edited docs
    still reuse most chunks — exactly what the per-flag
    (total_chars, reused_chars) rollup shows, and what fixed-width
    chunking would destroy. Oracle replays chunking, fps and the
    membership test in full list algebra."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.sketches import cdc_chunk_lengths
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out_fp, out_w, out_id, out_ln = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                continue
            for wave, tw in ((0, t), (1, ("X" + t) if did % 3 == 0 else t)):
                pos = 0
                for ln in cdc_chunk_lengths(tw, k=8, divisor=64):
                    out_fp.append(md5_hex(tw[pos : pos + ln]))
                    out_w.append(wave)
                    out_id.append(did)
                    out_ln.append(ln)
                    pos += ln
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                "wave": pa.array(out_w, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "ln": pa.array(out_ln, pa.int64()),
            }
        )

    def mark_reused(df: pd.DataFrame) -> pd.DataFrame:
        in_a = df.groupby("fp")["wave"].transform("min") == 0
        b = df[df["wave"] == 1].copy()
        b["edited"] = (b["doc_id"] % 3 == 0).astype("int64")
        b["rl"] = b["ln"] * in_a[b.index].astype("int64")
        g = b.groupby("edited", as_index=False).agg(
            total_chars=("ln", "sum"), reused_chars=("rl", "sum")
        )
        g["total_chars"] = g["total_chars"].astype("int64")
        g["reused_chars"] = g["reused_chars"].astype("int64")
        return g[["edited", "total_chars", "reused_chars"]]

    partial = coarse_group_reduce(
        ds.map_batches(chunk_rows, batch_format="pyarrow"),
        "fp", mark_reused,
    )

    agg = (
        partial.groupby("edited")
        .aggregate(
            Sum("total_chars", alias_name="total_chars"),
            Sum("reused_chars", alias_name="reused_chars"),
        )
        .to_pandas()
    )

    # doc counts per flag: a second scan that reads ONLY doc_id (the
    # text IS NOT NULL predicate pushes into the parquet read — text
    # bytes never leave storage again)
    import pyarrow.dataset as pads

    ids = _read(
        sf_dir, "documents", columns=["doc_id"],
        filter=pads.field("text").is_valid(),
    )

    def doc_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["edited"] = (df["doc_id"] % 3 == 0).astype("int64")
        g = df.groupby("edited", as_index=False).agg(
            n_docs=("doc_id", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    nd = (
        ids.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("edited")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    out = agg.merge(nd, on="edited")
    for c in ("edited", "total_chars", "reused_chars", "n_docs"):
        out[c] = out[c].astype("int64")
    return out[["edited", "n_docs", "total_chars", "reused_chars"]]


def q159_span_cut(sf_dir: str):
    """SPAN-CUT REWRITE — the actionable half of Lee et al. 2022 exact
    substring dedup (q134 measures the duplicated spans; this query CUTS
    them and proves the rewritten text). Shape: the shared
    `_dup_gram_positions` exchange yields maximal duplicated intervals
    per doc (`dup_span_intervals`), intervals pack to ONE tiny edit-list
    row per affected doc, and one doc-keyed bucketed LEFT join brings
    the edit list to the text — the only exchange the text rides, and
    the minimum any rewrite needs (edit instructions must meet the
    bytes). Evidence per doc: token counts plus md5 of the
    space-rejoined kept tokens — exact string proof of the cut, not just
    a count. Kernel single-sourced in `stages/dedup.py:span_cut_rewrite`
    (shared with the `span_cut` spec op)."""
    from basicocr_ray.stages.dedup import span_cut_rewrite

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    rewritten = span_cut_rewrite(docs, "doc_id", "text", width=5)

    def evidence(b: pa.Table) -> pa.Table:
        md = [md5_hex(t or "") for t in b["cut_text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_words": pc.cast(b["n_words"], pa.int64()),
                "n_cut": pc.cast(b["n_cut"], pa.int64()),
                "kept_md5": pa.array(md, pa.string()),
            }
        )

    return rewritten.map_batches(evidence, batch_format="pyarrow")


def q162_incremental_neardup(sf_dir: str):
    """INCREMENTAL MinHash near-dup — the operational form of q22: a new
    crawl wave dedups against a PERSISTED band index instead of
    re-banding history. Wave 1 (doc_id < 250, filter pushed into the
    parquet scan) ingests its band rows into a content-hash-named index;
    wave 2 bands ONCE and its candidates come from (a) the usual salted
    band buckets within the wave and (b) one bucketed hash join of its
    band rows against the index — history's TEXT is never re-read, the
    index carries num_bands small ints per ingested doc. Exact Jaccard
    verify at 0.8 owns precision (the q22 discipline; hot buckets expand
    fully for the exact-pair contract). Output = every near-dup pair
    involving a wave-2 doc; the oracle is the brute-force cross-pair
    restriction of q22's."""
    import tempfile

    import pyarrow.dataset as pads

    from basicocr_ray.stages.dedup import (
        incremental_minhash_candidates,
        verify_pairs_jaccard_join,
    )

    SPLIT = 250
    old = _read(
        sf_dir, "documents", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < SPLIT,
    )
    new = _read(
        sf_dir, "documents", columns=["doc_id", "text"],
        filter=pads.field("doc_id") >= SPLIT,
    )
    idx = tempfile.mkdtemp(prefix="q162_bands_")
    try:
        # wave 1: ingest history (within-wave-1 pairs are q22's
        # business, not this query's — only the index side effect is
        # consumed). Wave 2 is terminal here → commit=False.
        incremental_minhash_candidates(
            old, idx, num_bands=32, hot_bucket_mode="full"
        )
        pairs, _ = incremental_minhash_candidates(
            new, idx, num_bands=32, hot_bucket_mode="full",
            commit=False,
        )
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        verified = verify_pairs_jaccard_join(
            pairs, ds, "doc_id", "text", threshold=0.8
        )
        # materialize (output-sized) before dropping the scratch index
        # the lazy cross-join still reads from
        return verified.select_columns(["id_a", "id_b"]).materialize()
    finally:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)


def q163_incremental_exact(sf_dir: str):
    """INCREMENTAL exact dedup across waves — each shard dedups against
    everything ingested before it without rescanning old text
    (`incremental_exact_dedup`: within-wave min-id first-occurrence →
    single-shuffle ANTI-JOIN against the persisted fingerprint index →
    survivors stream out of a semi-join; the index grows by fp rows
    only). Wave 1 = the corpus; wave 2 is PLANTED from it (the q50
    discipline): every doc re-keyed +10000 with text unchanged (exact
    dup of history → dropped) except doc_id≡0 mod 3 which gets a ' v2'
    suffix (novel → survives), plus +20000 clones of the mod-5 rows
    (within-wave dups → min id wins). Evidence: surviving (doc_id,
    fp=md5(text)) — the oracle predicts the exact survivor set."""
    import tempfile

    from basicocr_ray.stages.dedup import incremental_exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def second_wave(b: pa.Table) -> pa.Table:
        out_id, out_t = [], []
        for i, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            t = t if t is not None else ""
            t2 = t + " v2" if i % 3 == 0 else t
            out_id.append(i + 10000)
            out_t.append(t2)
            if i % 5 == 0:
                out_id.append(i + 20000)
                out_t.append(t2)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_t, pa.string()),
            }
        )

    idx = tempfile.mkdtemp(prefix="q163_fps_")
    try:
        incremental_exact_dedup(ds, idx)  # wave 1: ingest the corpus
        survivors, _ = incremental_exact_dedup(
            ds.map_batches(second_wave, batch_format="pyarrow"), idx,
            commit=False,  # terminal wave: nothing dedups against it
        )

        def evidence(b: pa.Table) -> pa.Table:
            fps = [md5_hex(t or "") for t in b["text"].to_pylist()]
            return pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "fp": pa.array(fps, pa.string()),
                }
            )

        # materialize (output-sized) before dropping the scratch index
        # the lazy anti-join still reads from
        return survivors.map_batches(
            evidence, batch_format="pyarrow"
        ).materialize()
    finally:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)


def q169_shingle_containment(sf_dir: str):
    """Asymmetric CONTAINMENT near-dup (Broder 1997): ordered doc pairs
    where ≥ 50% of the source doc's distinct word 5-gram shingles also
    appear in the superset doc — the quote/subset relation symmetric
    Jaccard (q22) misses. Kernel in `stages/dedup.py:shingle_containment`
    (distinct-shingle exchange → exact ordered pair counts → per-source
    shingle counts → one bucketed join; text never rides a shuffle)."""
    from basicocr_ray.stages.dedup import shingle_containment

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return shingle_containment(
        ds, id_column="doc_id", text_column="text", width=5,
        threshold=0.5,
    )


def q171_edit2_fuzzy_pairs(sf_dir: str):
    """Edit-distance-≤2 fuzzy vocabulary self-join — q68's FastSS
    deletion-neighborhood join generalized to depth 2 (`stages.simjoin.
    editk_vocab_join`): every pair of distinct corpus tokens with exact
    Levenshtein distance 1 or 2, with the distance in the output. The
    vocab is length-bounded (4..16 chars) on BOTH sides — the variant
    explode is O(L²) per token at depth 2, so the bound is the
    scale-safety contract, mirrored in the oracle's WHERE."""
    from basicocr_ray.stages.simjoin import editk_vocab_join

    ds = _read(sf_dir, "documents", columns=["text"])

    def local_vocab(b: pa.Table) -> pa.Table:
        s: set = set()
        for t in b["text"].to_pylist():
            if t:
                s.update(
                    w for w in token_items(t) if 4 <= len(w) <= 16
                )
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    vocab = ds.map_batches(local_vocab, batch_format="pyarrow")
    return editk_vocab_join(vocab, max_d=2)


__all__ = [
    "q10_dedup_exact",
    "q11_fingerprint",
    "q22_minhash_neardup",
    "q23_simhash_dup",
    "q42_neardup_components",
    "q51_jaccard_join_exact",
    "q68_edit1_fuzzy_pairs",
    "q76_chunk_dedup",
    "q91_neardup_survivors",
    "q109_lsh_calibration",
    "q123_simhash_hamming",
    "q134_duplicate_spans",
    "q135_priority_dedup",
    "q136_winnow_fingerprints",
    "q139_cdc_chunks",
    "q140_sorted_neighborhood",
    "q141_snapshot_chunk_reuse",
    "q159_span_cut",
    "q162_incremental_neardup",
    "q163_incremental_exact",
    "q169_shingle_containment",
    "q171_edit2_fuzzy_pairs",
]


QUERIES = {
    "q10_dedup_exact": q10_dedup_exact,
    "q11_fingerprint": q11_fingerprint,
    "q22_minhash_neardup": q22_minhash_neardup,
    "q23_simhash_dup": q23_simhash_dup,
    "q42_neardup_components": q42_neardup_components,
    "q51_jaccard_join_exact": q51_jaccard_join_exact,
    "q68_edit1_fuzzy_pairs": q68_edit1_fuzzy_pairs,
    "q76_chunk_dedup": q76_chunk_dedup,
    "q91_neardup_survivors": q91_neardup_survivors,
    "q109_lsh_calibration": q109_lsh_calibration,
    "q123_simhash_hamming": q123_simhash_hamming,
    "q134_duplicate_spans": q134_duplicate_spans,
    "q135_priority_dedup": q135_priority_dedup,
    "q136_winnow_fingerprints": q136_winnow_fingerprints,
    "q139_cdc_chunks": q139_cdc_chunks,
    "q140_sorted_neighborhood": q140_sorted_neighborhood,
    "q141_snapshot_chunk_reuse": q141_snapshot_chunk_reuse,
    "q159_span_cut": q159_span_cut,
    "q162_incremental_neardup": q162_incremental_neardup,
    "q163_incremental_exact": q163_incremental_exact,
    "q169_shingle_containment": q169_shingle_containment,
    "q171_edit2_fuzzy_pairs": q171_edit2_fuzzy_pairs,
}


ORACLE_SQL = {
    "q10_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q11_fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    "q22_minhash_neardup": """
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (len(list_intersect(a.g, b.g))::DOUBLE
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) >= 0.8
    """,
    "q23_simhash_dup": """
        SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents
    """,
    "q42_neardup_components": """
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (len(list_intersect(a.g, b.g))::DOUBLE
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
                >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, peer) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
        )
        SELECT node AS id,
               CAST(least(node, min(peer)) AS BIGINT) AS rep
        FROM reach GROUP BY node
    """,
    "q51_jaccard_join_exact": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS s
          FROM toks
        ),
        sized AS (SELECT doc_id, s, len(s) AS n FROM sets),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.s, b.s)) AS n_inter,
                 a.n + b.n - len(list_intersect(a.s, b.s)) AS n_union
          FROM sized a JOIN sized b
            ON a.doc_id < b.doc_id
           AND least(a.n, b.n) >= 0.6 * greatest(a.n, b.n)
        )
        SELECT id_a, id_b,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(n_union AS BIGINT) AS n_union
        FROM cand
        WHERE n_union > 0 AND n_inter >= 0.6 * n_union
    """,
    "q68_edit1_fuzzy_pairs": """
        WITH vocab AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL
            UNION
            SELECT source AS tok FROM documents WHERE source IS NOT NULL
          ) WHERE tok <> ''
        )
        SELECT a.tok AS tok_a, b.tok AS tok_b
        FROM vocab a JOIN vocab b ON a.tok < b.tok
        WHERE levenshtein(a.tok, b.tok) <= 1
    """,
    "q76_chunk_dedup": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        ), chunks AS (
          SELECT doc_id,
                 unnest(generate_series(1, nch)) AS idx,
                 unnest(list_transform(
                   generate_series(1, nch),
                   i -> array_to_string(ts[(i-1)*10+1 : i*10], ' '))) AS chunk
          FROM (SELECT doc_id, ts,
                       CAST(ceil(len(ts) / 10.0) AS BIGINT) AS nch
                FROM toks)
        ), kept AS (
          SELECT doc_id, idx, chunk FROM (
            SELECT doc_id, idx, chunk,
                   row_number() OVER (
                     PARTITION BY chunk ORDER BY doc_id, idx) AS rn
            FROM chunks)
          WHERE rn = 1
        )
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY idx) AS clean_text,
               count(*) AS n_chunks
        FROM kept GROUP BY doc_id
    """,
    "q91_neardup_survivors": """
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (len(list_intersect(a.g, b.g))::DOUBLE
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
                >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, peer) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
        ),
        removed AS (
          SELECT node FROM reach GROUP BY node
          HAVING least(node, min(peer)) <> node
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM documents
        WHERE doc_id NOT IN (SELECT node FROM removed)
        GROUP BY lang
    """,
    "q109_lsh_calibration": f"""
        -- md5-MinHash (16 perms, 8 bands x 2 rows) candidate pairs with
        -- per-pair matched-band counts vs EXACT Jaccard evidence
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS s
          FROM toks
        ),
        nonempty AS (SELECT doc_id, s FROM sets WHERE len(s) > 0),
        sh AS (SELECT doc_id, unnest(s) AS shingle FROM nonempty),
        mh AS (
          SELECT doc_id, p,
                 min(md5(CAST(p AS VARCHAR) || ':' || shingle)) AS mh
          FROM sh CROSS JOIN range(16) t(p) GROUP BY 1, 2
        ),
        bands AS (
          SELECT doc_id, p // 2 AS band,
                 string_agg(mh, '|' ORDER BY p) AS key
          FROM mh GROUP BY 1, 2
        ),
        pb AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 count(*) AS bands_matched
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key
           AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        sized AS (SELECT doc_id, s, len(s) AS n FROM nonempty),
        j AS (
          SELECT pb.bands_matched,
                 len(list_intersect(x.s, y.s)) AS inter,
                 x.n + y.n - len(list_intersect(x.s, y.s)) AS uni
          FROM pb JOIN sized x ON pb.id1 = x.doc_id
                  JOIN sized y ON pb.id2 = y.doc_id
        )
        SELECT CAST(bands_matched AS BIGINT) AS bands_matched,
               count(*) AS n_pairs,
               CAST(sum(inter) AS BIGINT) AS sum_inter,
               CAST(sum(uni) AS BIGINT) AS sum_union
        FROM j GROUP BY 1
    """,
    "q123_simhash_hamming": f"""
        -- 32-bit md5 SimHash, 4x8-bit pigeonhole bands, exact
        -- popcount(xor) verify at radius 3 (Manku et al. 2007)
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 10000, text || ' zzz' FROM documents
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM corpus
        ),
        th AS (
          SELECT doc_id,
                 md5_number_lower(token) % 4294967296 AS h32
          FROM toks
        ),
        bits AS (
          SELECT doc_id, i.i,
                 sum(CASE WHEN (h32 >> i.i) & 1 = 1
                     THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN range(32) i(i)
          GROUP BY 1, 2
        ),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i)
                          ELSE 0 END) AS BIGINT) AS sig
          FROM bits GROUP BY doc_id
        ),
        bands AS (
          SELECT doc_id, sig, b.b AS band,
                 (sig >> CAST(b.b * 8 AS INTEGER)) & 255 AS bv
          FROM sig CROSS JOIN range(4) b(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
                          a.sig AS sa, c.sig AS sb
          FROM bands a
          JOIN bands c
            ON a.band = c.band AND a.bv = c.bv
           AND a.doc_id < c.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
    "q134_duplicate_spans": f"""
        -- stride-1 word 5-grams; grams in >= 2 distinct docs merge into
        -- maximal spans (gaps-and-islands, break when gap > 5)
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 ) AS fps
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (
          SELECT doc_id, unnest(fps) AS fp,
                 unnest(range(1, len(fps) + 1)) - 1 AS pos
          FROM g0
        ),
        dup AS (
          SELECT fp FROM g GROUP BY fp
          HAVING count(DISTINCT doc_id) >= 2
        ),
        d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (fp)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                      ) <= 5 THEN 0 ELSE 1 END AS brk
          FROM d
        ),
        sp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                 ) AS sid
          FROM isl
        ),
        spans AS (
          SELECT doc_id, sid, min(pos) AS a, max(pos) + 5 AS b
          FROM sp GROUP BY 1, 2
        )
        SELECT doc_id, count(*) AS n_dup_spans,
               CAST(sum(b - a) AS BIGINT) AS n_dup_words
        FROM spans GROUP BY 1
    """,
    "q135_priority_dedup": """
        -- keep-best-source dedup: highest md5-derived source priority
        -- per distinct text, tie to lowest doc_id, multiplicity kept
        WITH d AS (
          SELECT doc_id, md5(coalesce(text, '')) AS fp,
                 CAST(md5_number_lower(coalesce(source, '')) % 100
                      AS BIGINT) AS prio
          FROM documents
        ),
        w AS (
          SELECT doc_id, prio,
                 row_number() OVER (
                   PARTITION BY fp ORDER BY prio DESC, doc_id
                 ) AS rn,
                 count(*) OVER (PARTITION BY fp) AS n_dups
          FROM d
        )
        SELECT doc_id, prio, CAST(n_dups AS BIGINT) AS n_dups
        FROM w WHERE rn = 1
    """,
    "q136_winnow_fingerprints": """
        -- winnowing (k=8, w=4): md5 per char 8-gram, window-of-4 MIN,
        -- distinct selected hashes per doc
        WITH s AS (
          SELECT doc_id, lower(text) AS t FROM documents
          WHERE text IS NOT NULL AND length(text) >= 8
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, length(t) - 6),
                   i -> md5(substr(t, i, 8))
                 ) AS hs
          FROM s
        ),
        g AS (
          SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
                 unnest(hs) AS h,
                 unnest(range(1, len(hs) + 1)) AS i
          FROM g0
        ),
        w AS (
          SELECT doc_id, n_grams, i,
                 min(h) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
                 ) AS mh
          FROM g
        ),
        sel AS (
          SELECT DISTINCT doc_id, n_grams, mh FROM w WHERE i >= 4
        )
        SELECT doc_id, n_grams, count(*) AS n_fps
        FROM sel GROUP BY 1, 2
    """,
    "q139_cdc_chunks": """
        -- content-defined chunk boundaries: cut after char i+7 whenever
        -- md5_number_lower(substr(t, i, 8)) % 64 == 0 (cut < len only)
        WITH s AS (
          SELECT doc_id, text AS t, length(text) AS L
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, L,
                 list_transform(
                   list_filter(
                     range(1, greatest(L - 7, 0) + 1),
                     i -> md5_number_lower(substr(t, i, 8)) % 64 = 0
                          AND i + 7 < L
                   ),
                   i -> i + 7
                 ) AS cuts
          FROM s
        ),
        z AS (
          SELECT doc_id,
                 list_concat(cuts, [L]) AS ends,
                 list_concat([0], cuts) AS starts
          FROM c
        )
        SELECT doc_id,
               CAST(len(ends) AS BIGINT) AS n_chunks,
               CAST(list_aggregate(
                 list_transform(range(1, len(ends) + 1),
                                j -> ends[j] - starts[j]),
                 'max'
               ) AS BIGINT) AS max_len
        FROM z
    """,
    "q140_sorted_neighborhood": f"""
        -- SNM: rank by (n_chars, doc_id), window 2, exact word-set
        -- Jaccard >= 1/2 as 2*inter >= uni
        WITH r AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS rn
          FROM documents
        ),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM r a JOIN r b ON b.rn - a.rn IN (1, 2)
        ),
        toks AS (
          SELECT doc_id,
                 list_distinct(list_filter({_TOKS}, x -> x <> '')) AS s
          FROM documents
        ),
        j AS (
          SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS inter,
                 CAST(len(x.s) + len(y.s)
                      - len(list_intersect(x.s, y.s)) AS BIGINT) AS uni
          FROM cand c
          JOIN toks x ON x.doc_id = c.id_a
          JOIN toks y ON y.doc_id = c.id_b
        )
        SELECT id_a, id_b, inter, uni FROM j
        WHERE uni > 0 AND 2 * inter >= uni
    """,
    "q141_snapshot_chunk_reuse": """
        -- two crawl waves CDC-chunked; a wave-1 chunk is REUSED iff its
        -- md5 fp exists anywhere in wave 0
        WITH base AS (
          SELECT doc_id, text AS t FROM documents WHERE text IS NOT NULL
        ),
        waves AS (
          SELECT doc_id, 0 AS wave, t FROM base
          UNION ALL
          SELECT doc_id, 1 AS wave,
                 CASE WHEN doc_id % 3 = 0 THEN 'X' || t ELSE t END
          FROM base
        ),
        c AS (
          SELECT doc_id, wave, t, length(t) AS L,
                 list_transform(
                   list_filter(
                     range(1, greatest(length(t) - 7, 0) + 1),
                     i -> md5_number_lower(substr(t, i, 8)) % 64 = 0
                          AND i + 7 < length(t)
                   ),
                   i -> i + 7
                 ) AS cuts
          FROM waves
        ),
        z AS (
          SELECT doc_id, wave, t,
                 list_concat([0], cuts) AS starts,
                 list_concat(cuts, [L]) AS ends
          FROM c
        ),
        ch AS (
          SELECT doc_id, wave,
                 unnest(list_transform(range(1, len(ends) + 1),
                        j -> ends[j] - starts[j])) AS ln,
                 unnest(list_transform(range(1, len(ends) + 1),
                        j -> md5(substr(t, starts[j] + 1,
                                        ends[j] - starts[j])))) AS fp
          FROM z
        ),
        afps AS (SELECT DISTINCT fp FROM ch WHERE wave = 0),
        b AS (
          SELECT doc_id, ln,
                 CASE WHEN fp IN (SELECT fp FROM afps)
                      THEN 1 ELSE 0 END AS reused,
                 CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS edited
          FROM ch WHERE wave = 1
        )
        SELECT CAST(edited AS BIGINT) AS edited,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(ln) AS BIGINT) AS total_chars,
               CAST(sum(ln * reused) AS BIGINT) AS reused_chars
        FROM b GROUP BY 1
    """,
    "q159_span_cut": r"""
        -- q134's maximal duplicated spans, then CUT: md5 of the
        -- space-rejoined kept tokens proves the rewrite byte-for-byte
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   lower(coalesce(text, '')), '\s+'), x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 ) AS fps
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (
          SELECT doc_id, unnest(fps) AS fp,
                 unnest(range(1, len(fps) + 1)) - 1 AS pos
          FROM g0
        ),
        dup AS (
          SELECT fp FROM g GROUP BY fp
          HAVING count(DISTINCT doc_id) >= 2
        ),
        d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (fp)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                      ) <= 5 THEN 0 ELSE 1 END AS brk
          FROM d
        ),
        sp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                 ) AS sid
          FROM isl
        ),
        spans AS (
          SELECT doc_id, sid, min(pos) AS a, max(pos) + 5 AS b
          FROM sp GROUP BY 1, 2
        ),
        pos AS (
          SELECT doc_id, unnest(range(0, len(tk))) AS p FROM toks
        ),
        posw AS (
          SELECT pos.doc_id, p, t.tk[p + 1] AS w
          FROM pos JOIN toks t USING (doc_id)
        ),
        kept AS (
          SELECT doc_id, p, w FROM posw
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = posw.doc_id
              AND posw.p >= s.a AND posw.p < s.b
          )
        )
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_words,
               CAST(len(t.tk) - count(k.p) AS BIGINT) AS n_cut,
               md5(coalesce(string_agg(k.w, ' ' ORDER BY k.p), ''))
                 AS kept_md5
        FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
        GROUP BY t.doc_id, len(t.tk)
    """,
    "q162_incremental_neardup": """
        -- q22's brute-force Jaccard restricted to pairs involving a
        -- wave-2 doc (id_a < id_b and wave-2 ids are the upper range,
        -- so "at least one new" == id_b >= 250)
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE b.doc_id >= 250
          AND (len(list_intersect(a.g, b.g))::DOUBLE
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) >= 0.8
    """,
    "q163_incremental_exact": """
        -- wave-2 survivors: first within-wave occurrence of each fp
        -- that history (wave 1 = the corpus) has never seen
        WITH oldd AS (
          SELECT DISTINCT md5(coalesce(text, '')) AS fp FROM documents
        ),
        neww AS (
          SELECT doc_id + 10000 AS doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN coalesce(text, '') || ' v2'
                      ELSE coalesce(text, '') END AS t
          FROM documents
          UNION ALL
          SELECT doc_id + 20000,
                 CASE WHEN doc_id % 3 = 0
                      THEN coalesce(text, '') || ' v2'
                      ELSE coalesce(text, '') END
          FROM documents WHERE doc_id % 5 = 0
        ),
        nf AS (SELECT doc_id, md5(t) AS fp FROM neww)
        SELECT n.doc_id, n.fp FROM nf n
        WHERE NOT EXISTS (SELECT 1 FROM oldd o WHERE o.fp = n.fp)
          AND n.doc_id = (SELECT min(m.doc_id) FROM nf m
                          WHERE m.fp = n.fp)
    """,
    "q169_shingle_containment": f"""
        -- ordered-pair shingle containment over distinct word 5-gram
        -- md5 sets; keep pairs with |S(a) ∩ S(b)| / |S(a)| >= 0.5
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 )) AS fp
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (SELECT DISTINCT doc_id, fp FROM g0),
        nsh AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        pairs AS (
          SELECT ga.doc_id AS src_id, gb.doc_id AS sup_id,
                 count(*) AS n_inter
          FROM g ga JOIN g gb USING (fp)
          WHERE ga.doc_id <> gb.doc_id
          GROUP BY 1, 2
        )
        SELECT p.src_id, p.sup_id,
               CAST(p.n_inter AS BIGINT) AS n_inter,
               CAST(nsh.n AS BIGINT) AS n_src,
               round(p.n_inter::DOUBLE / nsh.n, 6) AS containment
        FROM pairs p JOIN nsh ON p.src_id = nsh.doc_id
        WHERE p.n_inter::DOUBLE / nsh.n >= 0.5
    """,
    "q171_edit2_fuzzy_pairs": """
        -- brute-force Levenshtein over the length-bounded vocab; the
        -- 4..16 length bound is the Ray side's variant-explode contract
        WITH vocab AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL
          ) WHERE length(tok) BETWEEN 4 AND 16
        )
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
        FROM vocab a JOIN vocab b ON a.tok < b.tok
        WHERE levenshtein(a.tok, b.tok) <= 2
    """,
}
