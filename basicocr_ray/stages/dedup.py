"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-based.

All follow the same scale discipline: per-document sketching happens inside
`map_batches` (no shuffle), the shuffle moves only SMALL keys (hashes,
band buckets, signatures), and expensive verification runs only on
candidate pairs (MMDS ch.3 banding; Broder 1997; Charikar 2002).

Exact dedup is the D3 operator of SURVEY §2.7 (hash-partition on content
fingerprint → per-group first); the reference's only dedup is the CTC
adjacent collapse (D1) which lives in core.decode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from basicocr_ray.core.sketches import MinHasher, ngram_jaccard, simhash, hamming64
from basicocr_ray.core.textstats import md5_hex


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(ds, id_column: str, text_column: str):
    """→ (doc_id, n_dups): representative (min id) + multiplicity per
    distinct text. The shuffle carries (id, fp) only — text stays put."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in batch[text_column].to_pylist()]
        return pa.table(
            {
                id_column: batch[id_column],
                "fp": pa.array(fps, pa.string()),
            }
        )

    def first_per_group(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_column: [df[id_column].min()], "n_dups": [len(df)]}
        )

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(first_per_group, batch_format="pandas")
    )


def assign_components(pairs_ds, max_rounds: int = 20):
    """Near-dup pairs → (id, rep) connected-component labels, rep = min id.

    Distributed min-label propagation: each round, every id adopts the
    smallest label among itself and its neighbors (two groupby rounds per
    iteration: labels join via edges, then min per id). Converges in
    O(component diameter) rounds; near-dup components are tiny chains, so
    a handful of rounds suffices — ``max_rounds`` is a safety bound and
    non-convergence raises. Driver-side union-find would be simpler but
    only valid when the pair set provably fits one machine; this path
    scales (the shuffle key is the doc id, values are (id, label) ints).
    """
    import pyarrow.compute as _pc

    pairs = pairs_ds.map_batches(
        lambda b: pa.table(
            {"id_a": pc_cast_i64(b["id_a"]), "id_b": pc_cast_i64(b["id_b"])}
        ),
        batch_format="pyarrow",
    ).materialize()  # edges are small (pairs only) and reused every round

    # initial labels: every endpoint labels itself
    def endpoints(b: pa.Table) -> pa.Table:
        ids = b["id_a"].to_pylist() + b["id_b"].to_pylist()
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "label": pa.array(ids, pa.int64())})

    def min_per_id(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"id": [df["id"].iloc[0]], "label": [int(df["label"].min())]}
        )

    labels = (
        pairs.map_batches(endpoints, batch_format="pyarrow")
        .groupby("id").map_groups(min_per_id, batch_format="pandas")
        .materialize()
    )
    for _ in range(max_rounds):
        lab_map = {r["id"]: r["label"] for r in labels.take_all()}

        def push(b: pa.Table, lm=lab_map) -> pa.Table:
            a = b["id_a"].to_pylist()
            bb = b["id_b"].to_pylist()
            ids, labs = [], []
            for x, y in zip(a, bb):
                lx, ly = lm.get(x, x), lm.get(y, y)
                m = min(lx, ly)
                ids.extend((x, y))
                labs.extend((m, m))
            return pa.table({"id": pa.array(ids, pa.int64()),
                             "label": pa.array(labs, pa.int64())})

        new_labels = (
            pairs.map_batches(push, batch_format="pyarrow")
            .groupby("id").map_groups(min_per_id, batch_format="pandas")
            .materialize()
        )
        new_map = {r["id"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if new_map == lab_map:
            return labels.map_batches(
                lambda b: pa.table({"id": b["id"], "rep": b["label"]}),
                batch_format="pyarrow",
            )
    raise RuntimeError(f"label propagation did not converge in {max_rounds} rounds")


def pc_cast_i64(col):
    import pyarrow.compute as _pc

    return _pc.cast(col, pa.int64())


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_candidate_pairs(
    ds,
    id_column: str,
    text_column: str,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int = 500,
):
    """→ Dataset of candidate (id_a, id_b) pairs (id_a < id_b), deduped.

    shingle→minhash per batch → explode to (band_id, band_hash, id) rows →
    groupby band bucket → pairs within bucket. The shuffle moves 16 small
    ints per document, never text."""
    hasher = MinHasher(num_perm=num_perm, k=shingle_k)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids_out, bids, bhashes = [], [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            sig = hasher.signature(t or "")
            for bid, bh in hasher.bands(sig, num_bands):
                ids_out.append(i)
                bids.append(bid)
                bhashes.append(bh)
        return pa.table(
            {
                id_column: pa.array(ids_out, pa.int64()),
                "band_id": pa.array(bids, pa.int32()),
                "band_hash": pa.array(bhashes, pa.uint64()),
            }
        )

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs of ONE band (coarse group): per-bucket work
        happens as an in-process pandas groupby, not as one Ray map_groups
        task per bucket — a corpus has millions of (band, hash) buckets
        and per-group task overhead dominates otherwise."""
        a_out: list[int] = []
        b_out: list[int] = []
        for _, ids_s in df.groupby("band_hash")[id_column]:
            ids = sorted(ids_s.unique())
            n = len(ids)
            if n < 2:
                continue
            if n > max_bucket_size:
                # hot-bucket guard: a bucket this large is a degenerate
                # near-identical cluster (or adversarial collision); its
                # O(n²) pairs would dominate the job. Skip — such clusters
                # belong to exact dedup (or salt into sub-buckets).
                continue
            for i in range(n):
                ai = ids[i]
                for j in range(i + 1, n):
                    a_out.append(ai)
                    b_out.append(ids[j])
        return pd.DataFrame(
            {"id_a": pd.Series(a_out, dtype="int64"),
             "id_b": pd.Series(b_out, dtype="int64")}
        )

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band_id")
        .map_groups(band_pairs, batch_format="pandas")
    )
    return _dedupe_pairs(pairs)


def _dedupe_pairs(pairs, extra_cols: tuple[str, ...] = ()):
    """Distinct (id_a, id_b) via 64 coarse hash groups with a vectorized
    pandas drop_duplicates inside each — NOT one map_groups per pair
    (millions of tiny calls) and NOT a Ray Aggregate keyed on every pair
    (its sort-based path stalls at high distinct-key cardinality here)."""
    import pyarrow.compute as _pc

    def add_cg(b: pa.Table) -> pa.Table:
        cg = _pc.cast(
            _pc.bit_wise_and(_pc.cast(b["id_a"], pa.int64()), 63), pa.int32()
        )
        return b.append_column("cg", cg)

    cols = ["id_a", "id_b", *extra_cols]

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        if extra_cols:  # keep the min of the extra column per pair
            df = df.sort_values(cols, kind="mergesort")
        return df.drop_duplicates(subset=["id_a", "id_b"])[cols]

    return (
        pairs.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(dd, batch_format="pandas")
    )


def verify_pairs_jaccard(
    pairs_ds,
    texts_by_id: dict[int, str],
    threshold: float,
    shingle_k: int = 5,
):
    """Candidate pairs → confirmed near-dups with exact n-gram Jaccard.

    ``texts_by_id`` is a broadcast lookup (``ray.put`` once, read per
    actor/task). At 100 TB scale this side would not fit — there you
    bucket-join pairs back to texts on id (hash-partitioned join) instead;
    the broadcast variant is the small-side fast path (SURVEY §2.4)."""
    import ray

    ref = ray.put(texts_by_id)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        sims = [
            ngram_jaccard(lookup.get(x, ""), lookup.get(y, ""), shingle_k)
            for x, y in zip(a, b)
        ]
        out = pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_exact_dup_pairs(ds, id_column: str, text_column: str):
    """Exact-duplicate pairs via SimHash bucketing: group by the full
    64-bit signature (identical docs always collide), verify with md5 text
    equality inside the bucket — signature collisions between
    merely-similar docs are rejected. The shuffle carries (id, sig, fp);
    text never moves."""

    def sig_fp(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        texts = batch[text_column].to_pylist()
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "sig": pa.array(
                    [simhash(t or "") for t in texts], pa.uint64()
                ),
                "fp": pa.array([md5_hex(t or "") for t in texts], pa.string()),
            }
        )

    def coarse_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, sub in df.groupby("sig"):
            sub = sub.sort_values(id_column)
            ids = sub[id_column].tolist()
            fps = sub["fp"].tolist()
            n = len(ids)
            for i in range(n):
                for j in range(i + 1, n):
                    if fps[i] == fps[j]:
                        a.append(ids[i])
                        b.append(ids[j])
        return pd.DataFrame({"id_a": pd.Series(a, dtype="int64"),
                             "id_b": pd.Series(b, dtype="int64")})

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.append_column(
            "cg", _pc.cast(
                _pc.bit_wise_and(batch["sig"], np.uint64(63)), pa.int32()
            )
        )

    return (
        ds.map_batches(sig_fp, batch_format="pyarrow")
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(coarse_pairs, batch_format="pandas")
    )


def simhash_pairs(
    ds,
    id_column: str,
    text_column: str,
    max_hamming: int = 3,
    token_k: int = 4,
):
    """→ (id_a, id_b, hamming) pairs with distance ≤ max_hamming.

    Bucketing: split the 64-bit signature into 4 × 16-bit chunks — any pair
    within hamming ≤ 3 shares at least one exact chunk (pigeonhole), so
    grouping by (chunk_id, chunk_value) has perfect recall; verification
    computes the true distance inside each bucket."""

    def to_chunks(batch: pa.Table) -> pa.Table:
        ids_out, cids, cvals, sigs = [], [], [], []
        for i, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            sig = simhash(t or "", token_k)
            for c in range(4):
                ids_out.append(i)
                cids.append(c)
                cvals.append((sig >> (16 * c)) & 0xFFFF)
                sigs.append(sig)
        return pa.table(
            {
                id_column: pa.array(ids_out, pa.int64()),
                "chunk_id": pa.array(cids, pa.int32()),
                "chunk_val": pa.array(cvals, pa.int32()),
                "sig": pa.array(sigs, pa.uint64()),
            }
        )

    def chunk_verify(df: pd.DataFrame) -> pd.DataFrame:
        """One coarse group per chunk_id; per-value buckets handled by an
        in-process pandas groupby (not one Ray task per tiny bucket)."""
        a, b, h = [], [], []
        for _, sub in df.groupby("chunk_val"):
            rows = sub.drop_duplicates(subset=[id_column]).sort_values(id_column)
            ids = rows[id_column].tolist()
            sigs = rows["sig"].tolist()
            n = len(ids)
            for i in range(n):
                for j in range(i + 1, n):
                    d = hamming64(int(sigs[i]), int(sigs[j]))
                    if d <= max_hamming:
                        a.append(ids[i])
                        b.append(ids[j])
                        h.append(d)
        return pd.DataFrame({"id_a": pd.Series(a, dtype="int64"),
                             "id_b": pd.Series(b, dtype="int64"),
                             "hamming": pd.Series(h, dtype="int64")})

    pairs = (
        ds.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("chunk_id")
        .map_groups(chunk_verify, batch_format="pandas")
    )
    return _dedupe_pairs(pairs, extra_cols=("hamming",))
