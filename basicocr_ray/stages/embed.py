"""Embedding operators: brute-force ANN top-k and LSH-bucketed near-dup.

Scale shapes (task brief):
* top-k: per-batch numpy matmul against a BROADCAST query matrix
  (`ray.put` once), local top-k per batch, tiny global sort — the
  baseline; an IVF variant would pre-cluster and prune batches by
  centroid, same per-batch kernel.
* near-dup: random-hyperplane signatures (Charikar 2002 cosine LSH) →
  bucket groupby → exact cosine verify within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix.

    Zero-copy path: for a rectangular non-null list column the flat
    values buffer reshapes directly — no per-row Python list
    round-trip (the ANN hot path runs this per batch). Falls back to
    to_pylist for ragged/null columns."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = col.flatten()  # slice-aware: values of the logical rows
            if flat.null_count == 0 and len(flat) == len(widths) * int(widths[0]):
                vals = flat.to_numpy(zero_copy_only=False)
                return vals.astype(np.float64, copy=False).reshape(
                    len(widths), int(widths[0])
                )
    return np.asarray(col.to_pylist(), dtype=np.float64)


def ann_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
):
    """→ Dataset (vec_id, sim): exact cosine top-k vs one query vector.

    query_vec is closure-captured (tiny); for a query MATRIX use ray.put
    and fetch in an actor __init__. Per-batch local top-k keeps the global
    sort input at k × num_batches rows."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        m = _stack(batch[vec_column])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qn) / norms
        mask = ~np.isin(ids, list(exclude_ids)) if exclude_ids else slice(None)
        ids, sims = ids[mask], sims[mask]
        # local top-k (sim desc, id asc) — deterministic
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                id_column: pa.array(ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["sim", id_column], descending=[True, False]
    ).limit(k)


def ivf_topk(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
    seed: int = 11,
    dim: int = 64,
    centroids: np.ndarray | None = None,
):
    """IVF-style approximate top-k: the scale path for ANN.

    Coarse quantizer = TRAINED centroids when provided (pass the output of
    `stages.kmeans.kmeans_fit` — see `ivf_topk_trained`), else seeded
    random-projection centroids (deterministic, zero training passes).
    Each batch assigns its vectors to the nearest centroid VECTORIZED and
    scores only vectors whose centroid is among the query's ``n_probe``
    nearest — pruning (1 - n_probe/n_clusters) of the corpus from the
    dot-product work. With ``n_probe == n_clusters`` this is exactly
    brute-force `ann_topk` (asserted in tests). Returns (vec_id, sim)."""
    if centroids is not None:
        centroids = np.asarray(centroids, dtype=np.float64).copy()
        n_clusters = len(centroids)
        norms_c = np.linalg.norm(centroids, axis=1)
        norms_c[norms_c == 0] = 1.0
        centroids /= norms_c[:, None]
    else:
        rng = np.random.default_rng(seed)
        centroids = rng.standard_normal((n_clusters, dim))
        centroids /= np.linalg.norm(centroids, axis=1)[:, None]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = set(np.argsort(-(centroids @ qn))[:n_probe].tolist())

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        m = _stack(batch[vec_column])
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        assign = np.argmax((m / norms[:, None]) @ centroids.T, axis=1)
        keep = np.fromiter((a in probe for a in assign), dtype=bool, count=len(ids))
        if exclude_ids:
            keep &= ~np.isin(ids, list(exclude_ids))
        ids, mm, nn = ids[keep], m[keep], norms[keep]
        if len(ids) == 0:
            return pa.table(
                {id_column: pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        sims = (mm @ qn) / nn
        order = np.lexsort((ids, -sims))[:k]
        return pa.table(
            {
                id_column: pa.array(ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["sim", id_column], descending=[True, False]
    ).limit(k)


def ivf_topk_trained(
    ds,
    query_vec: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
):
    """IVF top-k with centroids TRAINED by the distributed k-means stage
    (`stages.kmeans.kmeans_fit`, broadcast-partials, no shuffle) — the
    recall-improving step over random-projection centroids: trained cells
    follow the data distribution, so the query's n_probe cells hold more
    of the true neighbors at equal probe cost."""
    from basicocr_ray.stages.kmeans import kmeans_fit

    cen = kmeans_fit(
        ds, k=n_clusters, n_iters=kmeans_iters,
        vec_column=vec_column, id_column=id_column,
    )
    return ivf_topk(
        ds, query_vec, k=k, n_clusters=n_clusters, n_probe=n_probe,
        id_column=id_column, vec_column=vec_column,
        exclude_ids=exclude_ids, centroids=cen,
    )


def quantize_vec(m: np.ndarray, scale: float = 1_000_000.0) -> np.ndarray:
    """float embedding matrix → int64 via floor(x·scale + 0.5) (round half
    up, DuckDB-compatible: `CAST(floor(CAST(x AS DOUBLE)*scale + 0.5) AS
    BIGINT)`). float32 → float64 is exact and the product/+0.5/floor are
    single IEEE ops, so numpy and SQL produce bit-identical integers —
    the move that makes every downstream distance/dot EXACT (hashable)
    instead of a summation-order-dependent float."""
    return np.floor(
        np.asarray(m, dtype=np.float64) * scale + 0.5
    ).astype(np.int64)


def ivf_topk_int(
    ds,
    query_q: np.ndarray,
    centroids_q: np.ndarray,
    k: int = 10,
    n_probe: int = 3,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    exclude_ids: frozenset[int] = frozenset(),
):
    """INTEGER-EXACT IVF top-k — the ANN scale path with a hashable
    contract (no float summation-order ambiguity anywhere):

    * ``query_q`` / ``centroids_q`` are pre-quantized int64 (see
      `quantize_vec`); the centroid table is bounded (C rows) and rides
      the task closure — at a real corpus scale it is the output of a
      sampled k-means fit, `ray.put` once.
    * each batch quantizes its vectors, assigns every vector to the
      argmin squared-L2 centroid (exact int64 arithmetic; ties → the
      LOWEST cell id, matching the SQL twin's ``ORDER BY d, cid``), and
      scores ONLY vectors whose cell is among the query's ``n_probe``
      nearest cells — pruning (1 − n_probe/C) of the dot-product work,
      which is the entire point of IVF at 100 TB.
    * per-batch local top-k (dot desc, id asc) bounds the final global
      sort at k × num_batches rows.

    Returns Dataset (id, cell, dot) — all int64, bit-reproducible."""
    q = np.asarray(query_q, dtype=np.int64)
    cents = np.asarray(centroids_q, dtype=np.int64)
    # query's probe cells: squared-L2 asc, cell id asc on ties
    dq = ((cents - q) ** 2).sum(axis=1)
    probe_cells = np.lexsort((np.arange(len(cents)), dq))[:n_probe]
    probe = frozenset(int(c) for c in probe_cells)
    c_sq = (cents * cents).sum(axis=1)  # (C,) — reused per batch

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        m = quantize_vec(_stack(batch[vec_column]))
        # ||v−c||² = ||v||² − 2 v·c + ||c||²; argmin ties → first (lowest
        # cell id) — identical to the oracle's (d, cid) ordering
        d2 = (m * m).sum(axis=1)[:, None] - 2 * (m @ cents.T) + c_sq[None, :]
        assign = np.argmin(d2, axis=1)
        keep = np.isin(assign, list(probe))
        if exclude_ids:
            keep &= ~np.isin(ids, list(exclude_ids))
        ids, cells = ids[keep], assign[keep].astype(np.int64)
        dots = m[keep] @ q
        order = np.lexsort((ids, -dots))[:k]
        return pa.table(
            {
                id_column: pa.array(ids[order], pa.int64()),
                "cell": pa.array(cells[order], pa.int64()),
                "dot": pa.array(dots[order], pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["dot", id_column], descending=[True, False]
    ).limit(k)


def cosine_lsh_pairs(
    ds,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    n_planes: int = 16,
    threshold: float = 0.95,
    seed: int = 7,
    dim: int = 64,
    num_salt: int | None = None,
    n_tables: int = 1,
):
    """→ (id_a, id_b) pairs with exact cosine ≥ threshold among LSH-bucket
    collisions. Exact duplicates always collide (same signature) → recall
    1.0 for the dup case; near-dups at angle θ collide with prob
    p = (1 - θ/π)^n_planes per table. ``n_tables`` > 1 is the
    OR-amplification scale path: independent plane sets per table lift
    recall to 1-(1-p)^T at T× shuffle cost (each row ships its vector
    once per table); cross-table duplicate pairs are removed by the
    final pair-distinct pass."""
    rng = np.random.default_rng(seed)
    all_planes = [
        rng.standard_normal((dim, n_planes)) for _ in range(n_tables)
    ]

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        m = _stack(batch[vec_column])
        tabs = []
        for t, planes in enumerate(all_planes):
            bits = (m @ planes) > 0
            sig = np.zeros(len(ids), dtype=np.int64)
            for j in range(n_planes):
                sig |= bits[:, j].astype(np.int64) << j
            # table id rides in the high bits so buckets never collide
            # across tables; carry the vector for the in-bucket verify
            tabs.append(
                pa.table(
                    {
                        id_column: pa.array(ids, pa.int64()),
                        "bucket": pa.array(
                            sig | (np.int64(t) << np.int64(n_planes)),
                            pa.int64(),
                        ),
                        vec_column: batch[vec_column],
                    }
                )
            )
        return pa.concat_tables(tabs)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_column)
        ids = df[id_column].tolist()
        m = np.asarray(df[vec_column].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        sims = mn @ mn.T
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    def coarse_verify(df: pd.DataFrame) -> pd.DataFrame:
        outs = [verify(sub) for _, sub in df.groupby("bucket")]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    from basicocr_ray.stages.dedup import _coarse_salts, _dedupe_pairs

    # cluster-sized coarse groups (same bucket → same group, so the pair
    # set is salt-invariant; round 1's fixed `& 63` capped fan-out)
    salts = _coarse_salts(num_salt)

    pairs = (
        ds.map_batches(to_buckets, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "cg",
                pa.array(
                    (np.asarray(b["bucket"].to_pylist()) & (salts - 1))
                    .astype("int32"),
                    pa.int32(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(coarse_verify, batch_format="pandas")
    )
    return _dedupe_pairs(pairs, num_groups=num_salt)


def knn_self_join_grouped(
    ds,
    k: int = 3,
    group_column: str = "label",
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Per-group exact cosine k-NN SELF-JOIN: within each group, every
    vector's top-k neighbors (self excluded), ties broken by neighbor id.
    → Dataset (group, vec_id, nbr_rank 1..k, nbr_id, sim).

    Scale shape: the group column partitions the quadratic work — one
    groupby co-locates each group, then a single numpy gram-matrix pass
    (sims = (X·Xᵀ) / (‖x‖‖y‖), the DuckDB list_cosine_similarity formula)
    scores the whole group vectorized. Partitioning assumption
    (documented per the task brief): one GROUP's vectors fit a worker —
    the IVF-cell shape; for a corpus-wide knn join, first assign cells
    with `stages.kmeans` (or `_signature` LSH buckets) and run this
    per cell, trading exactness for the probe budget like `ivf_topk`."""

    def knn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_column].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        x = np.asarray(df[vec_column].to_list(), dtype=np.float64)[order]
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0] = 1.0
        sims = (x @ x.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        n = len(ids)
        kk = min(k, n - 1)
        if kk <= 0:
            return pd.DataFrame(
                {
                    group_column: pd.Series([], dtype=df[group_column].dtype),
                    id_column: pd.Series([], dtype="int64"),
                    "nbr_rank": pd.Series([], dtype="int64"),
                    "nbr_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        # columns are in ascending id order, so a STABLE argsort on -sim
        # breaks exact ties by neighbor id ascending
        nbr = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(n), kk)
        return pd.DataFrame(
            {
                group_column: df[group_column].iloc[order[rows]].to_numpy(),
                id_column: ids[rows],
                "nbr_rank": np.tile(np.arange(1, kk + 1), n).astype("int64"),
                "nbr_id": ids[nbr.ravel()],
                "sim": sims[rows, nbr.ravel()],
            }
        )

    return ds.groupby(group_column).map_groups(knn, batch_format="pandas")
