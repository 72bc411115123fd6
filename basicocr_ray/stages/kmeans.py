"""Distributed Lloyd k-means over an embedding column.

Iterative-algorithm pattern (task brief "IVF ... as the scale path"):
centroids broadcast each round; every batch computes partial
(sum, count) per cluster VECTORIZED (no per-row Python); the driver
reduces the tiny (k × dim) partials and updates centroids. The data never
shuffles — per round it is one `map_batches` pass, so cost is
O(rounds × scan), the canonical distributed-kmeans shape.

Deterministic: init centroids are the first k vectors in vec-id order
(k-means|| style seeding would also be deterministic but needs a second
scan; id-order init keeps tests exact), ties in assignment break to the
lowest cluster index via argmin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from basicocr_ray.core.collect import collect_rows


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # squared euclidean via ||x||² - 2x·c + ||c||²; argmin ties → lowest idx
    d = (
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ centroids.T)
        + (centroids * centroids).sum(axis=1)[None, :]
    )
    return np.argmin(d, axis=1)


def kmeans_fit(
    ds,
    k: int = 8,
    n_iters: int = 10,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    dim: int = 64,
) -> np.ndarray:
    """→ (k, dim) centroid matrix after ``n_iters`` Lloyd rounds."""
    # deterministic init: k lowest-id vectors (one tiny sorted take)
    first = collect_rows(ds.sort(id_column).limit(k))
    centroids = np.asarray([r[vec_column] for r in first], dtype=np.float64)

    for _ in range(n_iters):
        cen = centroids  # broadcast via closure capture (k×dim is tiny)

        def partial(batch: pa.Table) -> pa.Table:
            m = np.asarray(batch[vec_column].to_pylist(), dtype=np.float64)
            a = _assign(m, cen)
            sums = np.zeros((k, m.shape[1]))
            counts = np.zeros(k, dtype=np.int64)
            np.add.at(sums, a, m)
            np.add.at(counts, a, 1)
            nz = counts > 0
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k)[nz], pa.int32()),
                    "count": pa.array(counts[nz], pa.int64()),
                    "vec_sum": pa.array(sums[nz].tolist(),
                                        pa.list_(pa.float64())),
                }
            )

        rows = collect_rows(ds.map_batches(partial, batch_format="pyarrow"))
        sums = np.zeros((k, centroids.shape[1]))
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vec_sum"])
            counts[r["cluster"]] += r["count"]
        new = centroids.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        if np.allclose(new, centroids, atol=1e-12):
            return new
        centroids = new
    return centroids


def kmeans_assign(ds, centroids: np.ndarray, vec_column: str = "embedding",
                  id_column: str = "vec_id"):
    """→ Dataset (id, cluster) with the final assignment."""
    cen = np.asarray(centroids, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch[vec_column].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster": pa.array(_assign(m, cen), pa.int32()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_int(
    ds,
    seeds_q: np.ndarray,
    n_iters: int = 2,
    vec_column: str = "embedding",
    scale: float = 1_000_000.0,
) -> np.ndarray:
    """INTEGER-EXACT Lloyd rounds over scale-quantized vectors — the
    hashable sibling of `kmeans_fit` (same broadcast-partials shape, no
    shuffle): vectors quantize via `embed.quantize_vec`, assignment is
    exact int64 argmin squared-L2 (ties → lowest cell), and the
    centroid update is elementwise floor(sum/count) computed in float64
    (sums at these magnitudes are exactly representable, so numpy and a
    SQL twin produce bit-identical centroids). Empty cells keep their
    previous centroid. → (k, dim) int64 matrix."""
    from basicocr_ray.stages.embed import _stack, quantize_vec

    cents = np.asarray(seeds_q, dtype=np.int64)
    k = len(cents)
    for _ in range(n_iters):
        cen = cents  # broadcast via closure (k × dim int64 is tiny)

        def partial(batch: pa.Table) -> pa.Table:
            m = quantize_vec(_stack(batch[vec_column]), scale)
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2 * (m @ cen.T)
                + (cen * cen).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            sums = np.zeros((k, m.shape[1]), dtype=np.int64)
            counts = np.zeros(k, dtype=np.int64)
            np.add.at(sums, a, m)
            np.add.at(counts, a, 1)
            nz = counts > 0
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k)[nz], pa.int32()),
                    "count": pa.array(counts[nz], pa.int64()),
                    "vec_sum": pa.array(
                        sums[nz].tolist(), pa.list_(pa.int64())
                    ),
                }
            )

        rows = collect_rows(ds.map_batches(partial, batch_format="pyarrow"))
        sums = np.zeros((k, cents.shape[1]), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["vec_sum"], dtype=np.int64)
            counts[r["cluster"]] += r["count"]
        new = cents.copy()
        nz = counts > 0
        new[nz] = np.floor(
            sums[nz].astype(np.float64) / counts[nz][:, None]
        ).astype(np.int64)
        cents = new
    return cents
