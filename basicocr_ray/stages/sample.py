"""Sampling / shuffling ops (SURVEY §2 T1/T2).

The reference's `randomSequentialSampler` picks random block starts and
reads sequentially within each block (`contrib/crnn/dataset.py:83-106`) —
Ray Data's block-local scheduling gives the "sequential within block"
locality for free; the random part maps to seeded `random_shuffle` /
`random_sample`. Seeds make both reproducible across runs."""

from __future__ import annotations

import pyarrow as pa


def shuffled(ds, seed: int = 42):
    """Full deterministic shuffle (`shuffle=True` loader, crnn_main.py:75-77)."""
    return ds.random_shuffle(seed=seed)


def sampled(ds, fraction: float, seed: int = 42):
    """Bernoulli sample of ~fraction rows (val-subset analogue, T5)."""
    return ds.random_sample(fraction, seed=seed)


def block_sample(ds, every_k: int):
    """Deterministic systematic sample: every k-th row per batch (a
    seed-free sampler for conformance checks — unlike Bernoulli sampling
    its output is invariant to retry timing)."""

    def take(batch: pa.Table) -> pa.Table:
        return batch.take(list(range(0, batch.num_rows, every_k)))

    return ds.map_batches(take, batch_format="pyarrow")
