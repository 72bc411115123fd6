"""Wide (shuffling) operator helpers — built to SHRINK data before any
all-to-all exchange.

SURVEY §2.5 G3/G4: the reference's own docs prescribe sharded
count-then-merge for n-gram statistics (`split -l 10000` → per-shard
`ngram-count` → `merge-batch-counts`, language-model.md:168-197). The Ray
Data translation: partial aggregation INSIDE `map_batches` (one row per key
per batch), then a small `groupby().sum()` over the partials — the shuffle
moves keys, never documents.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Iterable

import pandas as pd
import pyarrow as pa


def partial_count_batch(
    batch: pa.Table,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    key_name: str = "token",
) -> pa.Table:
    """pages/documents batch → (key, cnt) partial counts (the per-shard
    `ngram-count` step). Output rows ≤ distinct keys in batch — typically
    orders of magnitude smaller than the token stream."""
    c: Counter[str] = Counter()
    for t in batch[text_column].to_pylist():
        if t:
            c.update(item_fn(t))
    keys = list(c.keys())
    return pa.table(
        {
            key_name: pa.array(keys, pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def token_items(text: str) -> list[str]:
    """Whitespace tokens, lowercased — MUST stay in lockstep with the
    DuckDB oracle expression `regexp_split_to_array(lower(text), '\\s+')`."""
    return text.lower().split()


def make_ngram_items(n: int) -> Callable[[str], list[str]]:
    def items(text: str) -> list[str]:
        toks = text.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    return items


def count_terms(
    ds,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    key_name: str = "token",
):
    """Dataset → (key, cnt) aggregated counts. Shuffle input: partials only
    (G3/G4 partial+final shape); the FINAL sum runs inside cluster-sized
    coarse groups of the key hash (same key → same group, pandas sum is
    exact) — a Ray Aggregate keyed on every distinct token is the
    high-cardinality sort stall on an open-vocabulary corpus."""
    import hashlib

    import pandas as pd

    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def add_cg(b: pa.Table) -> pa.Table:
        cgs = [
            int.from_bytes(hashlib.md5(k.encode()).digest()[:4], "little")
            & (salts - 1)
            for k in b[key_name].to_pylist()
        ]
        return b.append_column("cg", pa.array(cgs, pa.int32()))

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_name, as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    partials = ds.map_batches(
        lambda b: partial_count_batch(b, text_column, item_fn, key_name),
        batch_format="pyarrow",
    )
    return (
        partials.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(final_sum, batch_format="pandas")
    )


def approx_distinct(
    ds,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    p: int = 12,
) -> float:
    """Approximate distinct item count via mergeable HyperLogLog sketches:
    one sketch per batch (the only thing each task emits is 2^p bytes),
    max-merged driver-side. The exact alternative (`flat_map → unique`)
    shuffles every key; this never shuffles — the sketch pattern the
    reference's sharded count/merge docs gesture at, taken to its limit."""
    from basicocr_ray.core.sketches import HyperLogLog

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        toks: list[str] = []
        for t in batch[text_column].to_pylist():
            if t:
                toks.extend(item_fn(t))
        h.add_many(toks)  # one vectorized hash pass per batch
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(HyperLogLog.deserialize(row["sketch"], p))
    return merged.count()


def top_k(ds, k: int, key: str, tie_key: str):
    """Global top-k by (key desc, tie_key asc): per-batch local prune to k
    (partial top-k) before the tiny global sort — no full-data sort at
    scale."""

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            [key, tie_key], ascending=[False, True], kind="mergesort"
        ).head(k)

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return pruned.sort([key, tie_key], descending=[True, False]).limit(k)
