"""Benchmark decontamination and corpus-wide chunk dedup.

Two standard LLM-training-corpus hygiene operators the reference has no
analogue for (its dedup is the per-sample CTC collapse,
contrib/crnn/utils.py:85-89); both follow the house scale discipline:

* **n-gram decontamination** (GPT-3 appendix C / PaLM §6 style): drop or
  flag training documents sharing any word n-gram with a held-out
  benchmark set. The benchmark side is SMALL by definition (an eval set,
  not a corpus), so it is the canonical J1 broadcast: build the gram set
  once, ``ray.put`` it, probe per batch inside ``map_batches`` — the
  100-TB training side streams with NO shuffle.

* **chunk-level exact dedup with reassembly** (the CCNet paragraph-dedup
  shape, Wenzek et al. 2020 §4.1): split every document into fixed-width
  word chunks, keep each distinct chunk's FIRST occurrence corpus-wide
  (min (doc_id, idx)), and reassemble surviving chunks per document. The
  shuffle carries (chunk-hash, doc_id, idx, chunk) rows grouped by
  coarse salts of the chunk hash — a duplicate-heavy corpus collapses
  inside the group task, and no group is ever a whole relation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex, ws_tokens
from basicocr_ray.stages.dedup import _coarse_salts


def _word_ngrams(text: str | None, n: int) -> list[str]:
    toks = ws_tokens(text or "")
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def build_benchmark_grams(bench_ds, text_column: str, n: int):
    """Distinct word n-grams of the benchmark set as one driver-side
    frozenset, ready for ``ray.put``.

    Boundedness contract: the benchmark side is an EVAL set (thousands of
    documents), not a training corpus — the same small-side-only contract
    as the J1 dict broadcast (stages/correct.py). Per-batch local
    dedup bounds what crosses the wire; the driver holds only the
    distinct grams."""

    def grams_of_batch(b: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in b[text_column].to_pylist():
            out.update(_word_ngrams(t, n))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    grams: set[str] = set()
    for row in collect_rows(
        bench_ds.map_batches(grams_of_batch, batch_format="pyarrow")
    ):
        grams.add(row["gram"])
    return frozenset(grams)


def flag_contaminated(
    docs_ds,
    grams_ref,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 5,
):
    """Per-document contamination flag + distinct-hit count against a
    broadcast benchmark gram set (``grams_ref`` is a ``ray.ObjectRef`` to
    the frozenset from :func:`build_benchmark_grams`, or the set itself
    for tests). Pure ``map_batches`` — zero shuffle at any corpus size."""
    import ray

    def probe(b: pa.Table) -> pa.Table:
        grams = (
            ray.get(grams_ref)
            if isinstance(grams_ref, ray.ObjectRef)
            else grams_ref
        )
        ids = b[id_column].to_pylist()
        hits = []
        for t in b[text_column].to_pylist():
            doc_grams = set(_word_ngrams(t, n))
            hits.append(len(doc_grams & grams))
        harr = pa.array(hits, pa.int64())
        import pyarrow.compute as pc

        return pa.table(
            {
                id_column: b[id_column],
                "n_hit": harr,
                "contaminated": pc.greater(harr, 0),
            }
        )

    return docs_ds.map_batches(probe, batch_format="pyarrow")


def chunk_dedup_reassemble(
    docs_ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    chunk_words: int = 10,
    num_salt: int | None = None,
):
    """Corpus-wide first-occurrence chunk dedup + per-document
    reassembly (CCNet §4.1 at chunk granularity).

    1. ``map_batches`` splits each doc into ``chunk_words``-word chunks
       tagged (doc_id, idx, chunk, coarse-salt-of-md5(chunk)).
    2. one shuffle groups by the coarse salt; inside the group a
       vectorized pandas idxmin keeps each chunk's lexicographically
       first (doc_id, idx) — chunk equality never spans groups because
       the salt is a function of the chunk alone.
    3. a second coarse-grouped fold on doc_id string-aggregates the
       surviving chunks back into documents in idx order.

    Documents whose every chunk was claimed elsewhere disappear (they
    contributed nothing new) — the SQL twin's GROUP BY over kept chunks
    has the same behavior."""
    salts = _coarse_salts(num_salt)

    def explode(b: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for did, t in zip(
            b[id_column].to_pylist(), b[text_column].to_pylist()
        ):
            toks = ws_tokens(t or "")
            for i in range(0, len(toks), chunk_words):
                ids.append(did)
                idxs.append(i // chunk_words + 1)
                chunks.append(" ".join(toks[i : i + chunk_words]))
        if not ids:
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "idx": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "cg": pa.array([], pa.int32()),
                }
            )
        h = pd.util.hash_array(np.asarray(chunks, dtype=object))
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "chunk": pa.array(chunks, pa.string()),
                "cg": pa.array((h & (salts - 1)).astype("int32")),
            }
        )

    def first_occurrence(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [id_column, "idx"], kind="mergesort"
        ).drop_duplicates("chunk", keep="first")
        h = pd.util.hash_array(df[id_column].to_numpy())
        df = df[[id_column, "idx", "chunk"]].copy()
        df["cg2"] = (h & (salts - 1)).astype("int32")
        return df

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_column, "idx"], kind="mergesort")
        out = df.groupby(id_column, as_index=False).agg(
            clean_text=("chunk", " ".join),
            n_chunks=("chunk", "size"),
        )
        return out.astype({id_column: "int64", "n_chunks": "int64"})

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(first_occurrence, batch_format="pandas")
        .groupby("cg2")
        .map_groups(reassemble, batch_format="pandas")
    )
