"""Stateful actor-pool stages: trie corrector + AC boilerplate stripper.

SURVEY §2 A2/A3: state (trie, automaton) is built ONCE per actor in
``__init__`` — the `crnn_main.py:102-116` load-weights-once pattern — and
applied per batch in ``__call__``. Broadcast pattern: the small dictionary
rides to each actor either as plain constructor args (serialized once into
the actor definition) or as a ``ray.ObjectRef`` put once by the driver and
fetched zero-copy per node (SURVEY §2.4 J1-J3: never a distributed join).
"""

from __future__ import annotations

from collections.abc import Iterable

import pyarrow as pa

from basicocr_ray.core.ac import ACAutomaton
from basicocr_ray.core.textstats import ws_tokens
from basicocr_ray.core.trie import TrieDict


def _maybe_get(obj):
    """Accept either a plain value or a ray.ObjectRef broadcast handle."""
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


class TrieCorrector:
    """Dictionary correction over a text column (A2).

    entries: [(word, freq)] or an ObjectRef to it (``ray.put`` once on the
    driver for large dictionaries; lookup is in-actor, no shuffle)."""

    def __init__(
        self,
        entries,
        column: str = "main_text",
        out_column: str = "corrected_text",
        max_cost: int = 1,
    ):
        self.trie = TrieDict(_maybe_get(entries))
        self.column = column
        self.out_column = out_column
        self.max_cost = max_cost
        self._cache: dict[str, str] = {}

    def correct_text(self, text: str) -> str:
        out = []
        for tok in text.split(" "):
            hit = self._cache.get(tok)
            if hit is None:
                hit = self.trie.correct(tok, self.max_cost)
                self._cache[tok] = hit
            out.append(hit)
        return " ".join(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        corrected = [self.correct_text(t or "") for t in texts]
        arr = pa.array(corrected, pa.large_string())
        if self.out_column == self.column:  # in-place replacement
            idx = batch.schema.get_field_index(self.column)
            return batch.set_column(idx, self.out_column, arr)
        return batch.append_column(self.out_column, arr)


class ACStripper:
    """Boilerplate-phrase removal over a text column (A3), automaton built
    once per actor (`Test.java:58-66` build / `:76-80` scan+strip)."""

    def __init__(
        self,
        phrases: Iterable[str],
        column: str = "main_text",
        out_column: str = "stripped_text",
        backend: str = "pointer",
    ):
        if backend == "dat":
            # double-array layout (the reference's ACDAT): flat int
            # arrays instead of per-node dicts — pick for very large
            # phrase dictionaries (millions of boilerplate strings)
            from basicocr_ray.core.ac import ACDoubleArray

            self.ac = ACDoubleArray(_maybe_get(phrases))
        else:
            self.ac = ACAutomaton(_maybe_get(phrases))
        self.column = column
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        stripped = [self.ac.strip(t or "") for t in texts]
        arr = pa.array(stripped, pa.large_string())
        if self.out_column == self.column:  # in-place replacement
            idx = batch.schema.get_field_index(self.column)
            return batch.set_column(idx, self.out_column, arr)
        return batch.append_column(self.out_column, arr)
