"""Alphabet/vocabulary codec — `strLabelConverter` re-expression.

Reference: `/root/reference/contrib/crnn/utils.py:25-101`. Index 0 is the
reserved CTC blank (`utils.py:31-34`); `encode` flattens a batch of strings
into (codes, lengths) — exactly Arrow's list<int32> offsets+values layout,
which the reference hand-rolls and we keep native.
"""

from __future__ import annotations

from basicocr_ray.core.decode import ctc_collapse


class Vocab:
    """char ↔ id codec with blank=0, mirroring `strLabelConverter`."""

    def __init__(self, alphabet: str, ignore_case: bool = False):
        self.ignore_case = ignore_case
        if ignore_case:
            alphabet = alphabet.lower()
        self.alphabet = alphabet
        # index 0 reserved for blank (utils.py:31-34: ids start at 1)
        self.char_to_id = {ch: i + 1 for i, ch in enumerate(alphabet)}
        self.id_to_char = {i + 1: ch for i, ch in enumerate(alphabet)}

    @property
    def nclass(self) -> int:
        return len(self.alphabet) + 1

    def encode(self, texts: list[str]) -> tuple[list[int], list[int]]:
        """Batch of strings → (flat codes, per-item lengths)
        (`utils.py:44-64` semantics; unknown chars are skipped
        deterministically rather than raising)."""
        codes: list[int] = []
        lengths: list[int] = []
        for t in texts:
            if self.ignore_case:
                t = t.lower()
            ids = [self.char_to_id[c] for c in t if c in self.char_to_id]
            codes.extend(ids)
            lengths.append(len(ids))
        return codes, lengths

    def decode(
        self, codes: list[int], lengths: list[int], raw: bool = False
    ) -> list[str]:
        """(flat codes, lengths) → strings. ``raw=True`` maps ids 1:1
        (`utils.py:82-83`); ``raw=False`` applies the greedy CTC collapse
        first (`utils.py:85-89`). Raises ValueError when sum(lengths) does
        not cover codes — the asserted error path of
        `contrib/crnn/test/test_utils.py:59-62`."""
        if sum(lengths) != len(codes):
            raise ValueError(
                f"codes length {len(codes)} != sum(lengths) {sum(lengths)}"
            )
        out: list[str] = []
        pos = 0
        for ln in lengths:
            seq = codes[pos : pos + ln]
            pos += ln
            if not raw:
                seq = ctc_collapse(seq)
            out.append("".join(self.id_to_char.get(i, "") for i in seq))
        return out
