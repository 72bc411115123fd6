"""Deterministic dictionary-based CJK word segmentation (SURVEY §2 M14).

Reference analogue: the HanLP segmentation pass of the AC-automaton
pipeline (`/root/reference/contrib/acautomata/src/main/java/com/gds/
Test.java:20-53`, `HanLP.segment(line)` at line 28) — the reference
segments zh text with a dictionary segmenter before frequency counting.
No segmentation library exists in this container, so the engine ships the
classic FORWARD MAXIMUM MATCHING algorithm over a broadcast lexicon: at
each position take the longest dictionary word starting there (bounded by
the lexicon's max word length), else emit the single character. Fully
deterministic — output depends only on (text, lexicon).

The lexicon rides the same broadcast discipline as the trie corrector
(A2): built once driver-side, `ray.put`, rebuilt as a set in each actor's
``__init__`` (`stages.segment.SegmentTokenizer`).
"""

from __future__ import annotations


class FmmSegmenter:
    """Forward-maximum-matching segmenter over a closed lexicon.

    Matching is longest-first at each position; characters not starting
    any dictionary word are emitted as single-character tokens (HanLP's
    OOV fallback analogue). ``max_len`` is derived from the lexicon so a
    degenerate huge entry cannot make the scan quadratic."""

    def __init__(self, lexicon):
        self.words = frozenset(w for w in lexicon if w)
        self.max_len = max((len(w) for w in self.words), default=1)
        # per-first-char max length prunes the window for sparse lexicons
        self._first: dict[str, int] = {}
        for w in self.words:
            c = w[0]
            if len(w) > self._first.get(c, 0):
                self._first[c] = len(w)

    def segment(self, text: str) -> list[str]:
        out: list[str] = []
        i = 0
        n = len(text)
        while i < n:
            limit = min(self._first.get(text[i], 1), n - i)
            for length in range(limit, 0, -1):
                cand = text[i : i + length]
                if length == 1 or cand in self.words:
                    out.append(cand)
                    i += length
                    break
        return out
