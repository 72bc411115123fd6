"""Frequency trie + bounded-edit-distance word correction.

Re-expression of the reference's dictionary corrector
(`/root/reference/contrib/trietree/src/trietree_correct.py`):

* build a trie from ``word freq`` pairs (`trietree_correct.py:133-148`);
* fuzzy search walks the trie carrying one Levenshtein DP row per node,
  pruning a subtree when ``min(row) > max_cost`` (`:153-199`, prune `:196`);
* if nothing is found within ``max_cost`` retry once with ``max_cost + 3``
  (`:256-259`);
* tie-break ladder over candidates (`:225-242`): min edit distance →
  prefer same length as the query → max frequency → lexicographically
  smallest (final rung added for total determinism under distribution).

Semantics ported from the reference's documented behavior; implementation
is original (recursive DP-row walk, algorithm per Levenshtein-automaton
folklore, e.g. the classic Norvig/Hanov posts).
"""

from __future__ import annotations

from collections.abc import Iterable


class _Node:
    __slots__ = ("children", "word", "freq")

    def __init__(self) -> None:
        self.children: dict[str, _Node] = {}
        self.word: str | None = None
        self.freq: int = 0


class TrieDict:
    """Dictionary trie with fuzzy lookup (SURVEY.md §2 A2/J2)."""

    def __init__(self, entries: Iterable[tuple[str, int]] = ()):
        self.root = _Node()
        self.n_words = 0
        self.n_nodes = 1
        for word, freq in entries:
            self.insert(word, freq)

    def insert(self, word: str, freq: int = 1) -> None:
        node = self.root
        for ch in word:
            nxt = node.children.get(ch)
            if nxt is None:
                nxt = _Node()
                node.children[ch] = nxt
                self.n_nodes += 1
            node = nxt
        if node.word is None:
            self.n_words += 1
        node.word = word
        node.freq = max(node.freq, freq)

    def __contains__(self, word: str) -> bool:
        node = self.root
        for ch in word:
            node = node.children.get(ch)
            if node is None:
                return False
        return node.word is not None

    def search(self, word: str, max_cost: int) -> list[tuple[str, int, int]]:
        """All dictionary words within ``max_cost`` edits of ``word`` →
        [(candidate, dist, freq)] in deterministic (candidate-sorted) order."""
        current = list(range(len(word) + 1))
        results: list[tuple[str, int, int]] = []
        for ch in sorted(self.root.children):
            self._walk(self.root.children[ch], ch, word, current, results, max_cost)
        return results

    def _walk(
        self,
        node: _Node,
        ch: str,
        word: str,
        prev_row: list[int],
        results: list[tuple[str, int, int]],
        max_cost: int,
    ) -> None:
        n = len(word)
        row = [prev_row[0] + 1]
        for col in range(1, n + 1):
            insert_cost = row[col - 1] + 1
            delete_cost = prev_row[col] + 1
            replace_cost = prev_row[col - 1] + (word[col - 1] != ch)
            row.append(min(insert_cost, delete_cost, replace_cost))
        if row[n] <= max_cost and node.word is not None:
            results.append((node.word, row[n], node.freq))
        if min(row) <= max_cost:  # prune (trietree_correct.py:196)
            for nxt_ch in sorted(node.children):
                self._walk(node.children[nxt_ch], nxt_ch, word, row, results, max_cost)

    def correct(self, word: str, max_cost: int = 1) -> str:
        """Best dictionary correction for ``word`` (trietree_correct.py:245-274
        driver semantics): exact hit → itself; else fuzzy at ``max_cost``,
        retrying once at ``max_cost + 3``; no candidates → word unchanged."""
        if word in self:
            return word
        cands = self.search(word, max_cost)
        if not cands:
            cands = self.search(word, max_cost + 3)  # retry (:256-259)
        if not cands:
            return word
        return self._pick(word, cands)

    @staticmethod
    def _pick(word: str, cands: list[tuple[str, int, int]]) -> str:
        """Tie-break ladder (trietree_correct.py:225-242): min dist →
        same-length preference → max freq → lexicographic."""
        wl = len(word)
        best = min(
            cands,
            key=lambda c: (c[1], 0 if len(c[0]) == wl else 1, -c[2], c[0]),
        )
        return best[0]
