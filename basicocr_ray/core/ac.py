"""Aho–Corasick multi-pattern matcher + boilerplate-phrase stripper.

Re-expression of the reference's double-array AC stopword stripper
(`/root/reference/contrib/acautomata/src/main/java/com/gds/Test.java:58-82`:
build automaton from a phrase dictionary once, scan each line, remove all
hits). Match policy here is **leftmost-longest non-overlapping**, which for
pattern sets with no cross-pattern prefix/suffix sharing is equivalent to a
chained ``replace(text, p, '')`` — the property the DuckDB oracle relies on.

Standard AC construction (goto/fail/output per the Aho–Corasick 1975
paper); no code taken from the reference's Java.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable


class ACAutomaton:
    def __init__(self, patterns: Iterable[str]):
        pats = sorted({p for p in patterns if p})  # dedupe, deterministic order
        self.patterns = pats
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[int] = [-1]  # longest pattern index ending at state
        self.plen: list[int] = [len(p) for p in pats]
        for idx, p in enumerate(pats):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append(-1)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            if self.out[s] == -1 or self.plen[self.out[s]] < len(p):
                self.out[s] = idx
        # BFS fail links
        q: deque[int] = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != t else 0
                # inherit longest output through the fail chain
                fo = self.out[self.fail[t]]
                if self.out[t] == -1 or (
                    fo != -1 and self.plen[fo] > self.plen[self.out[t]]
                ):
                    if fo != -1 and (
                        self.out[t] == -1 or self.plen[fo] > self.plen[self.out[t]]
                    ):
                        self.out[t] = fo

    def find_all(self, text: str) -> list[tuple[int, int, str]]:
        """All (start, end, pattern) match occurrences (may overlap)."""
        res = []
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in self.goto[s]:
                s = self.fail[s]
            s = self.goto[s].get(ch, 0)
            t = s
            while t:
                if self.out[t] != -1:
                    p = self.patterns[self.out[t]]
                    res.append((i + 1 - len(p), i + 1, p))
                t = self.fail[t]
        return res

    def strip(self, text: str) -> str:
        """Remove leftmost-longest non-overlapping matches
        (`Test.java:76-80` removal semantics)."""
        matches = self.find_all(text)
        if not matches:
            return text
        # leftmost-longest selection: sort by (start, -len), greedily take
        matches.sort(key=lambda m: (m[0], -(m[1] - m[0])))
        out = []
        pos = 0
        for start, end, _ in matches:
            if start < pos:
                continue
            out.append(text[pos:start])
            pos = end
        out.append(text[pos:])
        return "".join(out)
