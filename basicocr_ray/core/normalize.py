"""Text width/case normalization + whitespace folding.

Re-expression of the reference's normalizer
(`/root/reference/contrib/trietree/src/trietree_correct.py:45-72`):
`B2Q`/`Q2B` full-width ↔ half-width conversion (0x3000 → space, otherwise
±0xFEE0 over the 0xFF01–0xFF5E band) and `uniform` = Q2B + lowercase.

Implemented as a single precomputed ``str.translate`` table so it is both
vectorization-friendly (one C call per string) and exactly reproducible.
"""

from __future__ import annotations

import re

# Full-width → half-width translate table (trietree_correct.py:56-66 semantics).
_Q2B_TABLE = {0x3000: 0x20}
for _code in range(0xFF01, 0xFF5F):
    _Q2B_TABLE[_code] = _code - 0xFEE0

_B2Q_TABLE = {0x20: 0x3000}
for _code in range(0x21, 0x7F):
    _B2Q_TABLE[_code] = _code + 0xFEE0

# ASCII whitespace + NBSP + LS/PS + ideographic space: a closed, explicit
# set so folding never shifts with unicode data versions.
_WS_RE = re.compile("[ \\t\\r\\n\\f\\v\\u00a0\\u2028\\u2029\\u3000]+")


def string_q2b(text: str) -> str:
    """Full-width → half-width (`stringQ2B`, trietree_correct.py:68-70)."""
    return text.translate(_Q2B_TABLE)


def string_b2q(text: str) -> str:
    """Half-width → full-width (`stringB2Q`, trietree_correct.py:64-66)."""
    return text.translate(_B2Q_TABLE)


def uniform(text: str) -> str:
    """Width-fold + lowercase (`uniform`, trietree_correct.py:72)."""
    return string_q2b(text).lower()


def collapse_ws(text: str) -> str:
    """Browser-like whitespace folding: runs of whitespace → one space,
    stripped at both ends. Part of the byte-identity contract — shared by
    oracle and pipeline, never batch-dependent."""
    # fast path: ASCII text already in folded form (no non-space
    # whitespace, no runs, no edge spaces) returns unchanged — five C
    # substring scans beat one regex sub on the hot extraction kernel.
    # isascii() gates the shortcut so U+00A0/U+2028/U+2029/U+3000 (in
    # _WS_RE but invisible to these checks) always take the regex path.
    if (
        text.isascii()
        and "  " not in text
        and "\t" not in text
        and "\n" not in text
        and "\r" not in text
        and "\f" not in text
        and "\v" not in text
        and text[:1] != " "
        and text[-1:] != " "
    ):
        return text
    return _WS_RE.sub(" ", text).strip()
