"""HTML → ordered block sequence (the text-DETECTION analogue).

Reference mapping (SURVEY.md §2 M9 / §1.2 `blocks` table): the CTPN /
SegLink detector proposes an ordered sequence of candidate text regions per
image; here a regex-driven lexer proposes an ordered sequence of DOM text
blocks per page. Block order is the CTC timestep axis — it must be
preserved end-to-end (`contrib/crnn/utils.py:85-89` decode is
order-sensitive), which is why a document's blocks always stay inside one
row / one Python call and never become independently-shuffled dataset rows.

A hand-rolled lexer (not html.parser) because:
  * deterministic: no recovery heuristics that could change between Python
    versions — every rule is in this file;
  * fast: one compiled regex scan per document, no per-character callbacks.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass

from basicocr_ray.config import (
    BLOCK_TAGS,
    DROP_TAGS,
    RAW_TEXT_TAGS,
    VOID_TAGS,
    DEFAULT_CONFIG,
    ExtractConfig,
)
from basicocr_ray.core.normalize import collapse_ws

# One scan: comments, doctype/CDATA/processing instructions, and tags.
# Single capture group (tag name, None for non-tags) — closing slash and
# self-closing tail are read by direct text indexing around m.span(),
# which is measurably cheaper than two more capture groups per match.
_TAG_RE = re.compile(
    r"""</?([a-zA-Z][a-zA-Z0-9:_\-]*)(?:"[^"]*"|'[^']*'|[^>"'])*>  # tag (first: ~99% of matches; the <! / <? forms can never match it, so order is correctness-neutral)
      | <!--.*?(?:-->|\Z)          # comment (unterminated → to EOF)
      | <!\[CDATA\[.*?(?:\]\]>|\Z) # CDATA
      | <![^>]*>                   # doctype / other declarations
      | <\?[^>]*>                  # processing instruction
    """,
    re.S | re.X,
)

@dataclass
class Block:
    """One candidate text region (≙ one CTC frame).

    Column-for-column the `blocks` intermediate table of SURVEY.md §1.2.
    """

    __slots__ = (
        "block_id", "tag", "tag_path", "text",
        "n_chars", "n_tags", "n_link_chars",
    )
    block_id: int
    tag: str
    tag_path: str
    text: str
    n_chars: int
    n_tags: int
    n_link_chars: int


def _unescape(raw: str) -> str:
    # html.unescape is comparatively slow; skip it when no '&' present
    # (C substring scan, no regex machinery)
    if "&" not in raw:
        return raw
    return _htmllib.unescape(raw)


# One dict lookup dispatches a tag to all four role sets at once (the four
# frozenset probes per tag were ~10% of kernel time).
_F_BLOCK, _F_DROP, _F_VOID, _F_RAW = 1, 2, 4, 8
_TAG_FLAGS: dict[str, int] = {}
for _t in BLOCK_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_BLOCK
for _t in DROP_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_DROP
for _t in VOID_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_VOID
for _t in RAW_TEXT_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_RAW


def _self_closing_at(text: str, mend: int) -> bool:
    """Trailing-/ detection by direct indexing (``mend`` = match end, one
    past the ``>``): the dominant tags end in a letter or quote — one char
    compare decides; the whitespace walk only runs on ``/ >`` tails. Never
    walks past the tag name (a letter/quote/digit stops it)."""
    c = text[mend - 2]
    if c == "/":
        return True
    while c in " \t\n\r\f\v":
        mend -= 1
        c = text[mend - 2]
    return c == "/"


def tokenize_html(text: str, cfg: ExtractConfig = DEFAULT_CONFIG) -> list[Block]:
    """Lex an HTML document into its ordered list of text blocks.

    Content inside DROP_TAGS subtrees (nav/header/footer/aside/...) is
    discarded structurally — the "obvious background" rejection a detector
    does before scoring. Script/style/textarea contents are skipped as raw
    text. Text inside <a> subtrees is counted into ``n_link_chars`` for the
    link-density score.
    """
    lower = None  # lazily lowered copy for raw-text close-tag search
    blocks: list[Block] = []
    stack: list[str] = []          # open block-level container tags
    pieces: list[str] = []         # text fragments of the current block
    link_chars = 0                 # chars inside <a> in current block
    inline_tags = 0                # inline tags seen inside current block
    drop_depth = 0                 # >0 → inside a DROP_TAGS subtree
    a_depth = 0                    # >0 → inside an <a> subtree
    cur_tag = "body"               # block container that opened the block
    pos = 0
    n = len(text)
    collapse = cfg.collapse_whitespace
    flags_get = _TAG_FLAGS.get
    unescape = _htmllib.unescape

    def flush() -> None:
        nonlocal pieces, link_chars, inline_tags
        joined = "".join(pieces)
        folded = collapse_ws(joined) if collapse else joined
        if folded:
            blocks.append(
                Block(
                    block_id=len(blocks),
                    tag=cur_tag,
                    tag_path="/".join(stack) or "html",
                    text=folded,
                    n_chars=len(folded),
                    n_tags=inline_tags,
                    # link chars are counted pre-folding; clamp to text len
                    n_link_chars=min(link_chars, len(folded)),
                )
            )
        pieces = []
        link_chars = 0
        inline_tags = 0

    # finditer walks the document once; matches inside a skipped raw-text
    # region (pos jumped past them) cost one span() compare each
    for m in _TAG_RE.finditer(text):
        mstart, mend = m.span()
        if mstart < pos:
            continue
        if mstart > pos:
            if drop_depth == 0:
                raw = text[pos:mstart]
                piece = raw if "&" not in raw else unescape(raw)
                pieces.append(piece)
                if a_depth > 0:
                    link_chars += len(piece)
        pos = mend
        name = m.group(1)
        if name is None:  # comment / doctype / CDATA / PI
            continue
        if not name.islower():
            name = name.lower()
        closing = text[mstart + 1] == "/"
        flags = flags_get(name, 0)

        if flags & _F_RAW and not closing and not _self_closing_at(text, mend):
            # skip raw content to the matching close tag (case-insensitive)
            if lower is None:
                lower = text.lower()
            close = lower.find("</" + name, pos)
            if close == -1:
                pos = n
            else:
                gt = text.find(">", close)
                pos = n if gt == -1 else gt + 1
            continue

        if flags & _F_BLOCK:
            if pieces:
                flush()
            else:
                link_chars = 0
                inline_tags = 0
            c = text[mend - 2]
            if flags & _F_VOID or c == "/" or (
                c in " \t\n\r\f\v" and _self_closing_at(text, mend)
            ):
                continue
            if closing:
                if name in stack:
                    # pop to (and including) the matching container
                    while stack:
                        top = stack.pop()
                        if top in DROP_TAGS:
                            drop_depth -= 1
                        if top == name:
                            break
            else:
                stack.append(name)
                if flags & _F_DROP:
                    drop_depth += 1
                cur_tag = name
        else:
            # inline tag
            if name == "a":
                if closing:
                    a_depth = max(0, a_depth - 1)
                else:
                    c = text[mend - 2]
                    if c != "/" and not (
                        c in " \t\n\r\f\v" and _self_closing_at(text, mend)
                    ):
                        a_depth += 1
            if not closing and drop_depth == 0:
                inline_tags += 1
            if flags & _F_DROP:
                # inline-listed drop tags (svg, video, ...) without block role
                if closing:
                    drop_depth = max(0, drop_depth - 1)
                elif not _self_closing_at(text, mend) and not flags & _F_VOID:
                    drop_depth += 1

    if pos < n:
        if drop_depth == 0:
            raw = text[pos:]
            piece = raw if "&" not in raw else unescape(raw)
            pieces.append(piece)
            if a_depth > 0:
                # raw piece length (pre-fold): cheap and clamped later
                link_chars += len(piece)
    flush()
    return blocks
