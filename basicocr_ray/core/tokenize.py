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
# Group 1 = "/" for closing tags, group 2 = tag name (None for non-tags).
_TAG_RE = re.compile(
    r"""<!--.*?(?:-->|\Z)          # comment (unterminated → to EOF)
      | <!\[CDATA\[.*?(?:\]\]>|\Z) # CDATA
      | <![^>]*>                   # doctype / other declarations
      | <\?[^>]*>                  # processing instruction
      | <(/?)([a-zA-Z][a-zA-Z0-9:_\-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)>
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

    def flush() -> None:
        nonlocal pieces, link_chars, inline_tags
        if pieces:
            joined = "".join(pieces)
            folded = collapse_ws(joined) if cfg.collapse_whitespace else joined
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

    while pos < n:
        m = _TAG_RE.search(text, pos)
        if m is None:
            raw = text[pos:]
            if raw and drop_depth == 0:
                piece = _unescape(raw)
                pieces.append(piece)
                if a_depth > 0:
                    # raw piece length (pre-fold): cheap and clamped later
                    link_chars += len(piece)
            break
        mstart = m.start()
        if mstart > pos:
            raw = text[pos:mstart]
            if drop_depth == 0:
                piece = _unescape(raw)
                pieces.append(piece)
                if a_depth > 0:
                    link_chars += len(piece)
        pos = m.end()
        # single C call for all three groups; avoid allocations on the
        # (dominant) already-lowercase / no-trailing-slash paths
        closing_slash, name, attrs = m.group(1, 2, 3)
        if name is None:  # comment / doctype / CDATA / PI
            continue
        if not name.islower():
            name = name.lower()
        closing = closing_slash == "/"
        if attrs:
            self_closing = attrs[-1] == "/" or attrs.rstrip().endswith("/")
        else:
            self_closing = False
            attrs = ""

        if not closing and name in RAW_TEXT_TAGS and not self_closing:
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

        if name in BLOCK_TAGS:
            flush()
            if name in VOID_TAGS or self_closing:
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
                if name in DROP_TAGS:
                    drop_depth += 1
                cur_tag = name
        else:
            # inline tag
            if name == "a":
                if closing:
                    a_depth = max(0, a_depth - 1)
                elif not self_closing:
                    a_depth += 1
            if not closing and drop_depth == 0:
                inline_tags += 1
            if name in DROP_TAGS:
                # inline-listed drop tags (svg, video, ...) without block role
                if closing:
                    drop_depth = max(0, drop_depth - 1)
                elif not self_closing and name not in VOID_TAGS:
                    drop_depth += 1

    flush()
    return blocks
