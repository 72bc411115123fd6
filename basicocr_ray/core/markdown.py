"""HTML → Markdown conversion — the canonical text-normal form
training-data pipelines feed LLMs.

Built on the same single-scan lexer as the extractor family
(`core/structured.iter_tags`): a block-level state machine (headings,
paragraphs, lists) with inline emphasis/link rendering. Scope is the
portable CommonMark core a crawl converter actually emits — h1-h6 (#…),
p, b/strong (**), i/em (*), a[href] ([t](u)), ul/li (- item), br; other
tags pass their text through; script/style bodies are dropped by the
lexer. Entities unescape; inline whitespace is preserved as-written
(the synthesizer/tests own spacing discipline)."""

from __future__ import annotations

import html as _htmllib

from basicocr_ray.core.structured import iter_tags, parse_attrs

_H = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_EMPH = {"b": "**", "strong": "**", "i": "*", "em": "*"}


def html_to_markdown(doc: str) -> str:
    blocks: list[str] = []
    cur: list[str] = []  # inline parts of the open block
    prefix = ""  # heading prefix for the open block
    list_items: list[str] | None = None  # open <ul> accumulator
    href_stack: list[str] = []
    pos = 0

    def flush_block() -> None:
        nonlocal cur, prefix
        text = "".join(cur).strip()
        if text:
            blocks.append(prefix + text)
        cur = []
        prefix = ""

    tags = list(iter_tags(doc))
    for idx, (name, closing, raw, start, end) in enumerate(tags):
        text = _htmllib.unescape(doc[pos:start])
        pos = end
        if text:
            cur.append(text)
        if name in _H:
            if not closing:
                flush_block()
                prefix = "#" * _H[name] + " "
            else:
                flush_block()
        elif name == "p":
            flush_block()
        elif name in _EMPH:
            cur.append(_EMPH[name])
        elif name == "a":
            if not closing:
                href_stack.append(parse_attrs(raw).get("href", ""))
                cur.append("[")
            elif href_stack:
                cur.append("](%s)" % href_stack.pop())
        elif name == "br" and not closing:
            cur.append("\n")
        elif name == "ul":
            if not closing:
                flush_block()
                list_items = []
            else:
                if list_items is not None and cur:
                    item = "".join(cur).strip()
                    if item:
                        list_items.append(item)
                    cur = []
                if list_items:
                    blocks.append(
                        "\n".join("- " + it for it in list_items)
                    )
                list_items = None
        elif name == "li":
            if list_items is not None:
                item = "".join(cur).strip()
                if item:
                    list_items.append(item)
                cur = []
    tail = _htmllib.unescape(doc[pos:])
    if tail:
        cur.append(tail)
    flush_block()
    return "\n\n".join(blocks)
