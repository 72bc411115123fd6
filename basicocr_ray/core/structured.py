"""Structured-data extraction from HTML: <table> grids and JSON-LD blocks.

The reference's extraction stack stops at main-content text; real crawl
curation also lifts STRUCTURED payloads out of the page — data tables and
schema.org metadata — so this module gives the engine both verbs on top of
the same single-scan lexer the block tokenizer uses (`core/tokenize._TAG_RE`,
see tokenize.py's rationale for the hand-rolled lexer: deterministic rules,
one compiled scan per document, no per-character callbacks).

Both functions are pure per-document kernels: they run inside
`map_batches` and never see more than one page at a time, so the stage
shape is the same embarrassingly-parallel scan as the flagship extractor.
"""

from __future__ import annotations

import html as _htmllib
import json
import re

from basicocr_ray.config import RAW_TEXT_TAGS
from basicocr_ray.core.tokenize import _TAG_RE

Row = list  # list[tuple[str, str]] — (cell_tag, cell_text)


class _TableBuilder:
    __slots__ = ("rows", "cur_row", "cur_tag", "cur_parts")

    def __init__(self) -> None:
        self.rows: list[Row] = []
        self.cur_row: Row | None = None
        self.cur_tag: str | None = None
        self.cur_parts: list[str] | None = None

    def close_cell(self) -> None:
        if self.cur_tag is not None:
            if self.cur_row is None:  # td outside tr: implicit row
                self.cur_row = []
            self.cur_row.append(
                (self.cur_tag, _htmllib.unescape("".join(self.cur_parts)))
            )
            self.cur_tag = None
            self.cur_parts = None

    def close_row(self) -> None:
        self.close_cell()
        if self.cur_row is not None:
            self.rows.append(self.cur_row)
            self.cur_row = None


def parse_tables(doc: str) -> list[list[Row]]:
    """All <table> grids in document order; each grid is rows of
    (cell_tag, text) with entities unescaped.

    Rules (all implicit-close cases a tag-soup page produces):
      * <td>/<th> closes any open cell; <tr> closes cell+row; </table>
        closes cell+row+table; EOF closes everything still open.
      * Nested tables are INDEPENDENT grids (a cell's inner table never
        leaks cells into the outer row); emitted in close order.
      * Raw-text elements (script/style/...) are skipped to their close
        tag, so markup-looking JS can't inject phantom cells.
      * Text outside a cell (captions, whitespace between rows) is
        dropped — only cell content is table data.
    """
    out: list[list[Row]] = []
    stack: list[_TableBuilder] = []
    pos = 0
    n = len(doc)
    while pos < n:
        m = _TAG_RE.search(doc, pos)
        if m is None:
            text = doc[pos:]
            pos = n
        else:
            text = doc[pos : m.start()]
        if text and stack and stack[-1].cur_tag is not None:
            stack[-1].cur_parts.append(text)
        if m is None:
            break
        pos = m.end()
        name = m.group(1)
        if name is None:  # comment / doctype / CDATA / PI
            continue
        name = name.lower()
        closing = doc[m.start() + 1] == "/"
        if not closing and name in RAW_TEXT_TAGS:
            # skip raw text to the matching close tag (or EOF)
            mm = re.compile(
                r"</%s\b[^>]*>" % re.escape(name), re.I
            ).search(doc, pos)
            pos = mm.end() if mm else n
            continue
        if name == "table":
            if not closing:
                stack.append(_TableBuilder())
            elif stack:
                b = stack.pop()
                b.close_row()
                out.append(b.rows)
        elif not stack:
            continue
        elif name == "tr":
            b = stack[-1]
            if closing:
                b.close_row()
            else:
                b.close_row()
                b.cur_row = []
        elif name in ("td", "th"):
            b = stack[-1]
            b.close_cell()
            if not closing:
                if b.cur_row is None:
                    b.cur_row = []
                b.cur_tag = name
                b.cur_parts = []
    while stack:  # unclosed tables at EOF
        b = stack.pop()
        b.close_row()
        out.append(b.rows)
    return out


_LDJSON_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*(?:\"application/ld\+json\""
    r"|'application/ld\+json')[^>]*>(.*?)</script\s*>",
    re.S | re.I,
)


def extract_jsonld(doc: str, want_type: str | None = None) -> list[dict]:
    """Every parseable JSON-LD object in the page, in document order.

    `want_type` filters on the @type field (the usual consumer pattern:
    take the first Article / Product / ... block and ignore decoys).
    Arrays at top level are flattened; unparseable blocks are skipped —
    the tolerant posture a crawl-scale extractor needs.
    """
    out: list[dict] = []
    for m in _LDJSON_RE.finditer(doc):
        try:
            obj = json.loads(m.group(1))
        except (ValueError, TypeError):
            continue
        items = obj if isinstance(obj, list) else [obj]
        for it in items:
            if not isinstance(it, dict):
                continue
            if want_type is not None and it.get("@type") != want_type:
                continue
            out.append(it)
    return out


_URL_FIELDS = ("loc", "lastmod", "changefreq", "priority")


def encode_sitemap(entries: list[dict]) -> str:
    """Sitemap-protocol urlset XML (sitemaps.org 0.9). `entries` carry
    any subset of loc/lastmod/changefreq/priority; text is XML-escaped."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n',
    ]
    for ent in entries:
        parts.append(" <url>")
        for f in _URL_FIELDS:
            if f in ent and ent[f] is not None:
                parts.append(
                    "<%s>%s</%s>" % (f, _htmllib.escape(str(ent[f])), f)
                )
        parts.append("</url>\n")
    parts.append("</urlset>\n")
    return "".join(parts)


def parse_sitemap(xml: str) -> list[dict]:
    """Parse a urlset sitemap back to entry dicts (same single-scan
    lexer as the HTML paths; entities unescaped; unknown elements and
    text outside <url> children ignored). Tolerant of missing fields —
    a field absent from the XML is absent from the dict."""
    out: list[dict] = []
    cur: dict | None = None
    field: str | None = None
    parts: list[str] = []
    pos = 0
    n = len(xml)
    while pos < n:
        m = _TAG_RE.search(xml, pos)
        if m is None:
            break
        text = xml[pos : m.start()]
        if text and cur is not None and field is not None:
            parts.append(text)
        pos = m.end()
        name = m.group(1)
        if name is None:
            continue
        name = name.lower()
        closing = xml[m.start() + 1] == "/"
        if name == "url":
            if not closing:
                cur = {}
            elif cur is not None:
                out.append(cur)
                cur = None
        elif name in _URL_FIELDS and cur is not None:
            if not closing:
                field = name
                parts = []
            elif field == name:
                cur[name] = _htmllib.unescape("".join(parts))
                field = None
    return out


_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)      # attribute name
        (?:\s*=\s*
           (?:"([^"]*)"|'([^']*)'|([^\s"'=<>`]+))  # "v" | 'v' | bare
        )?""",
    re.X,
)


def parse_attrs(tag_text: str) -> dict[str, str]:
    """Attributes of one raw tag string (e.g. the m.group(0) of the
    lexer): handles double/single-quoted and unquoted values and
    boolean attributes (value '' per the HTML spec); names lowercase;
    first occurrence wins on duplicates; entities unescaped."""
    # strip "<name" head and ">" tail so the tag name isn't an attr
    body = tag_text
    m = re.match(r"</?[a-zA-Z][a-zA-Z0-9:_\-]*", body)
    if m:
        body = body[m.end():]
    if body.endswith(">"):
        body = body[:-1]
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(body):
        name = m.group(1).lower()
        if name in out or name == "/":
            continue
        val = m.group(2)
        if val is None:
            val = m.group(3)
        if val is None:
            val = m.group(4)
        out[name] = _htmllib.unescape(val) if val is not None else ""
    return out


def extract_head_links(doc: str) -> list[dict]:
    """Every <link>/<meta> tag's attribute dict, in document order,
    with a '_tag' key — the head-metadata scan behind canonical-url
    resolution, robots meta, and charset sniffing. Raw-text elements
    are skipped so a script can't fake a head link."""
    out: list[dict] = []
    pos = 0
    n = len(doc)
    while pos < n:
        m = _TAG_RE.search(doc, pos)
        if m is None:
            break
        pos = m.end()
        name = m.group(1)
        if name is None:
            continue
        lname = name.lower()
        if doc[m.start() + 1] != "/" and lname in RAW_TEXT_TAGS:
            mm = re.compile(
                r"</%s\b[^>]*>" % re.escape(lname), re.I
            ).search(doc, pos)
            pos = mm.end() if mm else n
            continue
        if lname in ("link", "meta") and doc[m.start() + 1] != "/":
            attrs = parse_attrs(m.group(0))
            attrs["_tag"] = lname
            out.append(attrs)
    return out


def iter_tags(doc: str):
    """Yield (name, closing, raw, start, end) for every tag, skipping
    comments/doctypes and raw-text element bodies — the shared scan
    under the outline and anchor-audit extractors."""
    pos = 0
    n = len(doc)
    while pos < n:
        m = _TAG_RE.search(doc, pos)
        if m is None:
            break
        pos = m.end()
        name = m.group(1)
        if name is None:
            continue
        lname = name.lower()
        closing = doc[m.start() + 1] == "/"
        if not closing and lname in RAW_TEXT_TAGS:
            mm = re.compile(
                r"</%s\b[^>]*>" % re.escape(lname), re.I
            ).search(doc, pos)
            pos = mm.end() if mm else n
            # yield with end PAST the skipped body+close tag, so a
            # consumer resuming text at `end` never sees script bodies
            yield lname, False, m.group(0), m.start(), pos
            continue
        yield lname, closing, m.group(0), m.start(), m.end()


_H_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


def parse_outline(doc: str) -> list[tuple[int, str, str]]:
    """Document outline: (level, section_path, text) per h1–h6 in
    order. Section paths come from the standard counter stack — a
    heading at level L increments counter L and resets deeper ones;
    the path joins counters 1..L ('1.2.1'); a document that opens
    below level 1 shows the honest zero ('0.1'). Heading text is the
    inter-tag text up to the matching close, entities unescaped and
    whitespace collapsed."""
    counters = [0] * 7
    out: list[tuple[int, str, str]] = []
    tags = list(iter_tags(doc))
    for idx, (name, closing, _raw, _s, end) in enumerate(tags):
        if closing or name not in _H_LEVEL:
            continue
        level = _H_LEVEL[name]
        counters[level] += 1
        for d in range(level + 1, 7):
            counters[d] = 0
        path = ".".join(str(counters[d]) for d in range(1, level + 1))
        # text: accumulate inter-tag text until the matching close tag,
        # skipping inline children (<h1>Hello <b>World</b></h1> ->
        # 'Hello World'); stop early if another heading opens first
        # (malformed doc) so its text is not swallowed
        parts: list[str] = []
        cur = end
        # index iteration, not a tags[idx+1:] slice — the slice copies
        # the remaining tag list per heading (quadratic on heading-dense
        # documents); the scan itself stays bounded by the heading span
        for j in range(idx + 1, len(tags)):
            t_name, t_closing, _r2, t_start, t_end = tags[j]
            parts.append(doc[cur:t_start])
            cur = t_end
            if t_closing and t_name == name:
                break
            # only an OPENING heading ends accumulation early — a stray
            # closing tag of a different level (orphan </h2> inside
            # <h1>…</h1>) must not truncate this heading's text
            if not t_closing and t_name in _H_LEVEL:
                break
        else:
            parts.append(doc[cur:])
        text = _htmllib.unescape("".join(parts))
        out.append((level, path, " ".join(text.split())))
    return out
