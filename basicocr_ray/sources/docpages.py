"""documents → synthetic `pages` wrapper for SQL-verifiable roundtrips.

Wraps each `documents.text` into a boilerplate HTML page whose main content
is exactly that text; running the FULL extraction pipeline over the result
must reproduce `text` byte-identically — giving the driver a DuckDB oracle
(`SELECT doc_id, text AS main_text FROM documents`) for the flagship path.

Mirrors the fixture generator's self-labeling property (plateGen,
`genplate_plate.py:216-226`: labels correct by construction).
"""

from __future__ import annotations

import html as _htmllib

import pyarrow as pa

_NAV = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
_FOOTER = "<footer>© example.com — All rights reserved.</footer>"
_SIDEBAR = (
    '<aside><ul><li><a href="/1">Related link one</a></li>'
    '<li><a href="/2">Related link two</a></li></ul></aside>'
)


def wrap_single(text: str, doc_id: int) -> bytes:
    """Whole text in ONE content paragraph (single-block roundtrip)."""
    body = f"<article><p>{_htmllib.escape(text)}</p></article>"
    doc = (
        '<!DOCTYPE html><html><head><meta charset="utf-8">'
        f"<title>doc {doc_id}</title><script>var d={doc_id};</script></head>"
        f"<body><header><h1>corpus</h1></header>{_NAV}{_SIDEBAR}{body}"
        f"{_FOOTER}</body></html>"
    )
    return doc.encode("utf-8")


def wrap_chunked(text: str, doc_id: int, words_per_chunk: int = 16) -> bytes:
    """Text split into multi-word <p> chunks (multi-block roundtrip).

    Inverse contract: extraction with ``join_sep=' '`` reproduces the text
    exactly, because chunk boundaries fall on single spaces and a too-short
    tail (< 10 chars, the keep threshold) is merged into the previous
    chunk. Requires the input to be single-space separated (true for the
    `documents` corpus; asserted in tests)."""
    words = text.split(" ")
    chunks = [
        " ".join(words[i : i + words_per_chunk])
        for i in range(0, len(words), words_per_chunk)
    ]
    if len(chunks) > 1 and len(chunks[-1]) < 10:
        chunks[-2] = chunks[-2] + " " + chunks[-1]
        chunks.pop()
    body = "".join(f"<p>{_htmllib.escape(c)}</p>" for c in chunks)
    doc = (
        '<!DOCTYPE html><html><head><meta charset="utf-8">'
        f"<title>doc {doc_id}</title></head>"
        f"<body>{_NAV}<article>{body}</article>{_FOOTER}</body></html>"
    )
    return doc.encode("utf-8")


def docs_to_pages_batch(batch: pa.Table, chunked: bool = False) -> pa.Table:
    """documents batch → pages batch (url=doc:<id>, html, lang)."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    wrap = wrap_chunked if chunked else wrap_single
    return pa.table(
        {
            "url": pa.array([f"doc:{i}" for i in ids], pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(
                [wrap(t or "", i) for i, t in zip(ids, texts)], pa.large_binary()
            ),
            "lang": pa.array(langs, pa.string()),
        }
    )
