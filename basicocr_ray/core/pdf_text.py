"""Minimal real PDF text extraction — stdlib only (zlib + re).

De-stubs the A4 branch for genuine PDFs: no PDF library exists in this
container, but the dominant real-world case — content streams stored
uncompressed or FlateDecode-compressed, text drawn with Tj/TJ/' operators
inside BT…ET blocks, WinAnsi/ASCII strings — is parseable with ``zlib``
and a small tokenizer. Deterministic: output depends only on the bytes.

Scope (documented, enforced):
  * objects are discovered by scanning ``stream``/``endstream`` pairs —
    no xref table needed (robust to linearized/appended files);
  * ``/FlateDecode`` streams are inflated; other filters are skipped;
  * text-showing operators handled: ``(..) Tj``, ``(..) '``, ``[..] TJ``;
    ``Td/TD/T*`` and ET/BT boundaries emit newlines;
  * PDF string escapes (\\n \\r \\t \\b \\f \\( \\) \\\\ \\ooo) and
    hex strings ``<..> Tj`` are decoded; UTF-16BE BOM strings decoded.

Reference analogue: the heavyweight warm-parser runtimes of A1
(`contrib/crnn/crnn_main.py:102-116` load-once) — the engine's PdfParser
actor holds this extractor as its warm state.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# dict immediately preceding the stream keyword (crude but deterministic)
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
# direct /Length entry (indirect `n 0 R` references fall back to the
# EOL-delimited span)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R)")

# text operators inside a decoded content stream
_TEXT_OP_RE = re.compile(
    rb"""
      \((?P<lit>(?:\\.|[^\\()])*)\)\s*(?P<op1>Tj|')   # literal string show
    | <(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<op2>Tj|')       # hex string show
    | \[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ                # array show
    | (?P<nl>T\*|TD|Td|ET)                            # line/block breaks
    """,
    re.VERBOSE | re.DOTALL,
)
_ARR_STR_RE = re.compile(rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]*)>")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            # octal \ooo (1-3 digits; PDF spec digits are 0-7 only — \8
            # or \9 is a malformed escape and falls through to the
            # literal-char branch instead of raising in int(_, 8))
            if nxt in b"01234567":
                j = i + 1
                digits = b""
                while (
                    j < n and len(digits) < 3 and raw[j : j + 1] in b"01234567"
                ):
                    digits += raw[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("cp1252", "replace")


def _hex_to_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        h += b"0"  # PDF spec: odd final digit padded with 0
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def extract_stream_text(content: bytes) -> list[str]:
    """Decoded content stream → list of text pieces ('' = line break)."""
    pieces: list[str] = []
    for m in _TEXT_OP_RE.finditer(content):
        if m.group("nl") is not None:
            pieces.append("")
        elif m.group("lit") is not None:
            pieces.append(_decode_pdf_string(_unescape_literal(m.group("lit"))))
        elif m.group("hex") is not None:
            pieces.append(_decode_pdf_string(_hex_to_bytes(m.group("hex"))))
        elif m.group("arr") is not None:
            for s in _ARR_STR_RE.finditer(m.group("arr")):
                if s.group("lit") is not None:
                    pieces.append(
                        _decode_pdf_string(_unescape_literal(s.group("lit")))
                    )
                else:
                    pieces.append(_decode_pdf_string(_hex_to_bytes(s.group("hex"))))
    return pieces


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text (lines joined by \\n, streams by \\n)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (bad header)")
    out_lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        body = m.group(1)
        # the stream dict sits between the previous object start and the
        # 'stream' keyword; look back a bounded window for the filter
        head_start = max(0, m.start() - 512)
        head = data[head_start : m.start()]
        # the EOL-delimited span is wrong when the data's LAST byte is \r
        # (the `\r?\nendstream` strip eats it, truncating the deflate
        # stream); a direct /Length is authoritative — reslice by it
        lm = _LENGTH_RE.search(head)
        if lm:
            length = int(lm.group(1))
            if length <= len(body) + 2:  # EOL strip eats ≤2 data bytes
                body = data[m.start(1) : m.start(1) + length]
        if _FLATE_RE.search(head):
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue  # corrupt/partial stream: skip, don't fail the doc
        if b"BT" not in body:
            continue
        line = ""
        for piece in extract_stream_text(body):
            if piece == "":
                if line:
                    out_lines.append(line)
                    line = ""
            else:
                line += piece
        if line:
            out_lines.append(line)
    return "\n".join(out_lines)


def make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """Build a small real single-page PDF showing ``lines`` (test/fixture
    helper — the inverse of `extract_pdf_text` for round-trip tests)."""

    def esc(s: str) -> bytes:
        b = s.encode("cp1252", "replace")
        return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")

    content = b"BT /F1 12 Tf 50 750 Td\n"
    for i, ln in enumerate(lines):
        if i:
            content += b"0 -14 Td\n"
        content += b"(" + esc(ln) + b") Tj\n"
    content += b"ET"
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode() + b" >>\n"
        b"stream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_pos).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)
