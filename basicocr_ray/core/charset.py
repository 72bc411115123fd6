"""Deterministic charset sniffing + decoding for raw HTML bytes.

Analogue of the reference's encoding-identification procedure
(`/root/reference/contrib/trietree/encoder_trietree.md:44-93`: identify the
true source encoding of mojibake by byte-pattern analysis, then re-decode)
and of the payload validity probe (`tool/tolmdb.py:10-22`,
`checkImageIsValid`). The rule ORDER is part of the byte-identity contract
(SURVEY.md §7.4) — it must never depend on anything but the document bytes:

  1. Unicode BOM (utf-8-sig / utf-16 le / utf-16 be)
  2. ``<meta charset=...>`` / ``http-equiv`` declaration in the first 4 KiB
  3. strict utf-8 attempt
  4. latin-1 fallback (never fails)
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.IGNORECASE,
)

# Common alias folding (deterministic, closed table).
_ALIASES = {
    "gb2312": "gbk",
    "gb_2312": "gbk",
    "gb-2312": "gbk",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "utf8": "utf-8",
    "shift-jis": "shift_jis",
    "shiftjis": "shift_jis",
    "sjis": "shift_jis",
}


def _normalize_encoding(name: str) -> str | None:
    name = _ALIASES.get(name.lower(), name.lower())
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def sniff_encoding(data: bytes) -> str:
    """Return the encoding name chosen by the deterministic rule ladder."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if data.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    m = _META_RE.search(data[:4096])
    if m:
        enc = _normalize_encoding(m.group(1).decode("ascii", "replace"))
        if enc is not None:
            try:
                data.decode(enc)
                return enc
            except (UnicodeDecodeError, ValueError):
                pass  # declared charset lies → fall through
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def sniff_decode(data: bytes) -> tuple[str, str]:
    """Decode HTML payload bytes → (text, encoding_used).

    Raises ``ValueError`` on empty payloads (the `checkImageIsValid` reject
    path, `tolmdb.py:10-22`); callers route that to the `failed` table
    rather than crashing the task (`dataset.py:53-55` corrupt-skip analogue).
    """
    if not data:
        raise ValueError("empty payload")
    enc = sniff_encoding(data)
    if enc == "utf-16-le" or enc == "utf-16-be":
        return data[2:].decode(enc), enc
    return data.decode(enc), enc
