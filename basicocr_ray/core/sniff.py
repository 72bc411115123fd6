"""MIME/container sniffing for mixed binary payload columns.

The dispatcher in front of every multimodal ingest stage: magic bytes
plus the minimal structural check that distinguishes a real container
from a lucky prefix (RIFF without WAVE is not audio). Pure function —
runs vectorized-per-row inside map_batches."""

from __future__ import annotations

_PNG = b"\x89PNG\r\n\x1a\n"


def sniff_payload(data: bytes) -> str:
    """→ one of png/gif/wav/pdf/gzip/warc/unknown."""
    if data[:8] == _PNG:
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:5] == b"WARC/":
        return "warc"
    return "unknown"
