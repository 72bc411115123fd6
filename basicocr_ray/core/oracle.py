"""Single-document reference extractor — the engine's ground truth.

`extract_one(html_bytes)` composes the shared kernels
(charset → tokenize → score → greedy decode) exactly as the distributed
pipeline does; the Ray pipeline imports these same functions, so the
pytest byte-identity gate (`BASELINE.json` per-row invariant: byte-identical
extracted text per url) checks DISTRIBUTION correctness, not two diverging
implementations.

Reference lifecycle analogue: `contrib/crnn/demo.py` (read → normalize →
score → argmax transcribe → CTC decode on one record, SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Any

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.core.charset import sniff_decode
from basicocr_ray.core.decode import greedy_decode
from basicocr_ray.core.score import score_blocks
from basicocr_ray.core.tokenize import tokenize_html

PDF_MAGIC = b"%PDF"


def extract_text_pdf(data: bytes) -> str:
    """PDF branch kernel (SURVEY.md §2 A4).

    Two deterministic paths: the ``%PDF-FAKE\\n<utf-8 text>`` fixture
    convention (byte-exact, used by oracle-checked queries), and the REAL
    stdlib extractor (`core.pdf_text`: stream scan → FlateDecode inflate →
    Tj/TJ text operators) for genuine PDF payloads. A full layout-parse
    library, if ever present, would replace the real path behind the same
    signature.
    """
    if data.startswith(b"%PDF-FAKE\n"):
        return data[len(b"%PDF-FAKE\n"):].decode("utf-8", "replace")
    from basicocr_ray.core.pdf_text import extract_pdf_text

    return extract_pdf_text(data)


def extract_one(
    html_bytes: bytes, cfg: ExtractConfig = DEFAULT_CONFIG
) -> dict[str, Any]:
    """bytes → extraction record (the `extracted` row of SURVEY.md §1.2).

    Never raises on bad input: failures are routed into ``ok/error`` fields
    (the corrupt-record skip of `contrib/crnn/dataset.py:53-55`, re-expressed
    as a `failed`-routable row instead of a silent retry).
    """
    try:
        if html_bytes[:4] == PDF_MAGIC:
            text = extract_text_pdf(html_bytes)
            return {
                "main_text": text,
                "spans": [(0, len(text), 0)] if text else [],
                "n_blocks": 1,
                "n_blocks_kept": 1 if text else 0,
                "encoding": "pdf",
                "ok": bool(text),
                "error": "" if text else "empty_pdf",
            }
        text, enc = sniff_decode(html_bytes)
        blocks = tokenize_html(text, cfg)
        keeps = score_blocks(blocks, cfg)
        main_text, spans, n_kept = greedy_decode(
            [b.text for b in blocks], keeps, cfg
        )
        return {
            "main_text": main_text,
            "spans": spans,
            "n_blocks": len(blocks),
            "n_blocks_kept": n_kept,
            "encoding": enc,
            "ok": bool(main_text),
            "error": "" if main_text else "no_content",
        }
    except Exception as exc:  # poison pill → failed row, never a task crash
        return {
            "main_text": "",
            "spans": [],
            "n_blocks": 0,
            "n_blocks_kept": 0,
            "encoding": "",
            "ok": False,
            "error": f"{type(exc).__name__}: {exc}"[:200],
        }
