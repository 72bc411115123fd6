"""PDF branch — actor pool holding warm parser state (SURVEY §2 A4).

The north-star mandates routing PDF payloads to a layout-parse branch on an
actor pool; the reference analogue is the heavyweight model runtime loaded
once per worker (`contrib/crnn/crnn_main.py:102-116`). Real PDF libraries
are absent in this container, so the parse kernel is the deterministic
fixture stub `core.oracle.extract_text_pdf`; the Ray-side plumbing (actor
signature, schema, batching, union-back) is real and tested.
"""

from __future__ import annotations

import pyarrow as pa

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.core.oracle import extract_text_pdf
from basicocr_ray.stages.extract import SPAN_TYPE, partition_of


_WARM: dict = {}


def warm_parser(cfg: ExtractConfig) -> "PdfParser":
    """Per-worker-process warm parser (load-once without an actor hop).

    Ray reuses worker processes across map_batches tasks, so a module-level
    cache gives the same amortized-`__init__` economics as an actor pool
    (`crnn_main.py:102-116` load-once) while keeping the stage an ELASTIC
    task pool — no pass-through hop for the ~99% non-PDF rows and no pool
    sizing to starve the upstream read (NOTES_r1 deadlock hazard)."""
    p = _WARM.get(cfg)
    if p is None:
        p = _WARM[cfg] = PdfParser(cfg)
    return p


class PdfParser:
    """Callable class for ``map_batches(PdfParser, concurrency=N)``.

    ``__init__`` is where a real deployment would build the warm parser
    object (layout model, font cache) once per actor; ``__call__`` parses
    one Arrow batch of PDF rows into the `extracted` schema."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        # warm-parser placeholder: a real impl would load its model here.
        self.parse = extract_text_pdf

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = (
            batch["lang"].to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        texts, oks, errs = [], [], []
        for h in htmls:
            try:
                t = self.parse(h if h is not None else b"")
                texts.append(t)
                oks.append(bool(t))
                errs.append("" if t else "empty_pdf")
            except Exception as exc:
                texts.append("")
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}"[:200])
        spans = [
            [{"start": 0, "end": len(t), "block_id": 0}] if t else []
            for t in texts
        ]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "main_text": pa.array(texts, pa.large_string()),
                "spans": pa.array(spans, SPAN_TYPE),
                # parity with core.oracle.extract_one's PDF path: n_blocks
                # is 1 for every parsed PDF (kept count may still be 0)
                "n_blocks": pa.array([1] * len(texts), pa.int32()),
                "n_blocks_kept": pa.array(
                    [1 if t else 0 for t in texts], pa.int32()
                ),
                "encoding": pa.array(["pdf"] * len(urls), pa.string()),
                "lang": pa.array(langs, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "error": pa.array(errs, pa.string()),
                "partition_id": pa.array(
                    [partition_of(u, self.cfg.num_partitions) for u in urls],
                    pa.int32(),
                ),
                "n_bytes_in": pa.array(
                    [len(h) if h is not None else 0 for h in htmls], pa.int64()
                ),
                "n_bytes_out": pa.array(
                    [len(t.encode("utf-8")) for t in texts], pa.int64()
                ),
            }
        )
