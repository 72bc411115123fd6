"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module;
nothing here (or in ``basicocr_ray``) calls ``ray.init``/``ray.shutdown``.

* ``entry()``     — flagship main-content extraction pipeline on
                    /root/testdata/sf0.001 (documents wrapped into
                    Common-Crawl-style pages, extracted back).
* ``queries()``   — one callable per implemented operator (SURVEY.md §2).
* ``oracle_sql()``— DuckDB twins for every SQL-expressible query; keys
                    missing here get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents → synthetic
    Common-Crawl-style pages (url, html, lang) → tokenize → score → CTC
    greedy decode → extracted rows. Returns a lazy ray.data.Dataset."""
    import pyarrow as pa

    from basicocr_ray.config import ExtractConfig
    from basicocr_ray.pipelines.queries import _read
    from basicocr_ray.sources.docpages import docs_to_pages_batch
    from basicocr_ray.stages.extract import extract_batch

    import os

    correct = os.environ.get("BASICOCR_CORRECT", "") == "1"
    cfg = ExtractConfig(correct=correct)
    ds = _read("/root/testdata/sf0.001", "documents",
               columns=["doc_id", "text", "lang"])

    def wrap_extract(batch: pa.Table) -> pa.Table:
        pages = docs_to_pages_batch(batch)
        return extract_batch(pages, cfg)

    out = ds.map_batches(wrap_extract, batch_format="pyarrow")
    if cfg.correct:
        # detect→recognize→CORRECT: the A3 strip + A2 trie stages
        # chained into the flagship flow (opt-in; default smoke-check
        # output is byte-stable without it)
        from basicocr_ray.pipelines.extract_pipeline import (
            add_correction_stages,
        )

        out = add_correction_stages(
            out,
            cfg,
            strip_phrases=["all rights reserved", "click here"],
            trie_entries=[("the", 100), ("and", 80), ("data", 60)],
        )
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from basicocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from basicocr_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
