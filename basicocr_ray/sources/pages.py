"""`pages` source — pruned Parquet reads (SURVEY §2 S1).

The reference's LMDB reader fetches exactly the two values it needs per
record (`contrib/crnn/dataset.py:41-66`); the engine equivalent is COLUMN
PRUNING at the read: an extraction run reads (url, html, lang) and NEVER
the ground-truth `text` label column — loading all columns for a
3-column transform would double I/O at 100 TB.
"""

from __future__ import annotations

import ray.data

EXTRACT_COLUMNS = ["url", "html", "lang"]


def read_pages(paths: str | list[str], columns: list[str] | None = None):
    """pages Parquet → Dataset, pruned to the extraction columns."""
    return ray.data.read_parquet(
        paths, columns=list(columns) if columns else list(EXTRACT_COLUMNS)
    )
