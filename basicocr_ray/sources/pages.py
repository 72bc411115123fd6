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


def read_pages(
    paths: str | list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """pages Parquet → Dataset, pruned to the extraction columns.

    ``override_num_blocks`` controls read/task granularity: Ray Data's
    default splitter targets ~200 blocks regardless of the downstream
    map cost, which on a many-small-files corpus yields sub-second
    extract tasks whose scheduling overhead caps utilization (measured
    ~42% at 8 CPUs). The extract job passes ~6 tasks per CPU instead —
    coarse enough to amortize dispatch, fine enough that the tail wave
    is a small fraction of the run."""
    return ray.data.read_parquet(
        paths,
        columns=list(columns) if columns else list(EXTRACT_COLUMNS),
        override_num_blocks=override_num_blocks,
    )
