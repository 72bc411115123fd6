"""Shared helpers for the driver-contract query modules.

Float discipline: aggregates over doubles are rounded HALF-UP
(matching DuckDB ``round()``) via `_round_half_up`; pure per-row
arithmetic is left unrounded; int aggregates stay exact.
"""

from __future__ import annotations

import math
import os
import pandas as pd


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None, filter=None):
    """Pruned parquet read: ``columns`` projects at the reader (only the
    named columns leave storage) and ``filter`` (a pyarrow.dataset
    expression) pushes the predicate into the parquet scan — row groups
    whose statistics exclude the predicate are never read, and surviving
    row groups are filtered before the batch reaches the pipeline. At
    100 TB a selective filter here is the difference between scanning a
    shard and skipping it."""
    import ray.data

    return ray.data.read_parquet(
        _p(sf_dir, table), columns=columns, filter=filter
    )


def _round_half_up(x: float, n: int) -> float:
    """DuckDB-compatible round (half away from zero for positives)."""
    m = 10.0 ** n
    return math.floor(x * m + 0.5) / m if x >= 0 else -math.floor(-x * m + 0.5) / m


def _round_col(df: pd.DataFrame, col: str, n: int) -> pd.DataFrame:
    df[col] = [_round_half_up(float(v), n) for v in df[col]]
    return df


_TOKS = r"regexp_split_to_array(lower(text), '\s+')"
