"""Partitioned hash join — both sides large (SURVEY §2.4, guide pattern).

Every other lookup in this engine broadcasts the small side (J1-J3); when
BOTH sides are fact-scale the portable Ray Data pattern is the explicit
bucketed hash join: add ``bucket = key % B`` to each side, tag rows with
their side, union, group by bucket, and join matching buckets pairwise
inside `map_groups` with a pandas merge. Rows shuffle exactly once each
(by bucket); skewed keys are handled by raising B (and, for pathological
hot keys, salting them into sub-buckets — documented, not needed for the
uniform TPC-H keys here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def bucketed_hash_join(
    left_ds,
    right_ds,
    key: str,
    left_columns: list[str],
    right_columns: list[str],
    num_buckets: int = 32,
):
    """Inner equi-join of two large Datasets on an integer key column.

    → Dataset with key + left_columns + right_columns. Both sides are
    widened to a COMMON typed schema (types probed via ``ds.schema()``)
    so the union is well-formed; the per-bucket join is a pandas merge."""
    lcols = [key] + [c for c in left_columns if c != key]
    rcols = [key] + [c for c in right_columns if c != key]
    overlap = (set(lcols) & set(rcols)) - {key}
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    all_cols = lcols + [c for c in rcols if c not in lcols]

    ls, rs = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    types = {c: ltypes.get(c, rtypes.get(c)) for c in all_cols}

    def prep(cols_present: list[str], side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = np.asarray(batch[key].to_pylist(), dtype=np.int64)
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in cols_present:
                    arrays.append(batch[c])
                else:
                    arrays.append(pa.nulls(n, type=types[c]))
            arrays.append(pa.array(keys % num_buckets, pa.int32()))
            names.append("_bucket")
            arrays.append(pa.array([side] * n, pa.string()))
            names.append("_side")
            return pa.Table.from_arrays(arrays, names)

        return fn

    left_t = left_ds.map_batches(prep(lcols, "l"), batch_format="pyarrow")
    right_t = right_ds.map_batches(prep(rcols, "r"), batch_format="pyarrow")

    def join_bucket(tbl: pa.Table) -> pa.Table:
        # arrow-backed pandas: int64-with-nulls stays int64[pyarrow]
        # (plain pandas would coerce to float64 and corrupt ids > 2^53)
        df = tbl.to_pandas(types_mapper=pd.ArrowDtype)
        l = df.loc[df["_side"] == "l", lcols]
        r = df.loc[df["_side"] == "r", rcols]
        if l.empty or r.empty:
            return tbl.select(all_cols).slice(0, 0)
        out = l.merge(r, on=key, how="inner", sort=False)[all_cols]
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        left_t.union(right_t)
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
