"""JSONL source with corrupt-line routing (S1/S4 widening).

Web-crawl corpora ship as newline-delimited JSON at least as often as
Parquet; the reference's reader discipline (fetch exactly what you need,
skip corrupt records without failing the job — contrib/crnn/dataset.py
returns the *next* sample on a decode failure) maps to: `read_text` →
vectorized per-batch parse into a DECLARED schema, with undecodable lines
routed to a `_corrupt` flag instead of raising. The parse is
`pyarrow.json`-shaped (one Arrow array per declared field), missing keys
degrade to NULL, and type coercion failures count as corruption — so a
100-TB crawl with a bad shard streams through unchanged.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def read_jsonl(
    paths: str | list[str],
    fields: dict[str, pa.DataType],
    keep_corrupt: bool = False,
):
    """JSONL file(s) → Dataset with one column per declared field.

    ``fields`` maps field name → Arrow type (the caller's column-pruning
    contract: undeclared keys are never materialized, mirroring the S1
    pruned read). Lines that fail ``json.loads``, are not objects, or
    carry an uncoercible value are dropped — or, with
    ``keep_corrupt=True``, returned with every field NULL, ``_corrupt``
    True and the raw line in ``_raw`` for a quarantine sink."""
    names = list(fields)

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in names}
        corrupt_raw: list[str] = []
        for line in batch["text"].to_pylist():
            row = None
            if line is not None and line.strip():
                try:
                    obj = json.loads(line)
                    if isinstance(obj, dict):
                        row = {n: obj.get(n) for n in names}
                        # eagerly validate coercion so a bad value routes
                        # the LINE to quarantine, not the whole batch to
                        # a task failure
                        for n in names:
                            if row[n] is not None:
                                pa.scalar(row[n], type=fields[n])
                except (ValueError, TypeError, pa.ArrowInvalid):
                    row = None
            elif line is not None and not line.strip():
                continue  # blank line: neither a record nor corruption
            if row is None:
                corrupt_raw.append(line if line is not None else "")
                continue
            for n in names:
                cols[n].append(row[n])

        n_ok = len(cols[names[0]]) if names else 0
        out = {n: pa.array(cols[n], type=fields[n]) for n in names}
        if not keep_corrupt:
            return pa.table(out)
        n_bad = len(corrupt_raw)
        full = {
            n: pa.concat_arrays(
                [out[n], pa.nulls(n_bad, type=fields[n])]
            )
            for n in names
        }
        full["_corrupt"] = pa.array(
            [False] * n_ok + [True] * n_bad, pa.bool_()
        )
        full["_raw"] = pa.array([""] * n_ok + corrupt_raw, pa.string())
        return pa.table(full)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow"
    )


def write_jsonl(ds, out_dir: str, columns: list[str] | None = None):
    """Dataset → newline-delimited JSON files, content-hash named (the
    same idempotent-retry discipline as sources.text.write_lines)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        tbl = batch.select(columns) if columns else batch
        lines = [
            json.dumps(r, default=str, sort_keys=True)
            for r in tbl.to_pylist()
        ]
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.jsonl")
        with open(path + ".tmp", "wb") as f:
            f.write(payload)
        os.replace(path + ".tmp", path)
        return pa.table({"n_lines": pa.array([len(lines)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow").sum("n_lines")
