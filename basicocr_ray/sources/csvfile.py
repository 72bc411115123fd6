"""CSV source with corrupt-line quarantine (S1/S4 widening; sibling of
`sources.jsonl`).

Crawl sidecars and metadata dumps ship as CSV; the reference's reader
discipline (fetch what you need, skip corrupt records without failing the
job — contrib/crnn/dataset.py:53-55 retries past undecodable samples) maps
to: `read_text` → per-batch parse against a DECLARED schema, with
malformed lines (wrong field count, unbalanced quotes, uncoercible
values) routed to a `_corrupt` flag instead of raising. Quoting follows
RFC 4180 via the stdlib csv module; a 100-TB dump with a bad shard
streams through unchanged.
"""

from __future__ import annotations

import csv
import io

import pyarrow as pa
import ray.data


def _coerce(value: str, typ: pa.DataType):
    """CSV cell (string) → Python value for ``typ``; raises ValueError on
    an uncoercible cell. Empty cells are NULL for every type."""
    if value == "":
        return None
    if pa.types.is_integer(typ):
        return int(value)
    if pa.types.is_floating(typ):
        return float(value)
    if pa.types.is_boolean(typ):
        low = value.lower()
        if low in ("true", "1"):
            return True
        if low in ("false", "0"):
            return False
        raise ValueError(f"not a bool: {value!r}")
    if pa.types.is_timestamp(typ):
        from datetime import datetime

        return datetime.fromisoformat(value)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return value
    raise ValueError(f"unsupported CSV field type: {typ}")


def read_csv_quarantine(
    paths: str | list[str],
    fields: dict[str, pa.DataType],
    delimiter: str = ",",
    header: bool = True,
    keep_corrupt: bool = False,
):
    """CSV file(s) → Dataset with one column per declared field.

    ``fields`` maps field name → Arrow type in FILE COLUMN ORDER (the
    declared-schema contract of `read_jsonl`). With ``header=True`` any
    line that parses exactly to the declared field names is dropped —
    `read_text` erases file boundaries, so the header is recognized by
    content, which is deterministic for every shard. Lines with the wrong
    field count or an uncoercible cell are dropped — or, with
    ``keep_corrupt=True``, returned with every field NULL, ``_corrupt``
    True and the raw line in ``_raw`` for a quarantine sink."""
    names = list(fields)

    def parse(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in names}
        corrupt_raw: list[str] = []
        for line in batch["text"].to_pylist():
            if line is None or not line.strip():
                continue  # blank line: neither a record nor corruption
            row = None
            try:
                parsed = next(
                    csv.reader(io.StringIO(line), delimiter=delimiter)
                )
                if header and parsed == names:
                    continue  # header line (content-recognized)
                if len(parsed) == len(names):
                    row = [
                        _coerce(v, fields[n]) for n, v in zip(names, parsed)
                    ]
            except (ValueError, StopIteration, csv.Error):
                row = None
            if row is None:
                corrupt_raw.append(line)
                continue
            for n, v in zip(names, row):
                cols[n].append(v)

        n_ok = len(cols[names[0]]) if names else 0
        out = {n: pa.array(cols[n], type=fields[n]) for n in names}
        if not keep_corrupt:
            return pa.table(out)
        n_bad = len(corrupt_raw)
        full = {
            n: pa.concat_arrays([out[n], pa.nulls(n_bad, type=fields[n])])
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


def write_csv(
    ds,
    out_dir: str,
    columns: list[str] | None = None,
    delimiter: str = ",",
):
    """Dataset → CSV part files, content-hash named (idempotent-retry
    discipline of sources.text.write_lines: a retried task re-emits the
    same bytes to the same name). Headerless — the declared-schema reader
    doesn't need one, and per-part headers would corrupt a naive
    concatenation. → total row count."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        tbl = batch.select(columns) if columns else batch
        buf = io.StringIO()
        w = csv.writer(buf, delimiter=delimiter, lineterminator="\n")
        names = tbl.column_names
        for row in tbl.to_pylist():
            w.writerow(["" if row[n] is None else row[n] for n in names])
        payload = buf.getvalue().encode("utf-8")
        name = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.csv")
        with open(path + ".tmp", "wb") as f:
            f.write(payload)
        os.replace(path + ".tmp", path)
        return pa.table({"n_rows": pa.array([tbl.num_rows], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow").sum("n_rows")
