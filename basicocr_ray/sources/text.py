"""Line-stream source/sink (SURVEY §2 S4).

The reference's AC pipeline reads UTF-8 lines and writes transformed lines
(`contrib/acautomata/.../Test.java:73-82` read, `:25-39` write). Ray
translation: `ray.data.read_text` → per-batch transforms → parquet/text
sink, with a line-number column for order-sensitive consumers."""

from __future__ import annotations

import pyarrow as pa
import ray.data


def read_lines(paths: str | list[str]):
    """Text file(s) → Dataset(text: string)."""
    return ray.data.read_text(paths)


def lines_to_table(ds):
    """Normalize read_text output to a (line: large_string) schema."""

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"line": pa.array(batch["text"].to_pylist(), pa.large_string())}
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def write_lines(ds, out_dir: str, column: str = "line"):
    """Dataset → newline-delimited text files, one per batch (bytes are the
    raw column values — no CSV quoting/escaping; idempotent content-hashed
    names so task retries cannot duplicate output)."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        lines = [v if v is not None else "" for v in batch[column].to_pylist()]
        payload = ("\n".join(lines) + "\n").encode("utf-8")
        name = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.txt")
        with open(path + ".tmp", "wb") as f:
            f.write(payload)
        os.replace(path + ".tmp", path)
        return pa.table({"n_lines": pa.array([len(lines)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow").sum("n_lines")
