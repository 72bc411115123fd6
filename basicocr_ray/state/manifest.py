"""Per-partition lineage manifests → checkpoint/resume (SURVEY §4).

The reference checkpoints model state every ``saveInterval`` iterations and
resumes via a partial load (`contrib/crnn/crnn_main.py:233-235`, `:104-116`).
For a batch extraction job the analogue is per-PARTITION completion:

  out_dir/
    part={pid}/*.parquet      ← extracted rows of partition pid
    _manifests/part={pid}.json ← written only AFTER the partition's rows are
                                  fully on disk; records row counts, bytes,
                                  and the input fingerprint

Resume rule: a partition is done iff its manifest exists AND the recorded
input fingerprint matches the current input (stale partials are never
silently reused — SURVEY §7.4). Partitions without a valid manifest get
their output directory cleared before rerun so duplicate part-files cannot
accumulate.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def fingerprint_input(paths: list[str]) -> str:
    """Stable fingerprint of the input files: sorted (path, size, mtime_ns).

    Content-hash-free so it is O(#files) — at 100 TB you fingerprint
    metadata, not bytes; object stores give you etags for the same purpose.
    """
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:32]


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part={pid}.json")


def partition_dir(out_dir: str, pid: int) -> str:
    # must match the hive layout Ray's write_parquet(partition_cols=
    # ["partition_id"]) produces
    return os.path.join(out_dir, f"partition_id={pid}")


def load_done_partitions(out_dir: str, input_fp: str) -> set[int]:
    """Partition ids whose manifest exists and matches the input."""
    mdir = manifest_dir(out_dir)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part=") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("input_fingerprint") == input_fp and m.get("status") == "done":
            done.add(int(name[len("part=") : -len(".json")]))
    return done


def clear_stale_partitions(out_dir: str, pids: list[int]) -> None:
    """Remove output dirs of partitions about to be (re)computed, so a rerun
    after a mid-write crash cannot leave duplicate part files."""
    for pid in pids:
        d = partition_dir(out_dir, pid)
        if os.path.isdir(d):
            shutil.rmtree(d)


def write_manifest(
    out_dir: str,
    pid: int,
    input_fp: str,
    n_rows: int,
    n_ok: int,
    n_failed: int,
    n_bytes_in: int,
    n_bytes_out: int,
) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    tmp = manifest_path(out_dir, pid) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "partition_id": pid,
                "status": "done",
                "input_fingerprint": input_fp,
                "n_rows": n_rows,
                "n_ok": n_ok,
                "n_failed": n_failed,
                "n_bytes_in": n_bytes_in,
                "n_bytes_out": n_bytes_out,
            },
            f,
        )
    os.replace(tmp, manifest_path(out_dir, pid))  # atomic publish
