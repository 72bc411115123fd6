"""Flagship job: pages Parquet → extracted Parquet, resumable, with lineage.

Shape (SURVEY §3.1 translated):

    read_parquet(url, html, lang)              # column-pruned read
      ├─ filter html !startswith %PDF ─ map_batches(extract)   # task pool
      └─ filter html  startswith %PDF ─ map_batches(PdfParser) # actor pool
    union → write_parquet(partition_cols=[partition_id])
    read-back (small) → groupby(lang, partition_id) metrics → manifests

Scale notes
-----------
* The PDF/HTML routing is two filtered consumers of the same lazy read;
  Ray executes the read once per consumer. At 100 TB you would route at
  ingest (separate pdf/html input prefixes) to pay the read once; here the
  branch demonstrates the actor-pool routing the north-star mandates, and
  the PDF side prunes 99% of rows immediately after the read.
* Skew: `extract_batch` is wrapped in an adaptive GENERATOR that yields
  output slices every `yield_bytes` of input HTML, so one 50 MB document
  cannot inflate a task's working set (the alignCollate keep_ratio hazard,
  SURVEY §4); additionally `skew_split=True` routes oversized documents
  (> cfg.oversize_bytes) through a dedicated branch with batch_size
  `cfg.batch_size_big`.
* Resume: partitions (crc32(url) % P) whose manifest matches the input
  fingerprint are filtered out RIGHT AFTER the read — no re-extraction,
  no duplicate output (see state.manifest).
* Failed rows (undecodable/empty payloads) ride the same output with
  ok=False and are additionally mirrored to `out_dir/_failed/` — the
  corrupt-skip of `dataset.py:53-55` made explicit and auditable.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.sources.pages import read_pages
from basicocr_ray.stages.extract import extract_batch, partition_of
from basicocr_ray.stages.pdf import PdfParser
from basicocr_ray.state import manifest as mf

PDF_PREFIX = b"%PDF"


def _is_pdf_mask(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    return pc.equal(pc.binary_slice(batch["html"], 0, 4), PDF_PREFIX)


def _add_routing(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Vectorized-ish routing columns: partition_id + html byte length."""
    pids = pa.array(
        [partition_of(u, num_partitions) for u in batch["url"].to_pylist()],
        pa.int32(),
    )
    nbytes = pc.binary_length(batch["html"])
    return batch.append_column("partition_id", pids).append_column(
        "_nbytes", pc.cast(nbytes, pa.int64())
    )


def make_adaptive_extract(cfg: ExtractConfig, yield_bytes: int = 8 << 20):
    """Generator map_batches body: stream output slices so giant documents
    never pin a giant output batch (skew guard #1)."""

    def fn(batch: pa.Table) -> Iterator[pa.Table]:
        sizes = pc.binary_length(batch["html"]).to_pylist()
        start = 0
        acc = 0
        for i, s in enumerate(sizes):
            acc += s or 0
            if acc >= yield_bytes and i + 1 > start:
                yield extract_batch(batch.slice(start, i + 1 - start), cfg)
                start = i + 1
                acc = 0
        if start < batch.num_rows:
            yield extract_batch(batch.slice(start, batch.num_rows - start), cfg)

    return fn


def build_extract_ds(
    pages: "ray.data.Dataset",
    cfg: ExtractConfig = DEFAULT_CONFIG,
    skip_pids: set[int] | None = None,
    pdf_branch: bool = True,
    skew_split: bool = False,
    pdf_concurrency: int | tuple[int, int] = (1, 4),
):
    """Lazy pages → extracted Dataset (no materialization)."""
    skip = frozenset(skip_pids or ())

    def route(batch: pa.Table) -> pa.Table:
        batch = _add_routing(batch, cfg.num_partitions)
        if skip:
            mask = pa.array(
                [p not in skip for p in batch["partition_id"].to_pylist()]
            )
            batch = batch.filter(mask)
        return batch

    routed = pages.map_batches(route, batch_format="pyarrow")

    def not_pdf(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(_is_pdf_mask(batch)))

    def only_pdf(batch: pa.Table) -> pa.Table:
        return batch.filter(_is_pdf_mask(batch))

    if pdf_branch:
        html_ds = routed.map_batches(not_pdf, batch_format="pyarrow")
    else:
        # single-read mode: extract_one handles PDF payloads inline (same
        # kernel, task pool instead of a dedicated warm-parser actor pool)
        html_ds = routed

    branches = []
    if skew_split:
        thr = cfg.oversize_bytes

        def small_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.less_equal(b["_nbytes"], thr))

        def big_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater(b["_nbytes"], thr))

        branches.append(
            html_ds.map_batches(small_only, batch_format="pyarrow").map_batches(
                make_adaptive_extract(cfg),
                batch_format="pyarrow",
                batch_size=cfg.batch_size_small,
            )
        )
        branches.append(
            html_ds.map_batches(big_only, batch_format="pyarrow").map_batches(
                make_adaptive_extract(cfg),
                batch_format="pyarrow",
                batch_size=cfg.batch_size_big,
            )
        )
    else:
        branches.append(
            html_ds.map_batches(
                make_adaptive_extract(cfg),
                batch_format="pyarrow",
                batch_size=cfg.batch_size_small,
            )
        )
    if pdf_branch:
        branches.append(
            routed.map_batches(only_pdf, batch_format="pyarrow").map_batches(
                PdfParser,
                fn_constructor_kwargs={"cfg": cfg},
                batch_format="pyarrow",
                batch_size=cfg.batch_size_small,
                concurrency=pdf_concurrency,
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out


def run_extract_job(
    input_paths: str | list[str],
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    resume: bool = True,
    pdf_branch: bool = True,
    skew_split: bool = False,
) -> dict:
    """Execute the flagship job end-to-end; returns job stats.

    Layout: ``out_dir/partition_id=<pid>/*.parquet`` + per-partition JSON
    manifests + ``out_dir/_metrics/`` roll-ups (G7)."""
    paths = [input_paths] if isinstance(input_paths, str) else list(input_paths)
    files = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
        else:
            files.append(p)
    input_fp = mf.fingerprint_input(files)

    done = mf.load_done_partitions(out_dir, input_fp) if resume else set()
    todo = [p for p in range(cfg.num_partitions) if p not in done]
    mf.clear_stale_partitions(out_dir, todo)
    if not todo:
        return {"skipped": True, "partitions_done": len(done), "n_rows": 0}

    pages = read_pages(files)
    extracted = build_extract_ds(
        pages, cfg, skip_pids=done, pdf_branch=pdf_branch, skew_split=skew_split
    )
    extracted.write_parquet(out_dir, partition_cols=["partition_id"])

    # --- read-back (small, extracted only) → metrics + manifests (G7) ---
    # hive layout read-back: pyarrow ignores the underscore-prefixed
    # _manifests/_metrics/_failed dirs and restores partition_id from the
    # directory names
    todo_set = frozenset(todo)
    written = ray.data.read_parquet(
        out_dir,
        columns=["url", "lang", "ok", "error", "n_blocks_kept", "n_bytes_in",
                 "n_bytes_out", "partition_id"],
    ).map_batches(
        lambda b: b.filter(
            pa.array([int(p) in todo_set for p in b["partition_id"].to_pylist()])
        ),
        batch_format="pyarrow",
    )
    per_part = written.groupby("partition_id").aggregate(
        Count(alias_name="n_rows"),
        Sum("ok", alias_name="n_ok"),
        Sum("n_bytes_in", alias_name="n_bytes_in"),
        Sum("n_bytes_out", alias_name="n_bytes_out"),
    )
    part_rows = per_part.take_all()  # ≤ num_partitions rows — tiny
    for r in part_rows:
        pid = int(r["partition_id"])
        mf.write_manifest(
            out_dir, pid, input_fp,
            n_rows=int(r["n_rows"]), n_ok=int(r["n_ok"]),
            n_failed=int(r["n_rows"] - r["n_ok"]),
            n_bytes_in=int(r["n_bytes_in"]), n_bytes_out=int(r["n_bytes_out"]),
        )
    # partitions with zero input rows still need manifests (they are "done")
    seen = {int(r["partition_id"]) for r in part_rows}
    for pid in todo:
        if pid not in seen:
            mf.write_manifest(out_dir, pid, input_fp, 0, 0, 0, 0, 0)

    metrics = written.groupby(["lang", "partition_id"]).aggregate(
        Count(alias_name="n_docs"),
        Sum("ok", alias_name="n_ok"),
        Mean("n_blocks_kept", alias_name="mean_blocks_kept"),
        Sum("n_bytes_in", alias_name="n_bytes_in"),
        Sum("n_bytes_out", alias_name="n_bytes_out"),
    )
    metrics.write_parquet(os.path.join(out_dir, "_metrics"))

    # failed mirror — auditable corrupt-record routing (dataset.py:53-55
    # made explicit: poison rows land in a table, never crash a task)
    failed = written.map_batches(
        lambda b: b.filter(pc.invert(b["ok"])), batch_format="pyarrow"
    ).select_columns(["url", "lang", "error", "partition_id"])
    failed.write_parquet(os.path.join(out_dir, "_failed"))
    n_failed = sum(int(r["n_rows"] - r["n_ok"]) for r in part_rows)

    total_rows = sum(int(r["n_rows"]) for r in part_rows)
    return {
        "skipped": False,
        "partitions_done_prior": len(done),
        "partitions_computed": len(todo),
        "n_rows": total_rows,
        "n_failed": n_failed,
        "input_fingerprint": input_fp,
    }
