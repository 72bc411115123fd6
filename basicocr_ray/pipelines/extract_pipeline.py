"""Flagship job: pages Parquet → extracted Parquet, resumable, with lineage.

Shape (SURVEY §3.1 translated):

    read_parquet(url, html, lang)                      # column-pruned read
      → map_batches(route: partition_id, resume-skip)  # vectorized
      → map_batches(inline extract)                    # elastic task pool:
            HTML rows extracted inline; PDF rows parsed by the per-worker
            WARM parser (stages.pdf.warm_parser — load-once, no actor hop;
            pdf_branch="finisher"/"split" keep the actor-pool formulations)
      → spill fragments by partition_id → P merge tasks, each writing
        ONE data.parquet + failed mirror + manifest, returning metrics

Scale notes
-----------
* Single read: PDF rows ride the same pass as HTML rows and are finished
  by a warm-parser actor pool downstream (north-star's actor-pool branch)
  instead of a second filtered consumer of the input (pdf_branch="split"
  keeps that 2×-read formulation for comparison). A pool must never
  reserve every CPU — that starves its own upstream and deadlocks.
* The partition exchange is a filesystem-staged map-spill / reduce-merge
  shuffle (Spark-shuffle-file shape; on a cluster the staging prefix is
  shared storage): barrier-free, linear, and measured 5-7× faster end to
  end than Ray's sort-based AllToAll at low parallelism.
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
import pyarrow.parquet  # noqa: F401  (pa.parquet used below)
import ray.data

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.sources.pages import read_pages
from basicocr_ray.stages.extract import extract_batch, partition_of
from basicocr_ray.stages.pdf import PdfParser
from basicocr_ray.state import manifest as mf

PDF_PREFIX = b"%PDF"


def _staging_dir(out_dir: str) -> str:
    """Shuffle-staging location. Defaults to ``out_dir/_staging`` (shared
    storage on a cluster); ``BASICOCR_STAGING_DIR`` overrides it — point it
    at fast local media (tmpfs / NVMe) when the output filesystem cannot
    absorb the transient spill+merge traffic at full parallelism. The dir
    is keyed by a hash of out_dir so concurrent jobs never collide."""
    import hashlib as _hl

    base = os.environ.get("BASICOCR_STAGING_DIR")
    if not base:
        return os.path.join(out_dir, "_staging")
    return os.path.join(base, _hl.md5(out_dir.encode()).hexdigest()[:12])


def _is_pdf_mask(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    # NULL html must coalesce to False: a null mask value fails BOTH a
    # filter(mask) and a filter(invert(mask)), silently dropping the row —
    # null-payload rows must instead reach the extractor's failed path
    return pc.coalesce(
        pc.equal(pc.binary_slice(batch["html"], 0, 4), PDF_PREFIX),
        pa.scalar(False),
    )


def _add_routing(batch: pa.Table, num_partitions: int) -> pa.Table:
    """Vectorized-ish routing columns: partition_id + html byte length."""
    pids = pa.array(
        [partition_of(u, num_partitions) for u in batch["url"].to_pylist()],
        pa.int32(),
    )
    nbytes = pc.coalesce(pc.binary_length(batch["html"]), pa.scalar(0))
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


def make_inline_extract(cfg: ExtractConfig):
    """Default stage body: one elastic task pool does EVERYTHING.

    HTML rows go through the adaptive generator; PDF rows are parsed by the
    per-worker WARM parser (`stages.pdf.warm_parser` — load-once semantics
    via worker-process reuse, no actor hop). Round-1 profiling showed the
    forwarding+PdfFinisher formulation paid an every-row pass-through stage
    (serialize + actor queue for ~99% non-PDF rows); this keeps the warm
    state while deleting that hop."""
    from basicocr_ray.stages.pdf import warm_parser

    adaptive = make_adaptive_extract(cfg)

    def fn(batch: pa.Table) -> Iterator[pa.Table]:
        mask = _is_pdf_mask(batch)
        n_pdf = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if n_pdf:
            pdf_part = batch.filter(mask)
            yield warm_parser(cfg)(pdf_part)
            batch = batch.filter(pc.invert(mask))
        yield from adaptive(batch)

    return fn


def make_forwarding_extract(cfg: ExtractConfig):
    """Stage-1 task body: extract HTML rows inline (stateless, elastic
    tasks); FORWARD pdf rows untouched via a ``_pdf_html`` carry column so
    the downstream warm-parser actor pool can finish them — single read,
    no second consumption of the input (pdf_branch="split" pays one)."""
    adaptive = make_adaptive_extract(cfg)

    def fn(batch: pa.Table) -> Iterator[pa.Table]:
        mask = _is_pdf_mask(batch)
        n_pdf = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if n_pdf:
            pdf_part = batch.filter(mask)
            placeholder = extract_batch(
                pdf_part.set_column(
                    pdf_part.column_names.index("html"),
                    "html",
                    pa.array([b""] * pdf_part.num_rows, pa.large_binary()),
                ),
                cfg,
            )
            yield placeholder.append_column("_pdf_html", pdf_part["html"])
            batch = batch.filter(pc.invert(mask))
        for out in adaptive(batch):
            yield out.append_column(
                "_pdf_html",
                pa.array([None] * out.num_rows, pa.large_binary()),
            )

    return fn


class PdfFinisher:
    """Stage-2 actor pool: holds the WARM PDF parser (load-once pattern,
    `crnn_main.py:102-116`); parses only rows carrying ``_pdf_html``,
    passes every other row through zero-copy."""

    def __init__(self, cfg: ExtractConfig):
        self.cfg = cfg
        self.pdf = PdfParser(cfg)  # warm parser, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_valid(batch["_pdf_html"])
        n_pdf = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        idx = batch.column_names.index("_pdf_html")
        if not n_pdf:
            return batch.remove_column(idx)
        pdf_part = batch.filter(mask)
        parsed = self.pdf(
            pa.table(
                {
                    "url": pdf_part["url"],
                    "html": pdf_part["_pdf_html"],
                    "lang": pdf_part["lang"],
                }
            )
        )
        rest = batch.filter(pc.invert(mask)).remove_column(idx)
        return pa.concat_tables([rest, parsed.select(rest.column_names)])


def build_extract_ds(
    pages: "ray.data.Dataset",
    cfg: ExtractConfig = DEFAULT_CONFIG,
    skip_pids: set[int] | None = None,
    pdf_branch: bool | str = True,
    skew_split: bool = False,
    pdf_concurrency: int | tuple[int, int] | None = None,
    extract_concurrency: int | tuple[int, int] | None = None,
):
    """Lazy pages → extracted Dataset (no materialization).

    pdf_branch modes: True → single elastic task pool, PDF rows parsed by
    the per-worker warm parser (default, single read, no extra hop);
    "finisher" → forwarding tasks + PdfFinisher actor pool (round-1
    formulation, kept for comparison); "split" → separate filtered PDF
    actor-pool branch union'd back (two-consumer formulation; 2× read);
    False → stateless task pool, PDF handled inline by the shared kernel."""
    skip = frozenset(skip_pids or ())

    def route(batch: pa.Table) -> pa.Table:
        batch = _add_routing(batch, cfg.num_partitions)
        if skip:
            mask = pa.array(
                [p not in skip for p in batch["partition_id"].to_pylist()]
            )
            batch = batch.filter(mask)
        return batch

    # the routing pass exists for resume-skip filtering and skew bucketing;
    # the extract kernel computes partition_id itself, so on a fresh
    # non-skew run the whole per-row crc32 pre-pass is skipped
    if skip or skew_split:
        routed = pages.map_batches(route, batch_format="pyarrow")
    else:
        routed = pages

    if pdf_concurrency is None:
        # every row passes through the finisher pool (zero-copy for
        # non-PDF rows) — size it with the cluster or it caps throughput
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8))
        pdf_concurrency = (1, max(2, ncpu // 4))

    if pdf_branch is True:
        return routed.map_batches(
            make_inline_extract(cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size_small,
        )

    if pdf_branch == "finisher":
        # heavy HTML work in elastic stateless tasks; PDF rows forwarded to
        # the small warm-parser actor pool downstream (single read; the
        # pool never reserves the whole cluster, so no upstream starvation)
        return routed.map_batches(
            make_forwarding_extract(cfg),
            batch_format="pyarrow",
            batch_size=cfg.batch_size_small,
        ).map_batches(
            PdfFinisher,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            concurrency=pdf_concurrency,
            num_cpus=0.5,
        )

    def not_pdf(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(_is_pdf_mask(batch)))

    def only_pdf(batch: pa.Table) -> pa.Table:
        return batch.filter(_is_pdf_mask(batch))

    if pdf_branch == "split":
        html_ds = routed.map_batches(not_pdf, batch_format="pyarrow")
    else:
        # stateless task-pool mode: extract_one handles PDF payloads inline
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
    if pdf_branch == "split":
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


def add_correction_stages(
    ds: "ray.data.Dataset",
    cfg: ExtractConfig,
    strip_phrases=None,
    trie_entries=None,
    column: str = "main_text",
    concurrency: int | tuple[int, int] = (1, 4),
):
    """Chain the A3 AC-strip and A2 trie-correct actor pools onto an
    extracted Dataset, rewriting ``column`` in place — the reference's
    detect→recognize→CORRECT driver flow (`Test.java:58-82` strip,
    `contrib/trietree/trietree_correct.py:245-274` correct-inside-the-
    flow). State (automaton / trie) is built once per actor in
    ``__init__``; pass ``ray.put`` ObjectRefs for large dictionaries so
    the broadcast ships once per node, not once per batch. Order is
    strip-then-correct: boilerplate phrases leave before the bounded
    edit-distance lookup sees the tokens."""
    from basicocr_ray.stages.correct import ACStripper, TrieCorrector

    if strip_phrases is not None:
        ds = ds.map_batches(
            ACStripper,
            fn_constructor_kwargs={
                "phrases": strip_phrases,
                "column": column,
                "out_column": column,
            },
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=0.5,
        )
    if trie_entries is not None:
        ds = ds.map_batches(
            TrieCorrector,
            fn_constructor_kwargs={
                "entries": trie_entries,
                "column": column,
                "out_column": column,
                "max_cost": cfg.correct_max_cost,
            },
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=0.5,
        )
    return ds


_EMPTY_METRICS = pa.table(
    {
        "lang": pa.array([], pa.string()),
        "partition_id": pa.array([], pa.int64()),
        "n_docs": pa.array([], pa.int64()),
        "n_ok": pa.array([], pa.int64()),
        "mean_blocks_kept": pa.array([], pa.float64()),
        "n_bytes_in": pa.array([], pa.int64()),
        "n_bytes_out": pa.array([], pa.int64()),
    }
)


def _merge_one_pid(
    pid: int,
    fmap: dict[str, int],
    staging: str,
    out_dir: str,
    input_fp: str,
) -> pa.Table | None:
    """Reduce-side merge for ONE partition: read its listed fragments (each
    re-emitted with its reference multiplicity — byte-identical fragments
    from duplicate rows collide on one file by construction), publish the
    partition parquet + failed mirror + manifest atomically, and return the
    per-language metrics rows. Shared by the driver-collected and
    distributed (groupby-routed) metadata paths."""
    if not fmap:
        return None

    parts = []
    for frag, mult in sorted(fmap.items()):
        path = os.path.join(staging, f"pid={pid}", frag)
        with pa.memory_map(path) as mm:
            t = pa.ipc.open_file(mm).read_all()
        parts.extend([t] * int(mult))
    tbl = pa.concat_tables(parts)
    pdir = mf.partition_dir(out_dir, pid)
    os.makedirs(pdir, exist_ok=True)
    target = os.path.join(pdir, "data.parquet")
    # dictionary-encode only the low-cardinality columns and skip column
    # statistics: dict-building over unique main_text/spans values and
    # min/max comparisons on multi-KB strings were pure CPU with no
    # consumer (nothing predicate-pushes into partition files; the
    # manifest carries the counts) — measured ~2× faster merge writes
    pa.parquet.write_table(
        tbl, target + ".tmp",
        use_dictionary=["lang", "encoding", "error"],
        write_statistics=False,
    )
    os.replace(target + ".tmp", target)  # atomic publish

    failed_mask = pc.invert(tbl["ok"])
    n_failed = pc.sum(pc.cast(failed_mask, pa.int64())).as_py() or 0
    if n_failed:
        ftbl = tbl.filter(failed_mask).select(
            ["url", "lang", "error", "partition_id"]
        )
        fpath = os.path.join(out_dir, "_failed", f"part-{pid}.parquet")
        pa.parquet.write_table(ftbl, fpath + ".tmp")
        os.replace(fpath + ".tmp", fpath)

    mf.write_manifest(
        out_dir, pid, input_fp,
        n_rows=tbl.num_rows, n_ok=tbl.num_rows - n_failed,
        n_failed=n_failed,
        n_bytes_in=pc.sum(tbl["n_bytes_in"]).as_py() or 0,
        n_bytes_out=pc.sum(tbl["n_bytes_out"]).as_py() or 0,
    )
    df = tbl.select(
        ["lang", "ok", "n_blocks_kept", "n_bytes_in", "n_bytes_out"]
    ).to_pandas()
    g = df.groupby("lang", as_index=False).agg(
        n_docs=("ok", "size"), n_ok=("ok", "sum"),
        mean_blocks_kept=("n_blocks_kept", "mean"),
        n_bytes_in=("n_bytes_in", "sum"),
        n_bytes_out=("n_bytes_out", "sum"),
    )
    g.insert(1, "partition_id", pid)
    g["n_ok"] = g["n_ok"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


def run_extract_job(
    input_paths: str | list[str],
    out_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    resume: bool = True,
    pdf_branch: bool | str = True,
    skew_split: bool = False,
    spill_batch_rows: int | None = None,
    meta_mode: str = "auto",
    read_blocks: int | None = None,
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
    # stale staged fragments from a crashed run must never be merged, and
    # recomputed partitions must not keep a stale failed-row mirror
    import shutil as _sh

    _sh.rmtree(_staging_dir(out_dir), ignore_errors=True)
    for pid in todo:
        fpath = os.path.join(out_dir, "_failed", f"part-{pid}.parquet")
        if os.path.exists(fpath):
            os.remove(fpath)
    if not todo:
        return {"skipped": True, "partitions_done": len(done), "n_rows": 0}

    if read_blocks is None:
        # ~6 tasks per CPU, floored so a block is never smaller than
        # ~8 MB of input: Ray's default read splitter targets a fixed
        # ~200 blocks regardless of downstream cost, which on
        # many-small-files corpora yields extract tasks too small to
        # amortize dispatch (measured 58% → 76% of single-core kernel
        # rate at 8 CPUs from coarsening alone). Scaling with the
        # cluster keeps ~6 waves at any size; the byte floor keeps the
        # fragment count bounded on small inputs.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        try:
            total_bytes = sum(os.path.getsize(f) for f in files)
            read_blocks = max(1, min(6 * ncpu, total_bytes // (8 << 20)))
        except OSError:
            # remote URIs (s3://…) that read_pages accepts but the local
            # size probe cannot stat: fall back to Ray's default splitter
            read_blocks = None
    pages = read_pages(files, override_num_blocks=read_blocks)
    extracted = build_extract_ds(
        pages, cfg, skip_pids=done, pdf_branch=pdf_branch, skew_split=skew_split
    )

    # Two-stage filesystem-staged exchange on crc32(url) % P (north-rule's
    # explicit hash-partitioning), instead of a Ray all-to-all:
    #   stage 1: each spill batch is split by partition_id into
    #            _staging/pid=N/frag-<contenthash>.arrow (idempotent under
    #            task retry: the name is the md5 of the fragment's encoded
    #            BYTES, the write is tmp+rename) and the spill emits one
    #            (pid, frag, n_rows) metadata row per fragment;
    #   stage 2: the tiny metadata relation (Spark's map-output-statuses
    #            analogue — fragment names, never data) is collected
    #            driver-side; P merge tasks each read EXACTLY their
    #            partition's listed fragments into ONE data.parquet, mirror
    #            failed rows, publish the partition manifest, and return
    #            per-language metrics rows. If two distinct spill batches
    #            produce byte-identical fragments (e.g. two single-row
    #            batches of the same duplicated url) they collide on one
    #            file by construction — the merge re-emits that fragment
    #            once per metadata reference, so no row is ever lost while
    #            retries (same bytes → same name → overwrite) stay
    #            idempotent.
    # This is the map-side-spill / reduce-side-merge shuffle (on a cluster
    # the staging dir is the shared object store / S3 prefix); it is
    # barrier-free and scales linearly where Ray's sort-based AllToAll
    # stalled at low parallelism.
    staging = _staging_dir(out_dir)
    os.makedirs(os.path.join(out_dir, "_failed"), exist_ok=True)
    import time as _time

    _t_spill0 = _time.perf_counter()

    def spill_fragments(batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        # ONE stable argsort + gather splits the batch into per-pid runs
        # (P boolean filters each rescanned the whole batch — O(P·n) vs
        # this O(n log n) with one gather)
        pids_np = batch["partition_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(pids_np, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        sorted_pids = pids_np[order]
        bounds = np.flatnonzero(np.diff(sorted_pids)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sorted_pids)]))
        out_pids, out_frags, out_rows = [], [], []
        for s, e in zip(starts, ends):
            if s == e:
                continue
            pid = int(sorted_pids[s])
            sub = sorted_batch.slice(int(s), int(e - s))
            # transient staging: Arrow IPC, no compression — encode is
            # near-memcpy vs parquet's column encoding; hash the encoded
            # bytes (blake2b — ~2× md5 at equal collision safety here)
            # so the name covers full content and task retries stay
            # idempotent (same bytes → same name → overwrite)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_file(sink, sub.schema) as w:
                w.write_table(sub)
            buf = sink.getvalue()
            name = hashlib.blake2b(
                memoryview(buf), digest_size=16
            ).hexdigest()
            d = os.path.join(staging, f"pid={pid}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"frag-{name}.arrow")
            with pa.OSFile(path + ".tmp", "wb") as f:
                f.write(buf)
            os.replace(path + ".tmp", path)
            out_pids.append(pid)
            out_frags.append(f"frag-{name}.arrow")
            out_rows.append(int(e - s))
        return pa.table(
            {
                "pid": pa.array(out_pids, pa.int32()),
                "frag": pa.array(out_frags, pa.string()),
                "n_rows": pa.array(out_rows, pa.int64()),
            }
        )

    # spill batches: each spill batch writes ≤ P fragments, so the
    # fragment count is bounded by ceil(rows / spill_batch) × P —
    # tiny-fragment explosions made the merge stage read-bound. Default
    # None = whole-block batches: matching the extract stage's batching
    # lets read→extract→spill FUSE into one operator (no object-store
    # handoff; measured 15.8 → 14.2 s on 800k pages at 8 CPUs), and the
    # adaptive generator's 8 MB yield slices bound the batch size anyway;
    # pin an int only to reproduce the staged (unfused) formulation
    frag_meta_ds = extracted.map_batches(
        spill_fragments, batch_format="pyarrow", batch_size=spill_batch_rows
    ).materialize()  # tiny: one (pid, frag, n_rows) row per fragment
    n_fragments = frag_meta_ds.count()
    _t_spill = _time.perf_counter() - _t_spill0
    _t_merge0 = _time.perf_counter()

    # The fragment-metadata relation is Spark's map-output-statuses
    # analogue: names + counts, never data. Two reduce drivers:
    #   * "driver" (small P): collect it (~P × spill-waves tiny rows),
    #     build per-pid multiplicity maps, fan out one merge task per pid.
    #   * "distributed" (large P): the metadata never centralizes — a Ray
    #     groupby on pid routes each partition's fragment list straight to
    #     its merge task, so the driver holds O(1) regardless of P × waves
    #     (at 10^12 rows / P=64k the collect would be ~30M rows — fine
    #     today, zero tomorrow).
    if meta_mode == "auto":
        meta_mode = "driver" if len(todo) <= 64 else "distributed"

    if meta_mode == "distributed":
        def merge_group(df) -> "pa.Table":
            import pandas as _pd

            if not len(df):
                return _EMPTY_METRICS.to_pandas()
            pid = int(df["pid"].iloc[0])
            fmap = df["frag"].value_counts().to_dict()
            t = _merge_one_pid(pid, fmap, staging, out_dir, input_fp)
            if t is None:
                return _EMPTY_METRICS.to_pandas()
            return t.to_pandas()

        metrics_df = (
            frag_meta_ds.groupby("pid")
            .map_groups(merge_group, batch_format="pandas")
            .to_pandas()
        )
    else:
        frag_meta = frag_meta_ds.to_pandas()
        from collections import Counter

        frag_counts: dict[int, Counter] = {}
        for pid_v, frag_v in zip(frag_meta["pid"], frag_meta["frag"]):
            frag_counts.setdefault(int(pid_v), Counter())[frag_v] += 1

        # raw Ray tasks, not a second Dataset: the merge fan-out is a
        # driver-coordinated FIXED set of P independent tasks, and
        # spinning up another streaming executor (from_items →
        # repartition → map_batches) paid a constant ~0.3 s per job —
        # 6% of the whole 16-CPU run. This is the documented
        # drop-to-raw-tasks case (a shape the Dataset API only
        # expresses with dead overhead); the distributed meta_mode
        # above keeps the Dataset formulation for large P where the
        # metadata must never centralize.
        @ray.remote
        def _merge_task(pid: int, fmap: dict) -> "pa.Table":
            t = _merge_one_pid(pid, fmap, staging, out_dir, input_fp)
            return t if t is not None else _EMPTY_METRICS

        import pandas as _pd

        refs = [
            _merge_task.remote(p, dict(frag_counts.get(p, {})))
            for p in todo
        ]
        metrics_df = _pd.concat(
            [t.to_pandas() for t in ray.get(refs)], ignore_index=True
        )
    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)

    # metrics table (G7) — tiny, written driver-side. On a resumed run,
    # keep prior partitions' rows and replace only the recomputed ones.
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, "metrics.parquet")
    todo_set = set(todo)
    if done and os.path.exists(mpath):
        prior = pa.parquet.read_table(mpath).to_pandas()
        prior = prior[~prior["partition_id"].astype(int).isin(todo_set)]
        metrics_df = (
            __import__("pandas").concat([prior, metrics_df], ignore_index=True)
        )
    pa.parquet.write_table(
        pa.Table.from_pandas(metrics_df, preserve_index=False),
        mpath + ".tmp",
    )
    os.replace(mpath + ".tmp", mpath)

    # partitions with zero input rows still need manifests (they are "done")
    seen = set(metrics_df["partition_id"].astype(int))
    for pid in todo:
        if pid not in seen:
            mf.write_manifest(out_dir, pid, input_fp, 0, 0, 0, 0, 0)

    n_failed = int(metrics_df["n_docs"].sum() - metrics_df["n_ok"].sum())
    total_rows = int(metrics_df["n_docs"].sum())
    return {
        "skipped": False,
        "partitions_done_prior": len(done),
        "partitions_computed": len(todo),
        "n_rows": total_rows,
        "n_failed": n_failed,
        "n_fragments": int(n_fragments),
        "input_fingerprint": input_fp,
        "sec_extract_spill": round(_t_spill, 3),
        "sec_merge": round(_time.perf_counter() - _t_merge0, 3),
    }
