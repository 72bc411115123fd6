"""Distributed extraction stages — `map_batches` bodies over Arrow batches.

Two equivalent formulations, both built on the same shared kernels as the
single-doc oracle (`core.oracle.extract_one`) so byte-identity is
structural:

* ``extract_batch`` — the FUSED hot path (decode → tokenize → score →
  collapse in one stage; the `demo.py` single-process shape of SURVEY §3.1
  applied per row, no intermediate materialization);
* ``tokenize_batch`` / ``score_batch`` / ``decode_batch`` — the STAGED
  formulation matching SURVEY §7.1.4, with the ordered block sequence
  riding inside each row as a nested ``list<struct>`` column (never as
  independently-shuffled rows — block order is the CTC timestep axis,
  SURVEY §2.9).

All stages are pure functions of their batch: no batch-size- or
partition-dependent behavior, so results are invariant under re-batching.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.core.decode import greedy_decode
from basicocr_ray.core.oracle import extract_one
from basicocr_ray.core.score import score_values
from basicocr_ray.core.tokenize import tokenize_html
from basicocr_ray.core.charset import sniff_decode

SPAN_TYPE = pa.list_(
    pa.struct(
        [("start", pa.int64()), ("end", pa.int64()), ("block_id", pa.int32())]
    )
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("main_text", pa.large_string()),
        ("spans", SPAN_TYPE),
        ("n_blocks", pa.int32()),
        ("n_blocks_kept", pa.int32()),
        ("encoding", pa.string()),
        ("lang", pa.string()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
        ("partition_id", pa.int32()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
    ]
)

BLOCK_STRUCT = pa.struct(
    [
        ("block_id", pa.int32()),
        ("tag", pa.string()),
        ("tag_path", pa.string()),
        ("text", pa.large_string()),
        ("n_chars", pa.int32()),
        ("n_tags", pa.int32()),
        ("n_link_chars", pa.int32()),
    ]
)


def partition_of(url: str, num_partitions: int) -> int:
    """Deterministic partition assignment: crc32(url) % P. Stable across
    Python processes/versions (unlike salted ``hash()``), cheap, uniform."""
    return zlib.crc32(url.encode("utf-8")) % num_partitions


def extract_batch(
    batch: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.Table:
    """pages batch → extracted batch (fused hot path).

    Per-row Python is unavoidable for HTML *parsing* (like model inference
    in the reference, the kernel itself is sequential per record); the
    batch loop stays tight and allocation-light, and everything around it
    (Arrow IO, hashing, lengths) is columnar.
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = (
        batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    )
    n = len(urls)
    results = [extract_one(h if h is not None else b"", cfg) for h in htmls]
    # flat offsets+values construction of list<struct> — same layout the
    # reference hand-rolls for label sequences (utils.py:44-64), ~5× faster
    # than per-row lists of dicts
    offsets = [0]
    s_starts: list[int] = []
    s_ends: list[int] = []
    s_bids: list[int] = []
    for r in results:
        for (s, e, b) in r["spans"]:
            s_starts.append(s)
            s_ends.append(e)
            s_bids.append(b)
        offsets.append(len(s_starts))
    spans = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(s_starts, pa.int64()),
                pa.array(s_ends, pa.int64()),
                pa.array(s_bids, pa.int32()),
            ],
            ["start", "end", "block_id"],
        ),
    )
    main_arr = pa.array([r["main_text"] for r in results], pa.large_string())
    # url/lang ride through zero-copy from the input batch (combine to a
    # plain Array so downstream slice/take costs stay flat); re-encoding
    # them from the pylists paid a measurable fraction of the non-kernel
    # batch overhead at 800k rows
    url_arr = pc.cast(batch["url"].combine_chunks(), pa.string()) \
        if "url" in batch.column_names else pa.array(urls, pa.string())
    lang_arr = pc.cast(batch["lang"].combine_chunks(), pa.string()) \
        if "lang" in batch.column_names else pa.array(langs, pa.string())
    return pa.table(
        {
            "url": url_arr,
            "main_text": main_arr,
            "spans": spans,
            "n_blocks": pa.array([r["n_blocks"] for r in results], pa.int32()),
            "n_blocks_kept": pa.array(
                [r["n_blocks_kept"] for r in results], pa.int32()
            ),
            "encoding": pa.array([r["encoding"] for r in results], pa.string()),
            "lang": lang_arr,
            "ok": pa.array([r["ok"] for r in results], pa.bool_()),
            "error": pa.array([r["error"] for r in results], pa.string()),
            "partition_id": pa.array(
                [partition_of(u, cfg.num_partitions) for u in urls], pa.int32()
            ),
            "n_bytes_in": pa.array(
                [len(h) if h is not None else 0 for h in htmls], pa.int64()
            ),
            # utf-8 byte length straight off the Arrow buffer — the
            # Python .encode() pass re-encoded every output doc
            "n_bytes_out": pc.cast(pc.binary_length(main_arr), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Staged formulation (SURVEY §7.1.4) — blocks as a nested column.
# ---------------------------------------------------------------------------

def tokenize_batch(
    batch: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG
) -> pa.Table:
    """pages batch → (url, lang, blocks:list<struct>, encoding, ok, error).

    The detector stage: emits each document's ordered block sequence as ONE
    nested value so order survives any downstream shuffle."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = (
        batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
    )
    all_blocks, encs, oks, errs = [], [], [], []
    for h in htmls:
        try:
            if not h:
                raise ValueError("empty payload")
            text, enc = sniff_decode(h)
            blocks = tokenize_html(text, cfg)
            all_blocks.append(
                [
                    {
                        "block_id": b.block_id,
                        "tag": b.tag,
                        "tag_path": b.tag_path,
                        "text": b.text,
                        "n_chars": b.n_chars,
                        "n_tags": b.n_tags,
                        "n_link_chars": b.n_link_chars,
                    }
                    for b in blocks
                ]
            )
            encs.append(enc)
            oks.append(True)
            errs.append("")
        except Exception as exc:
            all_blocks.append([])
            encs.append("")
            oks.append(False)
            errs.append(f"{type(exc).__name__}: {exc}"[:200])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "blocks": pa.array(all_blocks, pa.list_(BLOCK_STRUCT)),
            "encoding": pa.array(encs, pa.string()),
            "ok": pa.array(oks, pa.bool_()),
            "error": pa.array(errs, pa.string()),
        }
    )


def score_batch(batch: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG) -> pa.Table:
    """blocks batch → adds per-block (text_density, link_density, score,
    keep) parallel list columns (the per-frame class-probability analogue,
    `crnn_main.py:177-179`)."""
    blocks_col = batch["blocks"].to_pylist()
    keeps, scores = [], []
    for blocks in blocks_col:
        ks, ss = [], []
        for b in blocks:
            td, ld, sc, keep = score_values(
                b["n_chars"], b["n_tags"], b["n_link_chars"], cfg
            )
            ks.append(keep)
            ss.append(sc)
        keeps.append(ks)
        scores.append(ss)
    return batch.append_column(
        "keep", pa.array(keeps, pa.list_(pa.bool_()))
    ).append_column("score", pa.array(scores, pa.list_(pa.float64())))


def decode_batch(batch: pa.Table, cfg: ExtractConfig = DEFAULT_CONFIG) -> pa.Table:
    """scored blocks batch → extracted rows (CTC greedy collapse, M5)."""
    urls = batch["url"].to_pylist()
    langs = batch["lang"].to_pylist()
    blocks_col = batch["blocks"].to_pylist()
    keeps_col = batch["keep"].to_pylist()
    oks_in = batch["ok"].to_pylist()
    errs_in = batch["error"].to_pylist()
    encs = batch["encoding"].to_pylist()
    texts_out, spans_out, kept_out, nblocks_out, oks, errs = [], [], [], [], [], []
    for blocks, keeps, ok_in, err_in in zip(blocks_col, keeps_col, oks_in, errs_in):
        if not ok_in:
            texts_out.append("")
            spans_out.append([])
            kept_out.append(0)
            nblocks_out.append(0)
            oks.append(False)
            errs.append(err_in)
            continue
        main_text, spans, n_kept = greedy_decode(
            [b["text"] for b in blocks], keeps, cfg
        )
        texts_out.append(main_text)
        spans_out.append(
            [{"start": s, "end": e, "block_id": b} for (s, e, b) in spans]
        )
        kept_out.append(n_kept)
        nblocks_out.append(len(blocks))
        oks.append(bool(main_text))
        errs.append("" if main_text else "no_content")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "main_text": pa.array(texts_out, pa.large_string()),
            "spans": pa.array(spans_out, SPAN_TYPE),
            "n_blocks": pa.array(nblocks_out, pa.int32()),
            "n_blocks_kept": pa.array(kept_out, pa.int32()),
            "encoding": pa.array(encs, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "ok": pa.array(oks, pa.bool_()),
            "error": pa.array(errs, pa.string()),
            "partition_id": pa.array(
                [partition_of(u, cfg.num_partitions) for u in urls], pa.int32()
            ),
            "n_bytes_in": pa.array([0] * len(urls), pa.int64()),
            "n_bytes_out": pa.array(
                [len(t.encode("utf-8")) for t in texts_out], pa.int64()
            ),
        }
    )
