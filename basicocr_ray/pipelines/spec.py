"""Config-driven pipeline composition (SURVEY §2 S5 / §2.10).

The reference binds its pipelines with config files (the AC pipeline's
`dataPath.xml`, `Test.java:124-145`; comment-toggled alphabets in
`keys.py:2-5`; argparse flags in `crnn_main.py:27-51`). Engine equivalent:
a JSON/dict pipeline spec naming an input table, an ordered list of steps
from a registered op table, and an optional output path — composed into
one lazy Dataset chain.

    spec = {
      "input": {"table": "documents", "columns": ["doc_id", "text"]},
      "steps": [
        {"op": "strip_phrases", "phrases": ["vector window"]},
        {"op": "quality"},
        {"op": "filter_ge", "column": "n_tokens", "value": 20}
      ],
      "output": "/tmp/out"            # optional: write_parquet sink
    }
    ds = run_spec(spec, sf_dir)

Steps are UDF hooks in the reference's sense (`dataset.py:18,35-36`
transform injection): each op is a (name, params) pair resolved against
OP_REGISTRY, so users extend the engine by registering ops, not by
editing pipelines."""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _op_strip_phrases(ds, params):
    from basicocr_ray.stages.correct import ACStripper

    return ds.map_batches(
        ACStripper,
        fn_constructor_kwargs={
            "phrases": list(params["phrases"]),
            "column": params.get("column", "text"),
            "out_column": params.get("out_column", "stripped_text"),
        },
        batch_format="pyarrow",
        concurrency=int(params.get("concurrency", 2)),
    )


def _op_correct(ds, params):
    from basicocr_ray.stages.correct import TrieCorrector

    return ds.map_batches(
        TrieCorrector,
        fn_constructor_kwargs={
            "entries": [tuple(e) for e in params["dictionary"]],
            "column": params.get("column", "text"),
            "out_column": params.get("out_column", "corrected_text"),
            "max_cost": int(params.get("max_cost", 1)),
        },
        batch_format="pyarrow",
        concurrency=int(params.get("concurrency", 2)),
    )


def _op_langid(ds, params):
    from basicocr_ray.core.textstats import lang_id

    col = params.get("column", "text")

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pred_lang",
            pa.array([lang_id(t or "") for t in batch[col].to_pylist()],
                     pa.string()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_quality(ds, params):
    from basicocr_ray.core.textstats import quality_score, ws_tokens

    col = params.get("column", "text")

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[col].to_pylist()
        return batch.append_column(
            "n_tokens",
            pa.array([len(ws_tokens(t or "")) for t in texts], pa.int64()),
        ).append_column(
            "quality",
            pa.array([quality_score(t or "") for t in texts], pa.float64()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_gopher_filter(ds, params):
    """Gopher-style quality gate (Rae et al. 2021 Table A1 subset): keep
    rows passing the integer rule vector; evidence columns attached.
    Kernel shared with q116 (`core/textstats.py:gopher_counts`)."""
    from basicocr_ray.core.textstats import gopher_counts, gopher_keep

    col = params.get("column", "text")
    stop = frozenset(
        params.get("stopwords", ("the", "a", "data", "key", "value"))
    )
    min_words = int(params.get("min_words", 50))

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[col].to_pylist()
        stats = [gopher_counts(t or "", stop) for t in texts]
        keep = [gopher_keep(*s, min_words=min_words) for s in stats]
        out = batch.filter(pa.array(keep))
        kept_stats = [s for s, k in zip(stats, keep) if k]
        return out.append_column(
            "n_words",
            pa.array([s[0] for s in kept_stats], pa.int64()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_simhash_radius(ds, params):
    """Hamming-radius near-dup pairs over a text column (Manku et al.
    2007 pigeonhole bucketing; `stages/dedup.py:simhash_pairs`)."""
    from basicocr_ray.stages.dedup import simhash_pairs

    max_hamming = int(params.get("max_hamming", 3))
    if max_hamming > 3:
        # 4 × 16-bit chunks guarantee recall only to radius 3 (pigeonhole:
        # 4 chunks cover ≤ 3 differing bits); a larger radius would return
        # a silently incomplete pair set
        raise ValueError(
            f"simhash_radius supports max_hamming <= 3, got {max_hamming}"
        )
    return simhash_pairs(
        ds,
        params.get("id_column", "doc_id"),
        params.get("column", "text"),
        max_hamming=max_hamming,
        token_k=int(params.get("token_k", 4)),
    )


def _op_epoch_upsample(ds, params):
    """Data-mixing repeat fan-out: duplicate each row `weights[key]`
    times (integer epochs per source/lang), adding a copy_idx column.
    Kernel single-sourced in `stages/sample.py:repeat_with_copy_idx`
    (shared with q120). Zero shuffle — copies are born partitioned
    like their sources."""
    from basicocr_ray.stages.sample import repeat_with_copy_idx

    key_col = params.get("key_column", "lang")
    weights = {k: int(v) for k, v in params["weights"].items()}
    default = int(params.get("default", 1))

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        keys = batch[key_col].to_pylist()
        n = np.array([weights.get(k, default) for k in keys], dtype=np.int64)
        return repeat_with_copy_idx(batch, n)

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_fingerprint(ds, params):
    from basicocr_ray.core.textstats import md5_hex

    col = params.get("column", "text")

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fp",
            pa.array([md5_hex(t or "") for t in batch[col].to_pylist()],
                     pa.string()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_quality_filter(ds, params):
    from basicocr_ray.core.textstats import quality_filter

    col = params.get("column", "text")
    kwargs = {k: params[k] for k in (
        "min_words", "max_words", "min_mean_word_len", "max_mean_word_len",
        "max_symbol_ratio", "max_dup_line_frac", "min_stop_hits",
    ) if k in params}

    def fn(batch: pa.Table) -> pa.Table:
        keeps, reasons = [], []
        for t in batch[col].to_pylist():
            k, r = quality_filter(t or "", **kwargs)
            keeps.append(k)
            reasons.append(r)
        out = batch.append_column("qf_keep", pa.array(keeps, pa.bool_()))
        out = out.append_column("qf_reason", pa.array(reasons, pa.string()))
        if params.get("drop_rejected", False):
            out = out.filter(out["qf_keep"])
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_normalize_url(ds, params):
    from basicocr_ray.core.textstats import normalize_url

    col = params.get("column", "url")

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "norm_url",
            pa.array([normalize_url(u or "") for u in batch[col].to_pylist()],
                     pa.string()),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_filter_ge(ds, params):
    col, val = params["column"], params["value"]
    return ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b[col], val)),
        batch_format="pyarrow",
    )


def _op_select(ds, params):
    return ds.select_columns(list(params["columns"]))


def _op_extract(ds, params):
    """pages-shaped input → extracted columns (the flagship as a step)."""
    from basicocr_ray.config import ExtractConfig
    from basicocr_ray.stages.extract import extract_batch

    cfg = ExtractConfig(**params.get("config", {}))
    return ds.map_batches(
        lambda b: extract_batch(b, cfg), batch_format="pyarrow",
        batch_size=cfg.batch_size_small,
    )


def _op_segment(ds, params):
    """Dictionary FMM segmentation (M14) as a spec step."""
    import ray

    from basicocr_ray.stages.segment import SegmentTokenizer

    ref = ray.put(list(params["lexicon"]))
    return ds.map_batches(
        SegmentTokenizer,
        fn_constructor_kwargs={
            "lexicon_ref": ref,
            "column": params.get("column", "text"),
            "id_column": params.get("id_column", "doc_id"),
        },
        batch_format="pyarrow",
        concurrency=int(params.get("concurrency", 2)),
    )


def _op_decode_image(ds, params):
    """Image feature extraction (real PNG codec / IMG! fixture path)."""
    from basicocr_ray.stages.multimodal import ImageFeatureExtractor

    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={
            "payload_column": params.get("payload_column", "payload"),
            "id_column": params.get("id_column", "item_id"),
        },
        batch_format="pyarrow",
        batch_size=int(params.get("batch_size", 64)),
        concurrency=int(params.get("concurrency", 2)),
    )


def _op_resize_image(ds, params):
    """Decode→resample→re-encode PNG payloads (actor pool, small
    batches — payloads are the wide column)."""
    from basicocr_ray.stages.multimodal import ImageResizer

    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "target_w": int(params["target_w"]),
            "target_h": int(params["target_h"]),
            "mode": params.get("mode", "nearest"),
            "payload_column": params.get("payload_column", "payload"),
            "id_column": params.get("id_column", "item_id"),
        },
        batch_format="pyarrow",
        batch_size=int(params.get("batch_size", 32)),
        concurrency=int(params.get("concurrency", 2)),
    )


def _read_right(params):
    """Second input for two-table ops: the ``right`` table name resolves
    against the spec's sf_dir (injected by run_spec as ``_sf_dir``)."""
    import ray.data

    return ray.data.read_parquet(
        os.path.join(params["_sf_dir"], f"{params['right']}.parquet"),
        columns=params.get("right_columns"),
    )


def _op_rename(ds, params):
    """Rename columns: ``mapping`` is {old: new}. Zero-copy per batch."""
    mapping = dict(params["mapping"])

    def _ren(b):
        return b.rename_columns([mapping.get(c, c) for c in b.column_names])

    return ds.map_batches(_ren, batch_format="pyarrow")


def _op_join(ds, params):
    """Bucketed hash join against another table (inner/left outer/left
    semi/left anti — `stages.joins.bucketed_hash_join`). ``right_rename`` ({old:
    new}) aligns the right table's key column name with the left's."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    right = _read_right(params)
    if params.get("right_rename"):
        mapping = dict(params["right_rename"])
        right = right.map_batches(
            lambda b: b.rename_columns(
                [mapping.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    return bucketed_hash_join(
        ds,
        right,
        params["key"],
        list(params.get("left_columns", [])),
        list(params.get("right_value_columns", [])),
        num_buckets=int(params.get("num_buckets", 32)),
        join_type=params.get("join_type", "inner"),
    )


def _op_skew_join(ds, params):
    """Skew-aware inner join (`stages.joins.skew_aware_join`): hot keys
    broadcast around the shuffle, cold keys take the bucketed join."""
    from basicocr_ray.stages.joins import skew_aware_join

    right = _read_right(params)
    if params.get("right_rename"):
        mapping = dict(params["right_rename"])
        right = right.map_batches(
            lambda b: b.rename_columns(
                [mapping.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    return skew_aware_join(
        ds,
        right,
        params["key"],
        list(params.get("left_columns", [])),
        list(params.get("right_value_columns", [])),
        num_buckets=int(params.get("num_buckets", 32)),
        hot_min_count=params.get("hot_min_count"),
        hot=params.get("hot"),
    )


def _op_sample(ds, params):
    """Deterministic samplers: uniform bottom-k, weighted (A-ES), or
    stratified per-group bottom-k (`stages.sample`)."""
    from basicocr_ray.stages.sample import (
        bottomk_sample,
        stratified_bottomk,
        weighted_bottomk,
    )

    k = int(params["k"])
    idc = params.get("id_column", "doc_id")
    if "weight_column" in params:
        return weighted_bottomk(ds, idc, params["weight_column"], k)
    if "group_column" in params:
        return stratified_bottomk(ds, params["group_column"], idc, k)
    return bottomk_sample(ds, idc, k)


def _op_rollup(ds, params):
    from basicocr_ray.stages.wide import rollup_counts

    return rollup_counts(
        ds,
        list(params["group_cols"]),
        params["value_column"],
        n_name=params.get("n_name", "n"),
        sum_name=params.get("sum_name", "total"),
    )


def _op_hash_split(ds, params):
    """Deterministic md5-bucket train/val/test assignment column."""
    from basicocr_ray.stages.sample import hash_split

    fractions = params.get("fractions")
    if fractions is not None:
        fractions = {k: int(v) for k, v in fractions.items()}
    return hash_split(
        ds, params.get("id_column", "doc_id"), fractions
    )


def _op_cube(ds, params):
    from basicocr_ray.stages.wide import cube_counts

    return cube_counts(
        ds,
        list(params["group_cols"]),
        params["value_column"],
        n_name=params.get("n_name", "n"),
        sum_name=params.get("sum_name", "total"),
    )


def _op_group_quantile(ds, params):
    """``kind``: "disc" (default, percentile_disc) or "cont"
    (percentile_cont; q_den must be a power of two)."""
    from basicocr_ray.stages.wide import (
        grouped_quantile_cont,
        grouped_quantile_disc,
    )

    fn = (
        grouped_quantile_cont
        if params.get("kind", "disc") == "cont"
        else grouped_quantile_disc
    )
    return fn(
        ds,
        params["group_column"],
        params["value_column"],
        int(params["q_num"]),
        int(params["q_den"]),
        num_hist_buckets=int(params.get("num_hist_buckets", 1024)),
    )


def _op_knn_join(ds, params):
    from basicocr_ray.stages.embed import knn_self_join_grouped

    return knn_self_join_grouped(
        ds,
        k=int(params.get("k", 3)),
        group_column=params.get("group_column", "label"),
        id_column=params.get("id_column", "vec_id"),
        vec_column=params.get("vec_column", "embedding"),
    )


def _op_chunk_dedup(ds, params):
    """Corpus-wide first-occurrence chunk dedup + reassembly (CCNet
    paragraph-dedup shape, stages.decontam)."""
    from basicocr_ray.stages.decontam import chunk_dedup_reassemble

    return chunk_dedup_reassemble(
        ds,
        text_column=params.get("text_column", "text"),
        id_column=params.get("id_column", "doc_id"),
        chunk_words=int(params.get("chunk_words", 10)),
    )


def _op_decontaminate(ds, params):
    """Flag/drop docs sharing any word n-gram with a benchmark JSONL or
    parquet file (`params["benchmark_path"]`), broadcast once."""
    import ray
    import ray.data

    from basicocr_ray.stages.decontam import (
        build_benchmark_grams,
        flag_contaminated,
    )

    n = int(params.get("n", 5))
    text_col = params.get("text_column", "text")
    bench = ray.data.read_parquet(
        params["benchmark_path"], columns=[text_col]
    )
    ref = ray.put(build_benchmark_grams(bench, text_col, n))
    flagged = flag_contaminated(
        ds, ref, text_column=text_col,
        id_column=params.get("id_column", "doc_id"), n=n,
    )
    return flagged


def _op_pack(ds, params):
    """Token-budget sequence packing (q100 primitive): exclusive prefix
    sum of ``count_column`` under the deterministic md5 shuffle order,
    then ``bin_id = prefix // bin_size``."""
    import pyarrow.compute as pc

    from basicocr_ray.stages.sample import global_prefix_sum

    id_col = params.get("id_column", "doc_id")
    count_col = params.get("count_column", "n_tok")
    bin_size = int(params.get("bin_size", 4096))
    with_prefix = global_prefix_sum(
        ds, id_col, count_col, seed=int(params.get("seed", 42))
    )

    def binify(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bin_id", pc.divide(b["prefix"], bin_size)
        )

    return with_prefix.map_batches(binify, batch_format="pyarrow")


def _op_chunk_windows(ds, params):
    """Overlapping context-window chunking (q113 semantics): each row
    fans out to (id, chunk_idx, n_words, chunk_text) rows."""
    from basicocr_ray.stages.wide import token_items

    W = int(params.get("width", 32))
    S = int(params.get("stride", 24))
    id_col = params.get("id_column", "doc_id")
    text_col = params.get("text_column", "text")

    def chunk(b: pa.Table) -> pa.Table:
        id_type = b.schema.field(id_col).type  # keep dtype stable even
        # for zero-chunk batches (untyped pa.array([]) is null-typed and
        # breaks downstream schema unification)
        ids, idxs, nws, texts = [], [], [], []
        for did, text in zip(
            b[id_col].to_pylist(), b[text_col].to_pylist()
        ):
            toks = token_items(text or "")
            n = len(toks)
            if n == 0:
                continue
            starts = range(0, max(n - W, 0) + S, S) if n > W else [0]
            ci = 0
            for st in starts:
                if st >= n:
                    break
                piece = toks[st : st + W]
                ids.append(did)
                idxs.append(ci)
                nws.append(len(piece))
                texts.append(" ".join(piece))
                ci += 1
        return pa.table(
            {
                id_col: pa.array(ids, type=id_type),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_words": pa.array(nws, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def _op_robots_filter(ds, params):
    """Drop rows whose url matches a per-host disallow-prefix table
    (params["rules"]: {host: [path_prefix, ...]}), broadcast once."""
    import ray
    from urllib.parse import urlsplit

    rules_ref = ray.put(dict(params["rules"]))
    url_col = params.get("url_column", "url")

    def keep(b: pa.Table) -> pa.Table:
        import ray as _ray

        rules = _ray.get(rules_ref)
        mask = []
        for u in b[url_col].to_pylist():
            parts = urlsplit(u or "")
            host = (parts.hostname or "").lower()
            path = parts.path or "/"
            mask.append(
                not any(path.startswith(p) for p in rules.get(host, ()))
            )
        return b.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def _op_bloom_prefilter(ds, params):
    """Bloom-filtered semi-join pre-pass: drop rows whose ``key`` cannot
    be in the ``right`` table (no false negatives; follow with an exact
    `join` op when exactness is required — the filter only cuts shuffle
    volume). `stages.joins.bloom_prefilter`."""
    from basicocr_ray.stages.joins import bloom_prefilter

    right = _read_right(params)
    if params.get("right_rename"):
        mapping = dict(params["right_rename"])
        right = right.map_batches(
            lambda b: b.rename_columns(
                [mapping.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
    return bloom_prefilter(
        ds, right, params["key"],
        m=int(params.get("m", 1 << 20)), k=int(params.get("k", 2)),
    )


def _op_priority_dedup(ds, params):
    """Keep-best-source exact dedup (`stages.dedup.priority_dedup`):
    per distinct text keep the highest-``priority_column`` row."""
    from basicocr_ray.stages.dedup import priority_dedup

    return priority_dedup(
        ds,
        id_column=params.get("id_column", "doc_id"),
        text_column=params.get("text_column", "text"),
        priority_column=params["priority_column"],
    )


def _op_duplicate_spans(ds, params):
    """Cross-document duplicated-span detection (Lee et al. 2022 shape;
    `stages.dedup.duplicate_spans`)."""
    from basicocr_ray.stages.dedup import duplicate_spans

    return duplicate_spans(
        ds,
        id_column=params.get("id_column", "doc_id"),
        text_column=params.get("text_column", "text"),
        width=int(params.get("width", 5)),
    )


def _op_span_cut(ds, params):
    """Rewrite docs with cross-document duplicated spans removed (the
    actionable Lee et al. cut; `stages.dedup.span_cut_rewrite`).
    → (id, cut_text, n_words, n_cut) for every doc."""
    from basicocr_ray.stages.dedup import span_cut_rewrite

    return span_cut_rewrite(
        ds,
        id_column=params.get("id_column", "doc_id"),
        text_column=params.get("text_column", "text"),
        width=int(params.get("width", 5)),
        out_column=params.get("out_column", "cut_text"),
    )


def _op_token_budget(ds, params):
    """Per-group greedy budget fill in the deterministic md5 order
    (`stages.sample.grouped_prefix_sum`): keep rows while the group's
    EXCLUSIVE running sum of ``value_column`` is under ``budget`` (the
    crossing row is included). The mixture-construction step."""
    import pyarrow.compute as _pc

    from basicocr_ray.stages.sample import grouped_prefix_sum

    budget = int(params["budget"])
    pref = grouped_prefix_sum(
        ds,
        params.get("group_column", "source"),
        params.get("id_column", "doc_id"),
        params["value_column"],
        seed=int(params.get("seed", 42)),
        out_column="prefix",
    )

    def under(b):
        return b.filter(_pc.less(b["prefix"], budget))

    return pref.map_batches(under, batch_format="pyarrow")


def _op_winnow(ds, params):
    """Winnowing fingerprints (Schleimer et al. 2003;
    `core.sketches.winnow_fingerprints`): one (id, fp) row per selected
    fingerprint — feed into `join`/dedup ops downstream."""
    from basicocr_ray.core.sketches import winnow_fingerprints

    col = params.get("column", "text")
    id_col = params.get("id_column", "doc_id")
    k = int(params.get("k", 8))
    w = int(params.get("w", 4))

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_fp = [], []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[col].to_pylist()
        ):
            _, fps = winnow_fingerprints(t or "", k=k, w=w)
            out_id.extend([did] * len(fps))
            out_fp.extend(fps)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_quality_gate(ds, params):
    """Hashed-linear classifier gate (the q129 shape with caller-supplied
    integer weights; kernel `core.textstats.hashed_linear_score`): keep
    rows with score > ``threshold``; score attached as ``score``."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import token_items

    weights = [int(x) for x in params["weights"]]
    col = params.get("column", "text")
    threshold = int(params.get("threshold", 0))

    def fn(batch: pa.Table) -> pa.Table:
        scores = [
            hashed_linear_score(token_items(t) if t else [], weights)
            for t in batch[col].to_pylist()
        ]
        out = batch.append_column("score", pa.array(scores, pa.int64()))
        return out.filter(
            pa.array([s > threshold for s in scores], pa.bool_())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _op_cdc_chunk(ds, params):
    """Content-defined chunking (`core.sketches.cdc_chunk_lengths`): one
    (id, chunk_idx, chunk_len, fp) row per chunk — the chunk-store
    relation incremental snapshot dedup joins against."""
    from basicocr_ray.core.sketches import cdc_chunk_lengths
    from basicocr_ray.core.textstats import md5_hex

    col = params.get("column", "text")
    id_col = params.get("id_column", "doc_id")
    k = int(params.get("k", 8))
    divisor = int(params.get("divisor", 64))

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_ix, out_ln, out_fp = [], [], [], []
        for did, t in zip(
            batch[id_col].to_pylist(), batch[col].to_pylist()
        ):
            t = t or ""
            pos = 0
            for ix, ln in enumerate(
                cdc_chunk_lengths(t, k=k, divisor=divisor)
            ):
                out_id.append(did)
                out_ix.append(ix)
                out_ln.append(ln)
                out_fp.append(md5_hex(t[pos : pos + ln]))
                pos += ln
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_idx": pa.array(out_ix, pa.int64()),
                "chunk_len": pa.array(out_ln, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


OP_REGISTRY: dict[str, Callable] = {
    "bloom_prefilter": _op_bloom_prefilter,
    "cdc_chunk": _op_cdc_chunk,
    "priority_dedup": _op_priority_dedup,
    "duplicate_spans": _op_duplicate_spans,
    "span_cut": _op_span_cut,
    "token_budget": _op_token_budget,
    "winnow": _op_winnow,
    "quality_gate": _op_quality_gate,
    "pack": _op_pack,
    "chunk_windows": _op_chunk_windows,
    "robots_filter": _op_robots_filter,
    "rename": _op_rename,
    "chunk_dedup": _op_chunk_dedup,
    "decontaminate": _op_decontaminate,
    "strip_phrases": _op_strip_phrases,
    "segment": _op_segment,
    "decode_image": _op_decode_image,
    "resize_image": _op_resize_image,
    "correct": _op_correct,
    "langid": _op_langid,
    "quality": _op_quality,
    "fingerprint": _op_fingerprint,
    "quality_filter": _op_quality_filter,
    "gopher_filter": _op_gopher_filter,
    "simhash_radius": _op_simhash_radius,
    "epoch_upsample": _op_epoch_upsample,
    "normalize_url": _op_normalize_url,
    "filter_ge": _op_filter_ge,
    "select": _op_select,
    "extract": _op_extract,
    "join": _op_join,
    "skew_join": _op_skew_join,
    "sample": _op_sample,
    "rollup": _op_rollup,
    "cube": _op_cube,
    "hash_split": _op_hash_split,
    "group_quantile": _op_group_quantile,
    "knn_join": _op_knn_join,
}


def run_spec(spec: dict | str, sf_dir: str):
    """Compose and return the lazy Dataset for a pipeline spec (dict, JSON
    string, or path to a JSON file). Writes to spec["output"] if set."""
    import ray.data

    if isinstance(spec, str):
        if os.path.exists(spec):
            with open(spec) as f:
                spec = json.load(f)
        else:
            spec = json.loads(spec)

    inp = spec["input"]
    fmt = inp.get("format", "parquet")
    if fmt == "warc":
        from basicocr_ray.sources.warc import read_warc

        ds = read_warc(inp["path"], keep_corrupt=bool(
            inp.get("keep_corrupt", False)
        ))
    elif fmt == "jsonl":
        import pyarrow as _pa

        from basicocr_ray.sources.jsonl import read_jsonl

        fields = {
            name: getattr(_pa, t)() for name, t in inp["fields"].items()
        }
        ds = read_jsonl(inp["path"], fields, keep_corrupt=bool(
            inp.get("keep_corrupt", False)
        ))
    else:
        ds = ray.data.read_parquet(
            os.path.join(sf_dir, f"{inp['table']}.parquet"),
            columns=inp.get("columns"),
        )
    for step in spec.get("steps", []):
        op = OP_REGISTRY.get(step["op"])
        if op is None:
            raise ValueError(
                f"unknown op {step['op']!r}; registered: {sorted(OP_REGISTRY)}"
            )
        ds = op(ds, {**step, "_sf_dir": sf_dir})
    if spec.get("output"):
        ds.write_parquet(spec["output"])
    return ds
