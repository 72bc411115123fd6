"""Deduplication operators: exact, MinHash-LSH, SimHash, embedding-based.

All follow the same scale discipline: per-document sketching happens inside
`map_batches` (no shuffle), the shuffle moves only SMALL keys (hashes,
band buckets, signatures), and expensive verification runs only on
candidate pairs (MMDS ch.3 banding; Broder 1997; Charikar 2002).

Exact dedup is the D3 operator of SURVEY §2.7 (hash-partition on content
fingerprint → per-group first); the reference's only dedup is the CTC
adjacent collapse (D1) which lives in core.decode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import pyarrow.compute as pc

from basicocr_ray.core.sketches import MinHasher, ngram_jaccard, simhash, hamming64
from basicocr_ray.core.textstats import md5_hex


def _coarse_salts(num_salt: int | None = None) -> int:
    """Salt count for coarse-group shuffle keys, as a power of two.

    Round 1 used FIXED fan-outs (4 chunk groups / 64 pair groups / one
    group per band) — correct, but they cap shuffle parallelism at a
    constant and make single-task group size O(corpus). Deriving the salt
    count from ``ray.cluster_resources()`` keeps the in-process pandas
    trick (few coarse groups, vectorized inner groupby) while letting the
    fan-out grow with the cluster. Salting by ``hash & (S-1)`` keeps every
    fine-grained bucket intact inside one group, so the emitted pair set
    is invariant under S (tests assert this)."""
    if num_salt is not None:
        return 1 << max(0, int(num_salt - 1).bit_length())
    try:
        import ray

        ncpu = (
            int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized()
            else 8
        )
    except Exception:
        ncpu = 8
    return 1 << max(3, int(2 * ncpu - 1).bit_length())


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(ds, id_column: str, text_column: str,
                       num_salt: int | None = None):
    """→ (doc_id, n_dups): representative (min id) + multiplicity per
    distinct text. The shuffle carries (id, fp) only — text stays put —
    keyed by a cluster-sized coarse group of the fingerprint (same fp →
    same group), with the per-fingerprint split done by an in-process
    pandas groupby: a Ray groupby on the raw fp would sort on one key per
    distinct document (the high-cardinality stall)."""
    salts = _coarse_salts(num_salt)

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in batch[text_column].to_pylist()]
        return pa.table(
            {
                id_column: batch[id_column],
                "fp": pa.array(fps, pa.string()),
                "cg": pa.array(
                    [int(f[:8], 16) & (salts - 1) for f in fps], pa.int32()
                ),
            }
        )

    def first_per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fp", as_index=False).agg(
            **{id_column: (id_column, "min"), "n_dups": (id_column, "size")}
        )
        return g[[id_column, "n_dups"]].astype(
            {id_column: "int64", "n_dups": "int64"}
        )

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(first_per_group, batch_format="pandas")
    )


def priority_dedup(ds, id_column: str, text_column: str,
                   priority_column: str, num_salt: int | None = None):
    """Keep-BEST-source exact dedup — the multi-corpus union resolution
    (curated > web > crawl) where `exact_dedup_groups`' min-id pick is
    arbitrary: per distinct text keep the row with the HIGHEST
    ``priority_column`` value (tie → lowest id), plus the multiplicity.
    Same scale shape as exact dedup: the shuffle carries (id, priority,
    fp) — text never moves — keyed by a cluster-sized coarse group of
    the fingerprint with the per-fingerprint argmax done by an
    in-process pandas pass. → (id_column, priority_column, n_dups)."""
    salts = _coarse_salts(num_salt)

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in batch[text_column].to_pylist()]
        return pa.table(
            {
                id_column: batch[id_column],
                priority_column: batch[priority_column],
                "fp": pa.array(fps, pa.string()),
                "cg": pa.array(
                    [int(f[:8], 16) & (salts - 1) for f in fps], pa.int32()
                ),
            }
        )

    def best_per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [priority_column, id_column], ascending=[False, True],
            kind="mergesort",
        )
        g = df.groupby("fp", as_index=False).agg(
            **{
                id_column: (id_column, "first"),
                priority_column: (priority_column, "first"),
                "n_dups": (id_column, "size"),
            }
        )
        return g[[id_column, priority_column, "n_dups"]].astype(
            {id_column: "int64", priority_column: "int64", "n_dups": "int64"}
        )

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(best_per_group, batch_format="pandas")
    )


def _dup_gram_positions(ds, id_column: str, text_column: str,
                        width: int, num_salt: int | None):
    """Shared first exchange of the duplicated-span family → (id, pos)
    rows of every stride-1 word ``width``-gram occurring in ≥ 2 distinct
    documents. Every ``width``-gram emits (md5 fp, id, pos); the fp-keyed
    coarse-group exchange holds ALL occurrences of a gram, so the
    ≥2-distinct-docs test is exact — and text never rides the shuffle."""
    from basicocr_ray.stages.wide import coarse_group_reduce, token_items

    def grams(batch: pa.Table) -> pa.Table:
        out_fp, out_id, out_pos = [], [], []
        for did, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            toks = token_items(t) if t else []
            for pos in range(len(toks) - width + 1):
                out_fp.append(md5_hex(" ".join(toks[pos : pos + width])))
                out_id.append(did)
                out_pos.append(pos)
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                id_column: pa.array(out_id, pa.int64()),
                "pos": pa.array(out_pos, pa.int64()),
            }
        )

    def dup_positions(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("fp")[id_column].transform("nunique")
        out = df[nd >= 2][[id_column, "pos"]].copy()
        out[id_column] = out[id_column].astype("int64")
        out["pos"] = out["pos"].astype("int64")
        return out

    return coarse_group_reduce(
        ds.map_batches(grams, batch_format="pyarrow"), "fp", dup_positions,
        num_salt=num_salt,
    )


def _merge_islands(ps: "np.ndarray", width: int) -> list[tuple[int, int]]:
    """Gaps-and-islands merge of SORTED gram start positions: intervals
    [pos, pos+width) that overlap or touch (gap ≤ width) coalesce into
    maximal [a, b) spans — THE merge rule of the span family, in one
    place (duplicate_spans counts these; dup_span_intervals emits them)."""
    brk = np.ones(len(ps), dtype=np.int64)
    brk[1:] = (np.diff(ps) > width).astype(np.int64)
    sid = np.cumsum(brk)
    out = []
    for s in range(1, int(sid[-1]) + 1):
        sel = ps[sid == s]
        out.append((int(sel[0]), int(sel[-1] + width)))
    return out


def duplicate_spans(ds, id_column: str = "doc_id",
                    text_column: str = "text", width: int = 5,
                    num_salt: int | None = None):
    """Cross-document DUPLICATED-SPAN detection (Lee et al. 2022, span-
    level exact substring dedup re-expressed for Ray Data): duplicated
    gram positions (see `_dup_gram_positions`) return to id-keyed coarse
    groups where overlapping/adjacent gram intervals [pos, pos+width)
    merge into MAXIMAL spans (`_merge_islands`).
    → (id, n_dup_spans, n_dup_words) for each doc holding at least one
    cross-doc duplicated gram."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    dup = _dup_gram_positions(ds, id_column, text_column, width, num_salt)

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, grp in df.groupby(id_column):
            iv = _merge_islands(np.sort(grp["pos"].to_numpy()), width)
            rows.append(
                (did, len(iv), sum(b - a for a, b in iv))
            )
        return pd.DataFrame(
            {
                id_column: pd.array([r[0] for r in rows], dtype="int64"),
                "n_dup_spans": pd.array([r[1] for r in rows], dtype="int64"),
                "n_dup_words": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(dup, id_column, spans, num_salt=num_salt)


def dup_span_intervals(ds, id_column: str = "doc_id",
                       text_column: str = "text", width: int = 5,
                       num_salt: int | None = None):
    """→ (id, a, b) rows: the MAXIMAL cross-document duplicated-span
    token intervals [a, b) per doc (same gaps-and-islands merge as
    `duplicate_spans`, but emitting the intervals themselves instead of
    per-doc counts) — the edit list a span-cut rewrite consumes. Shares
    `_dup_gram_positions`; intervals within a doc are disjoint."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    dup = _dup_gram_positions(ds, id_column, text_column, width, num_salt)

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_a, out_b = [], [], []
        for did, grp in df.groupby(id_column):
            for a, b in _merge_islands(
                np.sort(grp["pos"].to_numpy()), width
            ):
                out_id.append(did)
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame(
            {
                id_column: pd.array(out_id, dtype="int64"),
                "a": pd.array(out_a, dtype="int64"),
                "b": pd.array(out_b, dtype="int64"),
            }
        )

    return coarse_group_reduce(dup, id_column, intervals, num_salt=num_salt)


def shingle_containment(ds, id_column: str = "doc_id",
                        text_column: str = "text", width: int = 5,
                        threshold: float = 0.5,
                        num_salt: int | None = None):
    """ASYMMETRIC near-duplicate detection by shingle CONTAINMENT
    (Broder 1997's second resemblance measure): C(a→b) =
    |S(a) ∩ S(b)| / |S(a)| over distinct word ``width``-gram md5 sets —
    the quote/subset detector Jaccard misses (a short doc fully embedded
    in a long one has low Jaccard but containment 1.0).

    Shapes: per-doc DISTINCT shingle fps emit (fp, id) — text never
    rides a shuffle; the fp-keyed coarse exchange holds all holders of
    a gram, so per-group ORDERED pair partial counts are exact and a
    second (src, sup)-keyed coarse sum gives |S(a) ∩ S(b)|; per-doc
    shingle counts reduce id-keyed; one bucketed hash join meets the
    two. Hot shingles (df ≫, boilerplate) fan out O(df²) — strip
    boilerplate first (`boilerplate_paras`) on corpora that have it;
    the pair exchange carries ids only either way.

    → (src_id, sup_id, n_inter, n_src, containment) for ordered pairs
    with containment ≥ ``threshold``; containment is round-6 of an
    exact int/int division (engine-identical IEEE)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce, token_items

    def grams(batch: pa.Table) -> pa.Table:
        out_fp, out_id = [], []
        for did, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            toks = token_items(t) if t else []
            seen = set()
            for pos in range(len(toks) - width + 1):
                seen.add(md5_hex(" ".join(toks[pos : pos + width])))
            out_fp.extend(seen)
            out_id.extend([did] * len(seen))
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                "src_id": pa.array(out_id, pa.int64()),
            }
        )

    shingles = ds.map_batches(grams, batch_format="pyarrow")

    def count_src(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src_id", as_index=False).size()
        g = g.rename(columns={"size": "n_src"})
        return g.astype({"src_id": "int64", "n_src": "int64"})

    nsrc = coarse_group_reduce(shingles, "src_id", count_src,
                               num_salt=num_salt)

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("fp", sort=False):
            ids = g["src_id"].to_numpy()
            if len(ids) < 2:
                continue
            for i in range(len(ids)):
                for j in range(len(ids)):
                    if ids[i] != ids[j]:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
        p = pd.DataFrame(
            {
                "src_id": pd.array(out_a, dtype="int64"),
                "sup_id": pd.array(out_b, dtype="int64"),
            }
        )
        g = p.groupby(["src_id", "sup_id"], as_index=False).size()
        g = g.rename(columns={"size": "n_inter"})
        return g.astype(
            {"src_id": "int64", "sup_id": "int64", "n_inter": "int64"}
        )

    partial_pairs = coarse_group_reduce(
        shingles, "fp", pair_partials, num_salt=num_salt
    )

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["src_id", "sup_id"], as_index=False)[
            "n_inter"
        ].sum()
        return g.astype(
            {"src_id": "int64", "sup_id": "int64", "n_inter": "int64"}
        )

    pairs = coarse_group_reduce(
        partial_pairs, ["src_id", "sup_id"], sum_pairs, num_salt=num_salt
    )

    joined = bucketed_hash_join(
        pairs, nsrc, key="src_id",
        left_columns=["sup_id", "n_inter"], right_columns=["n_src"],
    )

    def finish(b: pa.Table) -> pa.Table:
        ni = b["n_inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        ns = b["n_src"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = ni / ns
        keep = c >= threshold
        cr = [
            float(np.floor(v * 1e6 + 0.5) / 1e6) for v in c[keep]
        ]
        return pa.table(
            {
                "src_id": b["src_id"].filter(pa.array(keep)),
                "sup_id": b["sup_id"].filter(pa.array(keep)),
                "n_inter": b["n_inter"].filter(pa.array(keep)),
                "n_src": b["n_src"].filter(pa.array(keep)),
                "containment": pa.array(cr, pa.float64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def span_cut_rewrite(ds, id_column: str = "doc_id",
                     text_column: str = "text", width: int = 5,
                     out_column: str = "cut_text",
                     num_salt: int | None = None):
    """The ACTIONABLE half of Lee et al. span dedup: REWRITE every doc
    with its cross-document duplicated spans removed. Maximal intervals
    (`dup_span_intervals`) pack to ONE tiny edit-list row per affected
    doc; one id-keyed bucketed LEFT join brings the edits to the text —
    the only exchange the text rides, and the minimum any rewrite needs
    (edit instructions must meet the bytes). Kept tokens re-join with a
    single space (tokenization is `token_items`, the oracle-lockstep
    whitespace split). → (id, out_column, n_words, n_cut) for EVERY doc
    (unaffected docs pass through with n_cut = 0)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce, token_items

    spans = dup_span_intervals(
        ds, id_column, text_column, width=width, num_salt=num_salt
    )

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        ids, packed = [], []
        for did, g in df.groupby(id_column):
            g = g.sort_values("a")
            ids.append(did)
            packed.append(
                ";".join(
                    f"{int(a)}:{int(b)}"
                    for a, b in zip(g["a"], g["b"])
                )
            )
        return pd.DataFrame(
            {
                id_column: pd.array(ids, dtype="int64"),
                "edits": pd.array(packed, dtype="object"),
            }
        )

    edit_lists = coarse_group_reduce(
        spans, id_column, pack, num_salt=num_salt
    )

    joined = bucketed_hash_join(
        ds, edit_lists, key=id_column,
        left_columns=[text_column], right_columns=["edits"],
        join_type="left outer",
    )

    def cut(b: pa.Table) -> pa.Table:
        ids, out_t, nw, nc = [], [], [], []
        for did, t, ed in zip(
            b[id_column].to_pylist(), b[text_column].to_pylist(),
            b["edits"].to_pylist(),
        ):
            toks = token_items(t or "")
            if ed:
                keep = np.ones(len(toks), dtype=bool)
                for seg in ed.split(";"):
                    a, bb = seg.split(":")
                    keep[int(a):int(bb)] = False
                kept = [tok for tok, k in zip(toks, keep) if k]
            else:
                kept = toks
            ids.append(did)
            out_t.append(" ".join(kept))
            nw.append(len(toks))
            nc.append(len(toks) - len(kept))
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                out_column: pa.array(out_t, pa.string()),
                "n_words": pa.array(nw, pa.int64()),
                "n_cut": pa.array(nc, pa.int64()),
            }
        )

    return joined.map_batches(cut, batch_format="pyarrow")


def incremental_exact_dedup(
    new_ds,
    index_dir: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_salt: int | None = None,
    commit: bool = True,
):
    """Dedup a NEW wave of documents against a PERSISTED fingerprint
    index, then extend the index — the operational shape of a growing
    corpus (each crawl shard dedups against everything ingested before
    it, without ever rescanning the old text).

    1. (id, fp) rows per new doc inside ``map_batches`` — text stays put.
    2. within-wave first-occurrence via the :func:`exact_dedup_groups`
       coarse-salt discipline (min id per fp).
    3. winners ANTI-JOIN the persisted index on fp (single-shuffle
       ``bucketed_hash_join``): only fps never seen before survive. The
       index stores fingerprints, not text — bytes-per-doc is constant.
    4. surviving (id, fp) materialize (metadata, not payload), the fps
       append to the index as content-hash-named parquet parts
       (idempotent: re-running the same wave rewrites the same file
       names, never duplicates), and the full surviving ROWS stream out
       of a semi-join of the wave against the winner ids — the payload
       is never materialized driver-side.

    Recovery contract: committing a wave's fps and consuming its
    survivors are two steps — a caller that persists survivors should
    write them to durable output BEFORE treating the wave as ingested
    (re-running a fully-committed wave yields zero survivors, which is
    the correct resume behavior for an already-ingested shard; the
    manifest machinery in ``state/`` is the place to make the two steps
    atomic if a stronger guarantee is needed). Duplicate fp rows from a
    differently-batched retry are harmless: anti-join semantics ignore
    right-side multiplicity.

    Returns ``(survivors_ds, n_new)``. ``commit=False`` skips extending
    the index (n_new still counts the wave's novel fps) — for a terminal
    wave no later wave will dedup against."""
    import hashlib
    import os

    import pyarrow.parquet as _pq
    import ray.data as _rd

    from basicocr_ray.stages.joins import bucketed_hash_join

    salts = _coarse_salts(num_salt)

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in batch[text_column].to_pylist()]
        return pa.table(
            {
                id_column: batch[id_column],
                "fp": pa.array(fps, pa.string()),
                "cg": pa.array(
                    [int(f[:8], 16) & (salts - 1) for f in fps], pa.int32()
                ),
            }
        )

    def first_per_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fp", as_index=False).agg(
            **{id_column: (id_column, "min")}
        )
        return g[[id_column, "fp"]].astype({id_column: "int64"})

    winners = (
        new_ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(first_per_group, batch_format="pandas")
        # normalize to Arrow blocks: the join's schema probe needs Arrow
        # types, and pandas-block object columns surface as python `str`
        .map_batches(
            lambda b: pa.table(
                {id_column: pc.cast(b[id_column], pa.int64()),
                 "fp": pc.cast(b["fp"], pa.string())}
            ),
            batch_format="pyarrow",
        )
    )

    os.makedirs(index_dir, exist_ok=True)
    have_index = any(
        f.endswith(".parquet") for f in os.listdir(index_dir)
    )
    if have_index:
        index_ds = _rd.read_parquet(index_dir, columns=["fp"])
        winners = bucketed_hash_join(
            winners, index_ds, "fp", [id_column], [],
            join_type="left anti",
        )

    def write_fps(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        tbl = batch.select(["fp"]).sort_by("fp")
        name = hashlib.md5(
            "".join(tbl["fp"].to_pylist()).encode()
        ).hexdigest()[:16]
        path = os.path.join(index_dir, f"fps-{name}.parquet")
        if not os.path.exists(path):
            _pq.write_table(tbl, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    winners = winners.materialize()  # (id, fp) — metadata, not payload
    if commit:
        n_new = winners.map_batches(
            write_fps, batch_format="pyarrow"
        ).sum("n")
    else:
        n_new = winners.count()

    from basicocr_ray.stages.joins import _probed

    new_ds, new_schema = _probed(new_ds)  # no throwaway execution
    survivors = bucketed_hash_join(
        new_ds,
        winners.map_batches(
            lambda b: b.select([id_column]), batch_format="pyarrow"
        ),
        id_column,
        [c for c in new_schema.names if c != id_column],
        [],
        join_type="left semi",
    )
    return survivors, int(n_new or 0)


def assign_components(
    pairs_ds,
    max_rounds: int = 30,
    num_salt: int | None = None,
    single_task_edges: int = 2_000_000,
):
    """Near-dup pairs → (id, rep) connected-component labels, rep = min id.

    Two regimes, same output:
    * **edge list fits one task** (≤ ``single_task_edges`` directed
      edges, known after the cheap edge materialize): min-union
      union-find inside ONE Ray task — the broadcast-small-side
      discipline applied to the graph step. A verified near-dup edge
      list is ≪ corpus size (only actual duplicates produce edges), so
      this is the common case even on huge corpora; the iterative path
      below cost ~10 chained shuffles of pure fixed overhead on small
      graphs.
    * **larger**: the distributed min-label propagation below.

    Fully distributed min-label propagation — nothing ever centralizes on
    the driver (round 1 broadcast the whole label map per round via
    ``take_all``; at billions of edges that is the scale-killer this
    replaces):

    per round
      1. messages: each directed edge (src → dst) carries src's current
         label to dst — a bucketed hash join of the edge list with the
         label table on ``src`` (`stages.joins.bucketed_hash_join`, rows
         shuffle once by key bucket);
      2. combine: union(self labels, incoming labels) → coarse-grouped
         pandas min per id (the house distinct/aggregate pattern).

    Labels only ever decrease, so Σ label is strictly decreasing until
    the fixpoint — convergence is detected by comparing that ONE scalar
    aggregate per round (`ds.sum`), not by materializing the label map.
    Converges in O(component diameter) rounds; near-dup components are
    tiny clusters, so a handful of rounds suffices — ``max_rounds`` is a
    safety bound and non-convergence raises."""
    import pyarrow.compute as _pc

    from basicocr_ray.stages.joins import bucketed_hash_join

    salts = _coarse_salts(num_salt)

    # directed both ways: src's label flows to dst
    def directed(b: pa.Table) -> pa.Table:
        a = pc_cast_i64(b["id_a"]).combine_chunks()
        bb = pc_cast_i64(b["id_b"]).combine_chunks()
        if isinstance(a, pa.ChunkedArray):
            a = a.chunk(0) if a.num_chunks else pa.array([], pa.int64())
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.chunk(0) if bb.num_chunks else pa.array([], pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a, bb]),
                "dst": pa.concat_arrays([bb, a]),
            }
        )

    # batch_size bundles the upstream's blocks: a pairs dataset produced by
    # the LSH chain arrives as hundreds of tiny map_groups output blocks,
    # and dragging that block count through every round's shuffle costs
    # ~10× in per-block overhead (measured 92 s vs 7 s on a 28-edge graph)
    edges = pairs_ds.map_batches(
        directed, batch_format="pyarrow", batch_size=65536
    ).materialize()

    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "rep": pa.array([], pa.int64()),
                }
            )
        )
    if n_edges <= single_task_edges:
        def union_find(b: pa.Table) -> pa.Table:
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for a, c in zip(src, dst):
                ra, rc = find(int(a)), find(int(c))
                if ra != rc:
                    # min-union: the tree root IS the component min,
                    # matching the distributed path's rep exactly
                    if ra < rc:
                        parent[rc] = ra
                    else:
                        parent[ra] = rc
            ids = sorted({int(x) for x in src} | {int(x) for x in dst})
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "rep": pa.array([find(i) for i in ids], pa.int64()),
                }
            )

        return edges.repartition(1).map_batches(
            union_find, batch_format="pyarrow", batch_size=None
        )

    def add_cg(b: pa.Table) -> pa.Table:
        # defensive exact cast: Ray's groupby assembly can widen blocks to
        # float64 when empty no-schema pandas blocks ride the union; values
        # stay integral, so the cast is lossless
        ids = _pc.cast(b["id"], pa.int64())
        labs = _pc.cast(b["label"], pa.int64())
        return pa.table(
            {
                "id": ids,
                "label": labs,
                "cg": _pc.cast(_pc.bit_wise_and(ids, salts - 1), pa.int32()),
            }
        )

    def min_per_id(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("id", as_index=False)["label"].min()
        return out.astype({"id": "int64", "label": "int64"})

    def combine_min(lbl_ds):
        return (
            lbl_ds.map_batches(add_cg, batch_format="pyarrow")
            .groupby("cg")
            .map_groups(min_per_id, batch_format="pandas")
        )

    # initial labels: every endpoint labels itself
    labels = combine_min(
        edges.map_batches(
            lambda b: pa.table({"id": b["src"], "label": b["src"]}),
            batch_format="pyarrow",
        )
    ).materialize()
    prev_total = labels.sum("label")

    for _ in range(max_rounds):
        incoming = bucketed_hash_join(
            labels.map_batches(
                lambda b: pa.table(
                    {
                        "src": _pc.cast(b["id"], pa.int64()),
                        "label": _pc.cast(b["label"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            edges,
            key="src",
            left_columns=["label"],
            right_columns=["dst"],
            num_buckets=salts,
        ).map_batches(
            lambda b: pa.table(
                {
                    "id": _pc.cast(b["dst"], pa.int64()),
                    "label": _pc.cast(b["label"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        labels = combine_min(labels.union(incoming)).materialize()
        total = labels.sum("label")
        if total == prev_total:
            return labels.map_batches(
                lambda b: pa.table({"id": b["id"], "rep": b["label"]}),
                batch_format="pyarrow",
            )
        prev_total = total
    raise RuntimeError(f"label propagation did not converge in {max_rounds} rounds")


def pc_cast_i64(col):
    import pyarrow.compute as _pc

    return _pc.cast(col, pa.int64())


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def _make_to_bands(
    hasher, num_bands, salts, id_column, text_column, with_counts=False
):
    """(id, gk, band_hash) row emitter shared by the one-shot and the
    incremental MinHash paths. Whole-batch signature + banding (one C
    hash pass per batch, one reduceat per permutation) — the per-doc
    Python loop here was the dominant cost of the dedup family after
    round 2's per-shingle fix; only the shingle-set construction remains
    per-document (string slicing, the irreducible kernel).

    ``with_counts`` adds an ``ns`` column carrying each document's exact
    distinct-shingle count (a byproduct of signature segmentation), so
    the band-bucket consumer can apply the lossless size-ratio prefilter
    before any pair leaves the bucket."""

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64, copy=False)
        texts = batch[text_column].to_pylist()
        if with_counts:
            sigs, counts = hasher.signatures_batch(
                texts, return_counts=True
            )
        else:
            sigs = hasher.signatures_batch(texts)
        bh = hasher.bands_batch(sigs, num_bands)  # (n, num_bands)
        n = len(ids)
        bids = np.tile(np.arange(num_bands, dtype=np.int64), n)
        flat = bh.reshape(-1)
        gk = bids * salts + (flat & np.uint64(salts - 1)).astype(np.int64)
        cols = {
            id_column: pa.array(np.repeat(ids, num_bands)),
            "gk": pa.array(gk),
            "band_hash": pa.array(flat),
        }
        if with_counts:
            cols["ns"] = pa.array(np.repeat(counts, num_bands))
        return pa.table(cols)

    return to_bands


def minhash_candidate_pairs(
    ds,
    id_column: str,
    text_column: str,
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int = 500,
    num_salt: int | None = None,
    hot_bucket_mode: str = "star",
    prefilter_threshold: float | None = None,
):
    """→ Dataset of candidate (id_a, id_b) pairs (id_a < id_b), deduped.

    shingle→minhash per batch → explode to (band_id, band_hash, id) rows →
    groupby salted band bucket ``band_id·S + (band_hash & (S-1))`` (S from
    the cluster size — same band_hash always lands in the same group, so
    the pair set is salt-invariant while parallelism scales out) → pairs
    within bucket. The shuffle moves ``num_bands`` small ints per
    document, never text.

    Hot buckets (> max_bucket_size members — degenerate near-identical
    clusters or adversarial collisions) would contribute O(n²) pairs that
    dominate the job; ``hot_bucket_mode="star"`` (default) instead emits
    the n−1 pairs linking every member to the bucket's minimum id, which
    preserves the connected component the bucket represents (downstream
    ``assign_components`` reconstructs the cluster) at linear cost.
    ``"drop"`` restores the round-1 behavior of emitting nothing.
    ``"full"`` expands every pair regardless of bucket size — required by
    consumers with an exact-pair contract (q22); O(n²) on hot buckets, so
    reserve it for verified-downstream pipelines where a pair miss is a
    correctness bug, not a recall tradeoff. ``"error"`` raises, for
    callers who would rather fail loudly than pay quadratic cost.

    ``prefilter_threshold=t`` applies the size-ratio prefilter INSIDE
    the band bucket, before any pair rides the dedupe shuffle or
    reaches the verify join: Jaccard(A,B) ≥ t implies
    min(|A|,|B|)/max(|A|,|B|) ≥ t, so dropping pairs below the ratio is
    LOSSLESS for any consumer that verifies at threshold ≥ t (the exact
    distinct-shingle counts ride the band rows as one extra int64 per
    band row). Leave it None for consumers with an exact-candidate-set
    contract (q22)."""
    hasher = MinHasher(num_perm=num_perm, k=shingle_k)
    salts = _coarse_salts(num_salt)
    to_bands = _make_to_bands(
        hasher, num_bands, salts, id_column, text_column,
        with_counts=prefilter_threshold is not None,
    )

    def band_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs of ONE salted band group: per-bucket work
        happens in-process (sorted arrays + boundary detection), not as
        one Ray map_groups task per bucket — a corpus has millions of
        (band, hash) buckets and per-group task overhead dominates
        otherwise. Pair EXPANSION is vectorized: size-2 buckets (the
        overwhelming majority) emit in one gather, larger buckets emit
        via ``np.triu_indices`` — the Python double loop here used to be
        the dominant cost of the whole dedup job once signatures were
        batched (candidate sets run to tens of millions of pairs).

        Pairs are built as POSITIONAL indices into the sorted bucket
        array so the optional size-ratio prefilter applies in one
        vectorized pass over all buckets at the end."""
        cols = [c for c in ("band_hash", id_column, "ns") if c in df]
        sub = df[cols].drop_duplicates(subset=["band_hash", id_column])
        sub = sub.sort_values(["band_hash", id_column], kind="mergesort")
        bh = sub["band_hash"].to_numpy()
        ids = sub[id_column].to_numpy()
        n = len(ids)
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64")}
        )
        if n == 0:
            return empty
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        s2 = starts[sizes == 2]
        if len(s2):
            a_parts.append(s2)
            b_parts.append(s2 + 1)
        for st, sz in zip(starts[sizes > 2], sizes[sizes > 2]):
            if sz > max_bucket_size and hot_bucket_mode != "full":
                if hot_bucket_mode == "star":
                    a_parts.append(np.full(sz - 1, st, dtype=np.int64))
                    b_parts.append(
                        np.arange(st + 1, st + sz, dtype=np.int64)
                    )
                elif hot_bucket_mode == "error":
                    raise ValueError(
                        f"LSH bucket of size {sz} exceeds max_bucket_size="
                        f"{max_bucket_size} (hot_bucket_mode='error')"
                    )
                continue
            ii, jj = np.triu_indices(int(sz), k=1)
            a_parts.append(st + ii)
            b_parts.append(st + jj)
        if not a_parts:
            return empty
        ia = np.concatenate(a_parts)
        ib = np.concatenate(b_parts)
        if prefilter_threshold is not None:
            ns = sub["ns"].to_numpy().astype(np.float64, copy=False)
            na, nb = ns[ia], ns[ib]
            keep = np.minimum(na, nb) >= prefilter_threshold * np.maximum(
                na, nb
            )
            ia, ib = ia[keep], ib[keep]
            if not len(ia):
                return empty
        return pd.DataFrame(
            {"id_a": pd.Series(ids[ia], dtype="int64"),
             "id_b": pd.Series(ids[ib], dtype="int64")}
        )

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(band_pairs, batch_format="pandas")
    )
    return _dedupe_pairs(pairs, num_groups=num_salt)


def incremental_minhash_candidates(
    new_ds,
    index_dir: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int = 500,
    num_salt: int | None = None,
    hot_bucket_mode: str = "star",
    commit: bool = True,
):
    """Near-dup candidates of a NEW wave against a PERSISTED band index
    (the incremental sibling of :func:`minhash_candidate_pairs`): each
    crawl shard is banded once, candidates split into

    * WITHIN-wave pairs — the usual salted-band-bucket grouping, and
    * CROSS pairs (new doc, previously-ingested doc) — one bucketed
      hash join of the wave's band rows against the index on a mixed
      (band_id, band_hash) key; matched buckets emit (new, old) pairs.

    The index stores (bkey, id) band rows — ``num_bands`` small ints per
    ingested doc, never text — appended as content-hash-named parquet
    parts (idempotent on retry; duplicate rows are removed at join
    output by the pair dedup). A hot index bucket (a giant historical
    near-dup cluster) emits |new∩bucket|·min(|old∩bucket|,
    ``max_bucket_size``) pairs per band under ``hot_bucket_mode="star"``
    semantics below; as in the one-shot path, candidates are a superset
    and the downstream exact verify owns precision.

    Returns ``(pairs_ds, n_band_rows_added)`` where pairs are distinct
    (id_a < id_b) over both candidate classes. ``commit=False`` skips
    the index append (n_band_rows_added = 0) — for a terminal wave whose
    rows no later wave will dedup against."""
    import hashlib
    import os

    import pyarrow.parquet as _pq
    import ray.data as _rd

    from basicocr_ray.stages.joins import bucketed_hash_join

    hasher = MinHasher(num_perm=num_perm, k=shingle_k)
    salts = _coarse_salts(num_salt)
    to_bands = _make_to_bands(
        hasher, num_bands, salts, id_column, text_column
    )

    def add_bkey(batch: pa.Table) -> pa.Table:
        # one uint64 key mixing band id and band hash: same collision
        # class as the band hash itself (candidates are verified anyway)
        bid = (
            pc.cast(batch["gk"], pa.int64()).to_numpy(zero_copy_only=False)
            // salts
        ).astype(np.uint64)
        bh = batch["band_hash"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        bkey = bh ^ ((bid + np.uint64(1)) * MinHasher._BAND_MIX)
        return pa.table(
            {
                id_column: batch[id_column],
                "gk": batch["gk"],
                "band_hash": batch["band_hash"],
                "bkey": pa.array(bkey.astype(np.int64)),
            }
        )

    band_rows = (
        new_ds.map_batches(to_bands, batch_format="pyarrow")
        .map_batches(add_bkey, batch_format="pyarrow")
        .materialize()  # banded once; reused by 3 consumers below
    )

    # within-wave candidates (identical discipline to the one-shot path)
    def band_pairs_within(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[["band_hash", id_column]].drop_duplicates()
        sub = sub.sort_values(["band_hash", id_column], kind="mergesort")
        bh = sub["band_hash"].to_numpy()
        ids = sub[id_column].to_numpy()
        n = len(ids)
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64")}
        )
        if n == 0:
            return empty
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        a_parts, b_parts = [], []
        s2 = starts[sizes == 2]
        if len(s2):
            a_parts.append(ids[s2])
            b_parts.append(ids[s2 + 1])
        for st, sz in zip(starts[sizes > 2], sizes[sizes > 2]):
            g = ids[st : st + sz]
            if sz > max_bucket_size and hot_bucket_mode != "full":
                a_parts.append(np.full(sz - 1, g[0], dtype=np.int64))
                b_parts.append(g[1:])
                continue
            ii, jj = np.triu_indices(int(sz), k=1)
            a_parts.append(g[ii])
            b_parts.append(g[jj])
        if not a_parts:
            return empty
        return pd.DataFrame(
            {"id_a": pd.Series(np.concatenate(a_parts), dtype="int64"),
             "id_b": pd.Series(np.concatenate(b_parts), dtype="int64")}
        )

    within = (
        band_rows.groupby("gk")
        .map_groups(band_pairs_within, batch_format="pandas")
    )

    os.makedirs(index_dir, exist_ok=True)
    # SNAPSHOT the index file list eagerly: the band-row append below
    # must not leak into this wave's own cross-join read
    index_paths = sorted(
        os.path.join(index_dir, f)
        for f in os.listdir(index_dir)
        if f.endswith(".parquet")
    )
    pairs = within
    if index_paths:
        index_ds = _rd.read_parquet(index_paths, columns=["bkey", "old_id"])

        def cross_pairs(joined: pa.Table) -> pa.Table:
            df = joined.to_pandas()
            df = df[df[id_column] != df["old_id"]].drop_duplicates(
                [id_column, "old_id"]
            )
            a = np.minimum(df[id_column].to_numpy(), df["old_id"].to_numpy())
            b = np.maximum(df[id_column].to_numpy(), df["old_id"].to_numpy())
            return pa.table(
                {"id_a": pa.array(a.astype(np.int64)),
                 "id_b": pa.array(b.astype(np.int64))}
            )

        cross = bucketed_hash_join(
            band_rows.map_batches(
                lambda b: b.select(["bkey", id_column]),
                batch_format="pyarrow",
            ),
            index_ds,
            "bkey",
            [id_column],
            ["old_id"],
            bucket_post_fn=cross_pairs,
        )
        pairs = within.union(cross)

    def write_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64())})
        tbl = pa.table(
            {"bkey": batch["bkey"], "old_id": batch[id_column]}
        ).sort_by([("bkey", "ascending"), ("old_id", "ascending")])
        name = hashlib.md5(
            tbl["old_id"].to_numpy(zero_copy_only=False).tobytes()
            + tbl["bkey"].to_numpy(zero_copy_only=False).tobytes()
        ).hexdigest()[:16]
        path = os.path.join(index_dir, f"bands-{name}.parquet")
        if os.path.exists(path):  # retry/resume: identical part exists
            return pa.table({"n": pa.array([0], pa.int64())})
        _pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    if not commit:
        return _dedupe_pairs(pairs, num_groups=num_salt), 0
    n_added = band_rows.map_batches(
        write_rows, batch_format="pyarrow"
    ).sum("n")
    return _dedupe_pairs(pairs, num_groups=num_salt), int(n_added or 0)


def _dedupe_pairs(
    pairs,
    extra_cols: tuple[str, ...] = (),
    num_groups: int | None = None,
):
    """Distinct (id_a, id_b) via cluster-sized coarse hash groups with a
    vectorized pandas drop_duplicates inside each — NOT one map_groups per
    pair (millions of tiny calls) and NOT a Ray Aggregate keyed on every
    pair (its sort-based path stalls at high distinct-key cardinality)."""
    import pyarrow.compute as _pc

    salts = _coarse_salts(num_groups)

    def add_cg(b: pa.Table) -> pa.Table:
        cg = _pc.cast(
            _pc.bit_wise_and(_pc.cast(b["id_a"], pa.int64()), salts - 1),
            pa.int32(),
        )
        return b.append_column("cg", cg)

    cols = ["id_a", "id_b", *extra_cols]

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        if extra_cols:  # keep the min of the extra column per pair
            df = df.sort_values(cols, kind="mergesort")
        return df.drop_duplicates(subset=["id_a", "id_b"])[cols]

    return (
        pairs.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(dd, batch_format="pandas")
    )


def verify_pairs_jaccard(
    pairs_ds,
    texts_by_id: dict[int, str],
    threshold: float,
    shingle_k: int = 5,
):
    """Candidate pairs → confirmed near-dups with exact n-gram Jaccard.

    ``texts_by_id`` is a broadcast lookup (``ray.put`` once, read per
    actor/task). At 100 TB scale this side would not fit — there you
    bucket-join pairs back to texts on id (hash-partitioned join) instead;
    the broadcast variant is the small-side fast path (SURVEY §2.4)."""
    import ray

    ref = ray.put(texts_by_id)

    def verify(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.sketches import shingles as _shingles

        lookup = ray.get(ref)
        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        # same memoized + size-ratio-prefiltered kernel as the join
        # variant: on template-heavy corpora a doc recurs in thousands
        # of pairs per batch and the per-PAIR shingle rebuild dominated
        cache: dict[int, set] = {}

        def sh(i: int) -> set:
            s = cache.get(i)
            if s is None:
                s = _shingles(lookup.get(i, ""), shingle_k)
                cache[i] = s
            return s

        def jac(x: int, y: int) -> float:
            sa, sb = sh(x), sh(y)
            if not sa and not sb:
                return 1.0
            la, lb = len(sa), len(sb)
            if min(la, lb) < threshold * max(la, lb):
                return 0.0  # exact prefilter: J ≤ min/max
            inter = len(sa & sb)
            return inter / (la + lb - inter)

        sims = [jac(x, y) for x, y in zip(a, b)]
        out = pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def verify_pairs_jaccard_join(
    pairs_ds,
    texts_ds,
    id_column: str,
    text_column: str,
    threshold: float,
    shingle_k: int = 5,
    num_buckets: int | None = None,
    broadcast_bytes: int = 0,
):
    """Candidate pairs → confirmed near-dups, with texts fetched via two
    bucketed hash joins instead of a driver-side broadcast.

    The corpus-scale verify path (round 1 built the id→text dict with
    ``ds.take_all()`` — a full-corpus driver materialization): join pairs
    to texts on id_a, then on id_b; each text row shuffles once per join,
    pairs carry only ids until the per-bucket pandas merge.

    ``broadcast_bytes > 0`` arms the adaptive small-side fast path: when
    ``texts_ds`` is materialized and its MEASURED size is within the
    budget, the id→text map rides one ``ray.put`` and the pairs stream
    through `verify_pairs_jaccard` — zero shuffles instead of two. The
    decision is made on block-metadata bytes per run (the
    `assign_components` / `adaptive_semi_anti_join` discipline), so the
    same call sites degrade to the join path the moment the text
    relation outgrows the budget; a lazy ``texts_ds`` (unknown size)
    always takes the join path."""
    import pyarrow.compute as _pc

    from basicocr_ray.stages.joins import bucketed_hash_join

    if broadcast_bytes:
        from ray.data.dataset import MaterializedDataset

        sz = None
        if isinstance(texts_ds, MaterializedDataset):
            # metadata read — size_bytes() on a LAZY dataset would
            # execute the plan just to measure it
            try:
                sz = texts_ds.size_bytes()
            except Exception:
                sz = None
        if sz is not None and sz <= broadcast_bytes:
            df = texts_ds.to_pandas()
            lookup = {
                int(i): (t or "")
                for i, t in zip(df[id_column], df[text_column])
            }
            return verify_pairs_jaccard(
                pairs_ds, lookup, threshold, shingle_k
            )

    buckets = num_buckets or _coarse_salts(None)

    def rename(key_name: str, text_name: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_name: pc_cast_i64(b[id_column]),
                    text_name: b[text_column],
                }
            )

        return fn

    with_a = bucketed_hash_join(
        pairs_ds,
        texts_ds.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        key="id_a",
        left_columns=["id_b"],
        right_columns=["text_a"],
        num_buckets=buckets,
    )
    with_both = bucketed_hash_join(
        with_a,
        texts_ds.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        key="id_b",
        left_columns=["id_a", "text_a"],
        right_columns=["text_b"],
        num_buckets=buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.sketches import shingles as _shingles

        a = batch["id_a"].to_pylist()
        b = batch["id_b"].to_pylist()
        # memoize shingle sets per unique text: on template-heavy
        # corpora a doc appears in thousands of candidate pairs per
        # batch, and recomputing its k-gram set per PAIR dominated the
        # whole near-dup stage (measured ~50 s → ~3 s on 4M pairs over
        # 5k docs)
        cache: dict[str, set] = {}

        def sh(t: str) -> set:
            s = cache.get(t)
            if s is None:
                s = _shingles(t, shingle_k)
                cache[t] = s
            return s

        def jac(x: str, y: str) -> float:
            sa, sb = sh(x), sh(y)
            if not sa and not sb:
                return 1.0
            la, lb = len(sa), len(sb)
            # exact prefilter: J = |∩|/|∪| ≤ min/max, so a size ratio
            # below the threshold can never verify — skip the set op
            if min(la, lb) < threshold * max(la, lb):
                return 0.0
            inter = len(sa & sb)
            return inter / (la + lb - inter)

        sims = [
            jac(x or "", y or "")
            for x, y in zip(
                batch["text_a"].to_pylist(), batch["text_b"].to_pylist()
            )
        ]
        out = pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "jaccard": pa.array(sims, pa.float64()),
            }
        )
        return out.filter(_pc.greater_equal(out["jaccard"], threshold))

    return with_both.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_exact_dup_pairs(
    ds, id_column: str, text_column: str, num_salt: int | None = None
):
    """Exact-duplicate pairs via SimHash bucketing: group by the full
    64-bit signature (identical docs always collide), verify with md5 text
    equality inside the bucket — signature collisions between
    merely-similar docs are rejected. The shuffle carries (id, sig, fp);
    text never moves. Coarse groups are ``sig & (S-1)`` with S sized from
    the cluster (same signature → same group, so results are
    salt-invariant)."""
    salts = _coarse_salts(num_salt)

    def sig_fp(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.sketches import simhash_batch

        ids = batch[id_column].to_pylist()
        texts = batch[text_column].to_pylist()
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "sig": pa.array(simhash_batch(texts)),
                "fp": pa.array([md5_hex(t or "") for t in texts], pa.string()),
            }
        )

    def coarse_pairs(df: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, sub in df.groupby("sig"):
            sub = sub.sort_values(id_column)
            ids = sub[id_column].tolist()
            fps = sub["fp"].tolist()
            n = len(ids)
            for i in range(n):
                for j in range(i + 1, n):
                    if fps[i] == fps[j]:
                        a.append(ids[i])
                        b.append(ids[j])
        return pd.DataFrame({"id_a": pd.Series(a, dtype="int64"),
                             "id_b": pd.Series(b, dtype="int64")})

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.append_column(
            "cg", _pc.cast(
                _pc.bit_wise_and(batch["sig"], np.uint64(salts - 1)),
                pa.int32(),
            )
        )

    return (
        ds.map_batches(sig_fp, batch_format="pyarrow")
        .map_batches(add_coarse, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(coarse_pairs, batch_format="pandas")
    )


def simhash_pairs(
    ds,
    id_column: str,
    text_column: str,
    max_hamming: int = 3,
    token_k: int = 4,
    num_salt: int | None = None,
):
    """→ (id_a, id_b, hamming) pairs with distance ≤ max_hamming.

    Bucketing: split the 64-bit signature into 4 × 16-bit chunks — any pair
    within hamming ≤ 3 shares at least one exact chunk (pigeonhole), so
    grouping by (chunk_id, chunk_value) has perfect recall; verification
    computes the true distance inside each bucket. The shuffle key is the
    SALTED ``chunk_id·S + (chunk_val & (S-1))`` — round 1's bare chunk_id
    gave exactly 4 groups, each holding every document's row (the clearest
    fixed fan-out in the repo); same chunk_val still lands in one group so
    recall is unchanged while parallelism scales with the cluster."""
    salts = _coarse_salts(num_salt)

    def to_chunks(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.sketches import simhash_batch

        ids = batch[id_column].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64, copy=False)
        sig = simhash_batch(batch[text_column].to_pylist(), token_k)
        n = len(ids)
        cids = np.tile(np.arange(4, dtype=np.int64), n)
        sig_rep = np.repeat(sig, 4)
        cv = (
            (sig_rep >> (np.uint64(16) * cids.astype(np.uint64)))
            & np.uint64(0xFFFF)
        ).astype(np.int64)
        gk = cids * salts + (cv & (salts - 1))
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, 4)),
                "gk": pa.array(gk),
                "chunk_val": pa.array(cv.astype(np.int32)),
                "sig": pa.array(sig_rep),
            }
        )

    def chunk_verify(df: pd.DataFrame) -> pd.DataFrame:
        """One coarse group per (chunk_id, salt); per-value buckets handled
        in-process (not one Ray task per tiny bucket). Pairwise hamming is
        a bit-matrix product per bucket — ``popcount(x^y) = B(1-B)ᵀ +
        (1-B)Bᵀ`` on the unpacked sign bits — computed in 512-row blocks
        so a degenerate all-identical bucket costs O(n²) OUTPUT (as any
        pair enumeration must) but only O(512·n) temporary memory."""
        a, b, h = [], [], []
        BLK = 512
        for _, sub in df.groupby("chunk_val"):
            rows = sub.drop_duplicates(subset=[id_column]).sort_values(id_column)
            n = len(rows)
            if n < 2:
                continue
            ids = rows[id_column].to_numpy()
            sigs = rows["sig"].to_numpy().astype(np.uint64)
            bits = np.unpackbits(
                sigs.view(np.uint8).reshape(n, 8), axis=1
            ).astype(np.int32)
            inv = 1 - bits
            for s in range(0, n, BLK):
                e = min(s + BLK, n)
                ham = bits[s:e] @ inv.T + inv[s:e] @ bits.T  # (e-s, n)
                ii, jj = np.nonzero(ham <= max_hamming)
                keep = s + ii < jj  # upper triangle only, no self
                gi, gj = s + ii[keep], jj[keep]
                a.extend(ids[gi].tolist())
                b.extend(ids[gj].tolist())
                h.extend(ham[ii[keep], jj[keep]].tolist())
        return pd.DataFrame({"id_a": pd.Series(a, dtype="int64"),
                             "id_b": pd.Series(b, dtype="int64"),
                             "hamming": pd.Series(h, dtype="int64")})

    pairs = (
        ds.map_batches(to_chunks, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(chunk_verify, batch_format="pandas")
    )
    return _dedupe_pairs(pairs, extra_cols=("hamming",), num_groups=num_salt)
