"""End-to-end corpus curation: the round's LLM-data operators composed
into ONE pipeline — the shape a real training-data run takes, registered
as a driver query (q88) with a full SQL twin so the WHOLE CHAIN is
hash-checked, not just its stages.

    read → quality filter (min tokens) → benchmark-slice exclusion
         → exact dedup (first occurrence by content fingerprint)
         → MinHash-LSH near-dup removal (candidates → exact-Jaccard
           verify → connected components → keep min-id representative)
         → n-gram decontamination vs the benchmark slice
         → deterministic md5 train/val/test split
         → per-(lang, split) rollup

This is the reference's detect→recognize→correct dataflow shape
(contrib/trietree/trietree_correct.py:245-274 chains correction INTO
the driver flow, not beside it): the near-dup machinery of q22/q42/q91
is composed into the flagship chain rather than existing only as
standalone queries.

Scale shape of each stage is the house discipline it reuses: the quality
filter and split are stateless per-batch maps; dedup shuffles (id, fp)
only and brings winners back with a single-shuffle semi-join; near-dup
shuffles signatures/band keys only and its removal set rides a bucketed
anti-join; the decontamination gram set is the bounded benchmark
broadcast; contaminated ids leave via a bucketed anti-join (both sides
fact-scale safe); the rollup is partial+final. No stage materializes
payload on the driver."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from basicocr_ray.core.textstats import md5_hex, ws_tokens


def _checkpointed(name, compute, checkpoint_dir, fingerprint):
    """Filesystem checkpoint for a SMALL id-table intermediate (the
    decision set a curation stage derives — winner ids, removal ids,
    contaminated ids). ``compute()`` returns a Dataset; the rows are
    persisted as one parquet file plus a marker carrying the input
    fingerprint + stage name, and a rerun whose fingerprint matches
    loads the parquet INSTEAD of recomputing (the `state/manifest.py`
    resume discipline applied to the curation chain: a crash between
    stages resumes from the last completed decision set; the text
    relation itself is re-read from source, which is the cheap part).
    Returns a materialized Dataset either way."""
    import ray.data

    if checkpoint_dir is None:
        return compute().materialize()
    os.makedirs(checkpoint_dir, exist_ok=True)
    data_path = os.path.join(checkpoint_dir, f"{name}.parquet")
    marker_path = os.path.join(checkpoint_dir, f"{name}.json")
    if os.path.exists(marker_path) and os.path.exists(data_path):
        try:
            marker = json.load(open(marker_path))
        except (OSError, json.JSONDecodeError):
            marker = None
        if marker and marker.get("fingerprint") == fingerprint:
            return ray.data.read_parquet(data_path).materialize()
    ds = compute().materialize()
    import pyarrow.parquet as _pq

    df = ds.to_pandas()
    if df.shape[1] == 0:
        # a fully-clean corpus yields an EMPTY decision set with no
        # schema — persist the canonical (doc_id) layout so the resume
        # path round-trips
        tab = pa.table({"doc_id": pa.array([], pa.int64())})
    else:
        tab = pa.Table.from_pandas(df, preserve_index=False)
    _pq.write_table(tab, data_path)
    json.dump(
        {"fingerprint": fingerprint, "stage": name, "rows": ds.count()},
        open(marker_path, "w"),
    )
    return ds


def curate_rollup(
    sf_dir: str,
    min_tokens: int = 5,
    bench_mod: int = 17,
    near_dup: bool = True,
    near_dup_threshold: float = 0.8,
    checkpoint_dir: str | None = None,
):
    import ray

    from basicocr_ray.pipelines.queries import _read
    from basicocr_ray.stages.decontam import (
        build_benchmark_grams,
        flag_contaminated,
    )
    from basicocr_ray.stages.dedup import (
        _coarse_salts,
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.sample import hash_split

    salts = _coarse_salts(None)
    docs = _read(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"]
    )
    fp = None
    if checkpoint_dir is not None:
        from basicocr_ray.state.manifest import fingerprint_input

        fp = fingerprint_input(
            [os.path.join(sf_dir, "documents.parquet")]
        ) + f":mt{min_tokens}:bm{bench_mod}:nd{near_dup}:{near_dup_threshold}"

    # 1+2. quality floor + benchmark-slice exclusion (stateless map)
    def keep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        ok = np.fromiter(
            (len(ws_tokens(t or "")) >= min_tokens for t in texts),
            dtype=bool,
            count=len(texts),
        )
        return b.filter(pa.array(ok & (ids % bench_mod != 0)))

    # Reused intermediates are materialized ONCE: `kept` feeds both the
    # winner derivation and the semi-join's left side, `deduped` feeds
    # the contamination flags, the anti-join's left side AND each join's
    # schema probe — left lazy, Ray re-executes the whole upstream chain
    # per consumer (measured 33 s → 12 s on the sf0.1 bench line). At
    # scale this is the standard super-stage checkpoint; the object
    # store spills as needed.
    kept = docs.map_batches(keep, batch_format="pyarrow").materialize()

    # 3. exact dedup: winner ids via the (id, fp) coarse-salt shuffle,
    #    full rows back through one semi-join
    def id_fp(b: pa.Table) -> pa.Table:
        fps = [md5_hex(t or "") for t in b["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "fp": pa.array(fps, pa.string()),
                "cg": pa.array(
                    [int(f[:8], 16) & (salts - 1) for f in fps],
                    pa.int32(),
                ),
            }
        )

    def min_per_fp(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fp", as_index=False)["doc_id"].min()
        return g[["doc_id"]].astype({"doc_id": "int64"})

    winners = _checkpointed(
        "winners",
        lambda: kept.map_batches(id_fp, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(min_per_fp, batch_format="pandas")
        .map_batches(
            lambda b: pa.table(
                {"doc_id": pa.array(b["doc_id"].to_pylist(), pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        checkpoint_dir,
        fp,
    )  # (id) rows — metadata; probed + joined below
    deduped = bucketed_hash_join(
        kept, winners, "doc_id",
        ["text", "lang", "n_chars"], [], join_type="left semi",
    ).materialize()

    # 3b. near-dup removal (MinHash-LSH → exact-Jaccard verify →
    #     connected components → keep the min-id representative per
    #     cluster). Shuffles carry signatures/band keys and (id, id)
    #     edges only; the removal set leaves via a bucketed anti-join.
    if near_dup:
        def compute_removed():
            # default "star" hot-bucket routing: a hot bucket
            # contributes star edges (member ↔ min-id center) instead
            # of all pairs — connectivity-preserving for the component
            # consumer below, and the difference between ~10⁴ and ~10⁷
            # candidate pairs on template-heavy corpora ("full" is only
            # for exact-pair-set consumers like q22)
            ids_text = deduped.select_columns(["doc_id", "text"])
            cand = minhash_candidate_pairs(
                ids_text, "doc_id", "text", num_bands=32,
            )
            verified = verify_pairs_jaccard_join(
                cand, ids_text, "doc_id", "text",
                threshold=near_dup_threshold,
            )
            comps = assign_components(
                verified.select_columns(["id_a", "id_b"])
            )
            return comps.map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": pa.compute.cast(
                            b.filter(
                                pa.compute.not_equal(b["id"], b["rep"])
                            )["id"],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )

        removed = _checkpointed(
            "neardup_removed", compute_removed, checkpoint_dir, fp
        )  # (id) rows — metadata; probed + joined below
        deduped = bucketed_hash_join(
            deduped, removed, "doc_id",
            ["text", "lang", "n_chars"], [], join_type="left anti",
        ).materialize()

    # 4. decontamination: bounded benchmark gram broadcast → flags →
    #    contaminated ids leave via a bucketed anti-join
    def is_bench(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % bench_mod == 0))

    def compute_contaminated():
        bench = docs.map_batches(is_bench, batch_format="pyarrow")
        grams_ref = ray.put(build_benchmark_grams(bench, "text", n=5))
        flags = flag_contaminated(deduped, grams_ref, n=5)
        return flags.map_batches(
            lambda b: b.filter(b["contaminated"]).select(["doc_id"]),
            batch_format="pyarrow",
        )

    contaminated = _checkpointed(
        "contaminated", compute_contaminated, checkpoint_dir, fp
    )  # (id) rows — metadata; probed + joined below
    clean = bucketed_hash_join(
        deduped, contaminated, "doc_id",
        ["text", "lang", "n_chars"], [], join_type="left anti",
    )

    # 5+6. split assignment (stateless) + partial/final rollup
    split_ds = hash_split(clean, "doc_id")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "split"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        h = pd.util.hash_pandas_object(
            g[["lang", "split"]], index=False
        ).to_numpy()
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "split"], as_index=False)[
            ["n_docs", "sum_chars"]
        ].sum()
        return out.astype({"n_docs": "int64", "sum_chars": "int64"})

    return (
        split_ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )
