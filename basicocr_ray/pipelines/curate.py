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


# bumped whenever the dedup / near-dup / decontamination decision logic
# changes meaning: mixed into the checkpoint fingerprint so a reused
# checkpoint_dir never silently loads decision sets computed by old code
_DECISIONS_VERSION = 2


def _checkpointed(name, compute, checkpoint_dir, fingerprint):
    """Filesystem checkpoint for an id-table intermediate (the decision
    set a curation stage derives — winner ids, removal ids, contaminated
    ids). ``compute()`` returns a Dataset; the rows are persisted via a
    DISTRIBUTED multi-file ``write_parquet`` into a per-stage directory
    (the ``winners`` set is one row per unique kept doc — O(corpus) — so
    a driver-side collect or single-file write here would be the 100-TB
    scale killer), plus a marker carrying the input fingerprint + stage
    name. A rerun whose fingerprint matches reads the directory back
    INSTEAD of recomputing (the `state/manifest.py` resume discipline
    applied to the curation chain: a crash between stages resumes from
    the last completed decision set; the text relation itself is re-read
    from source, which is the cheap part). The write is crash-safe: data
    lands in a tmp directory renamed into place, and the marker is
    written last — a crash mid-write leaves no marker, so the stage
    recomputes. Returns a materialized Dataset either way."""
    import ray.data

    if checkpoint_dir is None:
        return compute().materialize()
    os.makedirs(checkpoint_dir, exist_ok=True)
    # directory of parquet fragments (named .parquet for continuity with
    # the round-4 single-file layout; it is a directory now)
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
    # count from the materialized blocks' metadata — no extra data pass
    n_rows = ds.count()
    import shutil

    tmp_path = data_path + ".tmp"
    shutil.rmtree(tmp_path, ignore_errors=True)
    if n_rows == 0:
        # a fully-clean corpus yields an EMPTY decision set with no
        # schema — persist the canonical (doc_id) layout so the resume
        # path round-trips
        import pyarrow.parquet as _pq

        os.makedirs(tmp_path, exist_ok=True)
        _pq.write_table(
            pa.table({"doc_id": pa.array([], pa.int64())}),
            os.path.join(tmp_path, "empty.parquet"),
        )
    else:
        ds.write_parquet(tmp_path)
    if os.path.isdir(data_path):
        shutil.rmtree(data_path)
    elif os.path.exists(data_path):
        os.remove(data_path)  # round-4 single-file layout
    os.rename(tmp_path, data_path)
    marker_tmp = marker_path + ".tmp"
    json.dump(
        {"fingerprint": fingerprint, "stage": name, "rows": n_rows},
        open(marker_tmp, "w"),
    )
    os.rename(marker_tmp, marker_path)
    return ds


def curate_rollup(
    sf_dir: str,
    min_tokens: int = 5,
    bench_mod: int = 17,
    near_dup: bool = True,
    near_dup_threshold: float = 0.8,
    checkpoint_dir: str | None = None,
    hot_bucket_mode: str = "star",
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
    from basicocr_ray.stages.joins import adaptive_semi_anti_join
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
        ) + (
            f":v{_DECISIONS_VERSION}:mt{min_tokens}:bm{bench_mod}"
            f":nd{near_dup}:{near_dup_threshold}:hb{hot_bucket_mode}"
        )

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
    # adaptive: the decision sets are materialized, so each join below
    # broadcasts the key set (zero corpus shuffle) while it measures
    # small and degrades to the single-shuffle bucketed join when it
    # doesn't — `winners` is O(corpus) and crosses that line first
    deduped = adaptive_semi_anti_join(
        kept, winners, "doc_id",
        ["text", "lang", "n_chars"], join_type="left semi",
    ).materialize()

    # 3b. near-dup removal (MinHash-LSH → exact-Jaccard verify →
    #     connected components → keep the min-id representative per
    #     cluster). Shuffles carry signatures/band keys and (id, id)
    #     edges only; the removal set leaves via a bucketed anti-join.
    if near_dup:
        def compute_removed():
            # default "star" hot-bucket routing: a hot bucket
            # contributes star edges (member ↔ min-id center) instead
            # of all pairs — the difference between ~10⁴ and ~10⁷
            # candidate pairs on template-heavy corpora. CAVEAT: star
            # preserves connectivity of the CANDIDATE graph, not of the
            # post-verification graph — if two true near-dups in a hot
            # bucket both fail exact-Jaccard verification against the
            # bucket's min-id center, their edge is lost and a component
            # can split, so the brute-force-oracle equivalence is exact
            # only while no bucket exceeds max_bucket_size (which holds
            # at the driver's correctness scales and is pinned by
            # tests/test_dedup_sample_state.py's star-vs-full divergence
            # test). Callers who need the oracle equivalence by
            # construction on template-heavy corpora pass
            # hot_bucket_mode="full" and pay the quadratic hot buckets.
            # The size-ratio prefilter inside candidate generation is
            # lossless at the verify threshold (|A∩B|/|A∪B| ≥ t needs
            # min(|A|,|B|)/max(|A|,|B|) ≥ t), so it never changes the
            # verified pair set — only the shuffle volume.
            # 16 bands × 4 rows (not 32 × 2): at 4 rows per band a
            # sub-threshold pair collides with probability s⁴ per band
            # instead of s² — on the template-similar corpus this cuts
            # candidates ~6.7× (1.50M → 224k at bench scale) with an
            # IDENTICAL verified pair set (measured, and the q88 oracle
            # pins it at both correctness scales). Worst-case miss for a
            # pair at exactly J=0.8 is (1−0.8⁴)¹⁶ ≈ 2e-4, falling to
            # 7e-6 at J=0.85 — the band budget spent where the verify
            # stage, not recall, dominates the job.
            ids_text = deduped.select_columns(["doc_id", "text"])
            # materialized: (id, id) rows only — verify's bucketed joins
            # schema-probe their inputs, and a lazy candidate pipeline
            # would re-execute the whole minhash chain per probe
            # (measured ~6 s of the bench line)
            cand = minhash_candidate_pairs(
                ids_text, "doc_id", "text", num_bands=16,
                hot_bucket_mode=hot_bucket_mode,
                prefilter_threshold=near_dup_threshold,
            ).materialize()
            # texts_ds is the MATERIALIZED deduped relation so the
            # adaptive broadcast verify can read its size from block
            # metadata (zero shuffles when it fits; two bucketed joins
            # when the corpus doesn't)
            verified = verify_pairs_jaccard_join(
                cand, deduped, "doc_id", "text",
                threshold=near_dup_threshold,
                broadcast_bytes=64 << 20,
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
        deduped = adaptive_semi_anti_join(
            deduped, removed, "doc_id",
            ["text", "lang", "n_chars"], join_type="left anti",
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
    clean = adaptive_semi_anti_join(
        deduped, contaminated, "doc_id",
        ["text", "lang", "n_chars"], join_type="left anti",
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
