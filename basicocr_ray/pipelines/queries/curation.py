"""End-to-end corpus curation: decontamination, curate chain, release funnel (LLM-data brief).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import token_items

from ._shared import (
    _TOKS,
    _read,
)


def q75_decontaminate(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix C / PaLM §6): flag
    training documents sharing any word 5-gram with a held-out benchmark
    set (here the deterministic ``doc_id % 17 == 0`` slice). The
    benchmark gram set is small by definition → ONE ``ray.put``
    broadcast; the training side streams through ``map_batches`` with
    zero shuffle — the canonical J1 shape at decontamination's usual
    asymmetry (TB training corpus vs KB eval set)."""
    import ray

    from basicocr_ray.stages.decontam import (
        build_benchmark_grams,
        flag_contaminated,
    )

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def is_bench(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 17 == 0))

    def is_train(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 17 != 0))

    bench = docs.map_batches(is_bench, batch_format="pyarrow")
    grams = build_benchmark_grams(bench, "text", n=5)
    ref = ray.put(grams)
    train = docs.map_batches(is_train, batch_format="pyarrow")
    return flag_contaminated(train, ref, n=5)


def q88_curate_corpus(sf_dir: str):
    """END-TO-END corpus curation (pipelines/curate.py): quality floor →
    benchmark-slice exclusion → exact dedup (first occurrence by content
    fingerprint, winners back via semi-join) → MinHash-LSH NEAR-DUP
    removal (candidates → exact-Jaccard verify → connected components →
    keep min-id representative; the q22/q42/q91 machinery composed INTO
    the chain, mirroring the reference's detect→recognize→correct
    driver flow, contrib/trietree/trietree_correct.py:245-274) → 5-gram
    decontamination vs the benchmark slice (bounded broadcast +
    anti-join) → deterministic md5 train/val/test split → per-(lang,
    split) rollup. The whole chain hash-checks against one SQL twin —
    the integration test a per-stage oracle can't give."""
    from basicocr_ray.pipelines.curate import curate_rollup

    return curate_rollup(sf_dir)


def q200_release_funnel(sf_dir: str):
    """END-TO-END CORPUS RELEASE FUNNEL — the whole curation pipeline as
    ONE hash-checked query: quality gate (q129's hashed-linear scorer,
    keep score > −180 — a mid-distribution bar, so the funnel is
    non-degenerate on this vocabulary) → exact dedup (min doc_id per text) → per-language
    release cap (md5 bottom-20, the q46 discipline) → signed manifest
    (the q165 XOR digest). Output one row per (stage, lang): stage ∈
    input/quality/dedup/release with counts, and the release rows carry
    the content digest. The whole chain moves METADATA only: each row's
    text fingerprint, content digest and char count are computed ONCE
    in the first batch pass, so dedup, sampling and the manifest all
    run on (id, lang, fp, digest, n_chars) tuples — text never rides a
    shuffle, exactly how a 100 TB release would run."""
    from basicocr_ray.core.textstats import hashed_linear_score, md5_hex
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    MASK = (1 << 63) - 1
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]
    CAP = 20

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def enrich(b: pa.Table) -> pa.Table:
        ids, langs, fps, digs, ncs, keeps = [], [], [], [], [], []
        for did, t, lang in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist(),
            b["lang"].to_pylist(),
        ):
            t = t if t is not None else ""
            ids.append(did)
            langs.append(lang if lang is not None else "")
            fps.append(_md5_low64(t) & MASK)
            digs.append(_md5_low64(f"{did}:{t}") & MASK)
            ncs.append(len(t))
            s = hashed_linear_score(token_items(t) if t else [], weights)
            keeps.append(1 if s > -180 else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "fp": pa.array(fps, pa.int64()),
                "digest": pa.array(digs, pa.int64()),
                "n_chars": pa.array(ncs, pa.int64()),
                "keep": pa.array(keeps, pa.int64()),
            }
        )

    meta = ds.map_batches(enrich, batch_format="pyarrow").materialize()

    def lang_counts(src, stage):
        def partial(b: pa.Table) -> pa.Table:
            t = b.group_by("lang").aggregate([([], "count_all")])
            return pa.table(
                {
                    "lang": t["lang"],
                    "n_docs": pc.cast(t["count_all"], pa.int64()),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("lang", as_index=False)["n_docs"].sum()
            out.insert(0, "stage", stage)
            out["chk"] = 0
            return out.astype({"n_docs": "int64", "chk": "int64"})

        return coarse_group_reduce(
            src.map_batches(partial, batch_format="pyarrow"), "lang", merge
        )

    quality = meta.filter(expr="keep == 1")

    # exact dedup: min doc_id per text fingerprint (metadata-only rows)
    def dedup_group(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["fp", "doc_id"], kind="mergesort")
        return g.groupby("fp", as_index=False).head(1)

    deduped = coarse_group_reduce(quality, "fp", dedup_group)

    # per-lang release cap: md5(doc_id) bottom-20 (the q46/q47 rank)
    def cap_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            _rank=[md5_hex(str(i)) for i in df["doc_id"]]
        ).sort_values(["lang", "_rank", "doc_id"], kind="mergesort")
        return df.groupby("lang", as_index=False).head(CAP).drop(
            columns=["_rank"]
        )

    release = coarse_group_reduce(deduped, "lang", cap_group)

    def manifest(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang"):
            chk = 0
            for v in g["digest"]:
                chk ^= int(v)
            rows.append(("release", lang, len(g), chk))
        return pd.DataFrame(
            {
                "stage": pd.array([r[0] for r in rows], dtype="object"),
                "lang": pd.array([r[1] for r in rows], dtype="object"),
                "n_docs": pd.array([r[2] for r in rows], dtype="int64"),
                "chk": pd.array([r[3] for r in rows], dtype="int64"),
            }
        )

    manifest_ds = coarse_group_reduce(release, "lang", manifest)

    return (
        lang_counts(meta, "input")
        .union(lang_counts(quality, "quality"))
        .union(lang_counts(deduped, "dedup"))
        .union(manifest_ds)
    )


__all__ = [
    "q75_decontaminate",
    "q88_curate_corpus",
    "q200_release_funnel",
]


QUERIES = {
    "q75_decontaminate": q75_decontaminate,
    "q88_curate_corpus": q88_curate_corpus,
    "q200_release_funnel": q200_release_funnel,
}


ORACLE_SQL = {
    "q75_decontaminate": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, CAST(greatest(len(ts) - 4, 0) AS BIGINT)),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                        || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gram
          FROM toks
        ), bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0
        ), hits AS (
          SELECT dg.doc_id, count(*) AS n_hit
          FROM (SELECT DISTINCT doc_id, gram FROM g
                WHERE doc_id % 17 <> 0) dg
          JOIN bench b USING (gram)
          GROUP BY dg.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
               coalesce(h.n_hit, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
        WHERE d.doc_id % 17 <> 0
    """,
    "q88_curate_corpus": """
        WITH RECURSIVE toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        ), keep1 AS (
          SELECT d.doc_id, d.text, d.lang, d.n_chars
          FROM documents d JOIN toks USING (doc_id)
          WHERE len(ts) >= 5 AND d.doc_id % 17 <> 0
        ), dedup AS (
          SELECT doc_id, text, lang, n_chars FROM (
            SELECT *, row_number() OVER (
              PARTITION BY md5(coalesce(text, '')) ORDER BY doc_id) AS rn
            FROM keep1)
          WHERE rn = 1
        ), sh AS (
          -- near-dup stage: 5-char shingles of the exact-deduped set,
          -- brute-force Jaccard >= 0.8 pairs (the LSH path reproduces
          -- them exactly WHILE no band bucket exceeds max_bucket_size —
          -- which holds at both driver correctness scales; star-mode
          -- hot-bucket routing can drop post-verification edges on
          -- template-heavy corpora, see pipelines/curate.py), min-label
          -- components, keep the min-id representative per cluster
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g5
          FROM dedup
        ), nd_pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (len(list_intersect(a.g5, b.g5))::DOUBLE
                 / (len(a.g5) + len(b.g5) - len(list_intersect(a.g5, b.g5))))
                >= 0.8
        ), nd_edges AS (
          SELECT id_a AS a, id_b AS b FROM nd_pairs
          UNION ALL SELECT id_b, id_a FROM nd_pairs
        ), nd_reach(node, peer) AS (
          SELECT a, b FROM nd_edges
          UNION
          SELECT r.node, e.b FROM nd_reach r JOIN nd_edges e ON r.peer = e.a
        ), nd_removed AS (
          SELECT node FROM nd_reach GROUP BY node
          HAVING least(node, min(peer)) <> node
        ), neardedup AS (
          SELECT * FROM dedup
          WHERE doc_id NOT IN (SELECT node FROM nd_removed)
        ), g AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, CAST(greatest(len(ts) - 4, 0) AS BIGINT)),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                        || ' ' || ts[i+3] || ' ' || ts[i+4])) AS gram
          FROM toks
        ), bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0
        ), contaminated AS (
          SELECT DISTINCT g.doc_id
          FROM g JOIN bench USING (gram)
          WHERE g.doc_id % 17 <> 0
        ), clean AS (
          SELECT * FROM neardedup
          WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        ), assigned AS (
          SELECT lang, n_chars,
                 CASE WHEN p < 80 THEN 'train'
                      WHEN p < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM (
            SELECT lang, n_chars,
                   CAST('0x' || substr(
                     md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                     % 100 AS p
            FROM clean)
        )
        SELECT lang, split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM assigned GROUP BY 1, 2
    """,
    "q200_release_funnel": f"""
        -- the whole curation chain, stage by stage: quality gate →
        -- exact dedup (min id per text fp, the SAME masked md5 the Ray
        -- side computes) → per-lang md5 bottom-20 cap → XOR manifest
        WITH w AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'w:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t JOIN w
            ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        enriched AS (
          SELECT d.doc_id, coalesce(d.lang, '') AS lang,
                 CAST(md5_number_lower(coalesce(d.text, ''))
                      & 9223372036854775807 AS BIGINT) AS fp,
                 CAST(md5_number_lower(CAST(d.doc_id AS VARCHAR) || ':'
                        || coalesce(d.text, ''))
                      & 9223372036854775807 AS BIGINT) AS digest,
                 coalesce(s.score, 0) AS score
          FROM documents d LEFT JOIN s USING (doc_id)
        ),
        quality AS (SELECT * FROM enriched WHERE score > -180),
        dedup AS (
          SELECT * FROM quality
          QUALIFY row_number() OVER (
            PARTITION BY fp ORDER BY doc_id) = 1
        ),
        release AS (
          SELECT * FROM dedup
          QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
        )
        SELECT 'input' AS stage, lang, count(*) AS n_docs,
               CAST(0 AS BIGINT) AS chk
        FROM enriched GROUP BY 2
        UNION ALL
        SELECT 'quality', lang, count(*), CAST(0 AS BIGINT)
        FROM quality GROUP BY 2
        UNION ALL
        SELECT 'dedup', lang, count(*), CAST(0 AS BIGINT)
        FROM dedup GROUP BY 2
        UNION ALL
        SELECT 'release', lang, count(*), CAST(bit_xor(digest) AS BIGINT)
        FROM release GROUP BY 2
    """,
}
