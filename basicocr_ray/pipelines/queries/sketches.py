"""Mergeable sketches: HLL, CMS, KMV, Bloom, heavy hitters (G4 partial+final shape).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import count_terms
from basicocr_ray.stages.wide import make_ngram_items
from basicocr_ray.stages.wide import token_items

from ._shared import (
    _TOKS,
    _read,
)


def q19_distinct_langs(sf_dir: str):
    """DISTINCT one column (D-flavor; `Dataset.unique`)."""
    vals = _read(sf_dir, "documents", columns=["lang"]).unique("lang")
    return pd.DataFrame({"lang": sorted(vals)})


def q30_union_distinct(sf_dir: str):
    """Union + global distinct count (D/Set ops) as partial+final: each
    batch emits its LOCAL distinct keys tagged with a coarse group, the
    per-group pandas nunique is exact (groups partition the key space),
    and the counts sum — the shuffle carries deduped keys per batch
    instead of every row (`Dataset.unique` is the all-to-all the guide
    warns about; at fact scale local dedup shrinks it by the per-batch
    duplication factor)."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def local_distinct(b: pa.Table) -> pa.Table:
        u = pc.unique(b[b.column_names[0]])
        return pa.table(
            {
                "k": pc.cast(u, pa.int64()),
                "cg": pc.cast(
                    pc.bit_wise_and(pc.cast(u, pa.int64()), salts - 1),
                    pa.int32(),
                ),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        local_distinct, batch_format="pyarrow"
    )
    od = _read(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        local_distinct, batch_format="pyarrow"
    )

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(df["k"].nunique())]})

    parts = (
        li.union(od)
        .groupby("cg")
        .map_groups(count_distinct, batch_format="pandas")
    )
    n = int(parts.sum("n") or 0)
    return pd.DataFrame({"n": pd.Series([n], dtype="int64")})


def q45_heavy_hitters(sf_dir: str):
    """Heavy hitters via Count-Min sketch (the mergeable-sketch scale
    path): per-batch partial sketches merge driver-side (zero shuffle,
    HLL discipline), candidate tokens are the per-batch distincts whose
    CMS estimate clears the threshold (CMS only OVERcounts, so candidates
    ⊇ true heavies), and an exact count over candidates prunes false
    positives. Output = exact (token, cnt) with cnt ≥ threshold — the
    DuckDB twin is a plain HAVING."""
    import ray

    from basicocr_ray.core.sketches import CountMinSketch
    from basicocr_ray.stages.wide import count_terms, token_items

    THRESHOLD = 40
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sketch(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cms = CountMinSketch()
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update(token_items(t or ""))
        for tok, n in c.items():
            cms.add(tok, n)
        return pa.table({"sketch": pa.array([cms.serialize()], pa.large_binary())})

    merged = CountMinSketch()
    for row in collect_rows(ds.map_batches(sketch, batch_format="pyarrow")):
        merged.merge(CountMinSketch.deserialize(row["sketch"]))
    cms_ref = ray.put(merged.serialize())

    # candidates: per-batch distinct tokens clearing the CMS bound
    def candidates(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cms = CountMinSketch.deserialize(_ray.get(cms_ref))
        seen = set()
        for t in batch["text"].to_pylist():
            seen.update(token_items(t or ""))
        out = sorted(tok for tok in seen if cms.estimate(tok) >= THRESHOLD)
        return pa.table({"token": pa.array(out, pa.string())})

    cand = set()
    for row in collect_rows(ds.map_batches(candidates, batch_format="pyarrow")):
        cand.add(row["token"])
    cand_ref = ray.put(frozenset(cand))

    # exact verification pass restricted to candidates only
    def cand_items(text: str) -> list[str]:
        import ray as _ray

        cs = _ray.get(cand_ref)
        return [t for t in token_items(text) if t in cs]

    counts = count_terms(ds, "text", cand_items, "token")
    out = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["cnt"], THRESHOLD)),
        batch_format="pyarrow",
    )
    return out


def q117_hll_registers(sf_dir: str):
    """HyperLogLog with an AUDITABLE sketch (the q109 discipline applied
    to distinct-counting): per event type, the p=6 register table built
    from the md5 lower-64 hash — reg = h≫58, rho = leading-zeros(h mod
    2⁵⁸)+1 — so the oracle reconstructs every register EXACTLY
    (md5_number_lower + bin() bit-length; no float estimate in the
    hash). Each batch emits at most |types|·64 partial register maxima
    (the sketch IS the shuffle payload — user ids never move), a bounded
    groupby max-merges them, and the exact distinct count rides along
    per type as the audit column the estimate would be judged against."""
    from ray.data.aggregate import Max, Sum

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch(batch: pa.Table) -> pa.Table:
        best: dict[tuple[str, int], int] = {}
        for et, uid in zip(
            batch["event_type"].to_pylist(), batch["user_id"].to_pylist()
        ):
            h = _md5_low64(str(uid))
            reg = h >> 58
            w = h & ((1 << 58) - 1)
            rho = 59 if w == 0 else 58 - w.bit_length() + 1
            key = (et, reg)
            if rho > best.get(key, 0):
                best[key] = rho
        rows = sorted(best.items())
        return pa.table(
            {
                "event_type": pa.array([k[0] for k, _ in rows], pa.string()),
                "reg": pa.array([k[1] for k, _ in rows], pa.int64()),
                "rho": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    regs = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby(["event_type", "reg"])  # bounded: |types| × 64 keys
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )

    # exact distinct audit column: per-batch distinct pairs → coarse-group
    # dedup (same (type,user) → same group) → partial counts → tiny Sum
    def pair_distinct(batch: pa.Table) -> pa.Table:
        seen = {
            (et, uid)
            for et, uid in zip(
                batch["event_type"].to_pylist(),
                batch["user_id"].to_pylist(),
            )
        }
        rows = sorted(seen)
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.drop_duplicates()
            .groupby("event_type", as_index=False)
            .agg(n=("user_id", "size"))
        )
        return out.astype({"n": "int64"})

    exact = (
        coarse_group_reduce(
            ds.map_batches(pair_distinct, batch_format="pyarrow"),
            ["event_type", "user_id"],
            count_group,
        )
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="exact_distinct"))
        .to_pandas()
    )
    exact["exact_distinct"] = exact["exact_distinct"].astype("int64")

    # both relations are bounded (|types|×64 and |types|) — driver merge
    df = regs.merge(exact, on="event_type", how="inner")
    return df.astype({"reg": "int64", "rho": "int64"})


def q122_cms_audit(sf_dir: str):
    """Count-Min sketch ERROR AUDIT (the q109/q117 discipline applied to
    q45's sketch): a deliberately tiny CMS (d=2 rows × w=8 counters, so
    collisions actually happen) is built from per-batch partials on a
    BOUNDED key space (16 cells ride the shuffle, tokens never do),
    broadcast as 16 integers, and every vocabulary token gets
    (exact_cnt, cms_est) side by side — cms_est ≥ exact_cnt always
    (CMS only overcounts), and the gap IS the measurement that sizes w
    before a real run. Cell hash = md5 lower-64 of 'r:token' mod 8,
    reconstructed exactly by the oracle."""
    import ray
    from ray.data.aggregate import Sum

    def _cell(r: int, tok: str) -> int:
        return _md5_low64(f"{r}:{tok}") % 8

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cms_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            for tok in token_items(t or ""):
                for r in (0, 1):
                    c[(r, _cell(r, tok))] += 1
        rows = sorted(c.items())
        return pa.table(
            {
                "r": pa.array([k[0] for k, _ in rows], pa.int64()),
                "col": pa.array([k[1] for k, _ in rows], pa.int64()),
                "cnt": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    counters = (
        ds.map_batches(cms_partial, batch_format="pyarrow")
        .groupby(["r", "col"])  # bounded: 16 keys
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    cms = {
        (int(r), int(c)): int(n)
        for r, c, n in zip(counters["r"], counters["col"], counters["cnt"])
    }
    cms_ref = ray.put(cms)

    exact = count_terms(ds, "text", token_items, "token")

    def attach(batch: pa.Table) -> pa.Table:
        import ray as _ray

        table = _ray.get(cms_ref)
        toks = batch["token"].to_pylist()
        est = [
            min(table.get((r, _cell(r, t)), 0) for r in (0, 1))
            for t in toks
        ]
        return pa.table(
            {
                "token": batch["token"],
                "exact_cnt": batch["cnt"],
                "cms_est": pa.array(est, pa.int64()),
            }
        )

    return exact.map_batches(attach, batch_format="pyarrow")


def q173_kmv_sketch_ops(sf_dir: str):
    """KMV/THETA-SKETCH SET OPERATIONS (Beyer et al. 2007 / the Theta
    sketch) with fully auditable integer evidence — the distinct-count
    sketch family's answer to set algebra that HLL can't do: populations
    A = click users, B = view users; each sketch is the k = 64 SMALLEST
    md5-low-63 hashes of the distinct user ids. θ_X = the k-th minimum;
    the union sketch is the k smallest of A ∪ B (⊆ the two k-min sets —
    the per-batch partial k-mins compose exactly because every global
    k-min lives in some batch's local k-min); n_common counts union-
    sketch members present in BOTH sides (the Jaccard numerator — valid
    because h ≤ θ_U and h ∈ X ⇒ h is in X's k-min set). Exact distinct
    audits (|A|, |B|, |A∩B|) ride along via a presence-bitmask reduce.
    Output is LONG FORM (metric, value BIGINT) — no float ever hashes.
    Shuffles carry ≤ 2·64 sketch rows per batch + per-group count
    partials; user ids never move after the batch boundary."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 64
    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def sketch_partial(b: pa.Table) -> pa.Table:
        pops: dict[str, set] = {"a": set(), "b": set()}
        for et, uid in zip(
            b["event_type"].to_pylist(), b["user_id"].to_pylist()
        ):
            if et == "click":
                pops["a"].add(uid)
            elif et == "view":
                pops["b"].add(uid)
        out_p, out_h = [], []
        for p, uids in pops.items():
            hs = sorted(_md5_low64(str(u)) & MASK for u in uids)[:K]
            out_p.extend([p] * len(hs))
            out_h.extend(hs)
        return pa.table(
            {
                "pop": pa.array(out_p, pa.string()),
                "h": pa.array(out_h, pa.int64()),
            }
        )

    def sketch_final(df: pd.DataFrame) -> pd.DataFrame:
        ka = sorted(set(df[df["pop"] == "a"]["h"]))[:K]
        kb = sorted(set(df[df["pop"] == "b"]["h"]))[:K]
        ku = sorted(set(ka) | set(kb))[:K]
        sa, sb = set(ka), set(kb)
        n_common = sum(1 for h in ku if h in sa and h in sb)
        rows = [
            ("theta_a", ka[-1] if ka else 0),
            ("theta_b", kb[-1] if kb else 0),
            ("theta_union", ku[-1] if ku else 0),
            ("n_common", n_common),
        ]
        return pd.DataFrame(
            {
                "metric": pd.array([r[0] for r in rows], dtype="object"),
                "value": pd.array([r[1] for r in rows], dtype="int64"),
            }
        )

    # the into-final relation is bounded: ≤ 2·64 rows per input batch
    sketch = (
        ds.map_batches(sketch_partial, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: sketch_final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )

    # exact audits: distinct (user, pop) presence bitmask → counts
    def presence_partial(b: pa.Table) -> pa.Table:
        seen: dict[int, int] = {}
        for et, uid in zip(
            b["event_type"].to_pylist(), b["user_id"].to_pylist()
        ):
            if et == "click":
                seen[uid] = seen.get(uid, 0) | 1
            elif et == "view":
                seen[uid] = seen.get(uid, 0) | 2
        items = sorted(seen.items())
        return pa.table(
            {
                "user_id": pa.array([u for u, _ in items], pa.int64()),
                "mask": pa.array([m for _, m in items], pa.int64()),
            }
        )

    def presence_counts(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id")["mask"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy()))
        )
        rows = [
            ("exact_a", int((m.to_numpy() & 1 > 0).sum())),
            ("exact_b", int((m.to_numpy() & 2 > 0).sum())),
            ("exact_inter", int((m.to_numpy() == 3).sum())),
        ]
        return pd.DataFrame(
            {
                "metric": pd.array([r[0] for r in rows], dtype="object"),
                "value": pd.array([r[1] for r in rows], dtype="int64"),
            }
        )

    from ray.data.aggregate import Sum

    audits = (
        coarse_group_reduce(
            ds.map_batches(presence_partial, batch_format="pyarrow"),
            "user_id",
            presence_counts,
        )
        .groupby("metric")  # bounded: 3 keys
        .aggregate(Sum("value", alias_name="value"))
    )
    return sketch.union(audits)


def q179_merkle_bucket_diff(sf_dir: str):
    """MERKLE-STYLE RANGE-DIGEST snapshot diff — the rsync/anti-entropy
    primitive that finds WHICH id-range buckets changed between two
    corpus snapshots without moving any row data: old = documents,
    new = a deterministic successor snapshot (doc_id ≡ 0 mod 101
    deleted, else ≡ 0 mod 97 rewritten with a ' v2' suffix). Per
    64-id bucket and side: row count + the q165 order-insensitive
    digest (XOR of md5-low-63 over id:text — commutative, so the
    reduce is partition/retry-invariant). BOTH sides are derived in
    the SAME batch pass (the new snapshot is a function of the old
    row), partials carry one row per (batch, bucket), and only
    buckets whose (n, chk) differ are emitted — the sync worklist."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            t = t if t is not None else ""
            bucket = did // 64
            s = acc.setdefault(bucket, [0, 0, 0, 0])
            s[0] += 1
            s[1] ^= _md5_low64(f"{did}:{t}") & MASK
            if did % 101 == 0:
                continue  # deleted in the new snapshot
            t_new = t + " v2" if did % 97 == 0 else t
            s[2] += 1
            s[3] ^= _md5_low64(f"{did}:{t_new}") & MASK
        ks = sorted(acc)
        return pa.table(
            {
                "bucket": pa.array(ks, pa.int64()),
                "n_old": pa.array([acc[k][0] for k in ks], pa.int64()),
                "chk_old": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_new": pa.array([acc[k][2] for k in ks], pa.int64()),
                "chk_new": pa.array([acc[k][3] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for bucket, g in df.groupby("bucket"):
            chk_o = chk_n = 0
            for v in g["chk_old"]:
                chk_o ^= int(v)
            for v in g["chk_new"]:
                chk_n ^= int(v)
            n_o, n_n = int(g["n_old"].sum()), int(g["n_new"].sum())
            if n_o != n_n or chk_o != chk_n:
                rows.append((int(bucket), n_o, n_n, chk_o, chk_n))
        return pd.DataFrame(
            {
                "bucket": pd.array([r[0] for r in rows], dtype="int64"),
                "n_old": pd.array([r[1] for r in rows], dtype="int64"),
                "n_new": pd.array([r[2] for r in rows], dtype="int64"),
                "chk_old": pd.array([r[3] for r in rows], dtype="int64"),
                "chk_new": pd.array([r[4] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "bucket", final
    )


def q183_feature_hash_collisions(sf_dir: str):
    """FEATURE-HASHING collision audit (the hashing-trick sanity check
    before training on hashed n-grams): the distinct unigram ∪ bigram
    feature space — fastText's word+wordNgrams features — hashes into
    B = 64 buckets via md5-low-64 mod B; output the occupancy
    HISTOGRAM — (k distinct features in a bucket, number of such
    buckets) — the whole birthday-collision picture in ≤ a few dozen
    integer rows. Shape: count_terms gives the distinct feature set
    (its counts discarded — the keys are the point), bucket ids are a
    vectorized hash pass, the per-bucket distinct count is a bounded
    64-key aggregate, the histogram a second bounded aggregate."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.wide import count_terms, make_ngram_items

    B = 64

    def features(text: str) -> list:
        toks = token_items(text)
        return toks + make_ngram_items(2)(text)

    ds = _read(sf_dir, "documents", columns=["text"])
    vocab = count_terms(ds, "text", features, "token")

    def bucketize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": pa.array(
                    [
                        _md5_low64(t) % B
                        for t in b["token"].to_pylist()
                    ],
                    pa.int64(),
                )
            }
        )

    per_bucket = (
        vocab.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")  # bounded: ≤ 64 keys
        .aggregate(Count(alias_name="k"))
    )
    hist = (
        per_bucket.map_batches(
            lambda b: pa.table(
                {"k": pc.cast(b["k"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("k")  # bounded: ≤ max occupancy
        .aggregate(Count(alias_name="n_buckets"))
    )
    return hist.map_batches(
        lambda b: pa.table(
            {
                "k": pc.cast(b["k"], pa.int64()),
                "n_buckets": pc.cast(b["n_buckets"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


__all__ = [
    "q19_distinct_langs",
    "q30_union_distinct",
    "q45_heavy_hitters",
    "q117_hll_registers",
    "q122_cms_audit",
    "q173_kmv_sketch_ops",
    "q179_merkle_bucket_diff",
    "q183_feature_hash_collisions",
]


QUERIES = {
    "q19_distinct_langs": q19_distinct_langs,
    "q30_union_distinct": q30_union_distinct,
    "q45_heavy_hitters": q45_heavy_hitters,
    "q117_hll_registers": q117_hll_registers,
    "q122_cms_audit": q122_cms_audit,
    "q173_kmv_sketch_ops": q173_kmv_sketch_ops,
    "q179_merkle_bucket_diff": q179_merkle_bucket_diff,
    "q183_feature_hash_collisions": q183_feature_hash_collisions,
}


ORACLE_SQL = {
    "q19_distinct_langs": "SELECT DISTINCT lang FROM documents",
    "q30_union_distinct": """
        SELECT count(DISTINCT k) AS n FROM (
          SELECT l_orderkey AS k FROM lineitem
          UNION ALL SELECT o_orderkey AS k FROM orders
        )
    """,
    "q45_heavy_hitters": f"""
        SELECT token, count(*) AS cnt FROM (
          SELECT unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ) GROUP BY token HAVING count(*) >= 40
    """,
    "q117_hll_registers": """
        -- md5-HLL p=6: reg = h >> 58, rho = lz(h mod 2^58) + 1 — the
        -- register table is exact, the estimate is auditable against
        -- the exact distinct column
        WITH h AS (
          SELECT event_type,
                 md5_number_lower(CAST(user_id AS VARCHAR)) AS h64
          FROM events
        ),
        parts AS (
          SELECT event_type,
                 CAST(h64 >> 58 AS BIGINT) AS reg,
                 h64 % (1::UBIGINT << 58) AS w
          FROM h
        ),
        rr AS (
          SELECT event_type, reg,
                 CAST(CASE WHEN w = 0 THEN 59
                      ELSE 58 - length(bin(w)) + 1 END AS BIGINT) AS rho
          FROM parts
        ),
        regs AS (
          SELECT event_type, reg, max(rho) AS rho FROM rr GROUP BY 1, 2
        ),
        ex AS (
          SELECT event_type,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
          FROM events GROUP BY 1
        )
        SELECT r.event_type, r.reg, r.rho, ex.exact_distinct
        FROM regs r JOIN ex ON r.event_type = ex.event_type
    """,
    "q122_cms_audit": f"""
        WITH toks AS (
          SELECT unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        cells AS (
          SELECT t.r,
                 CAST(md5_number_lower(
                   CAST(t.r AS VARCHAR) || ':' || token
                 ) % 8 AS BIGINT) AS col,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM toks CROSS JOIN range(2) t(r)
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM toks GROUP BY 1
        ),
        tok_cells AS (
          SELECT e.token, e.exact_cnt, t.r,
                 CAST(md5_number_lower(
                   CAST(t.r AS VARCHAR) || ':' || e.token
                 ) % 8 AS BIGINT) AS col
          FROM exact e CROSS JOIN range(2) t(r)
        )
        SELECT tc.token, tc.exact_cnt,
               CAST(min(c.cnt) AS BIGINT) AS cms_est
        FROM tok_cells tc
        JOIN cells c ON c.r = tc.r AND c.col = tc.col
        GROUP BY 1, 2
    """,
    "q173_kmv_sketch_ops": """
        -- KMV/theta sketches rebuilt exactly: k=64 smallest md5-low-63
        -- of the distinct user hashes per population, union = k smallest
        -- of the merged hash set, n_common = union members in both
        WITH a AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'click'),
        b AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = 'view'),
        ha AS (SELECT CAST(md5_number_lower(CAST(user_id AS VARCHAR))
                           & 9223372036854775807 AS BIGINT) AS h FROM a),
        hb AS (SELECT CAST(md5_number_lower(CAST(user_id AS VARCHAR))
                           & 9223372036854775807 AS BIGINT) AS h FROM b),
        ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
        kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
        ku AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
               ORDER BY h LIMIT 64)
        SELECT 'theta_a' AS metric, max(h) AS value FROM ka
        UNION ALL SELECT 'theta_b', max(h) FROM kb
        UNION ALL SELECT 'theta_union', max(h) FROM ku
        UNION ALL SELECT 'n_common', count(*) FROM ku
          WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
        UNION ALL SELECT 'exact_a', count(*) FROM a
        UNION ALL SELECT 'exact_b', count(*) FROM b
        UNION ALL SELECT 'exact_inter', count(*) FROM
          (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    """,
    "q179_merkle_bucket_diff": """
        -- range-digest diff: the new snapshot is a function of the old
        -- row (mod-101 deletes, mod-97 ' v2' rewrites); only buckets
        -- whose (count, XOR digest) changed are emitted
        WITH old AS (
          SELECT doc_id, coalesce(text, '') AS text FROM documents
        ),
        new AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 97 = 0 THEN text || ' v2'
                      ELSE text END AS text
          FROM old WHERE doc_id % 101 <> 0
        ),
        o AS (
          SELECT doc_id // 64 AS bucket, count(*) AS n_old,
                 bit_xor(CAST(
                   md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || text)
                   & 9223372036854775807 AS BIGINT)) AS chk_old
          FROM old GROUP BY 1
        ),
        n AS (
          SELECT doc_id // 64 AS bucket, count(*) AS n_new,
                 bit_xor(CAST(
                   md5_number_lower(CAST(doc_id AS VARCHAR) || ':' || text)
                   & 9223372036854775807 AS BIGINT)) AS chk_new
          FROM new GROUP BY 1
        )
        SELECT o.bucket, o.n_old,
               coalesce(n.n_new, 0) AS n_new,
               o.chk_old, coalesce(n.chk_new, 0) AS chk_new
        FROM o LEFT JOIN n USING (bucket)
        WHERE o.n_old <> coalesce(n.n_new, 0)
           OR o.chk_old <> coalesce(n.chk_new, 0)
    """,
    "q183_feature_hash_collisions": """
        -- hashing-trick occupancy histogram over the distinct
        -- unigram ∪ bigram feature space: bucket = md5-low-64 mod 64
        WITH base AS (
          SELECT regexp_split_to_array(lower(text), '\\s+') AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        vocab AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(toks) AS tok FROM base
            UNION ALL
            SELECT unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) FROM base
          ) WHERE tok <> ''
        ),
        pb AS (
          SELECT CAST(md5_number_lower(tok) % 64 AS BIGINT) AS bucket,
                 count(*) AS k
          FROM vocab GROUP BY 1
        )
        SELECT k, count(*) AS n_buckets FROM pb GROUP BY 1
    """,
}
