"""Samplers, splits, packing, mixtures (SURVEY §2.6 T1/T2; LLM-data brief).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import math
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import token_items

from ._shared import (
    _TOKS,
    _read,
    _round_half_up,
)


def q46_bottomk_sample(sf_dir: str):
    """Deterministic distributed sampling: exact global bottom-k by
    md5(doc_id) — partition-invariant, retry-invariant, and reproducible
    in SQL (ORDER BY md5(id) LIMIT k), unlike RNG samplers whose output
    depends on execution layout."""
    from basicocr_ray.stages.sample import bottomk_sample

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    out = bottomk_sample(ds, "doc_id", k=50)
    return out.map_batches(
        lambda b: pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64())}),
        batch_format="pyarrow",
    )


def q47_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling: exact bottom-3 docs per language
    by md5(doc_id) (`stages.sample.stratified_bottomk`) — per-group quota
    sampling with partition/retry invariance, mirrored by a window-ranked
    SQL twin."""
    from basicocr_ray.stages.sample import stratified_bottomk

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_bottomk(ds, "lang", "doc_id", k=3)


def q55_global_rank(sf_dir: str):
    """Distributed global row numbering under the deterministic shuffle
    order (T2's scale path made driver-checkable): `global_rank` scatters
    by rank-prefix buckets, reduces metadata-sized per-bucket counts into
    an exclusive prefix (O(S) driver state), and numbers each bucket
    locally — exactly ROW_NUMBER() OVER (ORDER BY md5('7:'||id), id)-1
    with no global sort and no data on the driver."""
    from basicocr_ray.stages.sample import global_rank

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    out = global_rank(ds, "doc_id", seed=7)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "pos": pc.cast(b["pos"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q56_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES): 50 docs
    drawn ∝ n_chars without replacement via the exponential race
    key = -ln(u)/w with u a deterministic md5-derived uniform
    (`stages.sample.weighted_bottomk`) — per-batch local bottom-k, tiny
    global sort, partition/retry/cluster-size-invariant, and the u/key
    expressions reproduce verbatim in the SQL twin (T1's weighted flavor,
    the quality-weighted corpus-sampling primitive)."""
    from basicocr_ray.stages.sample import weighted_bottomk

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = weighted_bottomk(ds, "doc_id", "n_chars", k=50)
    return out.select_columns(["doc_id", "n_chars"])


def q81_hash_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split (md5-bucket
    assignment, `stages.sample.hash_split`) rolled up per (lang, split).
    The assignment is a stateless per-batch map — the same doc lands in
    the same split on any partitioning, any retry, any corpus growth —
    and the rollup is the house partial+final."""
    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.sample import hash_split

    salts = _coarse_salts(None)
    ds = hash_split(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]),
        "doc_id",
    )

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
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q100_sequence_packing(sf_dir: str):
    """Token-budget SEQUENCE PACKING — the step between a curated corpus
    and a training run: lay documents end-to-end in a deterministic
    global order and cut every 4096 tokens, reporting per-bin document
    and token counts. The order is the house md5 shuffle rank (q55), the
    layout cursor is `stages.sample.global_prefix_sum` — a distributed
    EXCLUSIVE running sum whose cross-bucket carry is an O(S) driver
    prefix over bucket totals (metadata), never a global sort. bin =
    prefix // 4096; all integers → exact hash. Partition/retry/cluster-
    size-invariant, so a resumed packing run reproduces byte-identical
    shards."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.sample import global_prefix_sum

    BIN = 4096
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tokcount(batch: pa.Table) -> pa.Table:
        n = [len(token_items(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(n, pa.int64()),
            }
        )

    with_prefix = global_prefix_sum(
        ds.map_batches(tokcount, batch_format="pyarrow"),
        "doc_id", "n_tok", seed=42,
    )

    def binify(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin_id": pc.divide(b["prefix"], BIN),
                "n_tok": b["n_tok"],
            }
        )

    df = (
        with_prefix.map_batches(binify, batch_format="pyarrow")
        .groupby("bin_id")
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_tok", alias_name="n_tokens")
        )
        .to_pandas()
    )
    df["bin_id"] = df["bin_id"].astype("int64")
    df["n_docs"] = df["n_docs"].astype("int64")
    df["n_tokens"] = df["n_tokens"].astype("int64")
    return df


def q107_temperature_mix_sample(sf_dir: str):
    """Temperature-weighted corpus MIXING (the mBERT/XLM α=0.5 sampling
    actually executed, not just the weights of q94): per-lang quota
    k_l = round(share_l·M) with share ∝ sqrt(n_l/N), then a DETERMINISTIC
    per-lang bottom-k_l by md5(doc_id) — partition/retry-invariant and
    SQL-reproducible (the q46/q47 sampler discipline with per-group
    VARIABLE k). The quota map is bounded by #langs and broadcasts; the
    sample is one lang-keyed group pass. Output: the sampled rows."""
    from ray.data.aggregate import Count

    from basicocr_ray.core.textstats import md5_hex

    M = 100
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    cnt = (
        ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    )  # ≤ #langs rows — metadata
    n_total = int(cnt["n"].sum())
    w = np.sqrt(cnt["n"].to_numpy(dtype=np.float64) / float(n_total))
    shares = [_round_half_up(x / float(w.sum()), 6) for x in w]
    k_of = {
        lang: int(math.floor(s * M + 0.5))
        for lang, s in zip(cnt["lang"], shares)
    }

    def head_per_lang(df: pd.DataFrame) -> pd.DataFrame:
        k = k_of.get(df["lang"].iloc[0], 0)
        df = df.sort_values(["_rk", "doc_id"], kind="mergesort").head(k)
        return df[["doc_id", "lang"]].astype({"doc_id": "int64"})

    k_max = max(k_of.values(), default=0)

    def add_rank_prune(df: pd.DataFrame) -> pd.DataFrame:
        # local prune BEFORE the lang shuffle (the q46/q47 bottom-k
        # discipline): each batch contributes at most k_max candidates
        # per lang, so a group carries ≤ k_max×blocks rows — never a
        # whole language of a 100-TB corpus
        df = df.assign(_rk=[md5_hex(str(i)) for i in df["doc_id"]])
        df = df.sort_values(["_rk", "doc_id"], kind="mergesort")
        return df.groupby("lang", as_index=False).head(k_max)

    return (
        ds.map_batches(add_rank_prune, batch_format="pandas")
        .groupby("lang")  # bounded cardinality (#langs)
        .map_groups(head_per_lang, batch_format="pandas")
    )


def q113_chunk_windows(sf_dir: str):
    """Overlapping CONTEXT-WINDOW chunking (the RAG/embedding prep step:
    split every document into 32-word windows with stride 24, keeping
    provenance): a pure flat-map expansion — each input row fans out to
    its chunk rows inside one map_batches, zero shuffle, so the op
    streams at any scale. Chunk identity is pinned by md5(chunk text);
    the final (doc_id, chunk_idx) relation carries exact integers +
    hashes only. Short docs yield their single (possibly sub-width)
    chunk; the tail chunk is kept IF it adds new words (start < n)."""
    W, S = 32, 24
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(b: pa.Table) -> pa.Table:
        ids, idxs, nws, fps = [], [], [], []
        for did, text in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
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
                fps.append(md5_hex(" ".join(piece)))
                ci += 1
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_words": pa.array(nws, pa.int64()),
                "fp": pa.array(fps, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


def q120_epoch_upsample(sf_dir: str):
    """Data-mixing UPSAMPLING (the per-source epoch factors of the
    Llama/Gopher training recipes): each language gets a deterministic
    integer repeat factor n = 1 + ascii(lang[0]) % 3 and every doc fans
    out to (doc_id, lang, copy_idx 1..n) — a pure vectorized flat-map
    (kernel single-sourced in `stages/sample.py:repeat_with_copy_idx`,
    shared with the `epoch_upsample` spec op), ZERO shuffle: upsampling
    is the one corpus-growing operator that never needs an exchange,
    the copies are born partitioned exactly like their source rows."""
    from basicocr_ray.stages.sample import repeat_with_copy_idx

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def fan_out(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        n = np.array([1 + (ord(l[0]) % 3) for l in langs], dtype=np.int64)
        return repeat_with_copy_idx(batch, n)

    return ds.map_batches(fan_out, batch_format="pyarrow")


def q149_negative_samples(sf_dir: str):
    """Deterministic NEGATIVE SAMPLING for contrastive training-pair
    prep (the in-batch-negatives data layout, made partition/retry/
    epoch-invariant): every doc gets k=2 pseudo-random negatives — the
    docs sitting at rank (pos + j·173) mod N under the md5 global order
    (`global_rank`: no global sort, O(S) driver state). The rank→doc
    resolution is ONE bucketed int join of the shifted anchors against
    the rank relation; accidental self-pairs are excluded on both
    sides. The same shift on the same corpus always yields the same
    pairs — the reproducibility contract sampled negatives need."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.sample import global_rank

    K, STRIDE = 2, 173
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    N = ds.count()

    ranked = global_rank(ds, "doc_id", seed=7).map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "pos": pc.cast(b["pos"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: anchors + join right side

    def anchors(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = b["pos"].to_numpy(zero_copy_only=False)
        out_id, out_j, out_np = [], [], []
        for j in range(1, K + 1):
            out_id.append(ids)
            out_j.append(np.full(len(ids), j, dtype=np.int64))
            out_np.append((pos + j * STRIDE) % N)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "j": pa.array(np.concatenate(out_j), pa.int64()),
                "np": pa.array(np.concatenate(out_np), pa.int64()),
            }
        )

    right = ranked.map_batches(
        lambda b: pa.table({"np": b["pos"], "neg_id": b["doc_id"]}),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        ranked.map_batches(anchors, batch_format="pyarrow"),
        right, "np", ["doc_id", "j"], ["neg_id"],
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "j": b["j"],
                "neg_id": b["neg_id"],
            }
        ).filter(pc.not_equal(b["doc_id"], b["neg_id"])),
        batch_format="pyarrow",
    )


def q160_token_budget_mix(sf_dir: str):
    """MIXTURE CONSTRUCTION under a per-source token budget — the data-
    mixing step that assembles a training corpus from weighted sources:
    docs are taken per source in the deterministic md5 shuffle order
    until each source's token budget (800) is exhausted (the crossing
    doc is included: selected ⇔ the source's EXCLUSIVE running token
    total before the doc is still under budget). Runs on the new
    `grouped_prefix_sum` primitive — per-(source, rank-bucket) totals
    reduce to O(G·S) driver metadata, buckets cumsum locally — so no
    per-source global sort and no driver data path. Token counts ride
    the exchange; text is dropped at the read."""
    from basicocr_ray.stages.sample import grouped_prefix_sum

    BUDGET = 800

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def count_tokens(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "source": pa.array(
                    [s if s is not None else ""
                     for s in b["source"].to_pylist()],
                    pa.string(),
                ),
                "n_tokens": pa.array(
                    [len(token_items(t or ""))
                     for t in b["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    pref = grouped_prefix_sum(
        counted, "source", "doc_id", "n_tokens", seed=42,
        out_column="prefix",
    )

    def under_budget(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b["prefix"], BUDGET))

    return pref.map_batches(under_budget, batch_format="pyarrow")


def q175_neyman_sample(sf_dir: str):
    """NEYMAN-ALLOCATED stratified sampling (optimal allocation, Neyman
    1934): n = 100 sample seats split across language strata
    ∝ N_h·σ_h, then drawn deterministically. Every step is integer- or
    IEEE-exact in both engines: N_h·σ_h = √(N_h·Σx² − (Σx)²) of the
    n_chars moments (the radicand is an exact BIGINT < 2⁵³, so the
    DOUBLE √ is the same correctly-rounded value everywhere; +1
    regularizer keeps a zero-variance stratum allocatable), seats by
    LARGEST-REMAINDER apportionment (integer quotient/remainder,
    remainder-desc/lang-asc tie ladder), rows by the house md5 bottom-k
    within each stratum (`stages.sample.stratified_bottomk_alloc`).
    The stratum-moment relation is strata-sized — reading it on the
    driver is bounded by definition; corpus rows never centralize."""
    from basicocr_ray.stages.sample import stratified_bottomk_alloc
    from basicocr_ray.stages.wide import coarse_group_reduce

    N_TOTAL = 100
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def moments_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "x": np.asarray(b["n_chars"].to_pylist(), dtype=np.int64),
            }
        )
        df["xx"] = df["x"] * df["x"]
        out = df.groupby("lang", as_index=False).agg(
            nh=("x", "size"), sx=("x", "sum"), sxx=("xx", "sum")
        )
        return pa.Table.from_pandas(
            out.astype({"nh": "int64", "sx": "int64", "sxx": "int64"}),
            preserve_index=False,
        )

    def moments_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        return out.astype({"nh": "int64", "sx": "int64", "sxx": "int64"})

    mom = coarse_group_reduce(
        ds.map_batches(moments_partial, batch_format="pyarrow"),
        "lang",
        moments_final,
    ).to_pandas()  # strata-sized: bounded by the number of languages

    mom = mom.sort_values("lang").reset_index(drop=True)
    rad = (mom["nh"] * mom["sxx"] - mom["sx"] * mom["sx"]).astype("int64")
    wh = np.floor(np.sqrt(rad.to_numpy().astype(np.float64))).astype(
        np.int64
    ) + 1
    W = int(wh.sum())
    k0 = (N_TOTAL * wh) // W
    rem = (N_TOTAL * wh) % W
    leftover = N_TOTAL - int(k0.sum())
    order = (
        pd.DataFrame({"lang": mom["lang"], "rem": rem})
        .sort_values(["rem", "lang"], ascending=[False, True],
                     kind="mergesort")
        .index
    )
    kh = k0.copy()
    for pos in order[:leftover]:
        kh[pos] += 1
    alloc = {
        str(lang): int(k)
        for lang, k in zip(mom["lang"], kh)
    }

    sampled = stratified_bottomk_alloc(ds, "lang", "doc_id", alloc)

    def attach_kh(b: pa.Table) -> pa.Table:
        ks = [alloc.get(v, 0) for v in b["lang"].to_pylist()]
        return b.append_column("kh", pa.array(ks, pa.int64()))

    return sampled.map_batches(attach_kh, batch_format="pyarrow")


def q191_weighted_draws(sf_dir: str):
    """WEIGHTED SAMPLING WITH REPLACEMENT as a distributed INVERSE-CDF
    lookup (q56's A-ES bottom-k is the without-replacement sibling):
    100 deterministic draws u_t = md5-low-63('draw:t') mod W land in
    the id-ordered cumulative-weight line; draw t selects the row whose
    [prefix, prefix + w) interval contains u_t. Shape (the q185
    discipline): per-id-bucket weight totals → driver exclusive bucket
    offsets (metadata) → each draw routes to exactly ONE bucket by a
    driver-side searchsorted over the bucket starts → the bucket task
    resolves its draws with a local cumsum + searchsorted. No
    corpus-sized relation ever centralizes; the draw list is
    query-sized by definition."""
    from basicocr_ray.core.collect import collect_rows

    T = 100
    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def add_rb(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "wt": pc.cast(b["n_chars"], pa.int64()),
                "rb": pc.cast(
                    pc.divide(pc.cast(b["doc_id"], pa.int64()), 64),
                    pa.int64(),
                ),
            }
        )

    body = ds.map_batches(add_rb, batch_format="pyarrow").materialize()

    def bucket_totals(b: pa.Table) -> pa.Table:
        t = b.group_by("rb").aggregate([("wt", "sum")])
        return t.rename_columns(["rb", "v"])

    totals: dict[int, int] = {}
    for row in collect_rows(
        body.map_batches(bucket_totals, batch_format="pyarrow")
    ):
        totals[int(row["rb"])] = totals.get(int(row["rb"]), 0) + int(row["v"])
    rbs = sorted(totals)
    starts = np.cumsum([0] + [totals[rb] for rb in rbs[:-1]])
    offsets = dict(zip(rbs, (int(s) for s in starts)))
    W = sum(totals.values())

    draws = [
        (t, (_md5_low64(f"draw:{t}") & MASK) % W) for t in range(T)
    ]
    per_bucket: dict[int, list] = {}
    for t, u in draws:
        i = int(np.searchsorted(starts, u, side="right")) - 1
        per_bucket.setdefault(rbs[i], []).append((t, u))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        rb = int(df["rb"].iloc[0])
        mine = per_bucket.get(rb, [])
        if not mine:
            return pd.DataFrame(
                {
                    "draw_id": pd.array([], dtype="int64"),
                    "doc_id": pd.array([], dtype="int64"),
                    "u": pd.array([], dtype="int64"),
                }
            )
        df = df.sort_values("doc_id", kind="mergesort")
        w = df["wt"].to_numpy(dtype=np.int64)
        pre = offsets[rb] + np.cumsum(w) - w
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        out_t, out_d, out_u = [], [], []
        for t, u in mine:
            i = int(np.searchsorted(pre, u, side="right")) - 1
            out_t.append(t)
            out_d.append(int(ids[i]))
            out_u.append(u)
        return pd.DataFrame(
            {
                "draw_id": pd.array(out_t, dtype="int64"),
                "doc_id": pd.array(out_d, dtype="int64"),
                "u": pd.array(out_u, dtype="int64"),
            }
        )

    return body.groupby("rb").map_groups(resolve, batch_format="pandas")


__all__ = [
    "q46_bottomk_sample",
    "q47_stratified_sample",
    "q55_global_rank",
    "q56_weighted_sample",
    "q81_hash_split",
    "q100_sequence_packing",
    "q107_temperature_mix_sample",
    "q113_chunk_windows",
    "q120_epoch_upsample",
    "q149_negative_samples",
    "q160_token_budget_mix",
    "q175_neyman_sample",
    "q191_weighted_draws",
]


QUERIES = {
    "q46_bottomk_sample": q46_bottomk_sample,
    "q47_stratified_sample": q47_stratified_sample,
    "q55_global_rank": q55_global_rank,
    "q56_weighted_sample": q56_weighted_sample,
    "q81_hash_split": q81_hash_split,
    "q100_sequence_packing": q100_sequence_packing,
    "q107_temperature_mix_sample": q107_temperature_mix_sample,
    "q113_chunk_windows": q113_chunk_windows,
    "q120_epoch_upsample": q120_epoch_upsample,
    "q149_negative_samples": q149_negative_samples,
    "q160_token_budget_mix": q160_token_budget_mix,
    "q175_neyman_sample": q175_neyman_sample,
    "q191_weighted_draws": q191_weighted_draws,
}


ORACLE_SQL = {
    "q46_bottomk_sample": """
        SELECT doc_id FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
    """,
    "q47_stratified_sample": """
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        ) WHERE rn <= 3
    """,
    "q55_global_rank": """
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS pos
        FROM documents
    """,
    "q56_weighted_sample": """
        WITH keyed AS (
          SELECT doc_id, n_chars,
                 -ln((CAST('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
                     / 4294967296.0) / n_chars AS k
          FROM documents
        )
        SELECT doc_id, n_chars FROM keyed ORDER BY k, doc_id LIMIT 50
    """,
    "q81_hash_split": """
        WITH a AS (
          SELECT lang, n_chars,
                 CAST('0x' || substr(
                   md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS p
          FROM documents
        )
        SELECT lang,
               CASE WHEN p < 80 THEN 'train'
                    WHEN p < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM a GROUP BY 1, 2
    """,
    "q100_sequence_packing": r"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(
                   regexp_split_to_array(lower(text), '\s+'),
                   x -> x <> ''
                 )) AS n_tok
          FROM documents
        ),
        o AS (
          SELECT doc_id, n_tok,
                 coalesce(sum(n_tok) OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS prev
          FROM t
        )
        SELECT CAST(prev // 4096 AS BIGINT) AS bin_id,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM o GROUP BY 1
    """,
    "q107_temperature_mix_sample": """
        WITH c AS (
          SELECT lang, count(*) AS n FROM documents GROUP BY lang
        ),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        w AS (
          SELECT lang, sqrt(CAST(n AS DOUBLE) / total) AS wt FROM c, t
        ),
        k AS (
          SELECT lang,
                 CAST(floor(round(wt / (SELECT sum(wt) FROM w), 6)
                            * 100 + 0.5) AS BIGINT) AS quota
          FROM w
        ),
        ranked AS (
          SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        )
        SELECT doc_id, ranked.lang
        FROM ranked JOIN k USING (lang)
        WHERE rn <= quota
    """,
    "q113_chunk_windows": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS tk
          FROM documents
        ),
        sized AS (
          SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0
        ),
        starts AS (
          SELECT doc_id, tk, n,
                 unnest(range(0, greatest(n - 32, 0) + 24, 24)) AS st
          FROM sized
        ),
        c AS (
          SELECT doc_id, st,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY st
                 ) - 1 AS chunk_idx,
                 tk[st + 1 : st + 32] AS piece
          FROM starts WHERE st < n
        )
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(piece) AS BIGINT) AS n_words,
               md5(array_to_string(piece, ' ')) AS fp
        FROM c
    """,
    "q120_epoch_upsample": """
        SELECT doc_id, lang,
               CAST(unnest(range(1, 2 + ascii(lang) % 3)) AS BIGINT)
                 AS copy_idx
        FROM documents
    """,
    "q149_negative_samples": """
        -- k=2 negatives at rank (pos + j*173) mod N under the md5
        -- global order; self-pairs excluded
        WITH r AS (
          SELECT doc_id,
                 row_number() OVER (
                   ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) - 1 AS pos
          FROM documents
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
        a AS (
          SELECT r.doc_id, CAST(j.j AS BIGINT) AS j,
                 (r.pos + j.j * 173) % total AS np
          FROM r CROSS JOIN range(1, 3) j(j), n
        )
        SELECT a.doc_id, a.j, b.doc_id AS neg_id
        FROM a JOIN r b ON b.pos = a.np
        WHERE a.doc_id <> b.doc_id
    """,
    "q160_token_budget_mix": r"""
        -- greedy per-source fill in the md5('42:'||id) order: keep while
        -- the EXCLUSIVE running token total is under the 800 budget
        WITH d AS (
          SELECT doc_id, coalesce(source, '') AS source,
                 len(list_filter(regexp_split_to_array(
                   lower(coalesce(text, '')), '\s+'), x -> x <> ''))
                   AS n_tokens,
                 md5('42:' || CAST(doc_id AS VARCHAR)) AS r
          FROM documents
        ),
        w AS (
          SELECT doc_id, source, n_tokens,
                 coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY r, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS prefix
          FROM d
        )
        SELECT doc_id, source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(prefix AS BIGINT) AS prefix
        FROM w WHERE prefix < 800
    """,
    "q175_neyman_sample": """
        -- Neyman allocation: wh = floor(sqrt(Nh*Sxx - Sx^2)) + 1 (the
        -- radicand is an exact BIGINT < 2^53, the DOUBLE sqrt is the
        -- same correctly-rounded value in any IEEE engine), seats by
        -- largest remainder, rows by the house md5 bottom-k per stratum
        WITH st AS (
          SELECT lang, count(*) AS nh,
                 CAST(sum(n_chars) AS BIGINT) AS sx,
                 CAST(sum(CAST(n_chars AS BIGINT)
                          * CAST(n_chars AS BIGINT)) AS BIGINT) AS sxx
          FROM documents GROUP BY 1
        ),
        w AS (
          SELECT lang,
                 CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)))
                      AS BIGINT) + 1 AS wh
          FROM st
        ),
        tot AS (SELECT CAST(sum(wh) AS BIGINT) AS tw FROM w),
        base AS (
          SELECT lang, wh, (100 * wh) // tw AS k0, (100 * wh) % tw AS rem
          FROM w, tot
        ),
        lo AS (SELECT 100 - CAST(sum(k0) AS BIGINT) AS leftover FROM base),
        rk AS (
          SELECT lang, k0,
                 row_number() OVER (ORDER BY rem DESC, lang) AS rr
          FROM base
        ),
        alloc AS (
          SELECT lang,
                 CAST(k0 + CASE WHEN rr <= (SELECT leftover FROM lo)
                                THEN 1 ELSE 0 END AS BIGINT) AS kh
          FROM rk
        ),
        ranked AS (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        )
        SELECT r.lang, r.doc_id, a.kh
        FROM ranked r JOIN alloc a USING (lang)
        WHERE r.rn <= a.kh
    """,
    "q191_weighted_draws": """
        -- inverse-CDF with-replacement draws: u_t = md5('draw:t') mod
        -- W picks the row whose cumulative-weight interval contains it
        WITH w AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents
        ),
        t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w),
        p AS (
          SELECT doc_id, wt,
                 coalesce(sum(wt) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS pre
          FROM w
        ),
        draws AS (
          SELECT d.t AS draw_id,
                 CAST(md5_number_lower('draw:' || CAST(d.t AS VARCHAR))
                      & 9223372036854775807 AS BIGINT)
                   % (SELECT tot FROM t) AS u
          FROM range(100) d(t)
        )
        SELECT draws.draw_id, p.doc_id, draws.u
        FROM draws JOIN p
          ON draws.u >= p.pre AND draws.u < p.pre + p.wt
    """,
}
