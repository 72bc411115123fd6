"""Exact set-similarity self-join (AllPairs/PPJoin-style prefix filtering).

The dedup family's MinHash-LSH path (`stages.dedup`) is probabilistic: band
collisions can MISS true pairs below the S-curve knee. This operator is the
EXACT complement for token-set Jaccard — every pair with
``J(a, b) = |a∩b| / |a∪b| ≥ t`` is emitted, none invented — using the
prefix-filtering principle (Bayardo et al., "Scaling Up All Pairs
Similarity Search", WWW'07; Xiao et al. PPJoin): order every document's
distinct tokens by a GLOBAL total order (ascending document frequency,
ties lexicographic), then any qualifying pair must share at least one
token inside each side's first ``p = n - ⌈t·n⌉ + 1`` tokens. Only prefix
tokens — by construction the RAREST tokens of each document — generate
candidates, so candidate groups stay small exactly where a naive
token-inverted-index join explodes (stopwords).

Scale shape (nothing centralizes):
  1. per-doc distinct-token explode               map_batches, no shuffle
  2. document frequencies                         count_terms (partial+final)
  3. token df's attached to the explode           bucketed hash join on token
  4. per-doc (df, token)-sorted prefix            coarse-grouped by id
  5. candidate pairs from shared prefix tokens    coarse-grouped by token,
     with the size filter ⌈t·|a|⌉ ≤ |b|           pairs dedup'd by pair hash
  6. exact |a∩b| / |a∪b| verify                   two bucketed joins fetch
     texts; integers out, no float in the shuffle

The reference has no similarity join; this belongs to the engine's
LLM-data-pipeline surface (brief: "n-gram Jaccard" dedup flavor) as the
exact-contract sibling of `minhash_candidate_pairs`.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from basicocr_ray.stages.dedup import _coarse_salts
from basicocr_ray.stages.wide import count_terms, token_items


def _prefix_len(n: int, threshold: float) -> int:
    """AllPairs prefix size: a pair with Jaccard ≥ t shares ≥ 1 token in
    each side's first ``n - ⌈t·n⌉ + 1`` tokens under any shared order."""
    return n - math.ceil(threshold * n) + 1


def _stabilizer(schema: pa.Schema):
    """map_batches fn that pins a map_groups output stream to ``schema``.

    With a high salt count most coarse groups are empty, and Ray's groupby
    assembly emits empty NO-COLUMN pandas blocks between real ones; the
    union then widens int64 id columns to float64 (the exact failure mode
    documented at `stages/dedup.py:142-144`), and a float64-keyed side
    entering `bucketed_hash_join` against an int64 side silently matches
    nothing. Bundling with a large batch_size + exact lossless casts pins
    every downstream block to one schema."""

    def fix(b: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in b.column_names:
                cols[f.name] = pc.cast(b[f.name], f.type)
            else:  # empty no-column block
                cols[f.name] = pa.array([], f.type)
        return pa.table(cols)

    return fix


def jaccard_set_join(
    ds,
    id_column: str,
    text_column: str,
    threshold: float,
    items_fn=token_items,
    num_salt: int | None = None,
    num_buckets: int | None = None,
):
    """→ (id_a, id_b, n_inter, n_union): every unordered pair (id_a < id_b)
    whose distinct-token Jaccard ≥ ``threshold``, exactly. Pairs where both
    token sets are empty are excluded (Jaccard is undefined at 0/0).
    Output stays integer so the driver hash is float-free; the threshold
    test is ``n_inter ≥ t·n_union`` (identical expression in the SQL
    oracle, bit-for-bit the same IEEE comparison)."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    salts = _coarse_salts(num_salt)
    buckets = num_buckets or _coarse_salts(None)

    def explode(batch: pa.Table) -> pa.Table:
        ids, toks, sizes = [], [], []
        for did, t in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            s = sorted(set(items_fn(t or "")))
            for tok in s:
                ids.append(did)
                toks.append(tok)
                sizes.append(len(s))
        return pa.table(
            {
                "sid": pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "n": pa.array(sizes, pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def distinct_items(t: str) -> list[str]:
        return sorted(set(items_fn(t or "")))

    df_ds = count_terms(ds, text_column, distinct_items, "token").map_batches(
        lambda b: pa.table({"token": b["token"], "df": b["cnt"]}),
        batch_format="pyarrow",
    )

    with_df = bucketed_hash_join(
        exploded, df_ds, "token", ["sid", "n"], ["df"], num_buckets=buckets
    )

    # per-doc prefix under the global (df, token) order — coarse-grouped by
    # id hash so one task never holds more than ~1/S of the explode
    def add_id_cg(b: pa.Table) -> pa.Table:
        import hashlib

        cgs = [
            int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[:4], "little"
            )
            & (salts - 1)
            for i in b["sid"].to_pylist()
        ]
        return b.append_column("cg", pa.array(cgs, pa.int32()))

    thr = float(threshold)

    def take_prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sid", "df", "token"], kind="mergesort")
        out = df.groupby("sid", group_keys=False)[df.columns].apply(
            lambda g: g.head(_prefix_len(int(g["n"].iloc[0]), thr))
        )
        return out[["token", "sid", "n"]].astype({"sid": "int64", "n": "int64"})

    prefixes = (
        with_df.map_batches(add_id_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(take_prefix, batch_format="pandas")
        .map_batches(
            _stabilizer(
                pa.schema(
                    [("token", pa.string()), ("sid", pa.int64()),
                     ("n", pa.int64())]
                )
            ),
            batch_format="pyarrow",
            batch_size=65536,
        )
    )

    # candidate pairs: docs sharing a prefix token, size-filtered
    # (⌈t·n_a⌉ ≤ n_b for n_a ≤ n_b — a Jaccard ≥ t pair can't differ more)
    def add_tok_cg(b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        h = pd.util.hash_array(
            b["token"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("token"):
            rows = sorted(zip(g["sid"], g["n"]))
            for i in range(len(rows)):
                ai, an = rows[i]
                for j in range(i + 1, len(rows)):
                    bi, bn = rows[j]
                    if ai == bi:
                        continue
                    lo, hi = min(an, bn), max(an, bn)
                    if lo >= thr * hi:
                        out_a.append(min(ai, bi))
                        out_b.append(max(ai, bi))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).astype("int64")

    _pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    cand = (
        prefixes.map_batches(add_tok_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(pairs_in_group, batch_format="pandas")
        .map_batches(
            _stabilizer(_pair_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )

    # distinct pairs (a pair is found once per shared prefix token)
    def add_pair_cg(b: pa.Table) -> pa.Table:
        import hashlib

        cgs = [
            int.from_bytes(
                hashlib.md5(f"{a},{bb}".encode()).digest()[:4], "little"
            )
            & (salts - 1)
            for a, bb in zip(b["id_a"].to_pylist(), b["id_b"].to_pylist())
        ]
        return b.append_column("cg", pa.array(cgs, pa.int32()))

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[["id_a", "id_b"]].drop_duplicates().astype("int64")

    distinct_pairs = (
        cand.map_batches(add_pair_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(dedup_pairs, batch_format="pandas")
        .map_batches(
            _stabilizer(_pair_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )

    # exact verify: fetch both texts via bucketed joins (the
    # verify_pairs_jaccard_join discipline — texts shuffle once per join,
    # never to the driver), emit integer intersection/union
    def rename(key_name: str, text_name: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key_name: pc.cast(b[id_column], pa.int64()),
                    text_name: b[text_column],
                }
            )

        return fn

    with_a = bucketed_hash_join(
        distinct_pairs,
        ds.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        key="id_a",
        left_columns=["id_b"],
        right_columns=["text_a"],
        num_buckets=buckets,
    )
    with_both = bucketed_hash_join(
        with_a,
        ds.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        key="id_b",
        left_columns=["id_a", "text_a"],
        right_columns=["text_b"],
        num_buckets=buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_i, out_u = [], [], [], []
        for a, b, ta, tb in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            sa = set(items_fn(ta or ""))
            sb = set(items_fn(tb or ""))
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union > 0 and inter >= thr * union:
                out_a.append(a)
                out_b.append(b)
                out_i.append(inter)
                out_u.append(union)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "n_inter": pa.array(out_i, pa.int64()),
                "n_union": pa.array(out_u, pa.int64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein ≤ 1 test in one O(|s|) scan (no DP table)."""
    la, lb = len(a), len(b)
    if a == b:
        return True
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def edit1_vocab_join(vocab_ds, token_column: str = "token",
                     num_salt: int | None = None):
    """Fuzzy vocabulary SELF-JOIN at edit distance ≤ 1 → (tok_a, tok_b),
    tok_a < tok_b, every pair of distinct input strings with Levenshtein
    distance exactly 1 (identical strings collapse — the join is over the
    distinct vocabulary).

    Candidate generation is the deletion-neighborhood principle (FastSS,
    Bocek et al. 2007; popularized as SymSpell): if lev(a, b) ≤ 1 then
    ({a} ∪ Dels1(a)) ∩ ({b} ∪ Dels1(b)) ≠ ∅ — a substitution shares the
    both-sides deletion at the edited position, an insert/delete shares
    the shorter string itself. The converse is FALSE ("ab"/"ba" share
    both their deletions at distance 2), so every candidate passes the
    exact `_lev_le1` verify.

    Scale shape (the spell-correction analogue of A2's trie corrector
    with the dictionary DISTRIBUTED instead of broadcast): the variant
    explode is ≤ (L+1)× the vocab size; candidates coarse-group by
    variant hash, pairs dedup by pair hash — nothing centralizes. A
    variant shared by k tokens emits C(k, 2) candidates, but at distance
    1 candidates are output-bound (most survive the verify), so a hot
    variant means a hot RESULT, not wasted work. Input may carry
    duplicate tokens (e.g. per-batch local vocabularies): duplicates
    collapse inside the candidate groups and the pair dedup."""
    import numpy as np

    salts = _coarse_salts(num_salt)

    def variants(b: pa.Table) -> pa.Table:
        va, vt = [], []
        for t in b[token_column].to_pylist():
            if not t:
                continue
            va.append(t)
            vt.append(t)
            for i in range(len(t)):
                va.append(t[:i] + t[i + 1 :])
                vt.append(t)
        return pa.table(
            {
                "variant": pa.array(va, pa.string()),
                "tok": pa.array(vt, pa.string()),
            }
        )

    def add_var_cg(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            b["variant"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("variant"):
            toks = sorted(set(g["tok"]))
            for i in range(len(toks)):
                for j in range(i + 1, len(toks)):
                    out_a.append(toks[i])
                    out_b.append(toks[j])
        return pd.DataFrame({"tok_a": out_a, "tok_b": out_b}).astype("str")

    pair_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])
    cand = (
        vocab_ds.map_batches(variants, batch_format="pyarrow")
        .map_batches(add_var_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(pairs_in_group, batch_format="pandas")
        .map_batches(
            _stabilizer(pair_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )

    def add_pair_cg(b: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(b["tok_a"], b["tok_b"], "\x1f")
        h = pd.util.hash_array(
            joined.combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def dedup_verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["tok_a", "tok_b"]].drop_duplicates()
        keep = [
            _lev_le1(a, b) for a, b in zip(df["tok_a"], df["tok_b"])
        ]
        return df[np.asarray(keep, dtype=bool)]

    return (
        cand.map_batches(add_pair_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(dedup_verify, batch_format="pandas")
        .map_batches(
            _stabilizer(pair_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )


def _lev_dist_le(a: str, b: str, k: int):
    """Exact Levenshtein distance if ≤ k, else None. Full DP with a
    row-minimum early exit — candidate tokens are short (the callers
    bound token length), so the O(|a|·|b|) table is a few hundred cells;
    the early exit prunes the common all-different case after ~k rows."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    if a == b:
        return 0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if min(cur) > k:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def _deletes_upto(tok: str, depth: int) -> set:
    """All strings reachable from ``tok`` by deleting ≤ ``depth`` chars
    (FastSS / SymSpell deletion neighborhood), ``tok`` itself included."""
    frontier = {tok}
    out = {tok}
    for _ in range(depth):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                v = t[:i] + t[i + 1 :]
                if v not in out:
                    nxt.add(v)
        out |= nxt
        frontier = nxt
    return out


def editk_vocab_join(vocab_ds, token_column: str = "token", max_d: int = 2,
                     num_salt: int | None = None):
    """Fuzzy vocabulary SELF-JOIN at edit distance ≤ ``max_d`` →
    (tok_a, tok_b, dist), tok_a < tok_b, dist the EXACT Levenshtein
    distance (1..max_d). The distance-k generalization of
    `edit1_vocab_join`: candidates come from the depth-``max_d``
    deletion neighborhood (FastSS, Bocek et al. 2007: lev(a, b) ≤ k ⇒
    Dels≤k(a) ∩ Dels≤k(b) ≠ ∅ — every edit is simulated by a deletion on
    one or both sides), then every candidate passes the exact banded-DP
    verify, so false candidates (the converse is false) never surface.

    Scale shape: the variant explode is ≤ (1 + L + C(L,2) + …)× the
    vocab — callers should bound token length (the explode is
    polynomial in L of degree max_d). Candidates coarse-group by
    variant hash; pairs dedup + verify in coarse groups of the pair
    hash; nothing centralizes. Duplicate vocab rows (per-batch local
    vocabularies) collapse inside the candidate groups."""
    import numpy as np

    salts = _coarse_salts(num_salt)

    def variants(b: pa.Table) -> pa.Table:
        va, vt = [], []
        for t in b[token_column].to_pylist():
            if not t:
                continue
            for v in _deletes_upto(t, max_d):
                va.append(v)
                vt.append(t)
        return pa.table(
            {
                "variant": pa.array(va, pa.string()),
                "tok": pa.array(vt, pa.string()),
            }
        )

    def add_var_cg(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            b["variant"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby("variant"):
            toks = sorted(set(g["tok"]))
            for i in range(len(toks)):
                for j in range(i + 1, len(toks)):
                    out_a.append(toks[i])
                    out_b.append(toks[j])
        return pd.DataFrame({"tok_a": out_a, "tok_b": out_b}).astype("str")

    pair_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string())])
    cand = (
        vocab_ds.map_batches(variants, batch_format="pyarrow")
        .map_batches(add_var_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(pairs_in_group, batch_format="pandas")
        .map_batches(
            _stabilizer(pair_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )

    def add_pair_cg(b: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(b["tok_a"], b["tok_b"], "\x1f")
        h = pd.util.hash_array(
            joined.combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def dedup_verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["tok_a", "tok_b"]].drop_duplicates()
        dists = [
            _lev_dist_le(a, b, max_d)
            for a, b in zip(df["tok_a"], df["tok_b"])
        ]
        keep = np.asarray([d is not None for d in dists], dtype=bool)
        out = df[keep].copy()
        out["dist"] = pd.array(
            [d for d in dists if d is not None], dtype="int64"
        )
        return out

    out_schema = pa.schema(
        [("tok_a", pa.string()), ("tok_b", pa.string()), ("dist", pa.int64())]
    )
    return (
        cand.map_batches(add_pair_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(dedup_verify, batch_format="pandas")
        .map_batches(
            _stabilizer(out_schema), batch_format="pyarrow",
            batch_size=65536,
        )
    )
