"""Driver-contract queries: one Ray Data pipeline per operator from
SURVEY.md §2, each with (where SQL-expressible) a DuckDB oracle twin in
`ORACLE_SQL`. Column names/aliases are IDENTICAL on both sides — the driver
hashes values after sorting columns by name.

Float discipline: aggregates over doubles are rounded HALF-UP (matching
DuckDB ``round()``) via `_round_half_up`; pure per-row arithmetic is left
unrounded (bitwise-identical IEEE ops on both sides); int aggregates stay
exact.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from html import escape as _html_escape

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from basicocr_ray.config import ExtractConfig
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex, ws_tokens
from basicocr_ray.sources.docpages import docs_to_pages_batch
from basicocr_ray.stages.extract import extract_batch
from basicocr_ray.stages.wide import (
    count_terms,
    make_ngram_items,
    token_items,
    top_k,
)


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None, filter=None):
    """Pruned parquet read: ``columns`` projects at the reader (only the
    named columns leave storage) and ``filter`` (a pyarrow.dataset
    expression) pushes the predicate into the parquet scan — row groups
    whose statistics exclude the predicate are never read, and surviving
    row groups are filtered before the batch reaches the pipeline. At
    100 TB a selective filter here is the difference between scanning a
    shard and skipping it."""
    import ray.data

    return ray.data.read_parquet(
        _p(sf_dir, table), columns=columns, filter=filter
    )


def _round_half_up(x: float, n: int) -> float:
    """DuckDB-compatible round (half away from zero for positives)."""
    m = 10.0 ** n
    return math.floor(x * m + 0.5) / m if x >= 0 else -math.floor(-x * m + 0.5) / m


def _round_col(df: pd.DataFrame, col: str, n: int) -> pd.DataFrame:
    df[col] = [_round_half_up(float(v), n) for v in df[col]]
    return df


from basicocr_ray.core.textstats import md5_low64 as _md5_low64  # noqa: E402
# (single-sourced in core/textstats so stages and spec ops share the
# DuckDB-md5_number_lower-exact hash)


# ===========================================================================
# Relational / TPC-H-ish (G1/G2/G5, M6, T2/T5, J-patterns)
# ===========================================================================

def q01_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → partial pre-agg per batch → tiny
    final groupby (the G4 partial+final pattern; shuffle carries ≤ 6 rows
    per batch, not 6M rows)."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cutoff = pa.scalar(datetime(2000, 1, 1), type=pa.timestamp("us"))
        batch = batch.filter(pc.less(batch["l_shipdate"], cutoff))
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                n_rows=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )
    df = agg.to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df = _round_col(df, c, 2)
    df["n_rows"] = df["n_rows"].astype("int64")
    return df


def q02_orders_topk(sf_dir: str):
    """Global top-k: sort (desc, key-tiebreak) + limit (T3/T5/T6)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return top_k(ds, 10, "o_totalprice", "o_orderkey")


def q03_revenue_by_status(sf_dir: str):
    """Vectorized filter + computed column + grouped rollup (M6/G1)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_linestatus", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev(batch: pa.Table) -> pa.Table:
        lo = pa.scalar(datetime(1996, 1, 1), type=pa.timestamp("us"))
        hi = pa.scalar(datetime(1998, 1, 1), type=pa.timestamp("us"))
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo),
                pc.less(batch["l_shipdate"], hi),
            )
        )
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return pa.table(
            {"l_linestatus": batch["l_linestatus"], "revenue": revenue}
        )

    agg = (
        ds.map_batches(rev, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(Sum("revenue", alias_name="revenue"), Count(alias_name="n"))
    )
    df = agg.to_pandas()
    df = _round_col(df, "revenue", 2)
    df["n"] = df["n"].astype("int64")
    return df


def q04_region_rollup(sf_dir: str):
    """Broadcast dimension join (J1-pattern): nation⋈region loaded driver-
    side (tiny), shipped in the closure; fact table never shuffles."""
    from ray.data.aggregate import Count, Sum

    nation = pq.read_table(_p(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_p(sf_dir, "region")).to_pandas()
    nk_to_region = dict(
        zip(
            nation["n_nationkey"],
            nation["n_regionkey"].map(
                dict(zip(region["r_regionkey"], region["r_name"]))
            ),
        )
    )

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    # vectorized broadcast lookup: index_in + take instead of a per-row
    # Python comprehension (the J1 dict is shipped as two parallel arrays)
    lk_keys = pa.array(list(nk_to_region.keys()), pa.int64())
    lk_vals = pa.array(list(nk_to_region.values()), pa.string())

    def add_region(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(batch["c_nationkey"], pa.int64()), value_set=lk_keys
        )
        return pa.table(
            {"r_name": pc.take(lk_vals, idx), "c_acctbal": batch["c_acctbal"]}
        )

    agg = (
        ds.map_batches(add_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("c_acctbal", alias_name="sum_acctbal"),
        )
    )
    df = agg.to_pandas()
    df = _round_col(df, "sum_acctbal", 2)
    df["n_customers"] = df["n_customers"].astype("int64")
    return df


def q05_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped, SURVEY §2.9): floor ts
    to the hour inside map_batches, PARTIAL-aggregate per batch (the
    shuffle carries ≤ distinct keys per batch, never rows), then a
    coarse-group pandas final — the partial+final shape that avoids
    Ray's sort-based Aggregate on thousands of distinct keys."""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    salts = _coarse_salts(None)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        # Coarse group = cross-process-stable hash of the FULL key.
        # (Round-2 used hour_ns % salts — degenerate: hour timestamps are
        # multiples of 3600e9 = 2^13·3^2·5^11, so every power-of-two salt
        # ≤ 8192 divides them and ALL partials landed in group 0, i.e. one
        # final task. hash_pandas_object uses SipHash with a fixed default
        # key, so the same (hour, event_type) maps to the same group on
        # every worker.)
        g["cg"] = (
            pd.util.hash_pandas_object(
                g[["hour", "event_type"]], index=False
            )
            % salts
        ).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )
    df = agg.to_pandas()
    df = _round_col(df, "sum_value", 2)
    df["n"] = df["n"].astype("int64")
    return df


def q06_events_asof(sf_dir: str):
    """As-of join (custom operator, SURVEY build-brief): each purchase →
    most recent STRICTLY earlier event of the same user. Partition by
    user_id, sort-in-group, pandas merge_asof per group — the documented
    partitioning assumption is `user_id` co-location."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        left = g.loc[g["event_type"] == "purchase", ["event_id", "ts"]]
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "prior_event_id": pd.Series([], dtype="int64"),
                 "gap_us": pd.Series([], dtype="int64")}
            )
        right = g[["event_id", "ts"]].rename(
            columns={"event_id": "prior_event_id"}
        )
        right["prior_ts"] = right["ts"]
        m = pd.merge_asof(
            left, right, on="ts", allow_exact_matches=False, direction="backward"
        )
        m = m.dropna(subset=["prior_event_id"])
        gap = (m["ts"] - m["prior_ts"]) // pd.Timedelta(microseconds=1)
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "prior_event_id": m["prior_event_id"].astype("int64"),
                "gap_us": gap.astype("int64"),
            }
        )

    return ds.groupby("user_id").map_groups(asof_group, batch_format="pandas")


def q17_sessionize(sf_dir: str):
    """Session windows (30-min gap) per user — groupby + in-group ordered
    scan (SURVEY §2.9 streaming translation)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    gap = pd.Timedelta(minutes=30)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        new = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_events": [len(g)],
                "n_sessions": [int(new.sum())],
            }
        )

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


def q18_topk_per_group(sf_dir: str):
    """Per-group top-k (T3 flavor): 2 priciest orders per customer —
    coarse-grouped (customers hash into cluster-sized groups, the
    per-customer split is ONE vectorized pandas sort + groupby-head, not
    one Ray map_groups call per customer — ~15k tiny Python calls cost
    14 s at sf0.1 vs ~3 s for this shape)."""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    salts = _coarse_salts(None)

    def add_cg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cg",
            pc.cast(
                pc.bit_wise_and(pc.cast(b["o_custkey"], pa.int64()), salts - 1),
                pa.int32(),
            ),
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby("o_custkey").head(2)[
            ["o_orderkey", "o_custkey", "o_totalprice"]
        ]

    return (
        ds.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(topk, batch_format="pandas")
    )


def q19_distinct_langs(sf_dir: str):
    """DISTINCT one column (D-flavor; `Dataset.unique`)."""
    vals = _read(sf_dir, "documents", columns=["lang"]).unique("lang")
    return pd.DataFrame({"lang": sorted(vals)})


def q28_events_scalar(sf_dir: str):
    """Scalar function showcase (§2.8): vectorized arithmetic + string fn;
    unrounded double math is bitwise-identical to the oracle."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch["value"], 100.0))
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type_u": pc.utf8_upper(batch["event_type"]),
                "adj_value": pc.add(batch["value"], 10.0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q29_orders_by_segment(sf_dir: str):
    """Fact⋈dim broadcast join + rollup (J1 at fact scale)."""
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    # vectorized broadcast lookup at fact scale: index_in against the dim
    # key array + take on the dict-encoded segment values (no per-row
    # Python in the hot map)
    lk_keys = pc.cast(cust["c_custkey"], pa.int64()).combine_chunks()
    lk_vals = cust["c_mktsegment"].combine_chunks()

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def add_seg(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(
            pc.cast(batch["o_custkey"], pa.int64()), value_set=lk_keys
        )
        return pa.table(
            {
                "c_mktsegment": pc.take(lk_vals, idx),
                "o_totalprice": batch["o_totalprice"],
            }
        )

    agg = (
        ds.map_batches(add_seg, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="sum_totalprice"),
        )
    )
    df = agg.to_pandas()
    df = _round_col(df, "sum_totalprice", 2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return df


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


# ===========================================================================
# Text / wide ops over `documents` (G3/G4/G7, M-ops, dedup, trie, AC)
# ===========================================================================

def q07_token_freq(sf_dir: str):
    """Word-frequency build (G3): flat_map tokens → partial counts →
    groupby sum → top-100."""
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", token_items, "token")
    return top_k(counts, 100, "cnt", "token")


def q08_bigram_freq(sf_dir: str):
    """n-gram count/merge (G4) with n=2 — the language-model.md:168-197
    sharded count-then-merge, as partial+final groupby."""
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", make_ngram_items(2), "bigram")
    return top_k(counts, 100, "cnt", "bigram")


def q26_trigram_freq(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", make_ngram_items(3), "trigram")
    return top_k(counts, 100, "cnt", "trigram")


def q09_lang_rollup(sf_dir: str):
    """Per-language quality rollup (G7/G1): exact int sums, derived mean."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_chars"] = df["sum_chars"].astype("int64")
    df["mean_chars"] = [
        _round_half_up(s / n, 6) for s, n in zip(df["sum_chars"], df["n_docs"])
    ]
    return df


def q10_dedup_exact(sf_dir: str):
    """Exact dedup (D3): content hash → per-group representative."""
    from basicocr_ray.stages.dedup import exact_dedup_groups

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup_groups(ds, "doc_id", "text")


def q11_fingerprint(sf_dir: str):
    """Document fingerprinting: md5 content hash (matches DuckDB md5())."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fp": pa.array(
                    [md5_hex(t or "") for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def q12_token_count(sf_dir: str):
    """Per-doc token counting (text-analysis op)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cnt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(
                    [len(ws_tokens(t or "")) for t in batch["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(cnt, batch_format="pyarrow")


_STOP5 = ("the", "a", "data", "key", "value")


def q16_quality(sf_dir: str):
    """Quality scoring: token/stopword stats per doc (text-analysis op)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def q(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        nt, ns, ratio = [], [], []
        for t in batch["text"].to_pylist():
            toks = ws_tokens(t or "")
            s = sum(1 for x in toks if x in _STOP5)
            nt.append(len(toks))
            ns.append(s)
            ratio.append(_round_half_up(s / len(toks), 6) if toks else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "stop_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


def q20_ac_strip(sf_dir: str):
    """AC-automaton boilerplate-phrase stripping (A3/J3) on an actor pool;
    non-overlapping phrase set ⇒ equivalent to the oracle's chained
    replace()."""
    from basicocr_ray.stages.correct import ACStripper

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stripped = ds.map_batches(
        ACStripper,
        fn_constructor_kwargs={
            "phrases": ["vector window", "hash scan"],
            "column": "text",
            "out_column": "stripped_text",
        },
        batch_format="pyarrow",
        concurrency=2,
    )
    return stripped.select_columns(["doc_id", "stripped_text"])


def q21_trie_correct(sf_dir: str):
    """Trie-corrector end-to-end (A2): dictionary = corpus token counts
    (G3 output broadcast); deterministically corrupt every 7th token (drop
    last char when len>3) then correct with bounded-edit-distance trie
    search (max_cost 1, retry +3, tie ladder per trietree_correct.py)."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # top-K cap (sorted+limited DISTRIBUTEDLY, before anything reaches the
    # driver) keeps the dictionary broadcast bounded on an open-vocabulary
    # corpus; 100k ≫ the fixture vocab so the oracle tie ladder is exact
    dict_rows = (
        count_terms(ds, "text", token_items, "token")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(100_000)
    )
    dict_rows = collect_rows(dict_rows)
    entries = [(r["token"], int(r["cnt"])) for r in dict_rows]
    entries_ref = ray.put(entries)

    class CorruptCorrect:
        def __init__(self, entries_ref):
            from basicocr_ray.core.trie import TrieDict

            self.trie = TrieDict(ray.get(entries_ref))
            self._cache: dict[str, str] = {}

        def _correct(self, tok: str) -> str:
            hit = self._cache.get(tok)
            if hit is None:
                hit = self.trie.correct(tok, 1)
                self._cache[tok] = hit
            return hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            out = []
            for did, t in zip(ids, batch["text"].to_pylist()):
                toks = (t or "").lower().split()
                fixed = []
                for i, tok in enumerate(toks):
                    if (did + i) % 7 == 0 and len(tok) > 3:
                        tok = tok[:-1]
                    fixed.append(self._correct(tok))
                out.append(" ".join(fixed))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "corrected_text": pa.array(out, pa.large_string()),
                }
            )

    return ds.map_batches(
        CorruptCorrect,
        fn_constructor_kwargs={"entries_ref": entries_ref},
        batch_format="pyarrow",
        concurrency=2,
    )


# ===========================================================================
# Extraction roundtrips (the flagship, SQL-verified)
# ===========================================================================

def _roundtrip(sf_dir: str, chunked: bool, cfg: ExtractConfig):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap_extract(batch: pa.Table) -> pa.Table:
        pages = docs_to_pages_batch(batch, chunked=chunked)
        ext = extract_batch(pages, cfg)
        return pa.table(
            {"doc_id": pages["doc_id"], "main_text": ext["main_text"]}
        )

    return ds.map_batches(wrap_extract, batch_format="pyarrow")


def q13_extract_roundtrip(sf_dir: str):
    """documents → boilerplate HTML wrap → FULL extraction → must equal the
    original text byte-for-byte (single content block)."""
    return _roundtrip(sf_dir, chunked=False, cfg=ExtractConfig())


def q14_extract_multiblock(sf_dir: str):
    """Multi-block variant: content split across many <p>; CTC-style
    collapse with join_sep=' ' must reassemble the exact original text."""
    return _roundtrip(
        sf_dir, chunked=True,
        # adjacent-dup collapse must be off: a text repeating the same
        # 16-word chunk twice would otherwise lose the repeat and break
        # byte-identity with the oracle
        cfg=ExtractConfig(join_sep=" ", collapse_adjacent_dups=False),
    )


# ===========================================================================
# Embeddings: ANN + near-dup (similarity-search ops)
# ===========================================================================

def q15_ann_cosine(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id 0 (float64, rounded 6
    — matches DuckDB list_cosine_similarity over DOUBLE[])."""
    from basicocr_ray.stages.embed import ann_topk

    qtab = pq.read_table(_p(sf_dir, "embeddings"))
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    res = ann_topk(ds, qvec, k=10, exclude_ids=frozenset({0})).to_pandas()
    res = _round_col(res, "sim", 6)
    return res


def q24_embed_dup_pairs(sf_dir: str):
    """Embedding near-dup via cosine LSH: corpus ∪ exact copies
    (vec_id + 10000) → every (v, v+10000) pair must be found (recall 1.0
    for exact dups: identical signature ⇒ same bucket)."""
    from basicocr_ray.stages.embed import cosine_lsh_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.add(batch["vec_id"], 10000),
                "embedding": batch["embedding"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))
    return cosine_lsh_pairs(both, threshold=0.95)


def q22_minhash_neardup(sf_dir: str):
    """MinHash-LSH near-duplicate pairs over the REAL documents corpus
    (which contains planted near-dups): shingle→minhash per batch → band
    buckets (32 bands × 2 rows: P(miss | J=0.8) = (1-0.8^2)^32 ≈ 6e-15) →
    candidate pairs → exact 5-gram-Jaccard verify ≥ 0.8, texts fetched via
    the BUCKETED-JOIN verify (no full-corpus driver materialization — the
    round-1 formulation broadcast an id→text dict built with take_all()).
    Oracle = DuckDB brute-force pairwise Jaccard — the LSH path must
    reproduce it exactly."""
    from basicocr_ray.stages.dedup import (
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # hot_bucket_mode="full": q22's contract is the EXACT pair set of the
    # brute-force oracle, so a >max_bucket_size bucket must expand all its
    # pairs — the default "star" economization is for component-style
    # consumers (q42) and would silently drop true near-dup pairs here.
    pairs = minhash_candidate_pairs(
        ds, "doc_id", "text", num_bands=32, hot_bucket_mode="full"
    )
    verified = verify_pairs_jaccard_join(
        pairs, ds, "doc_id", "text", threshold=0.8
    )
    return verified.select_columns(["id_a", "id_b"])


def q23_simhash_dup(sf_dir: str):
    """Exact-duplicate detection via SimHash bucketing: documents ∪ exact
    copies (doc_id + 10000); identical-signature buckets propose
    candidates, md5 text-equality verifies (signature collisions of
    merely-similar docs are filtered out). Every (d, d+10000) pair must
    surface — and nothing else (the corpus has no exact dups)."""
    from basicocr_ray.stages.dedup import simhash_exact_dup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(batch["doc_id"], 10000),
                "text": batch["text"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))
    return simhash_exact_dup_pairs(both, "doc_id", "text")


def q25_normalize(sf_dir: str):
    """Width-fold + lowercase normalization (M8, `trietree_correct.py:45-72`
    `uniform`): full-width → half-width then lowercase. On the ASCII
    `documents` corpus Q2B is the identity, so the oracle reduces to
    lower(text); the fold itself is golden-tested in tests/test_core.py."""
    from basicocr_ray.core.normalize import uniform

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": pa.array(
                    [uniform(t or "") for t in batch["text"].to_pylist()],
                    pa.large_string(),
                ),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


_VOCAB_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def q27_vocab_roundtrip(sf_dir: str):
    """Label codec end-to-end (M3/M4, `utils.py:44-101`): encode each doc
    against a fixed alphabet (unknown chars dropped), decode raw, compare.
    Output: (doc_id, n_codes, roundtrip_ok); the oracle computes n_codes as
    the length of the alphabet-filtered text and asserts roundtrip_ok."""
    from basicocr_ray.core.vocab import Vocab

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = Vocab(_VOCAB_ALPHABET)
    allowed = frozenset(_VOCAB_ALPHABET)

    def rt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n_codes, oks = [], []
        for t in batch["text"].to_pylist():
            t = (t or "").lower()
            codes, lens = vocab.encode([t])
            decoded = vocab.decode(codes, lens, raw=True)[0]
            expected = "".join(c for c in t if c in allowed)
            n_codes.append(lens[0])
            oks.append(decoded == expected)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_codes": pa.array(n_codes, pa.int64()),
                "roundtrip_ok": pa.array(oks, pa.bool_()),
            }
        )

    return ds.map_batches(rt, batch_format="pyarrow")


def q31_events_sliding(sf_dir: str):
    """Sliding-window aggregate (1 h window, 30 min step): each event lands
    in two windows; window starts are epoch-second integers so both sides
    stay in exact int arithmetic. Partial counts per batch, then a
    coarse-grouped pandas final sum — the shuffle carries per-batch
    partials only and never sorts on the (user, window) key space."""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    salts = _coarse_salts(None)

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        # normalize to ns first: pandas may carry datetime64[us] or [ns]
        # depending on the arrow conversion path
        epoch_s = df["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        bucket = (epoch_s // 1800) * 1800
        out = pd.concat(
            [
                pd.DataFrame({"user_id": df["user_id"], "window_start": bucket}),
                pd.DataFrame(
                    {"user_id": df["user_id"], "window_start": bucket - 1800}
                ),
            ]
        )
        g = out.groupby(["user_id", "window_start"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["cg"] = (
            (g["user_id"].astype("int64") * 31 + g["window_start"]) % salts
        ).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "window_start"], as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    agg = (
        ds.map_batches(windows, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )
    df = agg.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df


def q32_lm_score(sf_dir: str):
    """Bigram LM fit (distributed count/merge, G4) + broadcast scoring
    (A5). The hashable result is the EXACT INTEGER EVIDENCE the score is
    built from (token count + summed corpus bigram counts per doc), which
    the DuckDB oracle reproduces bit-for-bit; the libm-dependent log-prob
    itself stays out of the hash (semantics unit-tested in
    tests/test_multimodal_lm.py)."""
    from basicocr_ray.pipelines.lm import fit_bigram_lm, score_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_bigram_lm(ds)
    return score_documents(ds, lm).select_columns(
        ["doc_id", "n_tokens", "sum_bigram_count"]
    )


def q33_image_features(sf_dir: str):
    """Multimodal plumbing end-to-end: synthesize deterministic binary
    image payloads per embeddings row, run the ImageFeatureExtractor actor
    pool, return the SQL-checkable columns (decode kernel is the fixture
    stub — see stages/multimodal.py)."""
    from basicocr_ray.stages.multimodal import (
        ImageFeatureExtractor,
        make_image_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_image_payload(i, 32 + (i % 16), 24 + (i % 8)) for i in ids],
                    pa.large_binary(),
                ),
            }
        )

    feats = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", batch_size=256,
        concurrency=2,
    )
    return feats.select_columns(["item_id", "width", "height", "ok"])


def q34_bucketed_join_revenue(sf_dir: str):
    """Large⋈large join via the explicit bucketed hash join (guide
    pattern; both sides fact-scale so no broadcast): lineitem ⋈ orders on
    orderkey, then revenue per (order, customer), global top-100. Rows
    shuffle ONCE each (by join bucket); the per-key aggregate and the
    local top-100 are FUSED into the join task via ``bucket_post_fn`` —
    an orderkey never spans buckets, so the in-bucket reduction is exact
    and the follow-up coarse-group exchange round 2 ran (partial →
    add_cg → groupby → final) is gone. The global sort sees ≤ 100 ×
    num_buckets rows."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b["l_orderkey"],
                "rev": pc.multiply(
                    b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])
                ),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pa.table({"okey": b["o_orderkey"], "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow",
    )

    def agg_topk(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "okey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        g = pa.TableGroupBy(
            tbl, ["okey", "o_custkey"], use_threads=False
        ).aggregate([("rev", "sum")])
        g = g.rename_columns(["okey", "o_custkey", "revenue"])
        order = pc.sort_indices(
            g,
            sort_keys=[("revenue", "descending"), ("okey", "ascending")],
        )[:100]
        return g.take(order)

    joined = bucketed_hash_join(
        li, od, "okey", ["rev"], ["o_custkey"], bucket_post_fn=agg_topk
    )
    top = (
        joined.sort(["revenue", "okey"], descending=[True, False])
        .limit(100)
        .to_pandas()
    )
    top["okey"] = top["okey"].astype("int64")
    top["o_custkey"] = top["o_custkey"].astype("int64")
    return _round_col(top, "revenue", 2)


def q35_running_totals(sf_dir: str):
    """Ordered-window running aggregates per user (the reference's
    `averager` as a STREAM, SURVEY §2.9): row_number and cumulative count
    in exact ints; cumulative value sum rounded (both engines accumulate
    in the same (ts, event_id) order)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "rn": np.arange(1, len(g) + 1, dtype="int64"),
                "cum_value": [
                    _round_half_up(v, 2) for v in g["value"].cumsum()
                ],
            }
        )
        return out

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


def q36_distinct_pairs(sf_dir: str):
    """Multi-column DISTINCT via groupby-first (set op beyond
    single-column `unique`)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    return ds.groupby(["lang", "source"]).map_groups(first, batch_format="pandas")


def q37_event_stats(sf_dir: str):
    """Min/Max/Count per group — selection aggregates are exact on doubles
    (no accumulation-order sensitivity)."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    df = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    df["n"] = df["n"].astype("int64")
    return df


def q38_event_median(sf_dir: str):
    """Median per group — an exact order-statistic (selection + midpoint
    average; both engines compute (a+b)/2 of the same two doubles). Per-
    group medians run inside map_groups; at scale this is the operator
    you'd replace with a mergeable KLL/t-digest sketch (noted in
    core.sketches' docstring family)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value"].to_numpy())
        n = len(v)
        m = v[n // 2] if n % 2 else (v[n // 2 - 1] + v[n // 2]) / 2.0
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "median_value": [m]}
        )

    return ds.groupby("event_type").map_groups(med, batch_format="pandas")


def q39_staged_extract(sf_dir: str):
    """The STAGED pipeline formulation (SURVEY §7.1.4: tokenize → score →
    decode as separate map_batches stages, block sequence riding in a
    nested list<struct> column) driven through the SQL gate: wrapped docs
    tokenize to exactly one kept content block, and the decoded text must
    be byte-identical to the original."""
    from basicocr_ray.stages.extract import (
        decode_batch,
        score_batch,
        tokenize_batch,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap(batch: pa.Table) -> pa.Table:
        pages = docs_to_pages_batch(batch)
        return pages

    staged = (
        ds.map_batches(wrap, batch_format="pyarrow")
        .map_batches(tokenize_batch, batch_format="pyarrow")
        .map_batches(score_batch, batch_format="pyarrow")
        .map_batches(decode_batch, batch_format="pyarrow")
    )

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.split(":", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "main_text": batch["main_text"],
                "n_blocks": pc.cast(batch["n_blocks"], pa.int64()),
                "n_blocks_kept": pc.cast(batch["n_blocks_kept"], pa.int64()),
            }
        )

    return staged.map_batches(project, batch_format="pyarrow")


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


def q48_tf_df(sf_dir: str):
    """Doc-term matrix with corpus document frequencies — the exact
    integer core of TF-IDF (the log-weighted score itself is libm float;
    its inputs hash): per-doc term frequencies from one flat pass, df per
    token via the count_terms discipline over per-doc DISTINCT tokens,
    attached via a BUCKETED HASH JOIN on the token (string keys bucket by
    a stable hash) — the df relation never touches the driver, so an
    open-vocabulary corpus stays bounded (the round-2 formulation
    `take_all()`'d the whole (token, df) table and broadcast it). Emits
    (doc_id, token, tf, df) for tf ≥ 2."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import count_terms, token_items

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def distinct_items(text: str) -> list[str]:
        return sorted(set(token_items(text)))

    df_ds = count_terms(ds, "text", distinct_items, "token").map_batches(
        lambda b: pa.table({"token": b["token"], "df": b["cnt"]}),
        batch_format="pyarrow",
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_doc, out_tok, out_tf = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok, n in Counter(token_items(t or "")).items():
                if n >= 2:
                    out_doc.append(did)
                    out_tok.append(tok)
                    out_tf.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow")
    return bucketed_hash_join(
        tf_ds, df_ds, "token", ["doc_id", "tf"], ["df"]
    ).select_columns(["doc_id", "token", "tf", "df"])


def q49_trigram_lm_score(sf_dir: str):
    """TRIGRAM interpolated-KN LM fit (distributed order-3 counts through
    the same partial+final count/merge as q32's bigram pipeline — the
    reference's `make-big-lm` at its real order) + broadcast actor-pool
    scoring. Hashable result: the exact integer evidence (token count +
    summed corpus trigram counts per doc); the libm log-prob stays out of
    the hash (KN semantics unit-tested in tests/test_multimodal_lm.py)."""
    from basicocr_ray.pipelines.lm import fit_trigram_lm, score_documents_trigram

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_trigram_lm(ds)
    return score_documents_trigram(ds, lm).select_columns(
        ["doc_id", "n_tokens", "sum_trigram_count"]
    )


def q50_conformance_accuracy(sf_dir: str):
    """Held-out conformance accuracy as a driver-checked query (G2 — the
    reference's exact-match eval, `contrib/crnn/crnn_main.py:181-190`,
    n_correct/total over decoded vs ground-truth strings): every
    doc_id ≡ 0 (mod 7) gets a deterministic corruption planted in its
    page, the FULL extraction runs, extracted text is BUCKET-JOINED back
    to the `documents` ground truth (two fact-scale sides — the J4/G2
    composition under one driver hash), and per-lang exact-match counts
    roll up via partial+final. The DuckDB twin predicts the outcome
    analytically: corrupted docs mismatch, every other doc matches
    byte-identically — the flagship invariant q13 proves per-row."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap_extract(batch: pa.Table) -> pa.Table:
        texts = [
            (t or "") + " __corrupt__" if i % 7 == 0 else (t or "")
            for i, t in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
        ]
        pages = docs_to_pages_batch(
            pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "text": pa.array(texts, pa.string()),
                    "lang": batch["lang"],
                }
            ),
            chunked=False,
        )
        ext = extract_batch(pages, ExtractConfig())
        return pa.table(
            {"doc_id": pages["doc_id"], "main_text": ext["main_text"]}
        )

    extracted = ds.map_batches(wrap_extract, batch_format="pyarrow")
    joined = bucketed_hash_join(
        extracted, ds, "doc_id", ["main_text"], ["text", "lang"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["_ok"] = (df["main_text"] == df["text"]).astype("int64")
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("_ok", "size"), n_exact=("_ok", "sum")
        )
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False)[["n_docs", "n_exact"]].sum()
        return out.astype({"n_docs": "int64", "n_exact": "int64"})

    # lang is low-cardinality: the partial shrinks each bucket's rows to
    # ≤|langs|, the final groupby shuffles only those partials
    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q51_jaccard_join_exact(sf_dir: str):
    """EXACT shingle-set similarity self-join at Jaccard ≥ 0.6 via AllPairs
    prefix filtering (`stages.simjoin.jaccard_set_join`) — the
    exact-contract sibling of q22's probabilistic MinHash banding: every
    qualifying pair is emitted, none invented, and the candidate space is
    pruned by df-ordered prefixes + the size filter instead of hashing.
    Sets are word-TRIGRAM shingles (unigram token sets are near-identical
    across this corpus's shared vocabulary — shingles make set identity
    mean textual identity, the MinHash literature's standard choice).
    Integer output (n_inter, n_union) keeps the driver hash float-free;
    the threshold comparison is the same IEEE expression on both sides."""
    from basicocr_ray.stages.simjoin import jaccard_set_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return jaccard_set_join(
        ds, "doc_id", "text", threshold=0.6, items_fn=make_ngram_items(3)
    )


def q52_pii_redact(sf_dir: str):
    """PII scrub — the redaction pass every crawl-to-training-corpus
    pipeline runs before anything else. Emails are PLANTED deterministically
    (doc_id ≡ 0 mod 3 → appended address; the q50 planting discipline, so
    the oracle predicts exact counts), matched with a regex valid under
    BOTH engines (Python `re` and DuckDB's RE2 agree on this subset), and
    the redacted text is verified by md5 + removed-byte count — exact
    string evidence, not just counts."""
    import hashlib
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    email_re = _re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")

    def redact(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_removed, out_md5 = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = t or ""
            if did % 3 == 0:
                t = f"{t} contact-{did}@example.com"
            red, n = email_re.subn("<EMAIL>", t)
            out_id.append(did)
            out_n.append(n)
            out_removed.append(len(t) - len(red))
            out_md5.append(hashlib.md5(red.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_emails": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_removed, pa.int64()),
                "redacted_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


def q53_url_host_rollup(sf_dir: str):
    """Per-host crawl rollup — the first aggregate any web-scale corpus
    audit runs (pages per host, bytes per host). Urls are planted
    deterministically from doc_id (documents carries no url column; the
    q50 planting discipline keeps the oracle exact); host extraction and
    the rollup are PURE ARROW kernels (`split_pattern` + `list_element`
    + partial/final groupby) — zero Python per row, the vectorization
    pattern the brief asks every hot stage to follow."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def rollup_partial(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"]
        # doc_id % 50 (pyarrow ships no modulo kernel; int divide truncates
        # and doc_id ≥ 0, so x − (x÷50)·50 is exact)
        mod50 = pc.subtract(
            did, pc.multiply(pc.divide(did, pa.scalar(50)), pa.scalar(50))
        )
        urls = pc.binary_join_element_wise(
            pa.scalar("https://host"),
            pc.cast(mod50, pa.string()),
            pa.scalar(".example.com/page/"),
            pc.cast(did, pa.string()),
            pa.scalar(""),
        )
        hosts = pc.list_element(pc.split_pattern(urls, "/"), 2)
        t = pa.table({"host": hosts, "n_chars": batch["n_chars"]})
        df = t.to_pandas()
        g = df.groupby("host", as_index=False).agg(
            n_pages=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(rollup_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )
    df = out.to_pandas()
    return df.astype({"n_pages": "int64", "sum_chars": "int64"})


def q54_grouped_string_agg(sf_dir: str):
    """ORDERED in-group aggregation (string_agg with ORDER BY — an operator
    shape none of q01–q53 exercise): per order status, the comma-joined
    keys of its 3 highest-value orders. Per-batch partial top-3 bounds the
    shuffle at 3 rows × statuses per batch; the final per-status sort+join
    is exact because top-3-of-top-3s is top-3."""
    ds = _read(
        sf_dir, "orders",
        columns=["o_orderstatus", "o_totalprice", "o_orderkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderstatus", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("o_orderstatus", group_keys=False)[df.columns].head(3)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(3)
        return pd.DataFrame(
            {
                "o_orderstatus": [df["o_orderstatus"].iloc[0]],
                "top_keys": [",".join(str(k) for k in df["o_orderkey"])],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderstatus")
        .map_groups(final, batch_format="pandas")
    )


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


def q57_anti_join_customers(sf_dir: str):
    """Distributed ANTI-JOIN (NOT EXISTS — D2's anti-membership semantics
    with BOTH sides fact-scale, where the reference only ever broadcasts):
    customers with no order above 280k via `bucketed_hash_join(join_type=
    'left anti')` — single shuffle by key bucket, per-bucket Acero anti
    joins compose exactly because a key never spans buckets (the filter is
    pushed BEFORE the shuffle, so the right side ships only qualifying
    keys)."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.filter(
                    pc.greater(b["o_totalprice"], 280000.0)
                )["o_custkey"]
            }
        ),
        batch_format="pyarrow",
    )
    return bucketed_hash_join(
        cust, orders, "c_custkey", ["c_acctbal"], [], join_type="left anti"
    )


def q58_rollup_docs(sf_dir: str):
    """GROUP BY ROLLUP(lang, source) over documents (G7's rollup taken to
    its OLAP form): one scan computes finest-level partials; subtotal and
    grand-total levels derive from the finest AGGREGATE (count/sum are
    algebraic, so aggregate-of-aggregates is exact and costs zero extra
    scans) — `stages.wide.rollup_counts`."""
    from basicocr_ray.stages.wide import rollup_counts

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return rollup_counts(
        ds, ["lang", "source"], "n_chars",
        n_name="n_docs", sum_name="sum_chars",
    )


def q59_knn_join_label(sf_dir: str):
    """Per-label exact cosine k-NN SELF-JOIN (the similarity-search join:
    each vector's top-3 neighbors within its label, self excluded, ties by
    neighbor id): the label partitions the quadratic work — the IVF-cell
    shape — and each group scores in one numpy gram-matrix pass
    (`stages.embed.knn_self_join_grouped`). Sims rounded 6 like q15
    (numpy vs DuckDB double summation agree well past 1e-6)."""
    from basicocr_ray.stages.embed import knn_self_join_grouped

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    res = knn_self_join_grouped(ds, k=3).to_pandas()
    res["label"] = res["label"].astype("int64")
    return _round_col(res, "sim", 6)


def q60_group_quantile(sf_dir: str):
    """EXACT per-group p90 (percentile_disc) without a per-group sort:
    two metadata-sized histogram passes locate each group's candidate
    bucket, a pruned third scan selects the exact order statistic from
    ~n/1024 surviving rows (`stages.wide.grouped_quantile_disc`) — the
    distributed exact-quantile shape (G5's max generalized to any rank),
    q = 9/10 carried as an exact rational so the target index matches
    DuckDB's ceil(q·n) bit-for-bit."""
    from basicocr_ray.stages.wide import grouped_quantile_disc

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantile_disc(ds, "event_type", "value", 9, 10)


def q62_skew_join_nation_revenue(sf_dir: str):
    """SKEW-AWARE join (the 100-TB hot-key escape hatch): orders ⋈
    customer on custkey with heavy-hitter customers routed around the
    shuffle — `hot_keys` discovers keys with ≥14 orders from per-batch
    locally-frequent partials (shuffle carries candidates only), their
    dim rows broadcast once via ray.put and join inside map_batches with
    NO exchange, while cold keys take the ordinary bucketed join. The
    union is exact for ANY hot/cold split, so the result is invariant to
    discovery noise — verified by the plain-SQL oracle. Rollup to the 25
    nations happens AFTER the union (tiny groupby), nation names attach
    via the J1 broadcast lookup."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.joins import skew_aware_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
                   ).map_batches(
        lambda b: b.rename_columns(["custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
                 ).map_batches(
        lambda b: b.rename_columns(["custkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    joined = skew_aware_join(
        orders, cust, "custkey", ["o_totalprice"], ["c_nationkey"],
        hot_min_count=14,
    )

    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nk = pc.cast(nat["n_nationkey"], pa.int64()).combine_chunks()
    nv = nat["n_name"].combine_chunks()

    def add_name(b: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(b["c_nationkey"], pa.int64()), value_set=nk)
        return pa.table(
            {"n_name": pc.take(nv, idx), "o_totalprice": b["o_totalprice"]}
        )

    df = (
        joined.map_batches(add_name, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue"),
        )
        .to_pandas()
    )
    df["n_orders"] = df["n_orders"].astype("int64")
    return _round_col(df, "revenue", 2)


def q63_lag_delta(sf_dir: str):
    """Windowed LAG per key (value change between a user's consecutive
    events): users hash into cluster-sized coarse groups (the q18
    discipline — one vectorized pandas pass per group, not one
    map_groups call per user), the in-group pass sorts by the window
    order and takes a per-user shift. First event per user (lag NULL) is
    dropped so the relation is null-free for the typed hash."""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    salts = _coarse_salts(None)

    def add_cg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cg",
            pc.cast(
                pc.bit_wise_and(pc.cast(b["user_id"], pa.int64()), salts - 1),
                pa.int32(),
            ),
        )

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id")["value"].shift(1)
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "delta": g["value"] - prev,
            }
        )
        out = out[prev.notna().to_numpy()]
        out["delta"] = [_round_half_up(float(v), 3) for v in out["delta"]]
        return out

    return (
        ds.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(lag, batch_format="pandas")
    )


def q64_tfidf_topk(sf_dir: str):
    """TF-IDF top-3 terms per document, end to end distributed: q48's
    tf⋈df bucketed join (token-keyed, df never on the driver) → score →
    per-doc top-3 in doc-keyed coarse groups (the q18 discipline). The
    score is the exact rational tf·N/df — ONE IEEE division of exactly
    representable ints, so Ray and the SQL twin agree bit-for-bit where a
    libm log() would drift ulps; ties break on the token."""
    from basicocr_ray.stages.dedup import _coarse_salts

    tfdf = q48_tf_df(sf_dir)
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    salts = _coarse_salts(None)

    def add_score(b: pa.Table) -> pa.Table:
        score = pc.divide(
            pc.cast(pc.multiply(b["tf"], n_docs), pa.float64()),
            pc.cast(b["df"], pa.float64()),
        )
        cg = pc.cast(
            pc.bit_wise_and(pc.cast(b["doc_id"], pa.int64()), salts - 1),
            pa.int32(),
        )
        return pa.table(
            {"doc_id": b["doc_id"], "token": b["token"],
             "score": score, "cg": cg}
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby("doc_id").head(3)[["doc_id", "token", "score"]]

    return (
        tfdf.map_batches(add_score, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(topk, batch_format="pandas")
    )


def q65_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type — the partial+final
    composition for distributed distinct-counting: per-batch LOCAL pair
    dedup shrinks the exchange to unique (type, user) pairs per batch,
    pairs land in coarse groups of the user hash (a pair appears in
    exactly one group → in-group dedup is globally exact), each group
    emits tiny per-type partial counts, and a 5-row final sum finishes.
    (HLL `approx_distinct` is the sketch sibling; this is the exact
    path.)"""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    salts = _coarse_salts(None)

    def local_dedup(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            b, ["event_type", "user_id"], use_threads=False
        ).aggregate([])
        return g.append_column(
            "cg",
            pc.cast(
                pc.bit_wise_and(pc.cast(g["user_id"], pa.int64()), salts - 1),
                pa.int32(),
            ),
        )

    def group_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["event_type", "user_id"])
        out = d.groupby("event_type", as_index=False).size()
        return out.rename(columns={"size": "n_users"})

    from ray.data.aggregate import Sum

    res = (
        ds.map_batches(local_dedup, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(group_counts, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    res["n_users"] = res["n_users"].astype("int64")
    return res


def q66_group_quantile_cont(sf_dir: str):
    """Interpolated (continuous) per-group quantile at q = 3/4 — the
    percentile_cont sibling of q60's percentile_disc, same three-scan
    histogram refinement fetching the TWO order statistics around
    h = (n-1)·q. q is an exact binary rational so the interpolation
    arithmetic is bit-identical to DuckDB's double evaluation."""
    from basicocr_ray.stages.wide import grouped_quantile_cont

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_quantile_cont(ds, "event_type", "value", 3, 4)


def q67_left_join_order_counts(sf_dir: str):
    """LEFT OUTER join with both sides fact-scale: per-customer order
    count INCLUDING zero-order customers (`bucketed_hash_join(join_type=
    "left outer")` — unmatched left rows take null-padded right columns
    inside the bucket task; a custkey never spans buckets so the Acero
    per-bucket left-outer joins compose exactly). The count(o_orderkey)
    aggregate is fused into the join task via ``bucket_post_fn`` (Arrow
    ``count`` skips nulls, matching SQL COUNT(col)), so the whole query
    is one shuffle."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey"]
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b["o_custkey"], "o_orderkey": b["o_orderkey"]}
        ),
        batch_format="pyarrow",
    )

    def count_per_key(t: pa.Table) -> pa.Table:
        g = t.group_by("c_custkey").aggregate([("o_orderkey", "count")])
        return pa.table(
            {
                "c_custkey": g["c_custkey"],
                "n_orders": pc.cast(g["o_orderkey_count"], pa.int64()),
            }
        )

    return bucketed_hash_join(
        cust,
        orders,
        "c_custkey",
        [],
        ["o_orderkey"],
        bucket_post_fn=count_per_key,
        join_type="left outer",
    )


def q68_edit1_fuzzy_pairs(sf_dir: str):
    """Edit-distance-≤1 fuzzy self-join over the corpus vocabulary ∪ the
    source-label dictionary (the spell-correction candidate-discovery
    task — A2's trie corrector finds dictionary matches for ONE word via
    a broadcast trie; this finds EVERY fuzzy-matching pair with the
    dictionary distributed): SymSpell/FastSS deletion-neighborhood
    candidates → exact Levenshtein verify (`stages.simjoin.
    edit1_vocab_join`). The vocab feed is per-batch locally distinct
    only — global duplicates collapse inside the join's own candidate
    groups and pair dedup, so no separate distinct stage is needed."""
    from basicocr_ray.stages.simjoin import edit1_vocab_join

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def local_vocab(b: pa.Table) -> pa.Table:
        s: set[str] = set()
        for t in b["text"].to_pylist():
            if t:
                s.update(token_items(t))
        for src in b["source"].to_pylist():
            if src:
                s.add(src)
        s.discard("")
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    vocab = ds.map_batches(local_vocab, batch_format="pyarrow")
    return edit1_vocab_join(vocab)


def q69_window_rank(sf_dir: str):
    """Per-group window ranking — ROW_NUMBER / NTILE(4) / PERCENT_RANK
    over (PARTITION BY event_type ORDER BY value, event_id) — via the
    range-partition discipline (`stages.wide.grouped_window_rank`): rows
    shuffle once by (group, value-bucket), never a whole group into one
    task. The unique (value, event_id) order key makes RANK ≡ ROW_NUMBER,
    so PERCENT_RANK's (rn-1)/(n-1) double matches DuckDB bit-for-bit."""
    from basicocr_ray.stages.wide import grouped_window_rank

    ds = _read(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )
    out = grouped_window_rank(ds, "event_type", "value", "event_id", 4)
    return out.map_batches(
        lambda b: b.select(["event_id", "event_type", "rn", "tile", "pr"]),
        batch_format="pyarrow",
    )


def q70_mode_user(sf_dir: str):
    """Grouped MODE with a deterministic tie ladder: the most active
    user per event type (count desc, user_id asc). Two shuffles of
    metadata only: (group, user) partial counts fold in coarse groups of
    the composite-key hash; the per-group argmax then folds in coarse
    groups of the GROUP hash, so every group's candidates meet in one
    pandas idxmax — rows never shuffle."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["event_type", "user_id"], as_index=False
        ).agg(n=("user_id", "size"))
        h = pd.util.hash_pandas_object(
            out[["event_type", "user_id"]], index=False
        ).to_numpy()
        out["cg"] = (h & (salts - 1)).astype("int32")
        return out

    def final_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["event_type", "user_id"], as_index=False
        )["n"].sum()
        h = pd.util.hash_array(out["event_type"].to_numpy())
        out["cg2"] = (h & (salts - 1)).astype("int32")
        return out.astype({"n": "int64", "user_id": "int64"})

    def mode_in_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["event_type", "n", "user_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = df.groupby("event_type", as_index=False).first()
        return out[["event_type", "user_id", "n"]].rename(
            columns={"user_id": "mode_user", "n": "n_events"}
        ).astype({"mode_user": "int64", "n_events": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final_counts, batch_format="pandas")
        .groupby("cg2")
        .map_groups(mode_in_group, batch_format="pandas")
    )


def q71_value_histogram(sf_dir: str):
    """Per-group equi-width 16-bin histogram of `value` (the engine's
    internal quantile/window binning surfaced as a user op): bin width
    derives from the group's (min, max) metadata reduce; bin counts are
    partial-aggregated per batch before the tiny (group, bin) final sum.
    Bin arithmetic is the identical IEEE double expression on the SQL
    side (floor((v-lo)/w) clamped to 15; degenerate lo=hi groups → bin
    0), so counts hash-match."""
    from basicocr_ray.stages.dedup import _coarse_salts

    NB = 16
    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    stats: dict = {}
    def p1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["event_type", "value"]].dropna()
        return df.groupby("event_type", as_index=False).agg(
            lo=("value", "min"), hi=("value", "max")
        )

    for row in collect_rows(ds.map_batches(p1, batch_format="pandas")):
        g = row["event_type"]
        if g in stats:
            stats[g]["lo"] = min(stats[g]["lo"], float(row["lo"]))
            stats[g]["hi"] = max(stats[g]["hi"], float(row["hi"]))
        else:
            stats[g] = {"lo": float(row["lo"]), "hi": float(row["hi"])}

    los = {g: s["lo"] for g, s in stats.items()}
    widths = {g: (s["hi"] - s["lo"]) / NB for g, s in stats.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["event_type", "value"]].dropna()
        lo = df["event_type"].map(los).to_numpy()
        w = df["event_type"].map(widths).to_numpy()
        v = df["value"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.floor((v - lo) / w)
        bins = np.where(
            w == 0.0, 0, np.minimum(raw, NB - 1)
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": df["event_type"], "bin": bins})
        out = df.groupby(["event_type", "bin"], as_index=False).agg(
            n=("bin", "size")
        )
        h = pd.util.hash_pandas_object(
            out[["event_type", "bin"]], index=False
        ).to_numpy()
        out["cg"] = (h & (salts - 1)).astype("int32")
        return out

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "bin"], as_index=False)["n"].sum()
        return out.astype({"bin": "int64", "n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final_sum, batch_format="pandas")
    )


def q72_repetition_stats(sf_dir: str):
    """Per-document repetition signal (the Gopher/MassiveText
    duplicate-n-gram quality rule, Rae et al. 2021 §A1.1 — kept as the
    integer pair (total, distinct) so the driver hash is float-free):
    word-bigram totals vs distincts per doc. Pure per-batch map — no
    shuffle at any scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        ids, tot, dis = [], [], []
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            toks = (t or "").lower().split()
            grams = list(zip(toks, toks[1:]))
            ids.append(did)
            tot.append(len(grams))
            dis.append(len(set(grams)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(tot, pa.int64()),
                "n_distinct": pa.array(dis, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def q73_props_json_sum(sf_dir: str):
    """Semi-structured sidecar parsing (every web-crawl pipeline carries
    a JSON metadata column next to the payload): extract `k` from the
    `props` JSON string with ONE vectorized regex pass per batch
    (pandas .str.extract — no per-row json.loads), then the usual
    partial+final rollup per event type. Non-matching / missing props
    degrade to NULL (sum skips, n counts all rows), mirroring the SQL
    twin's TRY_CAST."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k":\s*(\d+)', expand=False),
            errors="coerce",
        )
        g = pd.DataFrame({"event_type": df["event_type"], "k": k}).groupby(
            "event_type", as_index=False
        ).agg(sum_k=("k", "sum"), n=("k", "size"))
        h = pd.util.hash_array(g["event_type"].to_numpy())
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False)[["sum_k", "n"]].sum()
        return out.astype({"sum_k": "int64", "n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q74_except_users(sf_dir: str):
    """Distributed EXCEPT (set difference over DISTINCT keys): users with
    a high-value click but no high-value purchase. ONE scan tags each
    qualifying (user, side) with a bit, batches dedup locally, and the
    per-user bit-max folds in coarse groups of the user hash — the
    shuffle carries distinct (user, bit) pairs, never events. INTERSECT
    and UNION fall out of the same shape (max==3 / any)."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    import pyarrow.dataset as pads

    # predicate pushdown: row groups whose stats exclude the filter are
    # never read; the in-batch filter below stays as a cheap guard
    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "value"],
        filter=(pads.field("value") > 95.0)
        & pads.field("event_type").isin(["click", "purchase"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[
            (df["value"] > 95.0)
            & df["event_type"].isin(["click", "purchase"])
        ]
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "bit": np.where(
                    df["event_type"].to_numpy() == "click", 1, 2
                ).astype("int64"),
            }
        ).drop_duplicates()
        h = pd.util.hash_array(out["user_id"].to_numpy())
        out["cg"] = (h & (salts - 1)).astype("int32")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id", as_index=False)["bit"].max()
        return m.loc[m["bit"] == 1, ["user_id"]].astype("int64")

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
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


def q76_chunk_dedup(sf_dir: str):
    """Corpus-wide chunk-level exact dedup with reassembly (the CCNet
    paragraph-dedup shape, Wenzek et al. 2020 §4.1, at fixed 10-word
    chunk granularity): each distinct chunk keeps only its first
    (doc_id, idx) occurrence corpus-wide, then surviving chunks
    string-agg back into documents. Two coarse-grouped shuffles — by
    chunk-hash salt (dedup) then doc-hash salt (reassembly)."""
    from basicocr_ray.stages.decontam import chunk_dedup_reassemble

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_dedup_reassemble(docs, chunk_words=10)


def q77_hopping_window(sf_dir: str):
    """HOPPING (sliding) window aggregate — 1-hour windows every 30
    minutes, so each event lands in exactly TWO windows. The overlap is
    resolved per batch (each row fans out to its two window starts
    before the partial aggregate), so the shuffle still carries only
    (window, type) partials — the streaming-engine shape where window
    assignment is a stateless map, never a self-join. q05 is the
    tumbling special case (hop == width). The value sum is kept in
    integer CENTS (values are 2-decimal doubles) so the partial+final
    addition order can't drift a double ulp from the oracle's."""
    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    salts = _coarse_salts(None)
    HOP = pd.Timedelta(minutes=30)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        f = df["ts"].dt.floor("30min")
        cents = np.round(df["value"].to_numpy() * 100.0).astype("int64")
        fan = pd.concat(
            [
                pd.DataFrame(
                    {"wstart": f, "event_type": df["event_type"],
                     "cents": cents}
                ),
                pd.DataFrame(
                    {"wstart": f - HOP, "event_type": df["event_type"],
                     "cents": cents}
                ),
            ],
            ignore_index=True,
        )
        g = fan.groupby(["wstart", "event_type"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        g["cg"] = (
            pd.util.hash_pandas_object(
                g[["wstart", "event_type"]], index=False
            )
            % salts
        ).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["wstart", "event_type"], as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum")
        )
        return out.astype({"n": "int64", "sum_cents": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q78_funnel_stages(sf_dir: str):
    """Ordered-sequence funnel (signup → click → purchase): the furthest
    stage each signed-up user reached, where each step must strictly
    FOLLOW the previous step's first occurrence — the event-analytics op
    a plain per-type min-ts rollup gets wrong. Rows shuffle ONCE into
    coarse groups of the user hash (a user's history is complete inside
    its group); the per-stage chaining is three vectorized merges inside
    the group task, never a driver loop."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    import pyarrow.dataset as pads

    STEPS = ("signup", "click", "purchase")
    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(list(STEPS)),
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(STEPS)]
        h = pd.util.hash_array(df["user_id"].to_numpy())
        df = df.copy()
        df["cg"] = (h & (salts - 1)).astype("int32")
        return df

    def stages(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            df[df["event_type"] == "signup"]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t1"})
        )
        cl = df[df["event_type"] == "click"].merge(t1, on="user_id")
        t2 = (
            cl[cl["ts"] > cl["t1"]]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t2"})
        )
        pu = df[df["event_type"] == "purchase"].merge(t2, on="user_id")
        t3 = (
            pu[pu["ts"] > pu["t2"]]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t3"})
        )
        out = t1.merge(t2, on="user_id", how="left").merge(
            t3, on="user_id", how="left"
        )
        out["stage"] = (
            1 + out["t2"].notna().astype(int) + out["t3"].notna().astype(int)
        )
        return out[["user_id", "stage"]].astype(
            {"user_id": "int64", "stage": "int64"}
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("cg")
        .map_groups(stages, batch_format="pandas")
    )


def q79_cube_events(sf_dir: str):
    """GROUP BY CUBE(event_type, day-of-week): all four grouping sets
    from ONE scan via the rollup machinery's partial-reuse discipline
    (`stages.wide.cube_counts` — coarser sets aggregate the tiny finest
    AGGREGATE, never re-scan the data). Sums in integer cents."""
    from basicocr_ray.stages.wide import cube_counts

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "dow": df["ts"].dt.strftime("%a"),
                "cents": np.round(
                    df["value"].to_numpy() * 100.0
                ).astype("int64"),
            }
        )

    return cube_counts(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "dow"],
        "cents",
        n_name="n",
        sum_name="sum_cents",
    )


def q80_pivot_user_counts(sf_dir: str):
    """PIVOT events into one row per user with a count column per event
    type (the conditional-aggregation pivot): per-batch (user, type)
    partial counts shuffle as metadata, the coarse user-hash final
    unstacks to fixed columns — the pivot schema is declared (the five
    types), so output columns are deterministic at any scale."""
    from basicocr_ray.stages.dedup import _coarse_salts

    TYPES = ["click", "error", "purchase", "signup", "view"]
    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        h = pd.util.hash_array(g["user_id"].to_numpy())
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def unstack(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(["user_id", "event_type"], as_index=False)[
            "n"
        ].sum()
        wide = (
            tot.pivot(index="user_id", columns="event_type", values="n")
            .reindex(columns=TYPES)
            .fillna(0)
            .astype("int64")
            .rename(columns={t: f"n_{t}" for t in TYPES})
            .reset_index()
        )
        wide.columns.name = None
        return wide.astype({"user_id": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(unstack, batch_format="pandas")
    )


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


def q82_intersect_users(sf_dir: str):
    """Distributed INTERSECT — q74's EXCEPT shape with the other
    terminal predicate: users with BOTH a high-value click and a
    high-value purchase (per-user bit-OR over distinct (user, side)
    pairs == 3). The shuffle carries distinct pairs, never events."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    import pyarrow.dataset as pads

    # predicate pushdown: row groups whose stats exclude the filter are
    # never read; the in-batch filter below stays as a cheap guard
    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "value"],
        filter=(pads.field("value") > 95.0)
        & pads.field("event_type").isin(["click", "purchase"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[
            (df["value"] > 95.0)
            & df["event_type"].isin(["click", "purchase"])
        ]
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "bit": np.where(
                    df["event_type"].to_numpy() == "click", 1, 2
                ).astype("int64"),
            }
        ).drop_duplicates()
        h = pd.util.hash_array(out["user_id"].to_numpy())
        out["cg"] = (h & (salts - 1)).astype("int32")
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("user_id", as_index=False)["bit"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy()))
        )
        return m.loc[m["bit"] == 3, ["user_id"]].astype("int64")

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q83_share_of_total(sf_dir: str):
    """Percent-of-total (ratio_to_report): each event type's share of
    global value. Partials shrink the data to ≤ |types| rows per batch;
    the final single task sees every group, so the grand total is local
    arithmetic — no second pass, no broadcast. The share is ONE IEEE
    division of two exactly-representable integer cent sums, so Ray and
    the SQL twin agree bit-for-bit."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["value"].to_numpy() * 100.0).astype("int64")
        g = pd.DataFrame(
            {"event_type": df["event_type"], "cents": cents}
        ).groupby("event_type", as_index=False)["cents"].sum()
        g["_one"] = np.int32(0)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False)["cents"].sum()
        total = float(out["cents"].sum())
        out["share"] = out["cents"].astype("float64") / total
        return out.rename(columns={"cents": "sum_cents"}).astype(
            {"sum_cents": "int64"}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_one")
        .map_groups(final, batch_format="pandas")
    )


def q84_full_outer_counts(sf_dir: str):
    """FULL OUTER join of two sparse per-user aggregates (high-value
    click counts vs high-value purchase counts): unmatched users on
    EITHER side survive with a null count for the other — the flavor
    that completes the join family (inner/left/semi/anti/full). Both
    inputs are partial+final count pipelines; the join itself is the
    single-shuffle bucketed join."""
    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.joins import bucketed_hash_join

    salts = _coarse_salts(None)
    import pyarrow.dataset as pads

    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "value"],
        filter=(pads.field("value") > 95.0)
        & pads.field("event_type").isin(["click", "purchase"]),
    )

    def counts_of(etype: str, out_name: str):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["value"] > 95.0) & (df["event_type"] == etype)]
            g = df.groupby("user_id", as_index=False).agg(
                n=("user_id", "size")
            )
            h = pd.util.hash_array(g["user_id"].to_numpy())
            g["cg"] = (h & (salts - 1)).astype("int32")
            return g

        def final(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("user_id", as_index=False)["n"].sum()
            return out.rename(columns={"n": out_name}).astype(
                {"user_id": "int64", out_name: "int64"}
            )

        return (
            ds.map_batches(partial, batch_format="pandas")
            .groupby("cg")
            .map_groups(final, batch_format="pandas")
        )

    return bucketed_hash_join(
        counts_of("click", "n_click"),
        counts_of("purchase", "n_purchase"),
        "user_id",
        ["n_click"],
        ["n_purchase"],
        num_buckets=8,
        join_type="full outer",
    )


def q85_bpe_token_stats(sf_dir: str):
    """BPE-ish regex pre-tokenization counts (the GPT-2 pre-tokenizer
    class split, simplified to its three run classes): alphabetic runs,
    digit runs, and single non-alnum-non-space marks per document —
    the token-budget estimate every corpus costing pass needs. Three
    VECTORIZED pandas str.count passes per batch (no per-row Python);
    character classes are spelled in explicit ASCII so Python re and
    DuckDB's RE2 agree (\\s is unicode-wide in Python, ASCII in RE2)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    WS = " \\t\\n\\r\\f"

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower()
        n_alpha = t.str.count(r"[a-z]+").astype("int64")
        n_num = t.str.count(r"[0-9]+").astype("int64")
        n_other = t.str.count(f"[^a-z0-9{WS}]").astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_alpha": n_alpha,
                "n_num": n_num,
                "n_other": n_other,
                "n_bpe_tokens": n_alpha + n_num + n_other,
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def q86_dense_rank_tokens(sf_dir: str):
    """Per-language DENSE_RANK token leaderboard: every token whose
    count ties one of the top-2 distinct frequency values in its
    language (rank-with-ties — the variant plain top-k truncates
    wrong). Two metadata shuffles: (lang, token) partial counts fold in
    coarse groups of the composite hash; the per-lang dense-rank filter
    then runs in coarse groups of the LANG hash, where pandas
    rank(method="dense") over the (small) aggregated count table is the
    whole window function."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def explode_count(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower().str.split()
        e = pd.DataFrame(
            {"lang": df["lang"], "token": t}
        ).explode("token")
        e = e[e["token"].notna() & (e["token"] != "")]
        g = e.groupby(["lang", "token"], as_index=False).agg(
            n=("token", "size")
        )
        h = pd.util.hash_pandas_object(
            g[["lang", "token"]], index=False
        ).to_numpy()
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "token"], as_index=False)["n"].sum()
        h = pd.util.hash_array(out["lang"].to_numpy())
        out["cg2"] = (h & (salts - 1)).astype("int32")
        return out.astype({"n": "int64"})

    def dense_top2(df: pd.DataFrame) -> pd.DataFrame:
        rnk = (
            df.groupby("lang")["n"]
            .rank(method="dense", ascending=False)
            .astype("int64")
        )
        out = df.loc[rnk <= 2, ["lang", "token", "n"]].copy()
        out["rnk"] = rnk[rnk <= 2]
        return out.astype({"n": "int64", "rnk": "int64"})

    return (
        ds.map_batches(explode_count, batch_format="pandas")
        .groupby("cg")
        .map_groups(final_counts, batch_format="pandas")
        .groupby("cg2")
        .map_groups(dense_top2, batch_format="pandas")
    )


def q87_oov_rate(sf_dir: str):
    """OOV-rate quality signal (the CCNet/fastText-era LM-vocabulary
    filter reduced to its integer core): per document, total tokens and
    tokens OUTSIDE the corpus top-100 vocabulary. The vocabulary comes
    from the distributed count (count_terms partial+final) pruned to a
    deterministic top-k (count desc, token asc) — a BOUNDED broadcast by
    construction (K entries, the fit_bigram_lm max_vocab discipline),
    then one zero-shuffle membership scan."""
    import ray

    from basicocr_ray.core.collect import collect_rows
    from basicocr_ray.stages.wide import count_terms, token_items, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counts = count_terms(
        _read(sf_dir, "documents", columns=["text"]), "text", token_items
    )
    vocab = frozenset(
        r["token"] for r in collect_rows(top_k(counts, 100, "cnt", "token"))
    )
    ref = ray.put(vocab)

    def stats(b: pa.Table) -> pa.Table:
        v = ray.get(ref)
        ids, n_tok, n_oov = [], [], []
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            toks = token_items(t or "")
            ids.append(did)
            n_tok.append(len(toks))
            n_oov.append(sum(1 for x in toks if x not in v))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def q88_curate_corpus(sf_dir: str):
    """END-TO-END corpus curation (pipelines/curate.py): quality floor →
    benchmark-slice exclusion → exact dedup (first occurrence by content
    fingerprint, winners back via semi-join) → 5-gram decontamination vs
    the benchmark slice (bounded broadcast + anti-join) → deterministic
    md5 train/val/test split → per-(lang, split) rollup. The whole chain
    hash-checks against one SQL twin — the integration test a per-stage
    oracle can't give."""
    from basicocr_ray.pipelines.curate import curate_rollup

    return curate_rollup(sf_dir)


def q89_group_variance(sf_dir: str):
    """Exact grouped sample variance via ALGEBRAIC moments: partials
    carry (n, Σx, Σx²) in integer cents — mergeable by addition, so the
    partial+final shape is exact at any parallelism — and the variance
    is ONE double expression over exactly-representable int64 sums
    ((n·Σx² − (Σx)²) / (n·(n−1)·100²·… )), reproduced verbatim in the
    SQL twin so even the inexact int→double roundings coincide."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.round(df["value"].to_numpy() * 100.0).astype("int64")
        g = pd.DataFrame(
            {"event_type": df["event_type"], "c": c, "c2": c * c}
        ).groupby("event_type", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"), s2=("c2", "sum")
        )
        h = pd.util.hash_array(g["event_type"].to_numpy())
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False)[
            ["n", "s", "s2"]
        ].sum()
        # Python big-int moments (n·Σx² overflows int64 at corpus scale;
        # the oracle's HUGEINT is exact the same way), ONE double at the end
        var = [
            float(int(n) * int(s2) - int(s) * int(s))
            / (float(int(n) * (int(n) - 1)) * 10000.0)
            for n, s, s2 in zip(out["n"], out["s"], out["s2"])
        ]
        out["var_value"] = var
        return out[["event_type", "n", "var_value"]].astype({"n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q90_value_k_corr(sf_dir: str):
    """Exact Pearson correlation between the event value (cents) and the
    JSON-sidecar integer k, per event type — the same algebraic-moment
    discipline as q89 extended to cross moments (n, Σx, Σy, Σx², Σy²,
    Σxy all int64; one double expression at the end, identical on the
    SQL side including the IEEE sqrt). Rows with unparseable props drop
    on both sides."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "value", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k":\s*(\d+)', expand=False),
            errors="coerce",
        )
        m = k.notna() & df["value"].notna()
        x = np.round(df.loc[m, "value"].to_numpy() * 100.0).astype("int64")
        y = k[m].to_numpy().astype("int64")
        g = pd.DataFrame(
            {
                "event_type": df.loc[m, "event_type"],
                "x": x, "y": y, "x2": x * x, "y2": y * y, "xy": x * y,
            }
        ).groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sx2=("x2", "sum"), sy2=("y2", "sum"), sxy=("xy", "sum"),
        )
        h = pd.util.hash_array(g["event_type"].to_numpy())
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        import math

        out = df.groupby("event_type", as_index=False)[
            ["n", "sx", "sy", "sx2", "sy2", "sxy"]
        ].sum()
        corr = []
        for _, r in out.iterrows():  # ≤ |event types| rows
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sx2, sy2, sxy = int(r["sx2"]), int(r["sy2"]), int(r["sxy"])
            corr.append(
                float(n * sxy - sx * sy)
                / (
                    math.sqrt(float(n * sx2 - sx * sx))
                    * math.sqrt(float(n * sy2 - sy * sy))
                )
            )
        out["corr_vk"] = corr
        return out[["event_type", "n", "corr_vk"]].astype({"n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q61_chained_join_returns(sf_dir: str):
    """THREE-table chained bucketed join (TPC-H Q10 shape): revenue lost
    to returned items per customer — lineitem(R) ⋈ orders on orderkey,
    then ⋈ customer on custkey, top-20. Composition discipline: the first
    join's ``bucket_post_fn`` PRE-AGGREGATES revenue per custkey inside
    each orderkey-bucket (a custkey spans orderkey-buckets, so it's a
    partial — but it shrinks the second shuffle's input to ≤ |custkeys|
    per bucket); the second join's post_fn runs the FINAL per-custkey sum
    + local top-20 (exact — a custkey never spans custkey-buckets). Each
    row shuffles twice total, once per join key, with the aggregates fused
    into the join tasks."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(
        lambda b: (
            lambda f: pa.table(
                {
                    "okey": f["l_orderkey"],
                    "rev": pc.multiply(
                        f["l_extendedprice"], pc.subtract(1.0, f["l_discount"])
                    ),
                }
            )
        )(b.filter(pc.equal(b["l_returnflag"], "R"))),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pa.table({"okey": b["o_orderkey"], "o_custkey": b["o_custkey"]}),
        batch_format="pyarrow",
    )

    def partial_by_cust(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.float64()),
                }
            )
        g = pa.TableGroupBy(tbl, ["o_custkey"], use_threads=False).aggregate(
            [("rev", "sum")]
        )
        return g.rename_columns(["c_custkey", "rev"])

    partials = bucketed_hash_join(
        li, od, "okey", ["rev"], ["o_custkey"], bucket_post_fn=partial_by_cust
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def final_topk(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        g = pa.TableGroupBy(
            tbl, ["c_custkey", "c_name"], use_threads=False
        ).aggregate([("rev", "sum")])
        g = g.rename_columns(["c_custkey", "c_name", "revenue"])
        order = pc.sort_indices(
            g,
            sort_keys=[("revenue", "descending"), ("c_custkey", "ascending")],
        )[:20]
        return g.take(order)

    top = (
        bucketed_hash_join(
            partials, cust, "c_custkey", ["rev"], ["c_name"],
            bucket_post_fn=final_topk,
        )
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    top["c_custkey"] = top["c_custkey"].astype("int64")
    return _round_col(top, "revenue", 2)


def q44_range_join(sf_dir: str):
    """Distributed RANGE JOIN (non-equi; the task brief's custom-operator
    example Ray Data lacks): events ⋈ maintenance windows on
    start ≤ ts < end via `stages.joins.interval_join` (domain-bucket
    partition, interval replication, in-group vectorized containment).
    The 25 windows derive deterministically from min(ts) + the nation
    keys, so the DuckDB twin reproduces them exactly."""
    from basicocr_ray.stages.joins import interval_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts"])
    min_ts_us = int(
        pd.Timestamp(ev.min("ts")).value // 1000
    )

    nat = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey"])
    ks = sorted(int(k) for k in nat["n_nationkey"].to_pylist())
    MIN_US = 60_000_000
    wins = pa.table(
        {
            "window_id": pa.array(ks, pa.int64()),
            "w_start": pa.array(
                [min_ts_us + k * 97 * MIN_US for k in ks], pa.int64()
            ),
            "w_end": pa.array(
                [
                    min_ts_us + k * 97 * MIN_US + (53 + 13 * k) * MIN_US
                    for k in ks
                ],
                pa.int64(),
            ),
        }
    )
    import ray.data as _rd

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts_us": pc.cast(
                    pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    joined = interval_join(
        ev.map_batches(to_us, batch_format="pyarrow"),
        _rd.from_arrow(wins),
        point_column="ts_us",
        start_column="w_start",
        end_column="w_end",
        point_columns=["event_id"],
        interval_columns=["window_id"],
        bucket_width=3600 * 1_000_000,
    )
    return joined.map_batches(
        lambda b: pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "window_id": pc.cast(b["window_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q42_neardup_components(sf_dir: str):
    """Near-dup clusters end-to-end: MinHash-LSH candidates → exact
    Jaccard verify (bucketed join) → JOIN-BASED connected components
    (distributed min-label propagation, `stages.dedup.assign_components`).
    The DuckDB twin computes the same components from the brute-force
    pair set with a recursive transitive closure."""
    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard_join(
        pairs, ds, "doc_id", "text", threshold=0.8
    )
    comps = assign_components(verified.select_columns(["id_a", "id_b"]))
    return comps.map_batches(
        lambda b: pa.table(
            {
                "id": pc.cast(b["id"], pa.int64()),
                "rep": pc.cast(b["rep"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q43_video_frames(sf_dir: str):
    """Video frame-sampling end-to-end: deterministic VID! containers of
    REAL PNG frames per embeddings row, the VideoFrameSampler actor pool
    (every-2nd-frame decode through the real codec), and the
    SQL-checkable frame-index arithmetic. Pixel stats (mean/phash) are
    pytest-verified (tests/test_png.py); the hash covers the sampling
    contract."""
    from basicocr_ray.stages.multimodal import (
        VideoFrameSampler,
        make_video_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        make_video_payload(i, n_frames=4 + (i % 5))
                        for i in ids
                    ],
                    pa.large_binary(),
                ),
            }
        )

    sampled = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": batch["item_id"],
                "fps": pc.cast(batch["fps"], pa.int64()),
                "n_frames": pc.cast(batch["n_frames"], pa.int64()),
                "frame_index": pc.cast(batch["frame_index"], pa.int64()),
                "width": pc.cast(batch["width"], pa.int64()),
                "height": pc.cast(batch["height"], pa.int64()),
            }
        )

    return sampled.map_batches(project, batch_format="pyarrow")


def q41_audio_frames(sf_dir: str):
    """Audio frame-sampling plumbing end-to-end: deterministic AUD!
    payloads per embeddings row (rate/duration derived from the id), the
    AudioFrameSampler actor pool, and the SQL-checkable integer columns
    (sample_rate, n_frames, n_features). The real WAV path is exercised
    by tests/test_wav.py; this query hashes the fixture path's frame
    arithmetic."""
    from basicocr_ray.stages.multimodal import (
        AudioFrameSampler,
        make_audio_payload,
    )

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        make_audio_payload(
                            i, 8000 + (i % 8) * 1000, 1.0 + (i % 5) * 0.5
                        )
                        for i in ids
                    ],
                    pa.large_binary(),
                ),
            }
        )

    sampled = ds.map_batches(payloads, batch_format="pyarrow").map_batches(
        AudioFrameSampler,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "item_id": batch["item_id"],
                "sample_rate": pc.cast(batch["sample_rate"], pa.int64()),
                "n_frames": pc.cast(batch["n_frames"], pa.int64()),
                "n_features": pc.cast(
                    pc.list_value_length(batch["features"]), pa.int64()
                ),
            }
        )

    return sampled.map_batches(project, batch_format="pyarrow")


def q40_cjk_segment(sf_dir: str):
    """Dictionary-based CJK segmentation end-to-end (M14, the HanLP pass of
    `Test.java:20-53`): synthesize zh text from each document via a
    BIJECTIVE token → 2-CJK-char mapping (every glyph char belongs to
    exactly one word, so forward maximum matching provably recovers the
    original token sequence), segment with the broadcast-lexicon FMM actor
    pool, and return per-doc segment counts. The DuckDB twin computes the
    same counts from the original whitespace tokens — equal by the
    bijection, so the hash check verifies the segmenter recovered every
    word boundary."""
    import ray

    from basicocr_ray.stages.segment import SegmentTokenizer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = sorted(
        r["token"]
        for r in collect_rows(count_terms(ds, "text", token_items, "token"))
    )
    def glyph_pair(i: int) -> str:
        # Two consecutive codepoints per token starting at U+4E00, hopping
        # over the UTF-16 surrogate block U+D800–U+DFFF (unpaired
        # surrogates are not Unicode scalar values — pyarrow's string
        # conversion raises — and the naive 0x4E00+2i walk reaches the
        # block at i >= 17664, i.e. any vocabulary above ~17.6k tokens).
        base = 0x4E00 + 2 * i
        if base >= 0xD800:
            base += 0x800
        return chr(base) + chr(base + 1)

    mapping = {tok: glyph_pair(i) for i, tok in enumerate(vocab)}
    map_ref = ray.put(mapping)

    def make_zh(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        texts = [
            "".join(m[t] for t in (x or "").lower().split())
            for x in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(texts, pa.string()),
            }
        )

    lex_ref = ray.put(sorted(mapping.values()))
    segged = ds.map_batches(make_zh, batch_format="pyarrow").map_batches(
        SegmentTokenizer,
        fn_constructor_kwargs={"lexicon_ref": lex_ref},
        batch_format="pyarrow",
        concurrency=2,
    )
    return segged.select_columns(
        ["doc_id", "n_segments", "n_distinct_segments"]
    )


# ===========================================================================
# Round-3 late wave: end-to-end near-dup dedup, clustering, cohorts,
# corpus mixing, collocations, per-group argmax join
# ===========================================================================

def q91_neardup_survivors(sf_dir: str):
    """END-TO-END near-duplicate DEDUP — the flagship LLM-corpus operator:
    MinHash-LSH candidates → exact-Jaccard verify (bucketed join) →
    join-based connected components → drop every non-representative member
    → per-language survivor rollup. Composes q22's discovery, q42's
    clustering and the anti-join in one pipeline; `sum_doc_id` is exact
    integer evidence of WHICH docs survived, not just how many. The
    text relation never materializes on the driver; the removal set rides
    a bucketed left-anti join (both-sides-large NOT EXISTS)."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.dedup import (
        assign_components,
        minhash_candidate_pairs,
        verify_pairs_jaccard_join,
    )
    from basicocr_ray.stages.joins import bucketed_hash_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    ids_text = docs.select_columns(["doc_id", "text"])
    pairs = minhash_candidate_pairs(ids_text, "doc_id", "text", num_bands=32)
    verified = verify_pairs_jaccard_join(
        pairs, ids_text, "doc_id", "text", threshold=0.8
    )
    comps = assign_components(verified.select_columns(["id_a", "id_b"]))

    def removed_only(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["id"], b["rep"])
        return pa.table(
            {"doc_id": pc.cast(b.filter(keep)["id"], pa.int64())}
        )

    removed = comps.map_batches(removed_only, batch_format="pyarrow")
    survivors = bucketed_hash_join(
        docs.select_columns(["doc_id", "lang"]),
        removed,
        key="doc_id",
        left_columns=["lang"],
        right_columns=[],
        join_type="left anti",
    )
    out = (
        survivors.groupby("lang")
        .aggregate(
            Count(alias_name="n_kept"),
            Sum("doc_id", alias_name="sum_doc_id"),
        )
        .to_pandas()
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_doc_id"] = out["sum_doc_id"].astype("int64")
    return out


def q92_kmeans_assign(sf_dir: str):
    """Embedding cluster assignment against k=4 broadcast centroids (the
    IVF coarse-quantizer step): centroids = the vec_id<4 embeddings,
    per-batch vectorized argmin of squared L2 in float64 (ties → lowest
    centroid id, `stages.kmeans._assign`), tiny per-cluster rollup.
    No shuffle — the k×dim centroid matrix broadcasts in the task closure;
    `sum_vec_id` is exact integer evidence of the full assignment."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.kmeans import kmeans_assign

    ctab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    crows = ctab.filter(pc.less(ctab["vec_id"], 4)).sort_by("vec_id")
    centroids = np.asarray(crows["embedding"].to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = kmeans_assign(ds, centroids)

    def widen(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster": pc.cast(b["cluster"], pa.int64()),
            }
        )

    out = (
        assigned.map_batches(widen, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Count(alias_name="n_vecs"),
            Sum("vec_id", alias_name="sum_vec_id"),
        )
        .to_pandas()
    )
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["sum_vec_id"] = out["sum_vec_id"].astype("int64")
    return out


_WEEK_US = 7 * 86_400_000_000
_DAY_US = 86_400_000_000


def _week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """Monday-start week truncation on µs-epoch ints — exact integer
    arithmetic mirroring DuckDB date_trunc('week', ts) (1970-01-01 was a
    Thursday → weekday = (days + 3) % 7)."""
    d = ts_us // _DAY_US
    return (d - (d + 3) % 7) * _DAY_US


def q93_cohort_retention(sf_dir: str):
    """Cohort retention matrix over events: each user's cohort is the week
    of their FIRST event; count distinct users per (cohort_week,
    active_week). One user-hash shuffle: per-batch (user, week) pair dedup
    shrinks the exchange, coarse groups of the user hash make the
    per-user min-week exact (a user lands wholly in one group), groups
    emit (cohort, week, partial n) and a tiny final sum finishes —
    the q65 exact-distinct discipline extended to a self-derived key."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.dedup import _coarse_salts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    salts = _coarse_salts(None)

    def local_pairs(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        weeks = _week_start_us(ts_us)
        t = pa.table(
            {
                "user_id": b["user_id"],
                "week_us": pa.array(weeks, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["user_id", "week_us"], use_threads=False)
        d = g.aggregate([])
        return d.append_column(
            "cg",
            pc.cast(
                pc.bit_wise_and(pc.cast(d["user_id"], pa.int64()), salts - 1),
                pa.int32(),
            ),
        )

    def group_matrix(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "week_us"])
        cohort = d.groupby("user_id")["week_us"].transform("min")
        out = (
            pd.DataFrame({"cohort_us": cohort, "week_us": d["week_us"]})
            .groupby(["cohort_us", "week_us"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return out

    res = (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(group_matrix, batch_format="pandas")
        .groupby(["cohort_us", "week_us"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    res["cohort_week"] = pd.to_datetime(res.pop("cohort_us"), unit="us")
    res["active_week"] = pd.to_datetime(res.pop("week_us"), unit="us")
    res["n_users"] = res["n_users"].astype("int64")
    return res[["cohort_week", "active_week", "n_users"]]


def q94_lang_mix_weights(sf_dir: str):
    """Multilingual sampling-temperature weights (the mBERT/XLM exponent
    trick at α=0.5): per-lang share ∝ sqrt(n_l/N). One tiny aggregate;
    sqrt and the n/N division are IEEE-exact-rounded so both engines agree
    bitwise, and the ≤5-term normalizing sum hides any last-ulp
    order drift under round-6."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["lang"])
    df = ds.groupby("lang").aggregate(Count(alias_name="n_docs")).to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    n_total = int(df["n_docs"].sum())
    w = np.sqrt(df["n_docs"].to_numpy(dtype=np.float64) / float(n_total))
    total_w = float(w.sum())
    df["sample_share"] = [_round_half_up(x / total_w, 6) for x in w]
    return df


def q95_pmi_collocations(sf_dir: str):
    """PMI-ranked collocations: lift(x,y) = c_xy·N / (c_x·c_y) over
    whitespace bigrams with c_xy ≥ 5. Distributed shape: partial+final
    unigram AND bigram counts (G3/G4), then the bigram relation joins the
    unigram counts TWICE via the bucketed hash join on each constituent
    token — open-vocabulary safe (no driver-side vocab dict; contrast the
    round-2 q48 anti-pattern). All counts are exact int64; the score is
    ONE division of exact integers (< 2^53) so both engines produce the
    identical double, then round-6."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["text"])
    uni = count_terms(ds, "text", token_items, "token")
    bi = count_terms(ds, "text", make_ngram_items(2), "bigram")

    n_total = int(
        uni.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b["cnt"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("s")
    )

    def split_bi(b: pa.Table) -> pa.Table:
        big = b["bigram"].to_pylist()
        w1, w2 = [], []
        for g in big:
            a, _, c = g.partition(" ")
            w1.append(a)
            w2.append(c)
        return pa.table(
            {
                "bigram": b["bigram"],
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "cnt_xy": b["cnt"],
            }
        )

    bi_f = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["cnt"], 5)),
        batch_format="pyarrow",
    ).map_batches(split_bi, batch_format="pyarrow")

    uni1 = uni.map_batches(
        lambda b: pa.table({"w1": b["token"], "cnt_x": b["cnt"]}),
        batch_format="pyarrow",
    )
    uni2 = uni.map_batches(
        lambda b: pa.table({"w2": b["token"], "cnt_y": b["cnt"]}),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        bi_f, uni1, key="w1",
        left_columns=["bigram", "w2", "cnt_xy"], right_columns=["cnt_x"],
    )
    j2 = bucketed_hash_join(
        j1, uni2, key="w2",
        left_columns=["bigram", "cnt_xy", "cnt_x"], right_columns=["cnt_y"],
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        num = df["cnt_xy"].to_numpy(dtype=np.int64) * np.int64(n_total)
        den = df["cnt_x"].to_numpy(dtype=np.int64) * df["cnt_y"].to_numpy(
            dtype=np.int64
        )
        df = df[["bigram", "cnt_xy"]].copy()
        df["lift"] = num.astype(np.float64) / den.astype(np.float64)
        # local prune: top-20 per batch before the tiny global sort
        return df.sort_values(
            ["lift", "bigram"], ascending=[False, True], kind="mergesort"
        ).head(20)

    top = (
        j2.map_batches(score, batch_format="pandas")
        .sort(["lift", "bigram"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return _round_col(top, "lift", 6)


def q96_top_supplier_per_part(sf_dir: str):
    """Per-part best supplier by revenue (the TPC-H Q2 correlated-subquery
    shape as a distributed argmax): partial (part, supp) revenue sums →
    per-part top-1 inside coarse groups of the part key (a part never
    spans groups → exact) → the 10-row supplier table broadcasts as a
    plain lookup (J1) instead of a shuffle join. Revenue accumulates in
    exact integer 10⁻⁴-currency units (price-cents × discount-percent)
    so partial-sum order can't drift a ulp and the argmax ordering is
    exact — the q89/q77 integer-evidence discipline."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].to_numpy() * 100.0).astype(
            np.int64
        )
        dpct = np.rint(
            (1.0 - df["l_discount"].to_numpy()) * 100.0
        ).astype(np.int64)
        df = df.assign(rev=cents * dpct)
        out = df.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "rev"
        ].sum()
        return out

    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def add_cg(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cg",
            pc.cast(
                pc.bit_wise_and(
                    pc.cast(b["l_partkey"], pa.int64()), salts - 1
                ),
                pa.int32(),
            ),
        )

    sup = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    name_of = dict(
        zip(sup["s_suppkey"].to_pylist(), sup["s_name"].to_pylist())
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)["rev"].sum()
        g = g.sort_values(
            ["l_partkey", "rev", "l_suppkey"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("l_partkey")
        return pd.DataFrame(
            {
                "partkey": g["l_partkey"].astype("int64"),
                "suppkey": g["l_suppkey"].astype("int64"),
                "s_name": [name_of[s] for s in g["l_suppkey"]],
                "revenue": [
                    _round_half_up(int(r) / 10000.0, 2) for r in g["rev"]
                ],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(best, batch_format="pandas")
    )


def q97_ngram_langid(sf_dir: str):
    """Cavnar–Trenkle (1994) n-gram-profile language ID — the classic
    langid a crawl pipeline runs before routing (reference analogue: the
    per-lang corpus routing of SURVEY §2.5 G7). Integer end-to-end, so the
    whole train→classify→confusion-matrix chain hash-matches SQL exactly:

    * TRAIN: char-trigram counts per (lang, gram) via the G4 partial+final
      shape (shuffle carries (lang\\x1fgram, cnt) partials, never text);
      each lang's profile is its top-K grams ranked (cnt desc, gram asc).
      #langs is small and K fixed → the profile relation is BOUNDED
      (≤ langs×K rows) and broadcasts legitimately.
    * CLASSIFY: one streaming map_batches; a doc's own top-K gram ranks
      measure out-of-place distance |r_doc − r_profile| (missing gram =
      K penalty) against every profile; argmin (dist, lang) predicts.
    * OUTPUT: the (actual, predicted) confusion matrix — per-batch partial
      counts, tiny final groupby."""
    from ray.data.aggregate import Sum

    K = 50
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    # ---- train ----------------------------------------------------------
    def lg_items(lt: str) -> list[str]:
        lang, _, text = lt.partition("\x1f")
        return [lang + "\x1f" + text[i : i + 3] for i in range(len(text) - 2)]

    with_lt = ds.map_batches(
        lambda b: pa.table(
            {
                "lt": pc.binary_join_element_wise(
                    b["lang"], b["text"], "\x1f"
                )
            }
        ),
        batch_format="pyarrow",
    )
    counts = count_terms(with_lt, "lt", lg_items, "lg")

    def top_per_lang(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["lg"].str.partition("\x1f")
        df = pd.DataFrame(
            {"lang": parts[0], "gram": parts[2], "cnt": df["cnt"]}
        )
        df = df.sort_values(
            ["lang", "cnt", "gram"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("lang", as_index=False).head(K)
        df["r"] = df.groupby("lang").cumcount() + 1
        return df[["lang", "gram", "r"]]

    def add_lang_cg(b: pa.Table) -> pa.Table:
        # group by the LANG prefix so each lang's top-K is computed whole;
        # vectorized split — this relation is vocabulary-scale (the
        # per-row pylist loop here is the round-2 q07/q08 regression class)
        parts = pc.split_pattern(b["lg"], pattern="\x1f", max_splits=1)
        return b.append_column("langkey", pc.list_element(parts, 0))

    prof_rows = collect_rows(
        counts.map_batches(add_lang_cg, batch_format="pyarrow")
        .groupby("langkey")
        .map_groups(
            lambda df: top_per_lang(df.drop(columns=["langkey"])),
            batch_format="pandas",
        )
    )  # ≤ langs×K rows — bounded metadata
    profiles: dict[str, dict[str, int]] = {}
    for row in prof_rows:
        profiles.setdefault(row["lang"], {})[row["gram"]] = int(row["r"])
    lang_list = sorted(profiles)

    import ray

    prof_ref = ray.put((lang_list, profiles))

    # ---- classify -------------------------------------------------------
    def classify(batch: pa.Table) -> pa.Table:
        from collections import Counter

        import ray as _ray

        langs, profs = _ray.get(prof_ref)
        out: Counter[tuple[str, str]] = Counter()
        for text, actual in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            if len(text) < 3:
                continue
            c = Counter(text[i : i + 3] for i in range(len(text) - 2))
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
            best = None
            for lang in langs:
                p = profs[lang]
                d = 0
                for r, (g, _) in enumerate(top, 1):
                    pr = p.get(g)
                    d += K if pr is None else abs(r - pr)
                if best is None or d < best[0]:
                    best = (d, lang)
            out[(actual, best[1])] += 1
        keys = list(out.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "pred_lang": pa.array([k[1] for k in keys], pa.string()),
                "n_docs": pa.array([out[k] for k in keys], pa.int64()),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def q98_importance_ratio(sf_dir: str):
    """DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed unigram features are.
    Exact-evidence variant: with Laplace-smoothed integer bucket counts
    t[b], r[b] (target = lang='en' docs, raw = all docs), a doc scores
    num = Σ(t[b]+1), den = Σ(r[b]+1) over its token buckets — both exact
    int64 — and ratio = num/den is ONE IEEE division both engines compute
    identically (the q95 discipline). Distributed shape: the B=1024-bucket
    histograms aggregate from per-batch partials (groupby on a
    BOUNDED-cardinality key), broadcast once via ray.put (8 KB, not a
    vocabulary); scoring is a zero-shuffle scan with per-batch local
    top-k before the tiny global sort."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.textstats import md5_hex

    B = 1024
    TARGET = "en"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        t_hist = np.zeros(B, dtype=np.int64)
        r_hist = np.zeros(B, dtype=np.int64)
        bucket_of: dict[str, int] = {}
        for text, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            for tok in token_items(text):
                b = bucket_of.get(tok)
                if b is None:
                    b = int(md5_hex(tok)[:8], 16) % B
                    bucket_of[tok] = b
                r_hist[b] += 1
                if lang == TARGET:
                    t_hist[b] += 1
        nz = np.nonzero(r_hist)[0]
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "tc": pa.array(t_hist[nz], pa.int64()),
                "rc": pa.array(r_hist[nz], pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("b")  # key cardinality ≤ B — bounded, no salt needed
        .aggregate(Sum("tc", alias_name="tc"), Sum("rc", alias_name="rc"))
    )
    t_arr = np.ones(B, dtype=np.int64)  # +1 Laplace baked in
    r_arr = np.ones(B, dtype=np.int64)
    for row in collect_rows(hist):  # ≤ B rows — metadata
        t_arr[int(row["b"])] += int(row["tc"])
        r_arr[int(row["b"])] += int(row["rc"])

    import ray

    arrs_ref = ray.put((t_arr, r_arr))

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t_a, r_a = _ray.get(arrs_ref)
        ids, nums, dens = [], [], []
        bucket_of: dict[str, int] = {}
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = token_items(text)
            if not toks:
                continue
            bs = np.empty(len(toks), dtype=np.int64)
            for i, tok in enumerate(toks):
                b = bucket_of.get(tok)
                if b is None:
                    b = int(md5_hex(tok)[:8], 16) % B
                    bucket_of[tok] = b
                bs[i] = b
            ids.append(did)
            nums.append(int(t_a[bs].sum()))
            dens.append(int(r_a[bs].sum()))
        out = pd.DataFrame({"doc_id": ids, "num": nums, "den": dens})
        out["ratio"] = out["num"].to_numpy(dtype=np.float64) / out[
            "den"
        ].to_numpy(dtype=np.float64)
        # local prune before the tiny global sort
        return out.sort_values(
            ["ratio", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(20)

    top = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["ratio", "doc_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    top["doc_id"] = top["doc_id"].astype("int64")
    top["num"] = top["num"].astype("int64")
    top["den"] = top["den"].astype("int64")
    return _round_col(top, "ratio", 6)


def q99_quantile_floor(sf_dir: str):
    """Corpus-global quality floor at a learned threshold: keep documents
    at or above the corpus p90 of n_chars, then per-lang rollup — the
    'top decile by length' curation step. The threshold comes from the
    exact distributed two-pass histogram quantile (q60's machinery with a
    constant group — three metadata-narrow scans, NO global sort), the
    filter is a streaming scan with the threshold inlined, and the rollup
    is the tiny G7 aggregate. Everything integer → exact hash."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.wide import grouped_quantile_disc

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    one = ds.map_batches(
        lambda b: b.append_column(
            "g", pa.array(np.zeros(len(b), dtype=np.int32))
        ),
        batch_format="pyarrow",
    )
    qrows = collect_rows(grouped_quantile_disc(one, "g", "n_chars", 9, 10))
    thr = int(qrows[0]["q_value"])

    flt = ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_chars"], thr)),
        batch_format="pyarrow",
    )
    df = (
        flt.groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
        .to_pandas()
    )
    df["p90_chars"] = np.int64(thr)
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_chars"] = df["sum_chars"].astype("int64")
    return df[["lang", "p90_chars", "n_docs", "sum_chars"]]


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


def q101_crawl_diff(sf_dir: str):
    """Crawl SNAPSHOT DIFF — recrawl triage (added / removed / changed /
    same) between two crawl waves, derived deterministically from
    `documents`: wave A holds doc_id % 10 ≠ 0, wave B holds doc_id % 7 ≠ 0
    with text revised ('<text> v2') where doc_id % 5 = 0. The diff is ONE
    full-outer bucketed hash join on doc_id carrying (id, md5-fingerprint)
    only — text never shuffles (the D3 fingerprint discipline) — then a
    vectorized status classification and a tiny rollup."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def wave_a(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 10 != 0))
        fps = [md5_hex(t) for t in b["text"].to_pylist()]
        return pa.table(
            {"doc_id": b["doc_id"], "fp_a": pa.array(fps, pa.string())}
        )

    def wave_b(b: pa.Table) -> pa.Table:
        allids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(allids % 7 != 0))
        ids = b["doc_id"].to_pylist()
        fps = [
            md5_hex(t + " v2" if i % 5 == 0 else t)
            for i, t in zip(ids, b["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": b["doc_id"], "fp_b": pa.array(fps, pa.string())}
        )

    from basicocr_ray.stages.joins import bucketed_hash_join

    a = ds.map_batches(wave_a, batch_format="pyarrow")
    bds = ds.map_batches(wave_b, batch_format="pyarrow")

    def classify(t: pa.Table) -> pa.Table:
        fa, fb = t["fp_a"], t["fp_b"]
        a_null = pc.is_null(fa)
        b_null = pc.is_null(fb)
        status = pc.if_else(
            a_null,
            pa.scalar("added"),
            pc.if_else(
                b_null,
                pa.scalar("removed"),
                pc.if_else(
                    pc.equal(fa, fb), pa.scalar("same"), pa.scalar("changed")
                ),
            ),
        )
        # in-bucket partial rollup: the status relation leaves the join
        # task as ≤4 rows per bucket
        out = pa.table({"status": status}).group_by("status").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["status", "n_docs"])

    joined = bucketed_hash_join(
        a, bds, key="doc_id",
        left_columns=["fp_a"], right_columns=["fp_b"],
        join_type="full outer", bucket_post_fn=classify,
    )
    df = (
        joined.groupby("status")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def q102_warc_roundtrip(sf_dir: str):
    """WARC codec conformance as a streaming pipeline: each batch of
    documents is ENCODED into a WARC/1.0 file image (`sources/warc.py` —
    the Common-Crawl container) and immediately PARSED back, and the
    per-lang rollup of the decoded payloads must match SQL computed from
    the original table — any header, Content-Length or boundary bug
    breaks the hash. Encode+decode stay inside one map_batches (zero shuffle); the
    rollup is the tiny G7 aggregate."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.sources.warc import encode_warc, parse_warc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def roundtrip(b: pa.Table) -> pa.Table:
        recs = [
            (
                f"https://example.org/doc/{i}",
                "2026-01-01T00:00:00Z",
                t.encode("utf-8"),
            )
            for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist())
        ]
        blob = encode_warc(recs)
        parsed = parse_warc(blob)
        if any(r["_corrupt"] for r in parsed):
            raise ValueError("WARC roundtrip produced corrupt records")
        ids = [int(r["uri"].rsplit("/", 1)[1]) for r in parsed]
        nch = [len(r["payload"].decode("utf-8")) for r in parsed]
        langs = dict(
            zip(b["doc_id"].to_pylist(), b["lang"].to_pylist())
        )
        return pa.table(
            {
                "lang": pa.array([langs[i] for i in ids], pa.string()),
                "n_chars": pa.array(nch, pa.int64()),
            }
        )

    df = (
        ds.map_batches(roundtrip, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
        )
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_chars"] = df["sum_chars"].astype("int64")
    return df


def q103_pagerank_hosts(sf_dir: str):
    """PageRank over the host graph — the canonical web link-analysis
    op, as join-based SpMV (`stages/graph.py`): each of the 3 fixed
    iterations is ONE bucketed hash join (ranks ⋈ edges on src, with the
    per-dst pre-sum fused into the join bucket) plus one aggregate —
    rows shuffle once per round, no driver materialization (the q42
    connected-components discipline with weighted mass instead of min
    labels). Hash-exact because ranks are carried as INTEGER numerators:
    every host has out-degree exactly 3, so with d = 17/20 the rank
    after k rounds is a rational with denominator N·60^k — the engine
    propagates the int64 numerators and performs ONE final IEEE division
    (the q95 discipline). Nodes are doc hosts (doc_id % 64) massed by
    doc count; the teleport vector is the document-mass distribution
    (personalized PageRank), keeping everything data-derived and
    integer."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.graph import pagerank_scaled_int

    H = 64
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hostify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(ids % H, pa.int64())})

    nodes = (
        ds.map_batches(hostify, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="mass"))
        .materialize()
    )

    def mk_edges(b: pa.Table) -> pa.Table:
        hs = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.repeat(hs, 3)
        dst = np.stack(
            [(3 * hs + 1) % H, (5 * hs + 2) % H, (7 * hs + 4) % H], axis=1
        ).reshape(-1)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    edges = nodes.map_batches(mk_edges, batch_format="pyarrow")
    # 64 hosts → 4 buckets; a real host graph would keep the default 32+
    out, scale = pagerank_scaled_int(nodes, edges, iters=3, num_buckets=4)

    df = out.to_pandas()
    n_total = int(df["mass"].sum())  # the full node relation is already
    # on the driver for the final frame — no extra distributed pass
    df["h"] = df["h"].astype("int64")
    df["mass"] = df["mass"].astype("int64")
    df["x"] = df["x"].astype("int64")
    df["pr"] = [
        _round_half_up(float(x) / float(n_total * scale), 8) for x in df["x"]
    ]
    return df


def q104_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016), distributed: learn
    the first 5 merge rules from the corpus word-frequency table. The
    textbook shape — pair statistics over the (word, count) relation,
    not the corpus — means ONE corpus scan total (the count_terms G3
    build); each merge round is then a scan of the small vocab relation:
    per-batch weighted pair partials → coarse-group exact sum → global
    top-1 (cnt desc, pair asc) → ONE merge row to the driver (metadata)
    → vectorized merge application. Merge application is the
    'space-padded non-overlapping replace' both engines implement
    identically (Python str.replace ≡ SQL replace, left-to-right
    non-overlapping), so the learned merge table hash-matches the
    5-round unrolled SQL twin exactly — integers end to end."""
    return _learn_bpe_merges(sf_dir, steps=5)


def _learn_bpe_merges(sf_dir: str, steps: int = 5) -> pd.DataFrame:
    """q104's distributed BPE merge learning, factored so q143 can apply
    the same merge table; → DataFrame(step, pair, cnt)."""
    from collections import Counter

    from basicocr_ray.stages.wide import coarse_group_reduce

    STEPS = steps
    ds = _read(sf_dir, "documents", columns=["text"])
    words = count_terms(ds, "text", token_items, "token")

    def symbolize(b: pa.Table) -> pa.Table:
        toks = b["token"].to_pylist()
        return pa.table(
            {
                "s": pa.array([" ".join(t) for t in toks], pa.string()),
                "c": pc.cast(b["cnt"], pa.int64()),
            }
        )

    words = words.map_batches(symbolize, batch_format="pyarrow").materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        cnt: Counter[str] = Counter()
        for s, c in zip(batch["s"].to_pylist(), batch["c"].to_pylist()):
            syms = s.split(" ")
            for a, b2 in zip(syms, syms[1:]):
                cnt[a + " " + b2] += c
        keys = list(cnt.keys())
        return pa.table(
            {
                "pair": pa.array(keys, pa.string()),
                "cnt": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("pair", as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    steps, pairs_out, cnts_out = [], [], []
    for step in range(1, STEPS + 1):
        pair_counts = coarse_group_reduce(
            words.map_batches(pair_partial, batch_format="pyarrow"),
            "pair", final_sum,
        )
        best = collect_rows(top_k(pair_counts, 1, "cnt", "pair"))
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        steps.append(step)
        pairs_out.append(pair)
        cnts_out.append(cnt)
        merged = pair.replace(" ", "")

        def apply(b: pa.Table, _p=pair, _m=merged) -> pa.Table:
            ss = [
                (" " + s + " ").replace(f" {_p} ", f" {_m} ").strip()
                for s in b["s"].to_pylist()
            ]
            return pa.table(
                {"s": pa.array(ss, pa.string()), "c": b["c"]}
            )

        words = words.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        {
            "step": pd.array(steps, dtype="int64"),
            "pair": pairs_out,
            "cnt": pd.array(cnts_out, dtype="int64"),
        }
    )


def q105_source_lang_entropy(sf_dir: str):
    """Per-source language-mix diagnostics (the corpus-composition
    dashboard every multilingual pipeline keeps): Shannon entropy (bits)
    of each source's language distribution plus its dominant-language doc
    count. Distributed shape: per-batch (source, lang) partial counts →
    coarse-salted source groups → one vectorized in-group pass. Counts
    stay exact int64; each entropy term −p·log2(p) is computed from the
    identical IEEE division on both engines and the ≤5-term sum hides
    any last-ulp libm/accumulation drift under round-6 (the q94
    discipline)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size")
        )

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False)["n"].sum()
        rows = []
        for src, grp in g.groupby("source"):
            n = grp["n"].to_numpy(dtype=np.int64)
            tot = int(n.sum())
            p = n.astype(np.float64) / float(tot)
            ent = float(np.sum(-p * np.log2(p)))
            rows.append(
                {
                    "source": src,
                    "n_docs": tot,
                    "lang_entropy": _round_half_up(ent, 6),
                    "max_lang_docs": int(n.max()),
                }
            )
        out = pd.DataFrame(rows)
        return out.astype(
            {"n_docs": "int64", "max_lang_docs": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"), "source", entropy
    )


def q106_url_canonicalize(sf_dir: str):
    """URL canonicalization (`core/textstats.py:normalize_url`, the
    spec-surface `normalize_url` op) — the crawl-frontier key
    normalization, exercised over a deterministic spread of messy URL
    spellings derived from doc_id (mixed-case scheme/host, default and
    NON-default ports on both schemes, utm tracking params, unsorted
    params, bare '?', fragments). A pure vectorized per-batch map, zero
    shuffle; the oracle constructs the expected canonical form
    analytically from the same doc_id arithmetic, so every rule (strip
    :443 only on https, keep :80 on https, drop utm_*, sort by key,
    drop fragment) is independently pinned."""
    from basicocr_ray.core.textstats import normalize_url as canonicalize_url

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_and_canon(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        out = []
        for i in ids:
            scheme = "HTTPS" if i % 2 == 1 else "http"
            port = ":443" if i % 3 == 0 else (":80" if i % 3 == 1 else "")
            q = (
                "?b=2&A=1&utm_campaign=z"
                if i % 4 == 0
                else "?x=1" if i % 4 == 1 else "?" if i % 4 == 2 else ""
            )
            frag = "#sec" if i % 6 == 0 else ""
            raw = (
                f"{scheme}://WWW.Site{i % 7}.Example.COM{port}/p/{i}{q}{frag}"
            )
            out.append(canonicalize_url(raw))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "url": pa.array(out, pa.string()),
            }
        )

    return ds.map_batches(mk_and_canon, batch_format="pyarrow")


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


def q108_vocab_growth(sf_dir: str):
    """Vocabulary-growth profile (the Heaps-law curve a tokenizer-corpus
    sizing study needs): for every word bigram (unigram vocab saturates
    on this corpus), the FIRST document position
    (under the deterministic md5 global order) at which it appears, then
    a histogram of first occurrences per corpus decile. Distributed
    shape: `global_rank` numbers docs with O(S) driver state; the
    shuffle then carries (token, min-pos) PARTIALS (per-batch min before
    the exchange, coarse-salted exact min groups after — G4 with min
    instead of sum); the decile rollup is tiny. Integers end to end."""
    from ray.data.aggregate import Count

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.sample import global_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_total = int(ds.count())
    # pos numbering runs over (doc_id) ONLY — text never rides the rank
    # shuffle; the per-token shuffle below carries (token, rank, id)
    # partials, and pos attaches to the ≤|vocab| winners via one join
    positioned = global_rank(
        ds.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ),
        "doc_id", seed=42, out_column="pos",
    )

    bigram_items = make_ngram_items(2)

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        # min over (md5 rank, id) == min over pos: rank order IS the
        # position order, so first-occurrence reduces on the rank string
        first: dict[str, tuple[str, int]] = {}
        for did, text in zip(df["doc_id"], df["text"]):
            key = (md5_hex(f"42:{int(did)}"), int(did))
            for tok in bigram_items(text):
                old = first.get(tok)
                if old is None or key < old:
                    first[tok] = key
        return pd.DataFrame(
            {
                "token": list(first.keys()),
                "rk": [v[0] for v in first.values()],
                "doc_id": pd.array(
                    [v[1] for v in first.values()], dtype="int64"
                ),
            }
        )

    def final_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "rk", "doc_id"], kind="mergesort")
        out = df.drop_duplicates("token")[["token", "doc_id"]]
        return out.astype({"doc_id": "int64"})

    firsts = (
        coarse_group_reduce(
            ds.map_batches(partial_min, batch_format="pandas"),
            "token", final_min,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "token": pc.cast(b["token"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    with_pos = bucketed_hash_join(
        firsts,
        positioned.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "pos": pc.cast(b["pos"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        key="doc_id", left_columns=["token"], right_columns=["pos"],
    )

    def decile(b: pa.Table) -> pa.Table:
        fp = b["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"decile": pa.array(fp * 10 // n_total, pa.int64())}
        )

    df = (
        with_pos.map_batches(decile, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Count(alias_name="n_new_tokens"))
        .to_pandas()
    )
    df["decile"] = df["decile"].astype("int64")
    df["n_new_tokens"] = df["n_new_tokens"].astype("int64")
    return df


def q109_lsh_calibration(sf_dir: str):
    """LSH CALIBRATION AUDIT — the measurement that justifies a banding
    choice before burning 100 TB of compute on it: for every candidate
    pair surfaced by (B=8, r=2) MinHash banding, how many bands matched
    vs the pair's EXACT Jaccard. Uses an md5-based MinHash
    (mh_p = min over shingles of md5(f"{p}:{shingle}")) precisely so the
    whole sketch is SQL-expressible and the audit itself is
    oracle-checkable — integers end to end (per-bands-matched pair
    counts and exact Σinter/Σunion). Distributed shape: signatures per
    batch (zero shuffle), band-key groups coarse-salted, per-pair band
    counts in key-hash groups, shingle sets fetched back by TWO bucketed
    joins (text never rides the band shuffle), tiny final rollup."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    P, R = 16, 2
    B = P // R
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_set(text: str) -> list[str]:
        toks = token_items(text)
        return sorted(
            {
                " ".join(toks[i : i + 3])
                for i in range(len(toks) - 2)
            }
        )

    def sets_batch(b: pa.Table) -> pa.Table:
        # the set rides joins as ONE \\x1f-joined string (Acero doesn't
        # take list<> payload columns), split again at the verify
        ids, sets = [], []
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            s = shingle_set(t or "")
            if s:
                ids.append(i)
                sets.append("\x1f".join(s))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "s": pa.array(sets, pa.string()),
            }
        )

    sets_ds = ds.map_batches(sets_batch, batch_format="pyarrow").materialize()

    def band_rows(b: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for i, joined in zip(b["doc_id"].to_pylist(), b["s"].to_pylist()):
            s = joined.split("\x1f")
            mh = [
                min(md5_hex(f"{p}:{sh}") for sh in s) for p in range(P)
            ]
            for band in range(B):
                ids.append(i)
                bands.append(band)
                keys.append("|".join(mh[band * R : band * R + R]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int64()),
                "key": pa.array(keys, pa.string()),
            }
        )

    bands_ds = sets_ds.map_batches(band_rows, batch_format="pyarrow")

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for (_, _), grp in df.groupby(["band", "key"]):
            ids = sorted(grp["doc_id"].tolist())
            for a, c in combinations(ids, 2):
                out1.append(a)
                out2.append(c)
        return pd.DataFrame(
            {
                "id1": pd.array(out1, dtype="int64"),
                "id2": pd.array(out2, dtype="int64"),
            }
        )

    pair_rows = coarse_group_reduce(bands_ds, "key", pairs_in_group)

    # bands_matched per pair: count the per-band pair emissions inside
    # pair-hash coarse groups (a pair never spans groups → exact)
    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id1", "id2"], as_index=False).agg(
            bands_matched=("id1", "size")
        )
        return g.astype(
            {"id1": "int64", "id2": "int64", "bands_matched": "int64"}
        )

    pairs = (
        coarse_group_reduce(pair_rows, ["id1", "id2"], count_pairs)
        .map_batches(
            lambda b: pa.table(
                {
                    "id1": pc.cast(b["id1"], pa.int64()),
                    "id2": pc.cast(b["id2"], pa.int64()),
                    "bands_matched": pc.cast(b["bands_matched"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    s1 = sets_ds.map_batches(
        lambda b: pa.table({"id1": b["doc_id"], "s1": b["s"]}),
        batch_format="pyarrow",
    )
    s2 = sets_ds.map_batches(
        lambda b: pa.table({"id2": b["doc_id"], "s2": b["s"]}),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        pairs, s1, key="id1",
        left_columns=["id2", "bands_matched"], right_columns=["s1"],
    )
    j2 = bucketed_hash_join(
        j1, s2, key="id2",
        left_columns=["bands_matched", "s1"], right_columns=["s2"],
    )

    def verify(b: pa.Table) -> pa.Table:
        bm, inter, uni = [], [], []
        for m, a, c in zip(
            b["bands_matched"].to_pylist(),
            b["s1"].to_pylist(),
            b["s2"].to_pylist(),
        ):
            sa, sc = set(a.split("\x1f")), set(c.split("\x1f"))
            n_i = len(sa & sc)
            bm.append(m)
            inter.append(n_i)
            uni.append(len(sa) + len(sc) - n_i)
        return pa.table(
            {
                "bands_matched": pa.array(bm, pa.int64()),
                "inter": pa.array(inter, pa.int64()),
                "uni": pa.array(uni, pa.int64()),
            }
        )

    df = (
        j2.map_batches(verify, batch_format="pyarrow")
        .groupby("bands_matched")
        .aggregate(
            Count(alias_name="n_pairs"),
            Sum("inter", alias_name="sum_inter"),
            Sum("uni", alias_name="sum_union"),
        )
        .to_pandas()
    )
    for c in ("bands_matched", "n_pairs", "sum_inter", "sum_union"):
        df[c] = df[c].astype("int64")
    return df


def q110_robots_filter(sf_dir: str):
    """robots.txt-style URL filtering — the crawl-side gate every fetch
    pipeline runs: a per-host DISALLOW prefix table (bounded: one robots
    file per host) broadcasts once via ray.put; each page tests its path
    against its host's prefixes in a zero-shuffle streaming scan
    (startswith = the robots longest-prefix-ignored simple form); rollup
    counts allowed/blocked per host. Urls derive deterministically from
    doc_id (host = site<doc_id%7>, path = /p/<doc_id>), and hosts 0/3/6
    disallow the '/p/1' prefix while hosts 1/4 disallow '/p/2' — so the
    oracle pins the exact rule semantics with LIKE arithmetic."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    rules = {
        f"site{k}": (["/p/1"] if k % 3 == 0 else
                     ["/p/2"] if k % 3 == 1 else [])
        for k in range(7)
    }
    rules_ref = ray.put(rules)

    def classify(b: pa.Table) -> pa.Table:
        import ray as _ray

        r = _ray.get(rules_ref)
        hosts, allowed, blocked = [], [], []
        agg: dict[str, list[int]] = {}
        for i in b["doc_id"].to_pylist():
            host = f"site{i % 7}"
            path = f"/p/{i}"
            bad = any(path.startswith(p) for p in r.get(host, ()))
            a = agg.setdefault(host, [0, 0])
            a[1 if bad else 0] += 1
        for host, (n_ok, n_bad) in agg.items():
            hosts.append(host)
            allowed.append(n_ok)
            blocked.append(n_bad)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "n_allowed": pa.array(allowed, pa.int64()),
                "n_blocked": pa.array(blocked, pa.int64()),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_allowed", alias_name="n_allowed"),
            Sum("n_blocked", alias_name="n_blocked"),
        )
        .to_pandas()
    )
    df["n_allowed"] = df["n_allowed"].astype("int64")
    df["n_blocked"] = df["n_blocked"].astype("int64")
    return df


def q111_event_transitions(sf_dir: str):
    """Per-corpus Markov TRANSITION matrix over user event sequences
    (the session-model statistic recommendation/abuse pipelines compute):
    (prev_type → type) counts over each user's time-ordered events, plus
    the row-normalized transition probability. One user-hash shuffle
    (the q63 LAG discipline — a user's events sort inside one coarse
    group, vectorized shift), exact int64 counts, and the probability is
    ONE division of two < 2^53 integers → bit-identical to the SQL
    window twin."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                          "event_type"])

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        prev = df.groupby("user_id")["event_type"].shift(1)
        out = pd.DataFrame(
            {"prev_type": prev, "event_type": df["event_type"]}
        ).dropna()
        g = out.groupby(["prev_type", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        return g.astype({"n": "int64"})

    counts = coarse_group_reduce(ds, "user_id", transitions)
    df = counts.to_pandas()
    df = df.groupby(["prev_type", "event_type"], as_index=False)["n"].sum()
    df["n"] = df["n"].astype("int64")
    totals = df.groupby("prev_type")["n"].transform("sum").astype("int64")
    df["p"] = [
        _round_half_up(float(n) / float(t), 6)
        for n, t in zip(df["n"], totals)
    ]
    return df


def q112_late_events(sf_dir: str):
    """Event-time vs ARRIVAL-time late-data accounting — the watermark
    bookkeeping a streaming ingest keeps (SURVEY §2.9: the reference is
    batch; this is the engine's streaming-lateness translation): each
    event's arrival is its event time plus a deterministic transport
    delay (event_id % 7200 seconds); an event is LATE if it arrives
    more than the 30-min allowed lateness after its hour window closes.
    Pure integer µs arithmetic per batch (zero shuffle before the
    partial), per-hour partial counts, tiny final sum."""
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000
    LATE_US = 1_800_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        hour_us = (ts_us // HOUR_US) * HOUR_US
        arrival = ts_us + (eid % 7200) * 1_000_000
        late = arrival > hour_us + HOUR_US + LATE_US
        df = pd.DataFrame(
            {"hour_us": hour_us, "late": late.astype(np.int64)}
        )
        g = df.groupby("hour_us", as_index=False).agg(
            n_events=("late", "size"), n_late=("late", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour_us")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_late", alias_name="n_late"),
        )
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "hour": pd.to_datetime(df["hour_us"], unit="us"),
            "n_events": df["n_events"].astype("int64"),
            "n_late": df["n_late"].astype("int64"),
        }
    )
    return out


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


def q114_blocklist_filter(sf_dir: str):
    """C4-style BAD-WORD filtering (Raffel et al. 2020 §2.2 — drop any
    page containing a blocklisted word): the blocklist broadcasts once
    (bounded by construction — a curated list, not a vocabulary), each
    doc streams through a zero-shuffle membership scan, and the rollup
    reports kept/dropped doc and char counts per lang. The blocklist
    derives deterministically from the corpus vocabulary (every 13th
    token by md5 order) so the oracle can reconstruct it exactly —
    integers end to end."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    # blocklist: every 13th distinct corpus token under md5 order — a
    # deterministic, corpus-derived stand-in for a curated list
    vocab = count_terms(ds, "text", token_items, "token")

    def pick(b: pa.Table) -> pa.Table:
        toks = [
            t for t in b["token"].to_pylist()
            if int(md5_hex(t)[:8], 16) % 13 == 0
        ]
        return pa.table({"token": pa.array(toks, pa.string())})

    bad = sorted(
        r["token"] for r in collect_rows(
            vocab.map_batches(pick, batch_format="pyarrow")
        )
    )  # bounded: |vocab|/13 at fixture scale; a curated list in prod
    bad_ref = ray.put(frozenset(bad))

    def classify(b: pa.Table) -> pa.Table:
        import ray as _ray

        bset = _ray.get(bad_ref)
        langs = b["lang"].to_pylist()
        nch = b["n_chars"].to_pylist()
        agg: dict[str, list[int]] = {}
        for text, lang, n in zip(b["text"].to_pylist(), langs, nch):
            blocked = any(t in bset for t in token_items(text or ""))
            a = agg.setdefault(lang, [0, 0, 0, 0])
            if blocked:
                a[1] += 1
                a[3] += int(n)
            else:
                a[0] += 1
                a[2] += int(n)
        rows = sorted(agg.items())
        return pa.table(
            {
                "lang": pa.array([k for k, _ in rows], pa.string()),
                "n_kept": pa.array([v[0] for _, v in rows], pa.int64()),
                "n_dropped": pa.array([v[1] for _, v in rows], pa.int64()),
                "kept_chars": pa.array([v[2] for _, v in rows], pa.int64()),
                "dropped_chars": pa.array(
                    [v[3] for _, v in rows], pa.int64()
                ),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_kept", alias_name="n_kept"),
            Sum("n_dropped", alias_name="n_dropped"),
            Sum("kept_chars", alias_name="kept_chars"),
            Sum("dropped_chars", alias_name="dropped_chars"),
        )
        .to_pandas()
    )
    for c in ("n_kept", "n_dropped", "kept_chars", "dropped_chars"):
        df[c] = df[c].astype("int64")
    return df


def q115_ivf_ann_int(sf_dir: str):
    """IVF approximate-nearest-neighbor as a HASHABLE contract — the ANN
    scale path promoted from pytest-only (`ivf_topk`) to the oracle gate:
    embeddings quantize to int64 (floor(x·1e6+0.5), bit-identical in
    numpy and SQL), 8 fixed centroid vectors (vec_id < 8 — a stand-in
    for a sampled k-means fit; loaded with a vec_id<8 row-group
    predicate pushdown, never a full scan) assign every vector to its
    exact argmin cell, and only the query's 3 nearest cells are scored —
    the (1 − n_probe/C) dot-product pruning that makes brute-force
    cosine (q15's baseline) survive 100 TB. Output (vec_id, cell, dot)
    is integer end-to-end."""
    from basicocr_ray.stages.embed import ivf_topk_int, quantize_vec

    head = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 8)],
    ).sort_by("vec_id")
    cents = quantize_vec(
        np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    )
    qvec = cents[0]  # query = vec_id 0 (same convention as q15)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ivf_topk_int(
        ds, qvec, cents, k=10, n_probe=3, exclude_ids=frozenset({0})
    ).to_pandas()
    return df.astype({"vec_id": "int64", "cell": "int64", "dot": "int64"})


def q116_gopher_rules(sf_dir: str):
    """Gopher-style quality filtering (Rae et al. 2021 Table A1 subset)
    with EXACT integer evidence — every ratio threshold is a
    cross-multiplied integer comparison, so the rule vector hashes:
    word count in [50, 100000], mean word length in [3, 10]
    (3·n ≤ Σlen ≤ 10·n), ≤10% no-alphanumeric words (10·n_nonal ≤ n),
    ≥80% words containing a letter (5·n_alpha ≥ 4·n), ≥2 stopwords.
    Zero-shuffle per-doc scan (the C4/Gopher quality pass is
    embarrassingly parallel — only the rollup would ever aggregate).
    Kernel single-sourced in `core/textstats.py:gopher_counts` /
    `gopher_keep` (also the `gopher_filter` spec op)."""
    from basicocr_ray.core.textstats import gopher_counts, gopher_keep

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rules(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        nw, sl, na, nn, ns, kept = [], [], [], [], [], []
        for t in batch["text"].to_pylist():
            n, s, a, z, st = gopher_counts(t or "", _STOP5)
            ok = gopher_keep(n, s, a, z, st)
            nw.append(n)
            sl.append(s)
            na.append(a)
            nn.append(z)
            ns.append(st)
            kept.append(1 if ok else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "sum_len": pa.array(sl, pa.int64()),
                "n_alpha": pa.array(na, pa.int64()),
                "n_nonal": pa.array(nn, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    return ds.map_batches(rules, batch_format="pyarrow")


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


def q118_inverted_index(sf_dir: str):
    """Inverted-index build with positions — the IR structure a search
    stack derives from a crawl: one flat pass emits (token, doc_id, pos)
    postings (positions are 1-based over the nonempty whitespace
    tokens), a coarse-grouped exchange co-locates each token's postings
    (the shuffle carries the postings themselves — that IS the index
    build's irreducible exchange; document text never moves), and the
    in-group reduce emits (token, df, n_postings, postings) with the
    posting list string-agg'd in (doc_id, pos) order. Hapax pruning
    (df ≥ 2) drops the singleton tail; at 100 TB the same reduce would
    also tier by df and shard each hot token's postings by doc range."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        out_t, out_d, out_p = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for i, tok in enumerate(token_items(t or ""), start=1):
                out_t.append(tok)
                out_d.append(did)
                out_p.append(i)
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
            }
        )

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "doc_id", "pos"], kind="mergesort")
        df["post"] = (
            df["doc_id"].astype(str) + ":" + df["pos"].astype(str)
        )
        out = df.groupby("token", as_index=False).agg(
            df=("doc_id", "nunique"),
            n_postings=("post", "size"),
            postings=("post", ",".join),
        )
        out = out[out["df"] >= 2]
        return out.astype({"df": "int64", "n_postings": "int64"})

    return coarse_group_reduce(
        ds.map_batches(postings, batch_format="pyarrow"), "token", build
    )


def q119_latest_by_url(sf_dir: str):
    """Snapshot COMPACTION (upsert/keep-latest — what a recrawl store runs
    before training ever sees the data): a versioned corpus derived
    deterministically from `documents` (version v∈{0,1,2} exists when
    (doc_id+v) % 3 ≠ 0, ts = doc_id·10+v, fp = md5(text ∥ ' v<v>')) is
    reduced to the max-ts row per doc. The fan-out and the per-batch
    partial argmax happen in the SAME task (all versions of a doc are
    emitted together), so the shuffle carries one (id, ver, ts, fp) row
    per doc per batch and the coarse-group final argmax is exact — text
    itself never moves."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def versions(batch: pa.Table) -> pa.Table:
        out_id, out_v, out_ts, out_fp = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            best = None
            for v in range(3):
                if (did + v) % 3 == 0:
                    continue
                # oracle lockstep: NULL text → NULL fp (md5(NULL) is NULL)
                fp = md5_hex(f"{t} v{v}") if t is not None else None
                row = (did * 10 + v, v, fp)
                if best is None or row[0] > best[0]:
                    best = row
            if best is not None:  # partial argmax: one row per doc
                out_id.append(did)
                out_v.append(best[1])
                out_ts.append(best[0])
                out_fp.append(best[2])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "ver": pa.array(out_v, pa.int64()),
                "ts": pa.array(out_ts, pa.int64()),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ts"], kind="mergesort")
        return df.groupby("doc_id", as_index=False).last()

    return coarse_group_reduce(
        ds.map_batches(versions, batch_format="pyarrow"),
        "doc_id",
        keep_latest,
    )


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


def q121_image_phash_dup(sf_dir: str):
    """PERCEPTUAL image dedup — the multimodal near-dup byte hashing
    can't do: each corpus image (deterministic per-id noise, real PNG)
    gets a clone that is brightness-shifted (+1 on every pixel, aHash
    is invariant to uniform shifts) AND re-encoded at a different zlib
    level, so the clone matches in NEITHER bytes NOR pixels — only the
    8×8 average hash pairs them. Decode + hash run on the
    ImageFeatureExtractor actor pool (real stdlib PNG codec), the
    groupby moves 16-char hash hexes (never image bytes), and every
    (i, i+10000) clone pair must come back exactly — recall AND
    precision 1.0 by construction, which is what the analytic oracle
    asserts."""
    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import ImageFeatureExtractor
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i))
            arr = rng.integers(0, 200, size=(24, 32)).astype(np.uint8)
            ids.append(i)
            blobs.append(encode_png(arr, level=6))
            ids.append(i + 10000)  # clone: +1 brightness, re-encoded
            blobs.append(encode_png(arr + 1, level=9))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    feats = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageFeatureExtractor, batch_format="pyarrow",
            batch_size=256, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for _, grp in df.groupby("ph"):
            ids = sorted(grp["item_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out1.append(ids[i])
                    out2.append(ids[j])
        return pd.DataFrame(
            {"id1": pd.array(out1, dtype="int64"),
             "id2": pd.array(out2, dtype="int64")}
        )

    return coarse_group_reduce(feats, "ph", pairs)


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


def q123_simhash_hamming(sf_dir: str):
    """SimHash near-dup at a HAMMING RADIUS (Manku et al., WWW 2007 —
    the web-crawl near-dup algorithm q23's exact-signature match can't
    do): 32-bit md5-based SimHash per doc (bit i sum of ±occurrence
    over tokens, >0 → 1; exact integers, SQL-reconstructible), split
    into 4 × 8-bit bands — by PIGEONHOLE any pair within hamming ≤ 3
    agrees exactly on ≥1 band, so band-bucket candidates are a
    superset of the answer and the exact popcount(xor) verify inside
    the bucket is complete. The corpus is doubled with one-token-
    appended clones (doc_id+10000) whose distance is usually small but
    NOT zero — the radius search is doing real work. Shuffles carry
    (band value, id, 32-bit sig) — never text. The production scale
    path is `stages/dedup.py:simhash_pairs` (64-bit signature, same
    pigeonhole bucketing, bit-matrix popcount verify); this query is
    its ORACLE-AUDITABLE twin (the q109 discipline: md5 signature the
    SQL twin reconstructs bit-for-bit)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def signatures(batch: pa.Table) -> pa.Table:
        out_band, out_bv, out_id, out_sig = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                # oracle lockstep: NULL text yields no tokens on either
                # side (list_filter(NULL) / NULL || ' zzz' are both NULL)
                continue
            for docid, text in ((did, t), (did + 10000, f"{t} zzz")):
                toks = token_items(text)
                if not toks:
                    # token-less doc: the SQL twin has no row in `sig`
                    # for it (unnest of an empty list emits nothing)
                    continue
                hs = np.array(
                    [_md5_low64(tok) & 0xFFFFFFFF for tok in toks],
                    dtype=np.uint32,
                ).reshape(-1, 1)
                # ±1 per occurrence per bit, summed vectorized
                bits = ((hs >> np.arange(32, dtype=np.uint32)) & 1)
                sums = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
                sig = int(((sums > 0) << np.arange(32)).sum())
                for b in range(4):
                    out_band.append(b)
                    out_bv.append((sig >> (b * 8)) & 255)
                    out_id.append(docid)
                    out_sig.append(sig)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int64()),
                "bv": pa.array(out_bv, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "sig": pa.array(out_sig, pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        o1, o2, hd = [], [], []
        for _, grp in df.groupby(["band", "bv"]):
            rows = sorted(zip(grp["doc_id"], grp["sig"]))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    d = int(rows[i][1] ^ rows[j][1]).bit_count()
                    if d <= 3:
                        o1.append(rows[i][0])
                        o2.append(rows[j][0])
                        hd.append(d)
        return pd.DataFrame(
            {"id_a": pd.array(o1, dtype="int64"),
             "id_b": pd.array(o2, dtype="int64"),
             "hamming": pd.array(hd, dtype="int64")}
        )

    cands = coarse_group_reduce(
        ds.map_batches(signatures, batch_format="pyarrow"),
        ["band", "bv"],
        bucket_pairs,
    )

    # a pair found in k bands appears k times — distinct via one more
    # bounded coarse-group pass on the pair key
    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return coarse_group_reduce(cands, ["id_a", "id_b"], distinct)


def q124_rare_feature_pairs(sf_dir: str):
    """Cross-lingual document PAIRING via rare shared features — the
    bitext-mining candidate-generation shape (shared rare n-grams as
    alignment anchors, cf. the anchor heuristics of parallel-corpus
    mining): word trigrams with GLOBAL df exactly 2 name their own
    candidate pair; pairs of docs in DIFFERENT languages sharing ≥ 2
    such anchors survive. Two bounded exchanges, both payload-light:
    (trigram, id, lang) rows group by trigram hash (all occurrences of
    a trigram co-locate, so the df==2 test is exact in-group), then
    (id_a, id_b) partials sum per pair. Document text never moves."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def trigrams(batch: pa.Table) -> pa.Table:
        out_g, out_id, out_lang = [], [], []
        for did, t, lg in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            toks = token_items(t or "")
            seen = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
            for g in sorted(seen):
                out_g.append(g)
                out_id.append(did)
                out_lang.append(lg)
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
            }
        )

    def anchor_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ia, ib, la, lb = [], [], [], []
        for _, grp in df.groupby("g"):
            if len(grp) != 2:  # global df==2: the group holds all of g
                continue
            rows = sorted(zip(grp["doc_id"], grp["lang"]))
            if rows[0][1] == rows[1][1]:
                continue
            ia.append(rows[0][0])
            ib.append(rows[1][0])
            la.append(rows[0][1])
            lb.append(rows[1][1])
        return pd.DataFrame(
            {"id_a": pd.array(ia, dtype="int64"),
             "id_b": pd.array(ib, dtype="int64"),
             "lang_a": la, "lang_b": lb}
        )

    anchors = coarse_group_reduce(
        ds.map_batches(trigrams, batch_format="pyarrow"), "g", anchor_pairs
    )

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["id_a", "id_b", "lang_a", "lang_b"], as_index=False
        ).agg(n_shared=("id_a", "size"))
        out = out[out["n_shared"] >= 2]
        return out.astype({"n_shared": "int64"})

    return coarse_group_reduce(anchors, ["id_a", "id_b"], sum_pairs)


def q125_crawl_budget(sf_dir: str):
    """Crawl-budget APPORTIONMENT — dividing a fixed fetch budget of
    B=1000 across sources proportional to their doc counts with the
    largest-remainder (Hamilton) method, EXACT in integers: base =
    B·n // total, the B − Σbase leftover slots go to the largest
    remainders (ties → source asc), so Σ quota == B always. Counts
    come from a bounded groupby (|sources| rows); the apportionment
    itself is O(|sources|) driver arithmetic — the correct place for
    it at any corpus size."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["source"])
    counts = (
        ds.groupby("source")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return _hamilton_quota(counts, "source", "n_docs", 1000)


def _hamilton_quota(
    counts: pd.DataFrame, key_col: str, n_col: str, budget: int
) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment, EXACT in integers:
    base = B·n // total, the B − Σbase leftover slots go to the largest
    remainders (ties → key asc), so Σ quota == B always. O(|keys|)
    driver arithmetic on a bounded relation (shared by q125/q146)."""
    counts = counts.sort_values(key_col).reset_index(drop=True)
    B = budget
    total = int(counts[n_col].sum())
    n = counts[n_col].astype("int64")
    base = (B * n) // total
    rem = (B * n) % total
    extra = B - int(base.sum())
    order = sorted(
        range(len(counts)),
        key=lambda i: (-int(rem.iloc[i]), counts[key_col].iloc[i]),
    )
    quota = base.copy()
    for i in order[:extra]:
        quota.iloc[i] += 1
    return pd.DataFrame(
        {
            key_col: counts[key_col],
            n_col: n.astype("int64"),
            "quota": quota.astype("int64"),
        }
    )


def q126_padding_waste(sf_dir: str):
    """PADDING-WASTE accounting for length-bucketed batching — the
    measurement behind dynamic batching in training loaders: documents
    take the deterministic md5 global order (q55/q100 discipline), form
    fixed batches of 64, and each batch reports n_docs, its max token
    length, and waste = n_docs·max_len − Σlen (tokens burned padding
    every sequence to the batch max). The 0-based rank is `global_rank`
    (ROW_NUMBER()−1 under the md5 order without a global sort); the
    per-batch reduce runs in coarse groups of the batch id. Integers
    end-to-end."""
    from basicocr_ray.stages.sample import global_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    BATCH = 64
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def lengths(batch: pa.Table) -> pa.Table:
        n = [len(token_items(t or "")) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(n, pa.int64()),
            }
        )

    ranked = global_rank(
        ds.map_batches(lengths, batch_format="pyarrow"),
        "doc_id", seed=42, out_column="rank0",
    ).map_batches(
        lambda b: pa.table(
            {
                "batch_id": pc.divide(b["rank0"], BATCH),
                "n_tok": b["n_tok"],
            }
        ),
        batch_format="pyarrow",
    )

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("batch_id", as_index=False).agg(
            n_docs=("n_tok", "size"),
            max_len=("n_tok", "max"),
            sum_len=("n_tok", "sum"),
        )
        out["waste"] = out["n_docs"] * out["max_len"] - out["sum_len"]
        return out.astype(
            {"n_docs": "int64", "max_len": "int64",
             "sum_len": "int64", "waste": "int64"}
        )

    return coarse_group_reduce(ranked, "batch_id", per_batch)


def q127_video_scene_cuts(sf_dir: str):
    """Video SCENE-CUT detection via per-frame perceptual hashes — the
    shot-boundary pass a video-curation pipeline runs before sampling
    keyframes: each fixture video has 12 real-PNG frames in
    n_shots = 2 + (id % 3) shots; WITHIN a shot frames differ in both
    bytes and pixels (alternating +1 brightness, re-encoded) but share
    the aHash (uniform-shift invariance, the q121 property), ACROSS
    shots the noise content changes the hash. Cuts = adjacent-frame
    hash changes, counted per item in an ordered in-group reduce —
    frame hashes ride the exchange, frames never do. The oracle is the
    analytic shot structure: n_cuts = 1 + (id % 3)."""
    import struct as _struct

    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import (
        VIDEO_MAGIC,
        VideoFrameSampler,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    N_FRAMES = 12
    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def make_shot_video(item_id: int) -> bytes:
        n_shots = 2 + (item_id % 3)
        bounds = [round(s * N_FRAMES / n_shots) for s in range(n_shots + 1)]
        body = _struct.pack("<HH", 24, N_FRAMES)
        for shot in range(n_shots):
            rng = np.random.default_rng(item_id * 100 + shot)
            base = rng.integers(0, 199, size=(12, 16)).astype(np.uint8)
            for f in range(bounds[shot], bounds[shot + 1]):
                png = encode_png(base + (f % 2), level=6 + (f % 2))
                body += _struct.pack("<I", len(png)) + png
        return VIDEO_MAGIC + body

    def payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_shot_video(i) for i in ids], pa.large_binary()
                ),
            }
        )

    frames = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            VideoFrameSampler,
            fn_constructor_kwargs={"sample_every": 1},
            batch_format="pyarrow", batch_size=64, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "frame_index": b["frame_index"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def count_cuts(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for item, grp in df.groupby("item_id"):
            grp = grp.sort_values("frame_index", kind="mergesort")
            hs = grp["ph"].tolist()
            cuts = sum(1 for a, b in zip(hs, hs[1:]) if a != b)
            rows.append((item, len(hs), cuts))
        return pd.DataFrame(
            {
                "item_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_frames": pd.array([r[1] for r in rows], dtype="int64"),
                "n_cuts": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(frames, "item_id", count_cuts)


def q128_bloom_semi_audit(sf_dir: str):
    """Bloom-filter SEMI-JOIN pre-filter with its false-positive AUDIT
    (the q109/q117/q122 discipline applied to the join family): a tiny
    m=1024-bit k=2 filter over BUILDING-segment customer keys is built
    from per-batch partials on a BOUNDED key space (≤ 2·1024 (r, cell)
    rows ride the exchange — keys never do), broadcast once, and every
    order gets a bloom verdict; the EXACT verdict comes from the house
    bucketed semi-join over only the bloom-passing rows (no false
    negatives, so exact ⊆ passed — the composition a 100-TB fact⋈dim
    semi-join runs to cut the probe side's shuffle volume before the
    exchange). Output per order status: total / bloom-pass / exact /
    false-positive counts — the FP-rate measurement that sizes m before
    a real run. Cell hash = md5-low64 of 'r:key' mod 1024, reconstructed
    exactly by the oracle. The PRODUCTION path (vectorized double
    hashing, packed bit partials) is `stages/joins.py:bloom_prefilter`;
    this query is its oracle-auditable twin."""
    import ray
    from ray.data.aggregate import Count

    from basicocr_ray.stages.joins import bucketed_hash_join

    M, K = 1024, 2
    build = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    build = build.map_batches(
        lambda b: b.filter(
            pc.equal(b["c_mktsegment"], "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )

    def cells_partial(batch: pa.Table) -> pa.Table:
        seen = set()
        for key in batch["c_custkey"].to_pylist():
            for r in range(K):
                seen.add((r, _md5_low64(f"{r}:{key}") % M))
        rows = sorted(seen)
        return pa.table(
            {
                "r": pa.array([r for r, _ in rows], pa.int64()),
                "cell": pa.array([c for _, c in rows], pa.int64()),
            }
        )

    cells_df = (
        build.map_batches(cells_partial, batch_format="pyarrow")
        .groupby(["r", "cell"])  # bounded: ≤ K·M keys
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    cells = set(zip(cells_df["r"].astype(int), cells_df["cell"].astype(int)))
    cells_ref = ray.put(cells)

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def bloom_flag(batch: pa.Table) -> pa.Table:
        table = ray.get(cells_ref)
        keys = batch["o_custkey"].to_pylist()
        bp = [
            int(all((r, _md5_low64(f"{r}:{key}") % M) in table
                    for r in range(K)))
            for key in keys
        ]
        return batch.append_column("bp", pa.array(bp, pa.int64()))

    flagged = orders.map_batches(bloom_flag, batch_format="pyarrow")

    def counts_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_orderstatus", as_index=False).agg(
            n_orders=("bp", "size"), n_bloom_pass=("bp", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    base = (
        flagged.map_batches(counts_partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_bloom_pass", alias_name="n_bloom_pass"),
        )
        .to_pandas()
    )

    # exact verdict: bucketed semi-join of ONLY the bloom-passing rows
    def keep_passed(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b["bp"], 1))
        return pa.table(
            {"c_custkey": f["o_custkey"], "o_orderstatus": f["o_orderstatus"]}
        )

    passed = flagged.map_batches(keep_passed, batch_format="pyarrow")
    exact = bucketed_hash_join(
        passed, build.map_batches(
            lambda b: pa.table({"c_custkey": b["c_custkey"]}).combine_chunks(),
            batch_format="pyarrow",
        ),
        "c_custkey", ["o_orderstatus"], [], join_type="left semi",
    )
    exact_df = (
        exact.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_exact"))
        .to_pandas()
    )

    out = base.merge(exact_df, on="o_orderstatus", how="left")
    out["n_exact"] = out["n_exact"].fillna(0).astype("int64")
    for c in ("n_orders", "n_bloom_pass"):
        out[c] = out[c].astype("int64")
    out["n_false_pos"] = (out["n_bloom_pass"] - out["n_exact"]).astype("int64")
    return out


def q129_quality_classifier(sf_dir: str):
    """Hashed-linear QUALITY-CLASSIFIER inference — the fastText-style
    quality gate of the GPT-3/LLaMA curation recipes as a Ray stage:
    tokens hash into B=64 feature buckets, each bucket carries a FIXED
    integer weight in [-10, 10] derived from md5-low64('w:b') (a stand-in
    for trained weights with the same execution shape: the weight vector
    broadcasts once, inference is a zero-shuffle scan, scores are exact
    int64 so the oracle reconstructs them bit-for-bit). Output: per-doc
    score and the keep verdict (score > 0). A real model swaps the weight
    table; nothing else changes — this is A1's load-once scorer semantics
    on the documents table. Scoring kernel single-sourced in
    `core/textstats.py:hashed_linear_score` (shared with the
    `quality_gate` spec op)."""
    from basicocr_ray.core.textstats import hashed_linear_score

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        out_id, out_s = [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            out_id.append(did)
            out_s.append(
                hashed_linear_score(token_items(t) if t else [], weights)
            )
        kept = [1 if s > 0 else 0 for s in out_s]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q130_embedding_outliers(sf_dir: str):
    """Embedding OUTLIER detection (the SemDeDup/SSL-curation shape —
    flag the member farthest from its cluster centroid): vectors
    quantize to int64 (q115 discipline, scale 10³ so the score bound
    stays far inside int64), pass 1 reduces BOUNDED per-label (n, Σv)
    partials (labels × 64 ints — no shuffle of vectors), pass 2
    broadcasts them and scores every row with the EXACT integer
    n²·‖x − s/n‖² = Σ_i (n·x_i − s_i)², keeping only each batch's
    per-label argmax (≤ |labels| rows per batch reach the driver).
    Ties break to the lowest vec_id so the result is
    partition-invariant. The oracle replays the same integer algebra
    with unnest-zip list SQL."""
    import ray

    from basicocr_ray.stages.embed import _stack, quantize_vec

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = quantize_vec(_stack(batch["embedding"]), scale=1000.0)
        labels = batch["label"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        out_l, out_n, out_s = [], [], []
        for lab in np.unique(labels):
            mask = labels == lab
            out_l.append(int(lab))
            out_n.append(int(mask.sum()))
            out_s.append(m[mask].sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "s": pa.array(out_s, pa.list_(pa.int64())),
            }
        )

    stats: dict[int, tuple[int, np.ndarray]] = {}
    for tbl in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for lab, n, s in zip(
            tbl["label"].to_pylist(), tbl["n"].to_pylist(), tbl["s"].to_pylist()
        ):
            pn, ps = stats.get(lab, (0, np.zeros(len(s), dtype=np.int64)))
            stats[lab] = (pn + n, ps + np.asarray(s, dtype=np.int64))
    stats_ref = ray.put(stats)

    def local_argmax(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        m = quantize_vec(_stack(batch["embedding"]), scale=1000.0)
        labels = batch["label"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = batch["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_l, out_id, out_sc = [], [], []
        for lab in np.unique(labels):
            n, s = st[int(lab)]
            mask = labels == lab
            d = n * m[mask] - s[None, :]
            sc = (d * d).sum(axis=1)
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -sc))  # score desc, id asc
            out_l.append(int(lab))
            out_id.append(int(sub_ids[order[0]]))
            out_sc.append(int(sc[order[0]]))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_sc, pa.int64()),
            }
        )

    cand = ds.map_batches(local_argmax, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["label", "score", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    out = cand.groupby("label", as_index=False).first()
    for c in ("label", "vec_id", "score"):
        out[c] = out[c].astype("int64")
    return out[["label", "vec_id", "score"]]


def q131_validity_intervals(sf_dir: str):
    """SCD-2 VALIDITY INTERVALS — the keep-history sibling of q119's
    keep-latest compaction (what a recrawl store materializes so
    training can ask 'which snapshot was live at time T'): the same
    deterministic versioned corpus, each version's interval being
    [its ts, the NEXT version's ts) with the current version open-ended
    at a 2⁶² sentinel. One (doc_id, ver, ts) row per version rides the
    exchange (text never does); the LEAD runs as an ordered in-group
    shift in doc-keyed coarse groups (the q63 discipline, LEAD flavor)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    SENTINEL = 1 << 62
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def versions(batch: pa.Table) -> pa.Table:
        out_id, out_v, out_ts = [], [], []
        for did in batch["doc_id"].to_pylist():
            for v in range(3):
                if (did + v) % 3 == 0:
                    continue
                out_id.append(did)
                out_v.append(v)
                out_ts.append(did * 10 + v)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "ver": pa.array(out_v, pa.int64()),
                "ts": pa.array(out_ts, pa.int64()),
            }
        )

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "ts"], kind="mergesort")
        nxt = df.groupby("doc_id")["ts"].shift(-1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "ver": df["ver"].astype("int64"),
                "valid_from": df["ts"].astype("int64"),
                "valid_to": nxt.fillna(SENTINEL).astype("int64"),
                "is_current": nxt.isna().astype("int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(versions, batch_format="pyarrow"),
        "doc_id",
        intervals,
    )


def q132_png_metadata(sf_dir: str):
    """Image METADATA extraction WITHOUT pixel decode (the provenance/
    EXIF pass a crawl pipeline runs on every image before deciding what
    to decode): fixture PNGs carry real tEXt chunks (Software = cam<id%5>,
    Comment on even ids only), `ImageMetadataExtractor` walks chunk
    headers and skips IDAT bodies entirely — kilobytes read per image —
    and the rollup counts images and comment-bearing images per software
    tag. The oracle is the analytic chunk-content contract."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import ImageMetadataExtractor

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i))
            arr = rng.integers(0, 200, size=(16, 16)).astype(np.uint8)
            meta = {"Software": f"cam{i % 5}"}
            if i % 2 == 0:
                meta["Comment"] = f"shot {i}"
            ids.append(i)
            blobs.append(encode_png(arr, text_chunks=meta))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    meta = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageMetadataExtractor,
            fn_constructor_kwargs={"keywords": ["Software", "Comment"]},
            batch_format="pyarrow", batch_size=256, concurrency=2,
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_images"] = 1
        df["n_with_comment"] = df["Comment"].notna().astype("int64")
        g = df.groupby("Software", as_index=False)[
            ["n_images", "n_with_comment"]
        ].sum()
        return pa.Table.from_pandas(
            g.rename(columns={"Software": "software"}), preserve_index=False
        )

    out = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby("software")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_with_comment", alias_name="n_with_comment"),
        )
        .to_pandas()
    )
    for c in ("n_images", "n_with_comment"):
        out[c] = out[c].astype("int64")
    return out


def q133_audio_silence(sf_dir: str):
    """Audio SILENCE segmentation (the VAD pre-pass of a speech-corpus
    pipeline): fixture WAVs interleave 0.1 s silence gaps with
    n = 1 + id % 4 active 0.1 s square-wave bursts (real 16-bit PCM),
    the `AudioSilenceSegmenter` actor pool decodes, takes per-50 ms-hop
    RMS, thresholds, and counts maximal active runs. Segment boundaries
    align to hop boundaries by construction, so the frame/segment
    arithmetic is exact and the oracle is analytic:
    n_frames = 2 + 4n, active = 2n, segments = n."""
    from basicocr_ray.core.wav import encode_wav
    from basicocr_ray.stages.multimodal import AudioSilenceSegmenter

    RATE, BLK = 8000, 800  # 0.1 s blocks; hop 0.05 s = 400 samples
    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            n_seg = 1 + (i % 4)
            burst = 0.25 * (1.0 - 2.0 * (np.arange(BLK) % 2))
            sil = np.zeros(BLK)
            parts = [sil]
            for _ in range(n_seg):
                parts.extend((burst, sil))
            ids.append(i)
            blobs.append(encode_wav(RATE, np.concatenate(parts)))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    seg = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            AudioSilenceSegmenter,
            fn_constructor_kwargs={"frame_hop_s": 0.05, "threshold": 0.05},
            batch_format="pyarrow", batch_size=128, concurrency=2,
        )
    )
    return seg.map_batches(
        lambda b: b.select(
            ["item_id", "n_frames", "n_active_frames", "n_segments"]
        ),
        batch_format="pyarrow",
    )


def q134_duplicate_spans(sf_dir: str):
    """Cross-document DUPLICATED-SPAN detection — the span-level exact
    substring dedup of Lee et al. 2022 ('Deduplicating Training Data
    Makes Language Models Better') re-expressed for Ray Data: every
    stride-1 word 5-gram emits (md5 fp, doc_id, pos) — the fp exchange
    holds ALL occurrences of a gram, so the ≥2-distinct-docs test is
    exact and text never rides a shuffle; duplicated positions come
    back to doc-keyed coarse groups where overlapping/adjacent gram
    intervals [pos, pos+5) merge into MAXIMAL spans (the
    gaps-and-islands reduce). Output per affected doc: span count and
    words covered — the measurement that decides whether span-level
    cutting is worth running on a corpus. Kernel single-sourced in
    `stages/dedup.py:duplicate_spans` (shared with the spec op)."""
    from basicocr_ray.stages.dedup import duplicate_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_spans(ds, id_column="doc_id", text_column="text",
                           width=5)


def q135_priority_dedup(sf_dir: str):
    """Keep-BEST-source exact dedup — the multi-corpus union resolution
    (curated > web > crawl) where q10's min-id pick is arbitrary: each
    source gets a deterministic integer priority (md5-low64(source) %
    100, a stand-in for a curation-quality rank with the same execution
    shape) and per distinct text the highest-priority row wins (tie →
    lowest doc_id), with the multiplicity alongside. Kernel
    single-sourced in `stages/dedup.py:priority_dedup` (shared with the
    spec op): the shuffle carries (id, priority, fp) — text never moves."""
    from basicocr_ray.stages.dedup import priority_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def add_prio(batch: pa.Table) -> pa.Table:
        # NULL source → priority of '' (oracle: coalesce(source, ''))
        prio = [
            _md5_low64(s if s is not None else "") % 100
            for s in batch["source"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": batch["text"],
                "prio": pa.array(prio, pa.int64()),
            }
        )

    return priority_dedup(
        ds.map_batches(add_prio, batch_format="pyarrow"),
        id_column="doc_id", text_column="text", priority_column="prio",
    )


def q136_winnow_fingerprints(sf_dir: str):
    """Document FINGERPRINTING by winnowing (Schleimer et al., SIGMOD
    2003 — the MOSS algorithm): md5 of every char 8-gram, window-of-4
    minima, distinct selected hashes per doc. Winnowing guarantees any
    shared substring of length ≥ k+w−1 = 11 chars yields a shared
    fingerprint while storing only ~2/(w+1) of the grams — the
    plagiarism-detection-grade dedup sketch between exact md5 (q11) and
    MinHash (q22). Zero-shuffle scan (the fingerprint SET stays
    per-doc); output is the (doc_id, n_grams, n_fps) profile the
    storage sizing of a fingerprint index needs. md5 keeps the window
    minima SQL-reconstructible — the oracle replays the same selection
    with a window-function MIN."""
    from basicocr_ray.core.sketches import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def winnow(batch: pa.Table) -> pa.Table:
        out_id, out_g, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None or len(t) < 8:
                continue  # oracle lockstep: length(text) >= 8 filter
            n_grams, fps = winnow_fingerprints(t, k=8, w=4)
            if not fps:
                continue  # no full window → no row on either side
            out_id.append(did)
            out_g.append(n_grams)
            out_f.append(len(fps))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_grams": pa.array(out_g, pa.int64()),
                "n_fps": pa.array(out_f, pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


def q137_trailing_distinct(sf_dir: str):
    """TRAILING-WINDOW distinct count — distinct active users over each
    hour's trailing 3-hour window (the rolling-DAU shape every
    freshness dashboard computes, and a composition Ray Data has no
    primitive for): per-batch LOCAL (hour, user) pair dedup shrinks the
    exchange, each surviving pair fans out to the ≤3 window-end hours
    that exist in the data (the bounded hour set broadcasts once), and
    the q65 exact-distinct discipline finishes — pairs land in
    user-hash coarse groups (a pair lands in exactly one group → the
    in-group dedup is globally exact), groups emit per-hour partial
    counts, a tiny final sum ends it."""
    import ray
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.dedup import _coarse_salts

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    salts = _coarse_salts(None)

    def local_pairs(b: pa.Table) -> pa.Table:
        hour = pc.cast(
            pc.multiply(
                pc.divide(pc.cast(b["ts"], pa.int64()), HOUR_US), HOUR_US
            ),
            pa.int64(),
        )
        t = pa.table({"h": hour, "user_id": b["user_id"]})
        return pa.TableGroupBy(
            t, ["h", "user_id"], use_threads=False
        ).aggregate([])

    # materialize: the pair relation is consumed twice (hour enumeration
    # + fan-out) — without this the upstream dedup would execute twice
    pairs = ds.map_batches(local_pairs, batch_format="pyarrow").materialize()

    hours: set[int] = set()
    for tbl in pairs.map_batches(
        lambda b: pa.TableGroupBy(
            pa.table({"h": b["h"]}), ["h"], use_threads=False
        ).aggregate([]),
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        hours.update(int(h) for h in tbl["h"].to_pylist())
    hours_arr = np.array(sorted(hours), dtype=np.int64)
    hours_ref = ray.put(hours_arr)

    def fan_out(b: pa.Table) -> pa.Table:
        harr = ray.get(hours_ref)
        hs = b["h"].to_numpy(zero_copy_only=False)
        us = b["user_id"].to_numpy(zero_copy_only=False)
        out_h, out_u = [], []
        for k in range(3):
            th = hs + k * HOUR_US
            keep = np.isin(th, harr)
            out_h.append(th[keep])
            out_u.append(us[keep])
        th = np.concatenate(out_h)
        uu = np.concatenate(out_u)
        return pa.table(
            {
                "th": pa.array(th, pa.int64()),
                "user_id": pa.array(uu, pa.int64()),
                "cg": pa.array(
                    (uu.astype(np.int64) & (salts - 1)).astype(np.int32)
                ),
            }
        )

    def group_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["th", "user_id"])
        out = d.groupby("th", as_index=False).size()
        return out.rename(columns={"size": "n_users_3h"})

    res = (
        pairs.map_batches(fan_out, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(group_counts, batch_format="pandas")
        .groupby("th")
        .aggregate(Sum("n_users_3h", alias_name="n_users_3h"))
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "hour": pd.to_datetime(res["th"], unit="us"),
            "n_users_3h": res["n_users_3h"].astype("int64"),
        }
    )
    return out


def q138_group_mad(sf_dir: str):
    """ROBUST per-group dispersion — median absolute deviation and the
    3×MAD outlier count (the outlier gate quality pipelines prefer over
    mean±σ because one 10 MB page doesn't drag the threshold): both
    medians come from the exact two-pass histogram quantile
    (`stages/wide.py:grouped_quantile_disc` — zero row shuffle beyond
    the candidate trickle), the per-lang medians broadcast as bounded
    metadata between the passes, and the outlier count is one more
    integer-compare scan. All arithmetic on int64 n_chars, so Ray and
    the quantile_disc-based oracle agree bit-for-bit."""
    import ray
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import grouped_quantile_disc

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    med_df = grouped_quantile_disc(
        ds, "lang", "n_chars", 1, 2, out_name="med"
    ).to_pandas()
    med = {r.lang: int(r.med) for r in med_df.itertuples()}
    med_ref = ray.put(med)

    def dev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        langs = b["lang"].to_pylist()
        x = b["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        d = np.abs(x - np.array([m[l] for l in langs], dtype=np.int64))
        return pa.table(
            {"lang": b["lang"], "dev": pa.array(d, pa.int64())}
        )

    devs = ds.map_batches(dev, batch_format="pyarrow")
    mad_df = grouped_quantile_disc(
        devs, "lang", "dev", 1, 2, out_name="mad"
    ).to_pandas()
    mad = {r.lang: int(r.mad) for r in mad_df.itertuples()}
    mad_ref = ray.put(mad)

    def outlier_partial(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        md = ray.get(mad_ref)
        df = b.to_pandas()
        df["dev"] = (df["n_chars"] - df["lang"].map(m)).abs()
        df["is_out"] = (df["dev"] > 3 * df["lang"].map(md)).astype("int64")
        g = df.groupby("lang", as_index=False).agg(
            n_outliers=("is_out", "sum"), n_docs=("is_out", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ds.map_batches(outlier_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_outliers", alias_name="n_outliers"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .to_pandas()
    )
    counts["med"] = counts["lang"].map(med).astype("int64")
    counts["mad"] = counts["lang"].map(mad).astype("int64")
    for c in ("n_outliers", "n_docs"):
        counts[c] = counts[c].astype("int64")
    return counts[["lang", "med", "mad", "n_outliers", "n_docs"]]


def q139_cdc_chunks(sf_dir: str):
    """CONTENT-DEFINED CHUNKING (the LBFS/rsync/restic primitive a crawl-
    snapshot store runs so one edit reshifts one chunk boundary instead
    of every fixed-width boundary after it — the storage-dedup
    complement of q76's fixed chunks): cut after a character whenever
    the md5-low64 of the 8-char window ending there ≡ 0 (mod 64) —
    expected ~64-char chunks. Zero-shuffle scan (boundaries are a pure
    per-doc function); output per doc: chunk count and max chunk
    length, the sizing profile a chunk store needs. Kernel
    single-sourced in `core/sketches.py:cdc_chunk_lengths` (shared with
    the `cdc_chunk` spec op); md5 keeps every boundary
    SQL-reconstructible."""
    from basicocr_ray.core.sketches import cdc_chunk_lengths

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_mx = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                continue  # oracle lockstep: WHERE text IS NOT NULL
            lens = cdc_chunk_lengths(t, k=8, divisor=64)
            out_id.append(did)
            out_n.append(len(lens))
            out_mx.append(max(lens) if lens else 0)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_chunks": pa.array(out_n, pa.int64()),
                "max_len": pa.array(out_mx, pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def q140_sorted_neighborhood(sf_dir: str):
    """SORTED-NEIGHBORHOOD dedup blocking (Hernández & Stolfo 1995 —
    the entity-resolution family LSH doesn't cover: sort by a blocking
    key, compare only rows within a window): rank every doc by
    (n_chars, doc_id) with the range-partition window machinery (no
    global sort in one task), pair each rank with ranks +1/+2 in
    rank-keyed coarse groups (rank rows carry (rn, id) only), fetch
    texts for the survivors via TWO bucketed hash joins (text never
    rides the rank shuffle — the verify_pairs_jaccard_join discipline),
    and keep pairs with exact word-set Jaccard ≥ 1/2 as the integer
    cross-multiplication 2·inter ≥ uni. The oracle replays rank,
    window and list_intersect algebra exactly."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        grouped_window_rank,
    )

    # materialized once: this narrow projection is consumed three times
    # (rank input + both text-join sides) — without this the parquet
    # read would re-execute per consumer (the q145/q137 discipline)
    docs = _read(
        sf_dir, "documents", columns=["doc_id", "text", "n_chars"]
    ).materialize()

    ranked = grouped_window_rank(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "g": pa.array([0] * b.num_rows, pa.int64()),
                    "doc_id": b["doc_id"],
                    "n_chars": b["n_chars"],
                }
            ),
            batch_format="pyarrow",
        ),
        "g", "n_chars", "doc_id", 1,
    ).map_batches(
        lambda b: b.select(["doc_id", "rn"]), batch_format="pyarrow"
    )

    W = 2  # window: compare rank r with r+1 .. r+W

    def fan_out(b: pa.Table) -> pa.Table:
        rn = b["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        anchors = np.concatenate([rn - d for d in range(W + 1)])
        return pa.table(
            {
                "a": pa.array(anchors, pa.int64()),
                "rn": pa.array(np.tile(rn, W + 1), pa.int64()),
                "doc_id": pa.array(np.tile(ids, W + 1), pa.int64()),
            }
        )

    def window_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for a, grp in df.groupby("a"):
            anchor = grp[grp["rn"] == a]
            if anchor.empty:
                continue
            aid = int(anchor["doc_id"].iloc[0])
            for _, row in grp[grp["rn"] > a].iterrows():
                out_a.append(aid)
                out_b.append(int(row["doc_id"]))
        return pd.DataFrame(
            {"id_a": pd.array(out_a, dtype="int64"),
             "id_b": pd.array(out_b, dtype="int64")}
        )

    cand = coarse_group_reduce(
        ranked.map_batches(fan_out, batch_format="pyarrow"),
        "a", window_pairs,
    )

    texts = docs.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
    )

    def rename(key, name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({key: b["doc_id"], name: b["text"]})

        return fn

    with_a = bucketed_hash_join(
        cand,
        texts.map_batches(rename("id_a", "text_a"), batch_format="pyarrow"),
        key="id_a", left_columns=["id_b"], right_columns=["text_a"],
    )
    with_both = bucketed_hash_join(
        with_a,
        texts.map_batches(rename("id_b", "text_b"), batch_format="pyarrow"),
        key="id_b", left_columns=["id_a", "text_a"],
        right_columns=["text_b"],
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_i, out_u = [], [], [], []
        for a, b_, ta, tb in zip(
            batch["id_a"].to_pylist(), batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(), batch["text_b"].to_pylist(),
        ):
            sa = set(token_items(ta)) if ta else set()
            sb = set(token_items(tb)) if tb else set()
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            if uni > 0 and 2 * inter >= uni:
                out_a.append(a)
                out_b.append(b_)
                out_i.append(inter)
                out_u.append(uni)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "inter": pa.array(out_i, pa.int64()),
                "uni": pa.array(out_u, pa.int64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


def q141_snapshot_chunk_reuse(sf_dir: str):
    """Cross-SNAPSHOT chunk-store savings — the measurement
    content-defined chunking exists for (LBFS §3): wave 1 re-crawls
    every doc, a third of them with a one-char prefix edit; both waves
    chunk with the q139 CDC rule IN THE SAME TASK (no second corpus
    scan) and only (fp, wave, id, len) rows ride the fp-keyed exchange,
    where a wave-1 chunk is REUSED iff its fp already exists in wave 0.
    Because CDC boundaries resynchronize after an edit, edited docs
    still reuse most chunks — exactly what the per-flag
    (total_chars, reused_chars) rollup shows, and what fixed-width
    chunking would destroy. Oracle replays chunking, fps and the
    membership test in full list algebra."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.sketches import cdc_chunk_lengths
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_rows(batch: pa.Table) -> pa.Table:
        out_fp, out_w, out_id, out_ln = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            if t is None:
                continue
            for wave, tw in ((0, t), (1, ("X" + t) if did % 3 == 0 else t)):
                pos = 0
                for ln in cdc_chunk_lengths(tw, k=8, divisor=64):
                    out_fp.append(md5_hex(tw[pos : pos + ln]))
                    out_w.append(wave)
                    out_id.append(did)
                    out_ln.append(ln)
                    pos += ln
        return pa.table(
            {
                "fp": pa.array(out_fp, pa.string()),
                "wave": pa.array(out_w, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
                "ln": pa.array(out_ln, pa.int64()),
            }
        )

    def mark_reused(df: pd.DataFrame) -> pd.DataFrame:
        in_a = df.groupby("fp")["wave"].transform("min") == 0
        b = df[df["wave"] == 1].copy()
        b["edited"] = (b["doc_id"] % 3 == 0).astype("int64")
        b["rl"] = b["ln"] * in_a[b.index].astype("int64")
        g = b.groupby("edited", as_index=False).agg(
            total_chars=("ln", "sum"), reused_chars=("rl", "sum")
        )
        g["total_chars"] = g["total_chars"].astype("int64")
        g["reused_chars"] = g["reused_chars"].astype("int64")
        return g[["edited", "total_chars", "reused_chars"]]

    partial = coarse_group_reduce(
        ds.map_batches(chunk_rows, batch_format="pyarrow"),
        "fp", mark_reused,
    )

    agg = (
        partial.groupby("edited")
        .aggregate(
            Sum("total_chars", alias_name="total_chars"),
            Sum("reused_chars", alias_name="reused_chars"),
        )
        .to_pandas()
    )

    # doc counts per flag: a second scan that reads ONLY doc_id (the
    # text IS NOT NULL predicate pushes into the parquet read — text
    # bytes never leave storage again)
    import pyarrow.dataset as pads

    ids = _read(
        sf_dir, "documents", columns=["doc_id"],
        filter=pads.field("text").is_valid(),
    )

    def doc_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["edited"] = (df["doc_id"] % 3 == 0).astype("int64")
        g = df.groupby("edited", as_index=False).agg(
            n_docs=("doc_id", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    nd = (
        ids.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("edited")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    out = agg.merge(nd, on="edited")
    for c in ("edited", "total_chars", "reused_chars", "n_docs"):
        out[c] = out[c].astype("int64")
    return out[["edited", "n_docs", "total_chars", "reused_chars"]]


def q142_profile_columns(sf_dir: str):
    """DATA-PROFILING pass (the schema-quality report every ingest runs
    before trusting a new drop): per column — row count, null count,
    EXACT distinct count, lexicographic min/max — over two orders
    string columns in ONE shape: (column, value) fan-out rows dedup per
    batch, land in value-hash coarse groups (the q65 exact-distinct
    discipline, kernel `stages/wide.py:local_distinct_cg`), and
    min/max/null ride per-batch partials."""
    from ray.data.aggregate import Max, Min, Sum

    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.wide import local_distinct_cg

    COLS = ["o_orderstatus", "o_orderpriority"]
    ds = _read(sf_dir, "orders", columns=COLS)
    salts = _coarse_salts(None)

    def fan(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in COLS:
            col = b[c].to_pylist()
            names.extend([c] * len(col))
            vals.extend(col)
        t = pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "val": pa.array(vals, pa.string()),
            }
        )
        return t

    fanned = ds.map_batches(fan, batch_format="pyarrow")

    def base_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("col_name", as_index=False).agg(
            n_rows=("val", "size"),
            n_null=("val", lambda s: int(s.isna().sum())),
            min_v=("val", "min"),
            max_v=("val", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    base = (
        fanned.map_batches(base_partial, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
        .to_pandas()
    )

    def distinct_local(b: pa.Table) -> pa.Table:
        return local_distinct_cg(
            b.filter(pc.is_valid(b["val"])), ["col_name", "val"],
            "val", salts,
        )

    def distinct_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["col_name", "val"])
        out = d.groupby("col_name", as_index=False).size()
        return out.rename(columns={"size": "n_distinct"})

    dist = (
        fanned.map_batches(distinct_local, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(distinct_counts, batch_format="pandas")
        .groupby("col_name")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas()
    )

    out = base.merge(dist, on="col_name")
    for c in ("n_rows", "n_null", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out[["col_name", "n_rows", "n_null", "n_distinct",
                "min_v", "max_v"]]


def _apply_bpe_merges(token: str, merges: list[str]) -> int:
    """Pieces a token splits into after applying ``merges`` in order —
    the space-padded non-overlapping replace both engines implement
    identically (q104's application kernel)."""
    s = " ".join(token)
    for pair in merges:
        s = (" " + s + " ").replace(
            f" {pair} ", f" {pair.replace(' ', '')} "
        ).strip()
    return len(s.split(" "))


def q143_bpe_apply(sf_dir: str):
    """BPE tokenizer APPLICATION — the fertility measurement (pieces per
    word, per language) that decides whether a learned vocab is usable
    for a multilingual corpus: the q104 merge table is learned first
    (same distributed loop, one corpus scan), then merges apply to the
    DISTINCT (lang, token) relation inside its coarse-group reduce —
    vocab-sized work, never corpus-sized — and per-lang word/piece
    totals come from a tiny final sum. The oracle re-learns the merges
    with q104's unrolled CTEs AND re-applies them to a distinct-word
    map, so the whole train→apply chain is hash-checked."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce

    merges = _learn_bpe_merges(sf_dir, steps=5)["pair"].tolist()

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def lt_partial(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for lang, t in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in token_items(t) if t else []:
                cnt[(lang, tok)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "token"], as_index=False)["c"].sum()
        pieces = g["token"].map(lambda t: _apply_bpe_merges(t, merges))
        out = pd.DataFrame(
            {
                "lang": g["lang"],
                "n_words": g["c"].astype("int64"),
                "n_pieces": (g["c"] * pieces).astype("int64"),
            }
        )
        return out.groupby("lang", as_index=False)[
            ["n_words", "n_pieces"]
        ].sum()

    agg = (
        coarse_group_reduce(
            ds.map_batches(lt_partial, batch_format="pyarrow"),
            ["lang", "token"], fold,
        )
        .groupby("lang")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("n_pieces", alias_name="n_pieces"),
        )
        .to_pandas()
    )
    for c in ("n_words", "n_pieces"):
        agg[c] = agg[c].astype("int64")
    return agg


def q144_ref_integrity(sf_dir: str):
    """REFERENTIAL-INTEGRITY audit (the fk-orphan report every ingest
    runs before trusting a drop): per declared fk edge, total rows and
    rows whose key has NO match on the dim side — each edge one
    bucketed LEFT ANTI join (single shuffle, left columns only) plus a
    pruned single-column count. The deliberately-untrusted
    events.user_id→customer edge shows a nonzero orphan count; the
    TPC-H-consistent edges audit clean."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    EDGES = [
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("events.user_id->customer", "events", "user_id",
         "customer", "c_custkey"),
    ]
    rows = []
    for name, fact, fkey, dim, dkey in EDGES:
        fact_ds = _read(sf_dir, fact, columns=[fkey])
        n_rows = fact_ds.count()
        dim_ds = _read(sf_dir, dim, columns=[dkey]).map_batches(
            lambda b, _f=fkey, _d=dkey: pa.table(
                {_f: pc.cast(b[_d], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        orphans = bucketed_hash_join(
            fact_ds, dim_ds, fkey, [], [], join_type="left anti"
        ).count()
        rows.append((name, n_rows, orphans))
    return pd.DataFrame(
        {
            "relation": [r[0] for r in rows],
            "n_rows": pd.array([r[1] for r in rows], dtype="int64"),
            "n_orphans": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def q145_conversion_latency(sf_dir: str):
    """Funnel CONVERSION LATENCY per signup cohort — q78's funnel with
    the time dimension (the time-to-convert distribution every growth
    dashboard tracks): per user, first signup ts and first purchase
    strictly after it, computed in ONE user-hash coarse-group pass
    (the q63 discipline); delays (int64 µs) land in a materialized
    relation consumed twice — per-cohort counts via partial+final and
    the EXACT median via the histogram-refinement quantile — so the
    user exchange runs once."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.wide import grouped_quantile_disc

    import pyarrow.dataset as pads

    DAY_US = 86_400_000_000
    ds = _read(
        sf_dir, "events", columns=["user_id", "event_type", "ts"],
        filter=pads.field("event_type").isin(["signup", "purchase"]),
    )
    salts = _coarse_salts(None)

    def add_cg(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                # timestamp[us] → exact int64 µs (no pandas dtype fuzz)
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "cg": pc.cast(
                    pc.bit_wise_and(
                        pc.cast(b["user_id"], pa.int64()), salts - 1
                    ),
                    pa.int32(),
                ),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        out_cohort, out_delay = [], []
        for _, g in df.groupby("user_id"):
            s = g[g["event_type"] == "signup"]["ts_us"]
            if s.empty:
                continue
            ts0 = int(s.min())
            p = g[(g["event_type"] == "purchase") & (g["ts_us"] > ts0)][
                "ts_us"
            ]
            if p.empty:
                continue
            out_cohort.append(ts0 // DAY_US * DAY_US)
            out_delay.append(int(p.min()) - ts0)
        return pd.DataFrame(
            {
                "cohort_us": pd.array(out_cohort, dtype="int64"),
                "delay_us": pd.array(out_delay, dtype="int64"),
            }
        )

    delays = (
        ds.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(per_user, batch_format="pandas")
        .materialize()
    )

    med = grouped_quantile_disc(
        delays, "cohort_us", "delay_us", 1, 2, out_name="median_delay_us"
    ).to_pandas()

    def count_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("cohort_us", as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_conversions"}), preserve_index=False
        )

    counts = (
        delays.map_batches(count_partial, batch_format="pyarrow")
        .groupby("cohort_us")
        .aggregate(Sum("n_conversions", alias_name="n_conversions"))
        .to_pandas()
    )
    out = counts.merge(med, on="cohort_us")
    out["cohort"] = pd.to_datetime(out["cohort_us"], unit="us")
    out["n_conversions"] = out["n_conversions"].astype("int64")
    out["median_delay_us"] = out["median_delay_us"].astype("int64")
    return out[["cohort", "n_conversions", "median_delay_us"]]


def q146_crawl_plan(sf_dir: str):
    """END-TO-END crawl PLANNING — the q88 composition discipline
    applied to the crawl side, one hash-checked chain: messy raw URLs
    (mixed-case scheme/host, tracking params) → REAL canonicalization
    (`normalize_url`) → robots disallow-prefix gate on the canonical
    host (broadcast rules, zero shuffle) → frontier DEDUP on the
    canonical (host, path) key (q65 exact-distinct discipline — the
    path spread i%400 makes collisions real) → per-host counts →
    largest-remainder budget of B=500 (`_hamilton_quota`, shared with
    q125). Every stage is the production kernel; the oracle replays
    the chain analytically from the same doc_id arithmetic."""
    import ray
    from ray.data.aggregate import Sum

    from basicocr_ray.core.textstats import normalize_url
    from basicocr_ray.stages.dedup import _coarse_salts
    from basicocr_ray.stages.wide import local_distinct_cg

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    rules = {
        f"www.site{k}.example.com": (
            ["/p/1"] if k % 3 == 0 else ["/p/2"] if k % 3 == 1 else []
        )
        for k in range(7)
    }
    rules_ref = ray.put(rules)
    salts = _coarse_salts(None)

    def canon_and_gate(b: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        r = ray.get(rules_ref)
        hosts, paths = [], []
        for i in b["doc_id"].to_pylist():
            scheme = "HTTPS" if i % 2 else "HTTP"
            utm = "?utm_source=x" if i % 5 == 0 else ""
            raw = f"{scheme}://WWW.Site{i % 7}.Example.COM/p/{i % 400}{utm}"
            parts = urlsplit(normalize_url(raw))
            host, path = parts.hostname, parts.path
            if any(path.startswith(p) for p in r.get(host, ())):
                continue  # robots-blocked
            hosts.append(host)
            paths.append(path)
        t = pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )
        # local frontier dedup, then coarse-group key on the path hash
        # (shared q65-discipline kernel)
        return local_distinct_cg(t, ["host", "path"], "path", salts)

    def host_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["host", "path"])
        out = d.groupby("host", as_index=False).size()
        return out.rename(columns={"size": "n_urls"})

    counts = (
        ds.map_batches(canon_and_gate, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(host_counts, batch_format="pandas")
        .groupby("host")
        .aggregate(Sum("n_urls", alias_name="n_urls"))
        .to_pandas()
    )
    counts["n_urls"] = counts["n_urls"].astype("int64")
    return _hamilton_quota(counts, "host", "n_urls", 500)


def q147_link_graph(sf_dir: str):
    """OUTLINK extraction → host LINK GRAPH — the web-native structure
    pass the flagship's text extraction doesn't expose: every document
    is wrapped into its real boilerplate HTML page (`wrap_single`, the
    flagship fixture path) with two deterministic absolute outlinks
    injected into the body; a compiled-regex kernel pulls
    `href="http(s)://…"` targets from the markup (relative boilerplate
    links are excluded by the absolute-URL filter — a deterministic
    precision contract), hosts parse out, and the bounded (src_host,
    dst_host) edge rollup is the input q103's PageRank consumes. The
    oracle is the analytic link contract (recall and precision 1.0 by
    construction — the q121/q127 discipline for kernels SQL can't
    run)."""
    import re

    from ray.data.aggregate import Sum

    from basicocr_ray.sources.docpages import wrap_single

    HREF = re.compile(rb'href="(https?://[^"]+)"')

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def edges_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        from urllib.parse import urlsplit

        cnt: Counter = Counter()
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            page = wrap_single(t or "", i)
            links = (
                f'<p><a href="http://site{(3 * i + 1) % 7}.example.com'
                f'/p/{i % 100}">more</a> '
                f'<a href="https://site{(5 * i + 2) % 7}.example.com'
                f'/q/{i % 50}">src</a></p>'
            ).encode()
            page = page.replace(b"</article>", links + b"</article>")
            src = f"site{i % 7}"
            for m in HREF.finditer(page):
                host = urlsplit(m.group(1).decode()).hostname or ""
                cnt[(src, host.split(".")[0])] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "src_host": pa.array([k[0] for k in keys], pa.string()),
                "dst_host": pa.array([k[1] for k in keys], pa.string()),
                "n_links": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    out = (
        ds.map_batches(edges_partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])  # bounded: ≤ 49 host pairs
        .aggregate(Sum("n_links", alias_name="n_links"))
        .to_pandas()
    )
    out["n_links"] = out["n_links"].astype("int64")
    return out


def q148_pii_scrub_net(sf_dir: str):
    """PII scrub, NETWORK-identifier flavor (q52's email pass extended
    to the other two identifiers every release-safety checklist names):
    deterministic planted phone numbers (doc_id ≡ 1 mod 3) and IPv4
    addresses (doc_id ≡ 2 mod 3), scrubbed with regexes chosen from the
    Python-re ∩ DuckDB-RE2 common subset (explicit [0-9] classes — the
    q85 engine-parity discipline), verified by exact counts, removed
    bytes, and the md5 of the scrubbed text."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    phone_re = _re.compile(r"\+1555[0-9]{4}")
    ip_re = _re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")

    def scrub(batch: pa.Table) -> pa.Table:
        out_id, out_p, out_ip, out_rm, out_md5 = [], [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = t or ""
            if did % 3 == 1:
                t = f"{t} call +1555{did % 10000:04d}"
            if did % 3 == 2:
                t = (
                    f"{t} from {did % 256}.{(did * 3) % 256}"
                    f".{(did * 7) % 256}.{(did * 11) % 256}"
                )
            s1, n_phone = phone_re.subn("<PHONE>", t)
            s2, n_ip = ip_re.subn("<IP>", s1)
            out_id.append(did)
            out_p.append(n_phone)
            out_ip.append(n_ip)
            out_rm.append(len(t) - len(s2))
            out_md5.append(md5_hex(s2))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_phones": pa.array(out_p, pa.int64()),
                "n_ips": pa.array(out_ip, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "scrubbed_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


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


def q150_thumbnail_dedup(sf_dir: str):
    """END-TO-END image pipeline — q121's perceptual-dedup contract
    pushed through the PRODUCTION resize stage (decode → box-resample →
    re-encode → decode → aHash → dedup, three chained actor-pool
    stages): 32×32 originals and their +1-brightness re-encoded clones
    both thumbnail to 16×16 through `ImageResizer(mode="box")`, whose
    integer round-half-up mean commutes with a uniform +1 shift
    (⌊m+1+½⌋ = ⌊m+½⌋+1 — no clipping, pixels < 200), so the clone pair
    survives the WHOLE chain and the 8×8 average hash pairs exactly
    (i, i+10000) — recall and precision 1.0 by construction, which the
    analytic oracle asserts. Hash strings ride the only exchange;
    image bytes never do."""
    from basicocr_ray.core.png import encode_png
    from basicocr_ray.stages.multimodal import (
        ImageFeatureExtractor,
        ImageResizer,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def payloads(batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for i in batch["vec_id"].to_pylist():
            rng = np.random.default_rng(int(i) + 5)
            arr = rng.integers(0, 200, size=(32, 32)).astype(np.uint8)
            ids.append(i)
            blobs.append(encode_png(arr, level=6))
            ids.append(i + 10000)
            blobs.append(encode_png(arr + 1, level=9))
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(blobs, pa.large_binary()),
            }
        )

    feats = (
        ds.map_batches(payloads, batch_format="pyarrow")
        .map_batches(
            ImageResizer,
            fn_constructor_kwargs={
                "target_w": 16, "target_h": 16, "mode": "box",
            },
            batch_format="pyarrow", batch_size=128, concurrency=2,
        )
        .map_batches(
            ImageFeatureExtractor, batch_format="pyarrow",
            batch_size=256, concurrency=2,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "item_id": b["item_id"],
                    "ph": pc.cast(b["phash"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out1, out2 = [], []
        for _, grp in df.groupby("ph"):
            ids = sorted(grp["item_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out1.append(ids[i])
                    out2.append(ids[j])
        return pd.DataFrame(
            {"id1": pd.array(out1, dtype="int64"),
             "id2": pd.array(out2, dtype="int64")}
        )

    return coarse_group_reduce(feats, "ph", pairs)


def _bp_host(doc_id: int) -> str:
    return f"site{doc_id % 7}"


def _bp_paras(doc_id: int, text: str) -> list[str]:
    """The planted page structure q151 strips: every doc carries its
    host's footer paragraph; even docs also carry a promo banner. The
    original text is (almost surely) unique per doc and must survive."""
    host = _bp_host(doc_id)
    paras = [
        text,
        f"host {host} footer navigation copyright terms privacy contact",
    ]
    if doc_id % 2 == 0:
        paras.append(f"subscribe newsletter promo banner {host}")
    return paras


def q151_boilerplate_paras(sf_dir: str):
    """Per-host BOILERPLATE PARAGRAPH removal — the CCNet-style dedup
    pass every crawl corpus runs before training (footer/nav/cookie
    banners repeat across a site's pages; body text doesn't): paragraphs
    hash to md5, a (host, para_md5) document-frequency reduce finds
    paragraphs present in a strict MAJORITY of the host's docs
    (2·df > n_docs, exact integers — no float threshold), and a second
    doc scan drops them and re-emits the cleaned text's md5.

    Scale shape: the paragraph exchange carries (host, md5, doc_id) —
    never text. The boilerplate relation is PROVABLY bounded: each
    boilerplate paragraph has df > n_docs/2, and Σ df over a host's
    paragraphs = its total paragraph instances ≤ n_docs·P̄, so a host
    has < 2·P̄ boilerplate paragraphs — a broadcast-sized set at any
    corpus size (the driver collect here is metadata, not data). Host
    doc-counts are a ≤-hosts-sized rollup. Reference anchor: the strip
    generalizes the AC stopword anti-membership (J3/D2,
    contrib/acautomata) from tokens to host-scoped paragraphs."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def para_instances(batch: pa.Table) -> pa.Table:
        out_h, out_m, out_d = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            host = _bp_host(did)
            for pm in {md5_hex(p) for p in _bp_paras(did, t or "")}:
                out_h.append(host)
                out_m.append(pm)
                out_d.append(did)
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "pm": pa.array(out_m, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    # host doc counts: ≤ #hosts rows — a metadata-sized rollup
    def host_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        mods, cnts = np.unique(ids % 7, return_counts=True)
        return pa.table(
            {
                "host": pa.array(
                    [f"site{m}" for m in mods], pa.string()
                ),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    n_docs: dict[str, int] = {}
    for row in collect_rows(
        ds.map_batches(host_partial, batch_format="pyarrow")
    ):
        n_docs[row["host"]] = n_docs.get(row["host"], 0) + int(row["n"])

    def df_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["host", "pm"], as_index=False).agg(
            df=("doc_id", "nunique")
        )
        nd = out["host"].map(n_docs).to_numpy()
        return out[2 * out["df"].to_numpy() > nd][["host", "pm"]]

    boiler_rows = collect_rows(
        coarse_group_reduce(
            ds.map_batches(para_instances, batch_format="pyarrow"),
            ["host", "pm"],
            df_final,
        )
    )  # < 2·P̄ rows per host by the df>n/2 bound — broadcastable always
    boiler_ref = ray.put(
        {(r["host"], r["pm"]) for r in boiler_rows}
    )

    def strip(batch: pa.Table) -> pa.Table:
        boiler = ray.get(boiler_ref)
        out_id, out_np, out_rm, out_md5 = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            host = _bp_host(did)
            paras = _bp_paras(did, t or "")
            kept = [
                p for p in paras if (host, md5_hex(p)) not in boiler
            ]
            out_id.append(did)
            out_np.append(len(paras))
            out_rm.append(len(paras) - len(kept))
            out_md5.append(md5_hex("\n".join(kept)))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_paras": pa.array(out_np, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "cleaned_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")


def q152_sparse_dot_topk(sf_dir: str):
    """All-pairs SPARSE similarity top-k via an INVERTED-INDEX join —
    the document-similarity candidate scorer behind clustering and
    near-dup mining, with an integer contract (no float cosine): score
    of a doc pair = Σ tf_a·tf_b over shared RARE word-bigram terms
    (2 ≤ df ≤ 20), global top-20 pairs by (score DESC, a, b).

    Scale shape: the postings exchange carries (term, doc_id, tf) —
    term text never rides with documents; each term's postings co-locate
    in ONE coarse group, so the global df test and the per-term pair
    emission are exact in-group (the q124 discipline, generalized from
    candidate generation to weighted scoring). The df ≤ 20 hot-list cap
    bounds the pair fan-out to O(Σ min(df,20)·tf²) — the standard
    inverted-index-similarity prune (stop terms contribute no
    discrimination and quadratic pairs; at 100 TB the cap is the
    difference between a linear and an all-pairs job). Pair partials
    sum through a second coarse reduce; the top-k is a per-block local
    prune + tiny global sort (T3/G5)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bigrams = make_ngram_items(2)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_t, out_d, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for term, tf in Counter(bigrams(t or "")).items():
                out_t.append(term)
                out_d.append(did)
                out_f.append(tf)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_w = [], [], []
        for _, g in df.groupby("term", sort=False):
            if not (2 <= len(g) <= 20):  # global df: the group holds
                continue  # ALL of this term's postings
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_w.append(int(tfs[i]) * int(tfs[j]))
        return pd.DataFrame(
            {
                "a": pd.array(out_a, dtype="int64"),
                "b": pd.array(out_b, dtype="int64"),
                "score": pd.array(out_w, dtype="int64"),
            }
        )

    pair_parts = coarse_group_reduce(
        ds.map_batches(postings, batch_format="pyarrow"),
        "term",
        pair_partials,
    )

    def score_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False)["score"].sum()
        # local top-k prune: ties broken by (a, b), both in the sort
        return out.sort_values(
            ["score", "a", "b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(20).astype({"score": "int64"})

    scored = coarse_group_reduce(pair_parts, ["a", "b"], score_final)
    out = (
        scored.sort(["score", "a", "b"], descending=[True, False, False])
        .limit(20)
        .to_pandas()
    )
    return out.astype({"a": "int64", "b": "int64", "score": "int64"})


def q153_doc_triangles(sf_dir: str):
    """Distributed TRIANGLE COUNTING on a deterministic citation-style
    doc graph (edges i—(i+1), i—(i+2), i—(3i+1) mod N) — the classic
    two-join algorithm with DEGREE-ORDERED orientation (each edge points
    from its lower (degree, id) endpoint), which bounds the wedge
    fan-out to O(m^1.5) regardless of hub skew — the property id-ordered
    orientation lacks (a celebrity node of degree d generates d² wedges
    under id order; under degree order its edges mostly point INTO it).

    Scale shape: edge dedup and the degree rollup are coarse-salted
    reduces; degrees attach to edges via two bucketed hash joins (the
    degree relation is node-sized — never broadcast); wedges form by a
    bucketed self-join on the tail vertex with the (deg, id) filter and
    closing-edge key computed in-bucket; closure is one more bucketed
    join of candidate keys against the oriented edge set. Every
    exchange carries int64 ids only. Output (orientation-invariant):
    per-vertex triangle participation counts. Vertex ids must fit
    31 bits (the u·2³² + v composite key; the fixture graph is ≤ 2²⁰)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        js = [
            (i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs,
        ]
        ii = np.concatenate([i, i, i])
        jj = np.concatenate(js)
        keep = ii != jj
        u = np.minimum(ii[keep], jj[keep])
        v = np.maximum(ii[keep], jj[keep])
        return pa.table(
            {
                "ek": pa.array(u * (1 << 32) + v, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    def dedup_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("ek")[["u", "v"]]

    E = coarse_group_reduce(
        ds.map_batches(edges, batch_format="pyarrow"), "ek", dedup_first
    ).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        vtx = pa.concat_arrays(
            [
                batch["u"].combine_chunks(),
                batch["v"].combine_chunks(),
            ]
        )
        vc = pc.value_counts(vtx)
        return pa.table(
            {"vtx": vc.field("values"), "deg": vc.field("counts")}
        )

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("vtx", as_index=False)["deg"].sum()
        return out.astype({"deg": "int64"})

    D = coarse_group_reduce(
        E.map_batches(endpoints, batch_format="pyarrow"), "vtx", deg_final
    )

    # attach degrees: two bucketed joins (D is node-sized — no broadcast)
    with_du = bucketed_hash_join(
        E.map_batches(
            lambda b: b.rename_columns(["vtx", "v"]),
            batch_format="pyarrow",
        ),
        D.map_batches(
            lambda df: df.rename(columns={"deg": "deg_u"}),
            batch_format="pandas",
        ),
        key="vtx",
        left_columns=["v"],
        right_columns=["deg_u"],
    )
    with_both = bucketed_hash_join(
        with_du.map_batches(
            lambda b: pa.table(
                {
                    "vtx": b["v"],
                    "u": b["vtx"],
                    "deg_u": b["deg_u"],
                }
            ),
            batch_format="pyarrow",
        ),
        D.map_batches(
            lambda df: df.rename(columns={"deg": "deg_v"}),
            batch_format="pandas",
        ),
        key="vtx",
        left_columns=["u", "deg_u"],
        right_columns=["deg_v"],
    )

    def orient(b: pa.Table) -> pa.Table:
        u = b["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = b["vtx"].combine_chunks().to_numpy(zero_copy_only=False)
        du = b["deg_u"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = b["deg_v"].combine_chunks().to_numpy(zero_copy_only=False)
        # point from lower (deg, id) to higher
        fwd = (du < dv) | ((du == dv) & (u < v))
        x = np.where(fwd, u, v)
        y = np.where(fwd, v, u)
        dy = np.where(fwd, dv, du)
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "deg_y": pa.array(dy, pa.int64()),
            }
        )

    Eo = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_pairs(b: pa.Table) -> pa.Table:
        # joined rows: (x, y, deg_y, y2, deg_y2) — one row per ordered
        # head pair; keep (deg,id)-ordered wedges, emit the closing key
        y = b["y"].combine_chunks().to_numpy(zero_copy_only=False)
        dy = b["deg_y"].combine_chunks().to_numpy(zero_copy_only=False)
        y2 = b["y2"].combine_chunks().to_numpy(zero_copy_only=False)
        dy2 = b["deg_y2"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (dy < dy2) | ((dy == dy2) & (y < y2))
        ck = y[keep] * (1 << 32) + y2[keep]
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "apex": pa.array(
                    b["x"].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )[keep],
                    pa.int64(),
                ),
            }
        )

    wedges = bucketed_hash_join(
        Eo,
        Eo.map_batches(
            lambda b: pa.table(
                {"x": b["x"], "y2": b["y"], "deg_y2": b["deg_y"]}
            ),
            batch_format="pyarrow",
        ),
        key="x",
        left_columns=["y", "deg_y"],
        right_columns=["y2", "deg_y2"],
        bucket_post_fn=wedge_pairs,
    )

    closing = Eo.map_batches(
        lambda b: pa.table(
            {
                "ck": pc.add(
                    pc.multiply(b["x"], pa.scalar(1 << 32, pa.int64())),
                    b["y"],
                ),
                "closed": pa.array(
                    np.ones(b.num_rows, dtype=np.int8), pa.int8()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    tris = bucketed_hash_join(
        wedges, closing, key="ck",
        left_columns=["apex"], right_columns=["closed"],
    )

    def tri_vertices(b: pa.Table) -> pa.Table:
        ck = b["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        apex = b["apex"].combine_chunks().to_numpy(zero_copy_only=False)
        vtx = np.concatenate([apex, ck >> 32, ck & ((1 << 32) - 1)])
        vc = pc.value_counts(pa.array(vtx, pa.int64()))
        return pa.table(
            {"vertex": vc.field("values"), "n": vc.field("counts")}
        )

    def vtx_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("vertex", as_index=False)["n"].sum()
        out = out.rename(columns={"n": "n_triangles"})
        return out.astype({"n_triangles": "int64"})

    return coarse_group_reduce(
        tris.map_batches(tri_vertices, batch_format="pyarrow"),
        "vertex",
        vtx_final,
    )


def q154_group_regression(sf_dir: str):
    """Grouped OLS REGRESSION (value vs hour-of-day per event_type) via
    ALGEBRAIC sufficient statistics — the q89 exact-moments discipline
    extended to two variables: partials carry (n, Σx, Σy, Σx², Σxy, Σy²)
    with y in integer cents and x the integer UTC hour, mergeable by
    addition at any parallelism; slope / intercept / r² are each ONE
    double division of exactly-representable big-int numerators and
    denominators, reproduced verbatim in the SQL twin (HUGEINT there,
    unbounded Python ints here) so the int→double roundings coincide.
    The regr_slope/regr_intercept/regr_r2 family (training-data drift
    dashboards: does quality trend with time-of-day?) with none of the
    streaming-float nondeterminism a naive mean-centered pass has."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (
            df["ts"].to_numpy().astype("datetime64[us]").view("int64")
            // 3_600_000_000
        ) % 24
        y = np.round(df["value"].to_numpy() * 100.0).astype("int64")
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "x": x,
                "y": y,
                "xx": x * x,
                "xy": x * y,
                "yy": y * y,
            }
        ).groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"), syy=("yy", "sum"),
        )
        h = pd.util.hash_array(g["event_type"].to_numpy())
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False)[
            ["n", "sx", "sy", "sxx", "sxy", "syy"]
        ].sum()
        slope, intercept, r2 = [], [], []
        for n, sx, sy, sxx, sxy, syy in zip(
            out["n"], out["sx"], out["sy"], out["sxx"], out["sxy"],
            out["syy"],
        ):
            n, sx, sy = int(n), int(sx), int(sy)
            dxx = n * int(sxx) - sx * sx
            dxy = n * int(sxy) - sx * sy
            dyy = n * int(syy) - sy * sy
            # cents cancel in slope's x-units; scale back to value/hour
            slope.append(float(dxy) / (float(dxx) * 100.0))
            intercept.append(
                float(sy * dxx - dxy * sx) / (float(n * dxx) * 100.0)
            )
            r2.append(
                float(dxy * dxy) / float(dxx * dyy)
                if dxx * dyy != 0 else None
            )
        out["slope"] = slope
        out["intercept"] = intercept
        out["r2"] = r2
        return out[
            ["event_type", "n", "slope", "intercept", "r2"]
        ].astype({"n": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("cg")
        .map_groups(final, batch_format="pandas")
    )


def q155_pareto_docs(sf_dir: str):
    """Per-language PARETO SKYLINE of documents on (n_chars, distinct
    tokens) — the multi-objective curation frontier ("longest AND most
    lexically diverse"): a doc survives iff no same-lang doc is ≥ in
    both metrics and > in one. Integer metrics only — no float
    dominance ties.

    Scale shape: skylines compose — skyline(∪ local skylines) =
    skyline(all) (a global dominator either survives its local prune or
    is itself dominated by a local survivor that transitively dominates)
    — so each batch prunes to its local frontier FIRST and only
    survivors reach the per-lang final (the classic distributed-skyline
    two-phase). The sweep is vectorized: per n_chars level keep rows at
    the level max of n_uniq, survive if that max beats the running max
    over strictly-longer levels. Worst case (an anti-chain) the skyline
    IS the data — at 100 TB the next refinement is range-partitioning
    by n_chars with cross-partition max filtering; the local-prune
    shape here already does the data reduction that matters."""
    ds = _read(
        sf_dir, "documents", columns=["doc_id", "lang", "text", "n_chars"]
    )

    def metrics(batch: pa.Table) -> pa.Table:
        uniq = [
            len(set((t or "").lower().split()))
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(batch["n_chars"], pa.int64()),
                "n_uniq": pa.array(uniq, pa.int64()),
            }
        )

    def skyline(df: pd.DataFrame) -> pd.DataFrame:
        # max n_uniq per n_chars level, scanned from longest down
        lvl = (
            df.groupby("n_chars")["n_uniq"].max()
            .sort_index(ascending=False)
        )
        prev_max = lvl.cummax().shift(1, fill_value=-1)
        alive = lvl[lvl > prev_max]  # level max beats all longer docs
        sel = df["n_chars"].map(alive).eq(df["n_uniq"])
        return df[sel.fillna(False)]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.groupby("lang", group_keys=False)
            .apply(skyline)
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(metrics, batch_format="pyarrow")
        .map_batches(local_prune, batch_format="pandas")
        .groupby("lang")
        .map_groups(skyline, batch_format="pandas")
    )


def q156_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): EMBEDDING-level semantic dedup —
    k-means clusters bound the pairwise-cosine work to O(Σ|cluster|²),
    then within each cluster every vector with a LOWER-id neighbor at
    cosine ≥ 0.9 drops (one representative per duplicate group
    survives). Corpus = embeddings ∪ exact clones (vec_id+10000), so
    recall/precision are analytic: clone pairs sit at cosine 1.0,
    the corpus's max non-clone pair is 0.48 (measured) — the 0.9
    threshold lies in a >0.4-wide gap, which is what makes a
    float-cosine rule drivable against a SQL oracle (the q24/q150
    threshold-in-gap discipline; both engines' last-ulp noise cannot
    cross the gap).

    Scale shape: centroids broadcast in the task closure (k×dim —
    q92's no-shuffle assign); ONE shuffle co-locates each cluster
    (ids + vectors, never text); the in-cluster prune is a vectorized
    normalized-Gram argmax. k is the SemDeDup cost knob: clusters too
    hot → raise k (or salt-subdivide and verify across, the q22/q123
    pigeonhole discipline)."""
    from basicocr_ray.stages.kmeans import _assign

    ctab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    crows = ctab.filter(pc.less(ctab["vec_id"], 8)).sort_by("vec_id")
    centroids = np.asarray(crows["embedding"].to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.add(batch["vec_id"], 10000),
                "embedding": batch["embedding"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))

    def assign_keep_vec(batch: pa.Table) -> pa.Table:
        # kmeans_assign's tie-exact argmin, keeping the vector for the
        # in-cluster prune (the cluster shuffle carries ids + vectors)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        return batch.append_column(
            "cluster", pa.array(_assign(m, centroids), pa.int32())
        )

    assigned = both.map_batches(assign_keep_vec, batch_format="pyarrow")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id", kind="mergesort").reset_index(
            drop=True
        )
        V = np.asarray(df["embedding"].to_list(), dtype=np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        G = V @ V.T
        # drop i iff any j < i (id order) has cos >= 0.9
        close = np.tril(G >= 0.9, k=-1).any(axis=1)
        out = df.loc[~close, ["vec_id", "cluster"]].copy()
        out["cluster"] = out["cluster"].astype("int64")
        return out

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas"
    )


def q157_event_pairs_window(sf_dir: str):
    """STREAM-STREAM SELF-JOIN within a time bound — pairs of events by
    the same user ≤ 60 min apart (the sessionless co-occurrence join
    behind funnel mining and bot detection; Ray Data has no non-equi
    self-join). The distributed shape is time-bucketing with BOUNDARY
    REPLICATION: each event lands in its Δ-wide home bucket AND the next
    one, so every qualifying pair co-occurs in exactly the LATER event's
    home bucket — the only bucket that emits it (two replicas never
    emit: the later event isn't home there). One composite
    (user, bucket) exchange; within a group a sorted two-pointer sweep
    emits pairs, ordered lexicographically by (ts, event_id) so
    equal-timestamp pairs have a deterministic orientation. Replication
    factor is exactly 2 regardless of data size — the stream-join
    analogue of q44's interval replication."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DELTA_US = 3_600_000_000  # 60 min

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        b = ts_us // DELTA_US
        out = pd.DataFrame(
            {
                "user_id": np.concatenate(
                    [df["user_id"].to_numpy()] * 2
                ),
                "bucket": np.concatenate([b, b + 1]),
                "event_id": np.concatenate(
                    [df["event_id"].to_numpy()] * 2
                ),
                "ts_us": np.concatenate([ts_us, ts_us]),
            }
        )
        return out

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_u, out_1, out_2, out_g = [], [], [], []
        for (uid, bkt), g in df.groupby(
            ["user_id", "bucket"], sort=False
        ):
            g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
            ids = g["event_id"].to_numpy()
            ts = g["ts_us"].to_numpy()
            home = ts // DELTA_US == bkt
            for j in range(1, len(ids)):
                if not home[j]:
                    continue  # emit only in the LATER event's home
                i = j - 1
                while i >= 0 and ts[j] - ts[i] <= DELTA_US:
                    if ids[i] != ids[j]:
                        out_u.append(uid)
                        out_1.append(ids[i])
                        out_2.append(ids[j])
                        out_g.append(int(ts[j] - ts[i]))
                    i -= 1
        return pd.DataFrame(
            {
                "user_id": pd.array(out_u, dtype="int64"),
                "id1": pd.array(out_1, dtype="int64"),
                "id2": pd.array(out_2, dtype="int64"),
                "gap_us": pd.array(out_g, dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(bucketize, batch_format="pandas"),
        ["user_id", "bucket"],
        pairs,
    )


def q158_large_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): the GROUP-THEN-JOIN
    pattern — per-order quantity rollup through the coarse-salted
    reduce, HAVING-style filter (total > 250), then ONE bucketed hash
    join back to orders. The big side (lineitem) never joins raw: the
    aggregate runs first and only qualifying order keys reach the join
    — the aggregate-pushdown discipline that turns an
    orders×lineitem join into a keys×orders join. Quantities are
    integral doubles, so sums are exact in both engines and the BIGINT
    cast is lossless."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def qty_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_orderkey", as_index=False)[
            "l_quantity"
        ].sum()
        out = out[out["l_quantity"] > 250.0]
        out["total_qty"] = out["l_quantity"].astype("int64")
        return out[["l_orderkey", "total_qty"]]

    big = coarse_group_reduce(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        "l_orderkey",
        qty_final,
    )

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: b.rename_columns(
            ["l_orderkey", "o_custkey", "o_totalprice"]
        ),
        batch_format="pyarrow",
    )

    joined = bucketed_hash_join(
        big, orders, key="l_orderkey",
        left_columns=["total_qty"],
        right_columns=["o_custkey", "o_totalprice"],
    )

    def narrow(b: pa.Table) -> pa.Table:
        # the pandas-block left side null-pads through float64; the
        # inner join leaves no nulls, so the int64 casts are lossless
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "total_qty": pc.cast(b["total_qty"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_totalprice": pc.cast(b["o_totalprice"], pa.float64()),
            }
        )

    return joined.map_batches(narrow, batch_format="pyarrow")


def q159_span_cut(sf_dir: str):
    """SPAN-CUT REWRITE — the actionable half of Lee et al. 2022 exact
    substring dedup (q134 measures the duplicated spans; this query CUTS
    them and proves the rewritten text). Shape: the shared
    `_dup_gram_positions` exchange yields maximal duplicated intervals
    per doc (`dup_span_intervals`), intervals pack to ONE tiny edit-list
    row per affected doc, and one doc-keyed bucketed LEFT join brings
    the edit list to the text — the only exchange the text rides, and
    the minimum any rewrite needs (edit instructions must meet the
    bytes). Evidence per doc: token counts plus md5 of the
    space-rejoined kept tokens — exact string proof of the cut, not just
    a count. Kernel single-sourced in `stages/dedup.py:span_cut_rewrite`
    (shared with the `span_cut` spec op)."""
    from basicocr_ray.stages.dedup import span_cut_rewrite

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    rewritten = span_cut_rewrite(docs, "doc_id", "text", width=5)

    def evidence(b: pa.Table) -> pa.Table:
        md = [md5_hex(t or "") for t in b["cut_text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_words": pc.cast(b["n_words"], pa.int64()),
                "n_cut": pc.cast(b["n_cut"], pa.int64()),
                "kept_md5": pa.array(md, pa.string()),
            }
        )

    return rewritten.map_batches(evidence, batch_format="pyarrow")


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


def q161_percent_rank_hist(sf_dir: str):
    """PERCENT-RANK WITHOUT A PER-GROUP SORT — every doc's strict rank of
    its character length within its language, computed the
    histogram-rank way: (lang, n_chars) counts through the coarse-salted
    reduce (the histogram is bounded by DISTINCT lengths, not rows),
    per-lang exclusive cumulative counts over the sorted values
    (n_smaller = rank()-1), then ONE bucketed hash join on a composite
    (lang:value) key attaches (n_smaller, n_lang) back to the docs.
    Integer evidence only — percent_rank = n_smaller/(n_lang-1) is left
    to the consumer so the driver hash stays float-free. The shape that
    replaces ``rank() OVER (PARTITION BY g ORDER BY v)`` when a group
    exceeds one task."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def measure(b: pa.Table) -> pa.Table:
        langs = [
            l if l is not None else "" for l in b["lang"].to_pylist()
        ]
        n = [len(t or "") for t in b["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "v": pa.array(n, pa.int64()),
            }
        )

    rows = ds.map_batches(measure, batch_format="pyarrow")

    def hist_partial(b: pa.Table) -> pa.Table:
        t = b.group_by(["lang", "v"]).aggregate([("v", "count")])
        return t.rename_columns(["lang", "v", "cnt"])

    def hist_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "v"], as_index=False)["cnt"].sum()
        return out.astype({"v": "int64", "cnt": "int64"})

    hist = coarse_group_reduce(
        rows.map_batches(hist_partial, batch_format="pyarrow"),
        ["lang", "v"],
        hist_final,
    )

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            g = g.sort_values("v")
            cnt = g["cnt"].to_numpy(dtype=np.int64)
            n_smaller = np.cumsum(cnt) - cnt
            out.append(pd.DataFrame(
                {
                    "k": lang + ":" + g["v"].astype(str),
                    "lang": lang,
                    "n_chars": g["v"].astype("int64"),
                    "n_smaller": n_smaller,
                    "n_lang": int(cnt.sum()),
                }
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"k": pd.array([], dtype="object"),
             "lang": pd.array([], dtype="object"),
             "n_chars": pd.array([], dtype="int64"),
             "n_smaller": pd.array([], dtype="int64"),
             "n_lang": pd.array([], dtype="int64")}
        )

    rank_rel = coarse_group_reduce(hist, "lang", ranks)

    def keyed(b: pa.Table) -> pa.Table:
        ks = [
            f"{l}:{v}" for l, v in zip(
                b["lang"].to_pylist(), b["v"].to_pylist()
            )
        ]
        return pa.table(
            {
                "k": pa.array(ks, pa.string()),
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
            }
        )

    joined = bucketed_hash_join(
        rows.map_batches(keyed, batch_format="pyarrow"),
        rank_rel,
        key="k",
        left_columns=["doc_id"],
        right_columns=["lang", "n_chars", "n_smaller", "n_lang"],
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang": pc.cast(b["lang"], pa.string()),
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
                "n_smaller": pc.cast(b["n_smaller"], pa.int64()),
                "n_lang": pc.cast(b["n_lang"], pa.int64()),
            }
        )

    return joined.map_batches(narrow, batch_format="pyarrow")


def q162_incremental_neardup(sf_dir: str):
    """INCREMENTAL MinHash near-dup — the operational form of q22: a new
    crawl wave dedups against a PERSISTED band index instead of
    re-banding history. Wave 1 (doc_id < 250, filter pushed into the
    parquet scan) ingests its band rows into a content-hash-named index;
    wave 2 bands ONCE and its candidates come from (a) the usual salted
    band buckets within the wave and (b) one bucketed hash join of its
    band rows against the index — history's TEXT is never re-read, the
    index carries num_bands small ints per ingested doc. Exact Jaccard
    verify at 0.8 owns precision (the q22 discipline; hot buckets expand
    fully for the exact-pair contract). Output = every near-dup pair
    involving a wave-2 doc; the oracle is the brute-force cross-pair
    restriction of q22's."""
    import tempfile

    import pyarrow.dataset as pads

    from basicocr_ray.stages.dedup import (
        incremental_minhash_candidates,
        verify_pairs_jaccard_join,
    )

    SPLIT = 250
    old = _read(
        sf_dir, "documents", columns=["doc_id", "text"],
        filter=pads.field("doc_id") < SPLIT,
    )
    new = _read(
        sf_dir, "documents", columns=["doc_id", "text"],
        filter=pads.field("doc_id") >= SPLIT,
    )
    idx = tempfile.mkdtemp(prefix="q162_bands_")
    try:
        # wave 1: ingest history (within-wave-1 pairs are q22's
        # business, not this query's — only the index side effect is
        # consumed). Wave 2 is terminal here → commit=False.
        incremental_minhash_candidates(
            old, idx, num_bands=32, hot_bucket_mode="full"
        )
        pairs, _ = incremental_minhash_candidates(
            new, idx, num_bands=32, hot_bucket_mode="full",
            commit=False,
        )
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        verified = verify_pairs_jaccard_join(
            pairs, ds, "doc_id", "text", threshold=0.8
        )
        # materialize (output-sized) before dropping the scratch index
        # the lazy cross-join still reads from
        return verified.select_columns(["id_a", "id_b"]).materialize()
    finally:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)


def q163_incremental_exact(sf_dir: str):
    """INCREMENTAL exact dedup across waves — each shard dedups against
    everything ingested before it without rescanning old text
    (`incremental_exact_dedup`: within-wave min-id first-occurrence →
    single-shuffle ANTI-JOIN against the persisted fingerprint index →
    survivors stream out of a semi-join; the index grows by fp rows
    only). Wave 1 = the corpus; wave 2 is PLANTED from it (the q50
    discipline): every doc re-keyed +10000 with text unchanged (exact
    dup of history → dropped) except doc_id≡0 mod 3 which gets a ' v2'
    suffix (novel → survives), plus +20000 clones of the mod-5 rows
    (within-wave dups → min id wins). Evidence: surviving (doc_id,
    fp=md5(text)) — the oracle predicts the exact survivor set."""
    import tempfile

    from basicocr_ray.stages.dedup import incremental_exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def second_wave(b: pa.Table) -> pa.Table:
        out_id, out_t = [], []
        for i, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            t = t if t is not None else ""
            t2 = t + " v2" if i % 3 == 0 else t
            out_id.append(i + 10000)
            out_t.append(t2)
            if i % 5 == 0:
                out_id.append(i + 20000)
                out_t.append(t2)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_t, pa.string()),
            }
        )

    idx = tempfile.mkdtemp(prefix="q163_fps_")
    try:
        incremental_exact_dedup(ds, idx)  # wave 1: ingest the corpus
        survivors, _ = incremental_exact_dedup(
            ds.map_batches(second_wave, batch_format="pyarrow"), idx,
            commit=False,  # terminal wave: nothing dedups against it
        )

        def evidence(b: pa.Table) -> pa.Table:
            fps = [md5_hex(t or "") for t in b["text"].to_pylist()]
            return pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "fp": pa.array(fps, pa.string()),
                }
            )

        # materialize (output-sized) before dropping the scratch index
        # the lazy anti-join still reads from
        return survivors.map_batches(
            evidence, batch_format="pyarrow"
        ).materialize()
    finally:
        import shutil

        shutil.rmtree(idx, ignore_errors=True)


def q164_audio_fp_match(sf_dir: str):
    """AUDIO CLIP-TO-SOURCE MATCHING — Shazam-style constellation
    fingerprints (Wang 2003) over REAL WAV PCM, end to end: every
    embeddings row becomes a deterministic frequency-hopping tone
    (`make_tone_wav`, genuine 16-bit PCM); rows ≡ 0 mod 4 also emit a
    1-second CLIP cut at sample 4096 (re-encoded — quantization
    commutes with slicing, so clip frames are byte-identical to the
    source's) under id+10000. `AudioFingerprinter` actor pools turn
    both corpora into (id, t, fhash) landmark rows — audio never rides
    a shuffle, only int64 landmarks do. ONE bucketed hash join on fhash
    meets clips with sources; per (clip, source) the coarse reduce
    scores the maximal count of time-ALIGNED matches (one dominant
    t_src−t_clip offset identifies a true sub-clip) and keeps score ≥ 7.
    Analytic contract: exactly the planted (v+10000, v) pairs — measured
    over all 500 sources, true-pair score is 11 vs ≤ 3 for non-pairs, so
    the threshold sits mid-gap (the q24/q150 discipline)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.multimodal import (
        AudioFingerprinter,
        make_tone_wav,
    )
    from basicocr_ray.stages.wide import coarse_group_reduce

    START, CLIP_N, THRESH = 4096, 8000, 7

    ds = _read(sf_dir, "embeddings", columns=["vec_id"])

    def tone_payloads(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [make_tone_wav(i) for i in ids], pa.large_binary()
                ),
            }
        )

    def clip_payloads(batch: pa.Table) -> pa.Table:
        from basicocr_ray.core.wav import decode_wav, encode_wav

        out_id, out_p = [], []
        for i in batch["vec_id"].to_pylist():
            if i % 4 != 0:
                continue
            rate, x = decode_wav(make_tone_wav(i))
            out_id.append(i + 10000)
            out_p.append(encode_wav(rate, x[START:START + CLIP_N]))
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "payload": pa.array(out_p, pa.large_binary()),
            }
        )

    def fp(payloads, id_out):
        rows = payloads.map_batches(
            AudioFingerprinter,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        return rows.map_batches(
            lambda b: pa.table(
                {
                    "fhash": b["fhash"],
                    id_out: b["item_id"],
                    f"t_{id_out}": b["t"],
                }
            ),
            batch_format="pyarrow",
        )

    src_fp = fp(
        ds.map_batches(tone_payloads, batch_format="pyarrow"), "orig_id"
    )
    clip_fp = fp(
        ds.map_batches(clip_payloads, batch_format="pyarrow"), "clip_id"
    )

    joined = bucketed_hash_join(
        clip_fp, src_fp, key="fhash",
        left_columns=["clip_id", "t_clip_id"],
        right_columns=["orig_id", "t_orig_id"],
    )

    def offsets(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "clip_id": pc.cast(b["clip_id"], pa.int64()),
                "orig_id": pc.cast(b["orig_id"], pa.int64()),
                "off": pc.subtract(
                    pc.cast(b["t_orig_id"], pa.int64()),
                    pc.cast(b["t_clip_id"], pa.int64()),
                ),
            }
        )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["clip_id", "orig_id", "off"])
            .size()
            .groupby(["clip_id", "orig_id"])
            .max()
            .reset_index(name="best")
        )
        g = g[g["best"] >= THRESH]
        return g[["clip_id", "orig_id"]].astype("int64")

    return coarse_group_reduce(
        joined.map_batches(offsets, batch_format="pyarrow"),
        ["clip_id", "orig_id"],
        score,
    )


def q165_migration_checksum(sf_dir: str):
    """MIGRATION-AUDIT corpus checksum — the verification primitive an
    engine swap (this whole project) runs on both systems to prove the
    data came through bit-for-bit: per lang, row count plus an
    ORDER-INSENSITIVE content digest (XOR of per-row md5-low-63 over a
    canonical ``id:text`` serialization — XOR is commutative/associative
    and BIGINT-exact, so the reduce is partition/retry/order-invariant
    by construction and never overflows either engine). Per-batch
    partials carry ONE row per (batch, lang); the coarse reduce XORs
    partials — bytes never ride the shuffle, a corpus of any size moves
    G rows per batch."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for did, lang, t in zip(
            b["doc_id"].to_pylist(), b["lang"].to_pylist(),
            b["text"].to_pylist(),
        ):
            lang = lang if lang is not None else ""
            h = _md5_low64(f"{did}:{t if t is not None else ''}") & MASK
            s = acc.setdefault(lang, [0, 0])
            s[0] += 1
            s[1] ^= h
        langs = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n": pa.array([acc[g][0] for g in langs], pa.int64()),
                "chk": pa.array([acc[g][1] for g in langs], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang"):
            chk = 0
            for v in g["chk"]:
                chk ^= int(v)
            rows.append((lang, int(g["n"].sum()), chk))
        return pd.DataFrame(
            {
                "lang": pd.array([r[0] for r in rows], dtype="object"),
                "n": pd.array([r[1] for r in rows], dtype="int64"),
                "chk": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q166_rrf_fusion(sf_dir: str):
    """HYBRID RETRIEVAL with Reciprocal-Rank Fusion — the modern
    dense+sparse retrieval stack end to end: for every query doc (id ≡ 0
    mod 10), (a) a DENSE ranking — cosine top-5 against the broadcast
    query matrix (`ray.put` once, numpy matmul per batch, per-batch
    local top-5 → tiny per-query final; the q15 float-order discipline),
    (b) a SPARSE ranking — rare-bigram inverted-index dot scores (the
    q152 postings shape restricted to query→candidate pairs, integer
    scores), and (c) RRF fusion: score = Σ 1/(60+r) over the lists the
    candidate appears in — at most TWO terms added in a fixed order, so
    the float comparison is engine-identical — with the final top-3 per
    query by (rrf DESC, cand). Output is all-integer (ranks; 0 = absent
    from that list), so the driver hash is float-free."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    TOPK, OUT_K, K_RRF = 5, 3, 60

    # query matrix: the query SET is an input (bounded by definition) —
    # read once on the driver, broadcast via ray.put
    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    # ---- dense top-5 per query ----
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def dense_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, Qn_b = _ray.get(qref)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Qn_b.T  # (n_cand × n_query)
        out_q, out_c, out_s = [], [], []
        for j, qid in enumerate(ids_np):
            col = sims[:, j]
            ok = cids != qid
            order = np.lexsort((cids[ok], -col[ok]))[:TOPK]
            sel_c = cids[ok][order]
            sel_s = col[ok][order]
            out_q.extend([int(qid)] * len(sel_c))
            out_c.extend(sel_c.tolist())
            out_s.extend(sel_s.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def dense_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["sim", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(TOPK)
            for r, cid in enumerate(g["cand_id"], 1):
                out.append((qid, int(cid), r))
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "rd": pd.array([o[2] for o in out], dtype="int64"),
            }
        )

    d5 = coarse_group_reduce(
        ds.map_batches(dense_partial, batch_format="pyarrow"),
        "query_id",
        dense_final,
    )

    # ---- sparse top-5 per query (q152 postings, query→cand pairs) ----
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bigrams = make_ngram_items(2)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_t, out_d, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for term, tfv in Counter(bigrams(t or "")).items():
                out_t.append(term)
                out_d.append(did)
                out_f.append(tfv)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def qc_partials(df: pd.DataFrame) -> pd.DataFrame:
        out_q, out_c, out_w = [], [], []
        for _, g in df.groupby("term", sort=False):
            if not (2 <= len(g) <= 20):  # global df in-group
                continue
            ids = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            qm = ids % 10 == 0
            for qi in np.flatnonzero(qm):
                for ci in range(len(ids)):
                    if ids[ci] == ids[qi]:
                        continue
                    out_q.append(int(ids[qi]))
                    out_c.append(int(ids[ci]))
                    out_w.append(int(tfs[qi]) * int(tfs[ci]))
        return pd.DataFrame(
            {
                "query_id": pd.array(out_q, dtype="int64"),
                "cand_id": pd.array(out_c, dtype="int64"),
                "score": pd.array(out_w, dtype="int64"),
            }
        )

    spairs = coarse_group_reduce(
        docs.map_batches(postings, batch_format="pyarrow"),
        "term",
        qc_partials,
    )

    def sum_scores(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["query_id", "cand_id"], as_index=False
        )["score"].sum()
        return out.astype("int64")

    s_scores = coarse_group_reduce(
        spairs, ["query_id", "cand_id"], sum_scores
    )

    def sparse_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["score", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(TOPK)
            for r, cid in enumerate(g["cand_id"], 1):
                out.append((qid, int(cid), r))
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "rs": pd.array([o[2] for o in out], dtype="int64"),
            }
        )

    s5 = coarse_group_reduce(s_scores, "query_id", sparse_final)

    # ---- fusion: full outer on (query, cand), RRF, top-3 per query ----
    def keyed(cols_keep):
        def fn(b: pa.Table) -> pa.Table:
            ks = [
                f"{q}:{c}" for q, c in zip(
                    b["query_id"].to_pylist(), b["cand_id"].to_pylist()
                )
            ]
            out = {"k": pa.array(ks, pa.string())}
            for name, src in cols_keep.items():
                out[name] = pc.cast(b[src], pa.int64())
            return pa.table(out)

        return fn

    d_k = d5.map_batches(
        keyed({"query_id": "query_id", "cand_id": "cand_id", "rd": "rd"}),
        batch_format="pyarrow",
    )
    s_k = s5.map_batches(
        keyed({"qid_s": "query_id", "cid_s": "cand_id", "rs": "rs"}),
        batch_format="pyarrow",
    )
    fused = bucketed_hash_join(
        d_k, s_k, key="k",
        left_columns=["query_id", "cand_id", "rd"],
        right_columns=["qid_s", "cid_s", "rs"],
        join_type="full outer",
    )

    def rrf(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        qid = df["query_id"].fillna(df["qid_s"]).astype("int64")
        cid = df["cand_id"].fillna(df["cid_s"]).astype("int64")
        rd = df["rd"].fillna(0).astype("int64")
        rs = df["rs"].fillna(0).astype("int64")
        score = np.where(
            rd.to_numpy() > 0, 1.0 / (K_RRF + rd.to_numpy()), 0.0
        ) + np.where(
            rs.to_numpy() > 0, 1.0 / (K_RRF + rs.to_numpy()), 0.0
        )
        return pa.table(
            {
                "query_id": pa.array(qid.to_numpy(), pa.int64()),
                "cand_id": pa.array(cid.to_numpy(), pa.int64()),
                "r_dense": pa.array(rd.to_numpy(), pa.int64()),
                "r_sparse": pa.array(rs.to_numpy(), pa.int64()),
                "rrf": pa.array(score, pa.float64()),
            }
        )

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["rrf", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(OUT_K)
            for r, row in enumerate(g.itertuples(index=False), 1):
                out.append(
                    (qid, row.cand_id, r, row.r_dense, row.r_sparse)
                )
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "fused_rank": pd.array(
                    [o[2] for o in out], dtype="int64"
                ),
                "r_dense": pd.array([o[3] for o in out], dtype="int64"),
                "r_sparse": pd.array([o[4] for o in out], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        fused.map_batches(rrf, batch_format="pyarrow"), "query_id", top3
    )


def q167_margin_mining(sf_dir: str):
    """MARGIN-based neighbor mining — the CCMatrix/LASER bitext-mining
    criterion (Artetxe & Schwenk 2019) re-expressed for Ray Data: for
    every source vector (label = 0) and each of its cosine top-4
    candidates among the rest of the corpus, score
    margin = cos(a,b) / ((avgk(a) + avgk(b)) / 2) where avgk(·) is the
    mean of the vector's top-4 cosines against the OTHER side — the
    ratio-margin that suppresses hub vectors a raw-cosine cut cannot.
    Shapes: the source side is the bounded query set (read once,
    `ray.put` broadcast); ONE matmul pass over candidate batches yields
    both directions — per-candidate avgk(b) is EXACT locally (the whole
    source matrix is visible in every batch) while per-source top-4
    rows reduce through coarse groups; the tiny candidate relation then
    meets the per-candidate averages in a bucketed hash join (at corpus
    scale the b-avg relation is fact-sized — it never touches the
    driver). All sums over the 4 top values run in descending order on
    the Ray side; round-6 absorbs the unordered-avg ulp on the SQL side
    (q15/q166 float discipline)."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 4

    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    qsel = qtab.filter(pc.equal(qtab["label"], 0))
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    ds = _read(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    )

    def _cand_sims(b: pa.Table):
        """(cand_ids, sims cand×src, src_ids) for the label≠0 rows."""
        import ray as _ray

        ids_np, Qn_b = _ray.get(qref)
        keep = pc.not_equal(b["label"], 0)
        b = b.filter(keep)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        if len(cids) == 0:
            return cids, np.zeros((0, len(ids_np))), ids_np
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return cids, Vn @ Qn_b.T, ids_np

    def _desc_mean(v: np.ndarray) -> float:
        """Sum in descending order (deterministic), then /len."""
        acc = 0.0
        for x in sorted(v.tolist(), reverse=True):
            acc += x
        return acc / len(v)

    # per-candidate avgk(b): exact within one batch (full source side
    # is present), one row per candidate — no reduce needed
    def b_avg(b: pa.Table) -> pa.Table:
        cids, sims, _ = _cand_sims(b)
        out_ab = [
            _desc_mean(np.sort(row)[-K:]) for row in sims
        ]
        return pa.table(
            {
                "cand_id": pa.array(cids, pa.int64()),
                "ab": pa.array(out_ab, pa.float64()),
            }
        )

    bavg = ds.map_batches(b_avg, batch_format="pyarrow")

    # per-source batch-local top-4 → coarse-group final top-4 + avgk(a)
    def a_partial(b: pa.Table) -> pa.Table:
        cids, sims, ids_np = _cand_sims(b)
        out_a, out_c, out_s = [], [], []
        for j, aid in enumerate(ids_np):
            col = sims[:, j] if len(cids) else np.zeros(0)
            order = np.lexsort((cids, -col))[:K]
            out_a.extend([int(aid)] * len(order))
            out_c.extend(cids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "src_id": pa.array(out_a, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
            }
        )

    def a_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for aid, g in df.groupby("src_id"):
            g = g.sort_values(
                ["s", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(K)
            aa = _desc_mean(g["s"].to_numpy())
            for row in g.itertuples(index=False):
                out.append((aid, row.cand_id, row.s, aa))
        return pd.DataFrame(
            {
                "src_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "s": pd.array([o[2] for o in out], dtype="float64"),
                "aa": pd.array([o[3] for o in out], dtype="float64"),
            }
        )

    cands = coarse_group_reduce(
        ds.map_batches(a_partial, batch_format="pyarrow"),
        "src_id",
        a_final,
    )

    joined = bucketed_hash_join(
        cands, bavg, key="cand_id",
        left_columns=["src_id", "s", "aa"], right_columns=["ab"],
    )

    def margin(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        aa = b["aa"].to_numpy(zero_copy_only=False)
        ab = b["ab"].to_numpy(zero_copy_only=False)
        m = [
            _round_half_up(float(v), 6)
            for v in s / ((aa + ab) / 2.0)
        ]
        return pa.table(
            {
                "src_id": b["src_id"],
                "cand_id": b["cand_id"],
                "margin": pa.array(m, pa.float64()),
            }
        )

    return joined.map_batches(margin, batch_format="pyarrow")


def q168_zorder_cells(sf_dir: str):
    """Z-ORDER (Morton) clustering keys — the multi-dimensional layout
    key behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits
    of two dimensions (user bucket × hour bucket, 8 bits each) gives a
    1-D sort key under which rows close in BOTH dimensions land in the
    same file, so min/max zone maps prune 2-D predicates. The query
    computes the 16-bit Morton code per event VECTORIZED (numpy shifts,
    no Python loop over rows), rolls up per 64-code z-cell (count +
    min/max code — exactly the zone-map a writer would persist), with
    per-batch partial aggregation so the shuffle carries ≤1024 rows per
    batch. All-integer output."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch_us = (
            df["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        )
        x = (df["user_id"].astype("int64") % 256).to_numpy()
        y = ((epoch_us // 3_600_000_000) % 256).to_numpy()
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        g = pd.DataFrame({"zcell": z // 64, "zv": z}).groupby(
            "zcell", as_index=False
        ).agg(
            n_rows=("zv", "size"),
            z_min=("zv", "min"),
            z_max=("zv", "max"),
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("zcell")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Min("z_min", alias_name="z_min"),
            Max("z_max", alias_name="z_max"),
        )
    )
    df = agg.to_pandas()
    for c in ("zcell", "n_rows", "z_min", "z_max"):
        df[c] = df[c].astype("int64")
    return df


def q169_shingle_containment(sf_dir: str):
    """Asymmetric CONTAINMENT near-dup (Broder 1997): ordered doc pairs
    where ≥ 50% of the source doc's distinct word 5-gram shingles also
    appear in the superset doc — the quote/subset relation symmetric
    Jaccard (q22) misses. Kernel in `stages/dedup.py:shingle_containment`
    (distinct-shingle exchange → exact ordered pair counts → per-source
    shingle counts → one bucketed join; text never rides a shuffle)."""
    from basicocr_ray.stages.dedup import shingle_containment

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return shingle_containment(
        ds, id_column="doc_id", text_column="text", width=5,
        threshold=0.5,
    )


def q170_interval_coverage(sf_dir: str):
    """INTERVAL-UNION coverage per user — the classic sweep-line merge
    (ad/session exposure accounting, GTFS service spans): each event
    opens an interval [ts, ts + dur) with dur = (event_id % 3600) + 60
    seconds (deterministic per row so both engines build identical
    intervals); overlapping intervals merge into islands; output per
    user the island count and the total covered microseconds (exact
    BIGINT — timestamp math never touches floats). Shape: rows shuffle
    ONCE into coarse groups of the user hash; inside a group the merge
    is one vectorized pandas pass (sort → per-user running cummax of
    interval ends → island ids by cumsum — q18's no-per-key-Python-call
    discipline), so a user's intervals never centralize beyond their
    coarse group."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        s = g["ts"].astype("datetime64[us]").astype("int64")
        e = s + ((g["event_id"] % 3600) + 60) * 1_000_000
        prev_max = (
            e.groupby(g["user_id"]).cummax().groupby(g["user_id"]).shift(1)
        )
        new_island = prev_max.isna() | (s > prev_max)
        island = new_island.cumsum()
        isl = pd.DataFrame(
            {"user_id": g["user_id"], "island": island, "s": s, "e": e}
        ).groupby(["user_id", "island"], as_index=False).agg(
            s0=("s", "min"), e1=("e", "max")
        )
        out = isl.assign(cov=isl["e1"] - isl["s0"]).groupby(
            "user_id", as_index=False
        ).agg(n_islands=("cov", "size"), covered_us=("cov", "sum"))
        return out.astype(
            {"user_id": "int64", "n_islands": "int64", "covered_us": "int64"}
        )

    return coarse_group_reduce(ds, "user_id", coverage)


def q171_edit2_fuzzy_pairs(sf_dir: str):
    """Edit-distance-≤2 fuzzy vocabulary self-join — q68's FastSS
    deletion-neighborhood join generalized to depth 2 (`stages.simjoin.
    editk_vocab_join`): every pair of distinct corpus tokens with exact
    Levenshtein distance 1 or 2, with the distance in the output. The
    vocab is length-bounded (4..16 chars) on BOTH sides — the variant
    explode is O(L²) per token at depth 2, so the bound is the
    scale-safety contract, mirrored in the oracle's WHERE."""
    from basicocr_ray.stages.simjoin import editk_vocab_join

    ds = _read(sf_dir, "documents", columns=["text"])

    def local_vocab(b: pa.Table) -> pa.Table:
        s: set = set()
        for t in b["text"].to_pylist():
            if t:
                s.update(
                    w for w in token_items(t) if 4 <= len(w) <= 16
                )
        return pa.table({"token": pa.array(sorted(s), pa.string())})

    vocab = ds.map_batches(local_vocab, batch_format="pyarrow")
    return editk_vocab_join(vocab, max_d=2)


def q172_decay_leaderboard(sf_dir: str):
    """Trending-users leaderboard with EXPONENTIAL TIME DECAY — the feed
    -ranking primitive — made hash-exact by dyadic weights: each event
    contributes 2^(48 − min(age_hours, 48)) where age is whole hours
    behind the corpus max timestamp, so every weight is an INTEGER
    (1 … 2⁴⁸) and the per-user score is an exact BIGINT sum no float
    accumulation order can perturb. Two passes: a tiny scalar max(ts)
    (driver-held scalar, the q28 shape), then per-batch partial (user,
    n, score) sums → coarse user-hash reduce → per-batch local top-20 →
    tiny global sort; rows never shuffle, only per-user partials."""
    from basicocr_ray.stages.wide import coarse_group_reduce, top_k

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    max_ts = ds.max("ts")
    max_us = int(
        np.datetime64(pd.Timestamp(max_ts), "us").astype("int64")
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        age_h = (max_us - ts_us) // 3_600_000_000
        w = np.int64(1) << (48 - np.minimum(age_h, 48))
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(zero_copy_only=False), "w": w}
        )
        out = df.groupby("user_id", as_index=False).agg(
            n_events=("w", "size"), score=("w", "sum")
        )
        return pa.Table.from_pandas(
            out.astype(
                {"user_id": "int64", "n_events": "int64", "score": "int64"}
            ),
            preserve_index=False,
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"), score=("score", "sum")
        )
        return out.astype(
            {"user_id": "int64", "n_events": "int64", "score": "int64"}
        )

    per_user = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", final
    )
    return top_k(per_user, 20, "score", "user_id")


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


def q174_grouped_covariance(sf_dir: str):
    """GROUPED FEATURE COVARIANCE over the embedding table (the PCA /
    whitening / Mahalanobis prep step every embedding pipeline runs) —
    made hash-exact by integer quantization: x_i := floor(1e6 · dim_i)
    is an exact BIGINT in both engines (float32 → float64 is exact, one
    double multiply + floor round identically), and the per-label
    moment sums n, Σx_i, Σx_i·x_j (i ≤ j ≤ 3) are exact int64 — the
    covariance matrix is a driver-side O(k·d²) epilogue the evidence
    fully determines. Shape: ONE numpy pass per batch builds per-label
    partial moment rows (Q^T Q per label — the k-means/covariance
    canonical partial), a coarse label-hash reduce sums them; embedding
    vectors never ride a shuffle."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    D = 4
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])
    pair_idx = [(i, j) for i in range(D) for j in range(i, D)]

    def partial(b: pa.Table) -> pa.Table:
        labels = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        V = np.asarray(
            [e[:D] for e in b["embedding"].to_pylist()], dtype=np.float64
        )
        Q = np.floor(V * 1e6).astype(np.int64)
        rows: list[list[int]] = []
        for lb in np.unique(labels):
            m = labels == lb
            Qm = Q[m]
            C = Qm.T @ Qm
            row = [int(lb), int(m.sum())]
            row += [int(s) for s in Qm.sum(axis=0)]
            row += [int(C[i, j]) for i, j in pair_idx]
            rows.append(row)
        names = (
            ["label", "n"]
            + [f"s{i}" for i in range(D)]
            + [f"c{i}{j}" for i, j in pair_idx]
        )
        return pa.table(
            {
                nm: pa.array([r[k] for r in rows], pa.int64())
                for k, nm in enumerate(names)
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", as_index=False).sum()
        return out.astype({c: "int64" for c in out.columns})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "label", final
    )


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


def q176_phrase_positions(sf_dir: str):
    """POSITIONAL PHRASE SEARCH — the positional-postings operation a
    token-level inverted index (q118) can't answer: find every
    (doc_id, token_position) occurrence of the corpus's most frequent
    word trigram (ties: trigram asc). Two scans: (1) the distributed
    trigram count (count_terms partials) pruned to a global top-1 — a
    bounded driver scalar, the phrase IS the query; (2) a per-batch
    vectorized position scan (numpy equality over three shifted token
    arrays — no per-row phrase matching in Python). Output positions
    are 0-based."""
    from basicocr_ray.stages.wide import count_terms, make_ngram_items, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tri = count_terms(ds, "text", make_ngram_items(3), "tri")
    top = top_k(tri, 1, "cnt", "tri").take(1)
    phrase = top[0]["tri"]
    w0, w1, w2 = phrase.split(" ")

    def positions(b: pa.Table) -> pa.Table:
        out_d, out_p = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if not t:
                continue
            toks = np.asarray(t.lower().split(), dtype=object)
            if len(toks) < 3:
                continue
            hit = (
                (toks[:-2] == w0) & (toks[1:-1] == w1) & (toks[2:] == w2)
            )
            for p in np.flatnonzero(hit):
                out_d.append(did)
                out_p.append(int(p))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "phrase": pa.array([phrase] * len(out_d), pa.string()),
            }
        )

    return ds.map_batches(positions, batch_format="pyarrow")


def q177_locf_gapfill(sf_dir: str):
    """HOURLY GAP-FILL with last-observation-carried-forward — the
    time-series regularization every metrics store runs: per user, one
    row per hour from the first to the last observed hour; missing
    hours inherit the most recent value (LOCF). Per (user, hour) the
    observation is the LAST event by (ts, event_id). The whole fill is
    vectorized inside coarse user-hash groups: the per-user grid is
    built by np.repeat/arange from the span table (no per-user Python
    loop) and filled by ONE pd.merge_asof — memory rides with a
    group's hour span, never the corpus. `filled` marks interpolated
    rows. Values are CARRIED floats (never recomputed), so the driver
    hash is float-safe."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    HOUR_US = 3_600_000_000
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        g = g.assign(h_us=ts_us - ts_us % HOUR_US)
        # last observation per (user, hour)
        obs = g.groupby(["user_id", "h_us"], as_index=False).tail(1)[
            ["user_id", "h_us", "value"]
        ]
        span = obs.groupby("user_id", as_index=False).agg(
            h0=("h_us", "min"), h1=("h_us", "max")
        )
        n_h = ((span["h1"] - span["h0"]) // HOUR_US + 1).to_numpy()
        grid_user = np.repeat(span["user_id"].to_numpy(), n_h)
        starts = np.repeat(span["h0"].to_numpy(), n_h)
        seg_off = np.arange(n_h.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(n_h)[:-1])), n_h
        )
        grid = pd.DataFrame(
            {"user_id": grid_user, "h_us": starts + seg_off * HOUR_US}
        )
        obs = obs.sort_values(["h_us", "user_id"], kind="mergesort")
        grid = grid.sort_values(["h_us", "user_id"], kind="mergesort")
        filled = pd.merge_asof(
            grid, obs, on="h_us", by="user_id", direction="backward"
        )
        exact = grid.merge(
            obs[["user_id", "h_us"]], on=["user_id", "h_us"],
            how="left", indicator=True,
        )["_merge"].eq("left_only")
        out = pd.DataFrame(
            {
                "user_id": filled["user_id"].astype("int64"),
                "h": pd.to_datetime(filled["h_us"], unit="us"),
                "value": filled["value"].astype("float64"),
                "filled": exact.to_numpy().astype("int64"),
            }
        )
        return out.sort_values(
            ["user_id", "h"], kind="mergesort"
        ).reset_index(drop=True)

    return coarse_group_reduce(ds, "user_id", fill)


def q178_anchor_text_index(sf_dir: str):
    """ANCHOR-TEXT aggregation per target host — the web-graph signal
    (anchors describe the TARGET page) behind classic ranking and
    anchor-corpus pretraining sets: documents are wrapped into their
    real boilerplate HTML (the q147 fixture path) with two
    deterministic outlinks whose anchor TEXT is the doc's first two
    tokens; a compiled-regex kernel extracts (href, anchor_text) pairs
    from the markup, anchors tokenize, and per (dst_host, token)
    counts roll up to the top-3 anchor tokens per host (count desc,
    token asc). The oracle rebuilds anchors analytically from the same
    doc_id arithmetic + token slice (the q147 analytic-contract
    discipline), so the HTML round-trip is hash-checked."""
    import re

    from basicocr_ray.stages.wide import coarse_group_reduce
    from basicocr_ray.sources.docpages import wrap_single

    A_TAG = re.compile(rb'<a href="(https?://[^"]+)">([^<]*)</a>')

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def anchors_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        from urllib.parse import urlsplit

        cnt: Counter = Counter()
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = (t or "").lower().split()[:2]
            if not toks:
                continue
            anchor = " ".join(toks)
            page = wrap_single(t or "", i)
            links = (
                f'<p><a href="http://site{(3 * i + 1) % 7}.example.com'
                f'/p/{i % 100}">{anchor}</a> '
                f'<a href="https://site{(5 * i + 2) % 7}.example.com'
                f'/q/{i % 50}">{anchor}</a></p>'
            ).encode()
            page = page.replace(b"</article>", links + b"</article>")
            for m in A_TAG.finditer(page):
                host = urlsplit(m.group(1).decode()).hostname or ""
                for tok in m.group(2).decode().split():
                    cnt[(host.split(".")[0], tok)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "dst_host": pa.array([k[0] for k in keys], pa.string()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "cnt": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["dst_host", "token"], as_index=False)["cnt"].sum()
        agg = agg.sort_values(
            ["dst_host", "cnt", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        out = agg.groupby("dst_host").head(3)
        return out.astype({"cnt": "int64"}).reset_index(drop=True)

    return coarse_group_reduce(
        ds.map_batches(anchors_partial, batch_format="pyarrow"),
        "dst_host",
        final,
    )


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


def q180_compaction_plan(sf_dir: str):
    """SMALL-FILE COMPACTION PLANNER (the Iceberg/Delta OPTIMIZE file-
    grouping step): parts are 16-doc id ranges per language with bytes
    = Σ n_chars; within each language, parts in id order are packed by
    the streaming NEXT-FIT rule bin = exclusive-prefix-bytes //
    65536 — one window expression, deterministic, and the rule a
    single pass over a sorted manifest can execute at any scale (FFD
    would need sequential bin state). Output one row per (lang, bin):
    part count, total bytes, covered part range. Shape: per-batch
    (lang, part) partials → exact coarse reduce on the composite key →
    the parts MANIFEST (metadata-sized, corpus/16 rows) re-groups by
    lang for the vectorized cumsum plan."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    TARGET = 65536
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "part": np.asarray(
                    b["doc_id"].to_pylist(), dtype=np.int64
                ) // 16,
                "bytes": np.asarray(
                    b["n_chars"].to_pylist(), dtype=np.int64
                ),
            }
        )
        out = df.groupby(["lang", "part"], as_index=False).agg(
            bytes=("bytes", "sum"), files=("bytes", "size")
        )
        return pa.Table.from_pandas(
            out.astype({"part": "int64", "bytes": "int64", "files": "int64"}),
            preserve_index=False,
        )

    def merge_parts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "part"], as_index=False).agg(
            bytes=("bytes", "sum"), files=("files", "sum")
        )
        return out.astype({"part": "int64", "bytes": "int64", "files": "int64"})

    parts = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "part"],
        merge_parts,
    )

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["lang", "part"], kind="mergesort").reset_index(
            drop=True
        )
        csum = g.groupby("lang")["bytes"].cumsum() - g["bytes"]
        g = g.assign(bin=(csum // TARGET).astype("int64"))
        out = g.groupby(["lang", "bin"], as_index=False).agg(
            n_parts=("part", "size"),
            tot_bytes=("bytes", "sum"),
            part_lo=("part", "min"),
            part_hi=("part", "max"),
        )
        return out.astype(
            {
                "bin": "int64", "n_parts": "int64", "tot_bytes": "int64",
                "part_lo": "int64", "part_hi": "int64",
            }
        )

    return coarse_group_reduce(parts, "lang", plan)


def q181_skipgram_pairs(sf_dir: str):
    """SKIP-GRAM window co-occurrence counts (the word2vec/GloVe corpus
    statistic; q95's adjacent bigrams are its w=1 slice): unordered
    token pairs within window distance ≤ 3, pair key = 'min max' under
    binary collation (Python str and DuckDB VARCHAR compare identically
    on codepoints), global top-100 by (count desc, pair asc). The pair
    explode is 3 shifted-array zips per batch feeding the house
    count_terms partial+final reduce — open-vocabulary safe, rows never
    shuffle."""
    from basicocr_ray.stages.wide import count_terms, top_k

    W = 3

    def skipgram_items(text: str) -> list:
        toks = text.lower().split()
        out = []
        for d in range(1, W + 1):
            for a, b in zip(toks[:-d], toks[d:]):
                out.append(a + " " + b if a <= b else b + " " + a)
        return out

    ds = _read(sf_dir, "documents", columns=["text"])
    pairs = count_terms(ds, "text", skipgram_items, "pair")
    return top_k(pairs, 100, "cnt", "pair")


def q182_quant_recall(sf_dir: str):
    """SCALAR-QUANTIZATION RECALL AUDIT — the evaluation every vector
    store runs before shipping int8 embeddings: per query (vec_id ≡ 0
    mod 10), the top-10 by exact float cosine (the q15/q166 float-order
    discipline) vs the top-10 by QUANTIZED integer dot (q = floor(1e3·x)
    per dim — exact int64 both engines; dots ≤ 64·(10³)² ≪ 2⁵³ so even
    a double-valued SQL dot is the exact integer), and n_hits = overlap
    of the two sets. Output (query_id, n_hits) is all-integer. ONE
    matmul pass per batch computes BOTH scores; per-batch local top-10s
    → tiny per-query finals; vectors never ride a shuffle."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    TOPK = 10
    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Qq = np.floor(Q * 1e3).astype(np.int64)
    qref = ray.put((qids, Qn, Qq))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, Qn_b, Qq_b = _ray.get(qref)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Vq = np.floor(V * 1e3).astype(np.int64)
        sims = Vn @ Qn_b.T           # float cosine
        dots = Vq @ Qq_b.T           # exact integer quantized dot
        out_q, e_cand, e_sim, q_cand, q_dot = [], [], [], [], []
        for j, qid in enumerate(ids_np):
            ok = cids != qid
            eo = np.lexsort((cids[ok], -sims[ok, j]))[:TOPK]
            qo = np.lexsort((cids[ok], -dots[ok, j]))[:TOPK]
            k = max(len(eo), len(qo))
            for i in range(k):
                out_q.append(int(qid))
                e_cand.append(int(cids[ok][eo[i]]) if i < len(eo) else -1)
                e_sim.append(float(sims[ok, j][eo[i]]) if i < len(eo)
                             else 0.0)
                q_cand.append(int(cids[ok][qo[i]]) if i < len(qo) else -1)
                q_dot.append(int(dots[ok, j][qo[i]]) if i < len(qo) else 0)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "e_cand": pa.array(e_cand, pa.int64()),
                "e_sim": pa.array(e_sim, pa.float64()),
                "q_cand": pa.array(q_cand, pa.int64()),
                "q_dot": pa.array(q_dot, pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("query_id"):
            ge = g[g["e_cand"] >= 0].sort_values(
                ["e_sim", "e_cand"], ascending=[False, True],
                kind="mergesort",
            ).drop_duplicates("e_cand").head(TOPK)
            gq = g[g["q_cand"] >= 0].sort_values(
                ["q_dot", "q_cand"], ascending=[False, True],
                kind="mergesort",
            ).drop_duplicates("q_cand").head(TOPK)
            hits = len(set(ge["e_cand"]) & set(gq["q_cand"]))
            rows.append((int(qid), hits))
        return pd.DataFrame(
            {
                "query_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_hits": pd.array([r[1] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "query_id", final
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


def q184_calibration_bins(sf_dir: str):
    """CLASSIFIER CALIBRATION BINS — the reliability-diagram evidence
    (per-bin n, positives, score mass) behind ECE, over the q129
    hashed-linear quality scores with lang = 'en' as the deterministic
    reference label: scores clamp to [-1024, 1023] and shift NONNEGATIVE
    before the width-16 binning because DuckDB's ``//`` truncates toward
    zero while Python floors — on a nonnegative dividend they agree (the
    q180 discipline). All-integer output: (bin, n, n_pos, sum_score)."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            s = hashed_linear_score(token_items(t) if t else [], weights)
            sc = min(max(s, -1024), 1023)
            bin_id = (sc + 1024) // 16
            a = acc.setdefault(bin_id, [0, 0, 0])
            a[0] += 1
            a[1] += 1 if lang == "en" else 0
            a[2] += s
        ks = sorted(acc)
        return pa.table(
            {
                "bin": pa.array(ks, pa.int64()),
                "n": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_pos": pa.array([acc[k][1] for k in ks], pa.int64()),
                "sum_score": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bin", as_index=False).sum()
        return out.astype({c: "int64" for c in out.columns})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "bin", final
    )


def q185_range_splits(sf_dir: str):
    """WEIGHTED RANGE-PARTITION PLANNING — the boundary computation
    behind every balanced sort/repartition: split the id-ordered corpus
    into 8 ranges of ~equal n_chars WEIGHT (not row count). Rule: a row
    belongs to part = exclusive-prefix-weight // ceil(W/8) — contiguous
    by construction, deterministic, one window expression. Distributed
    shape (the `grouped_prefix_sum` discipline specialized to the id
    order): per-id-range-bucket (doc_id // 64 — a MONOTONE function of
    the order key, the range-partitioner assumption) weight totals are
    a metadata relation; the driver folds them into exclusive bucket
    offsets + the global W; each bucket task then assigns parts with a
    local cumsum and emits per-part partials; a bounded reduce merges.
    Output per part: n_docs, tot_weight, covered id range."""
    from basicocr_ray.core.collect import collect_rows
    from basicocr_ray.stages.wide import coarse_group_reduce

    S = 8
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def add_rb(b: pa.Table) -> pa.Table:
        rb = pc.cast(
            pc.divide(pc.cast(b["doc_id"], pa.int64()), 64), pa.int64()
        )
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "wt": pc.cast(b["n_chars"], pa.int64()),
                "rb": rb,
            }
        )

    body = ds.map_batches(add_rb, batch_format="pyarrow").materialize()

    def bucket_totals(b: pa.Table) -> pa.Table:
        t = b.group_by("rb").aggregate([("wt", "sum")])
        return t.rename_columns(["rb", "v"])

    totals: dict[int, int] = {}
    for row in collect_rows(
        body.map_batches(bucket_totals, batch_format="pyarrow")
    ):  # metadata: ≤ blocks × #buckets rows
        totals[int(row["rb"])] = totals.get(int(row["rb"]), 0) + int(row["v"])
    W = sum(totals.values())
    target = (W + S - 1) // S
    offsets: dict[int, int] = {}
    acc = 0
    for rb in sorted(totals):
        offsets[rb] = acc
        acc += totals[rb]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        w = df["wt"].to_numpy(dtype=np.int64)
        pre = offsets[int(df["rb"].iloc[0])] + np.cumsum(w) - w
        df = df.assign(part=(pre // target).astype("int64"))
        out = df.groupby("part", as_index=False).agg(
            n_docs=("doc_id", "size"),
            tot_weight=("wt", "sum"),
            id_lo=("doc_id", "min"),
            id_hi=("doc_id", "max"),
        )
        return out.astype({c: "int64" for c in out.columns})

    partials = body.groupby("rb").map_groups(assign, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("part", as_index=False).agg(
            n_docs=("n_docs", "sum"),
            tot_weight=("tot_weight", "sum"),
            id_lo=("id_lo", "min"),
            id_hi=("id_hi", "max"),
        )
        return out.astype({c: "int64" for c in out.columns})

    return coarse_group_reduce(partials, "part", merge)


def q186_classifier_agreement(sf_dir: str):
    """TWO-CLASSIFIER AGREEMENT (the inter-rater / model-upgrade audit
    that precedes any classifier swap — the integer evidence behind
    Cohen's κ): classifier A = the q129 hashed-linear scorer (weight
    seed 'w:'), classifier B = the same architecture with independent
    weights (seed 'v:'); per language, the full confusion matrix of
    keep verdicts (n00, n01, n10, n11). ONE pass scores both models
    (the weight tables broadcast in the closure); partials carry four
    counters per (batch, lang)."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    w_a = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]
    w_b = [_md5_low64(f"v:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            toks = token_items(t) if t else []
            ka = 1 if hashed_linear_score(toks, w_a) > 0 else 0
            kb = 1 if hashed_linear_score(toks, w_b) > 0 else 0
            lang = lang if lang is not None else ""
            a = acc.setdefault(lang, [0, 0, 0, 0])
            a[2 * ka + kb] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n00": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n01": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n10": pa.array([acc[k][2] for k in ks], pa.int64()),
                "n11": pa.array([acc[k][3] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        for c in ("n00", "n01", "n10", "n11"):
            out[c] = out[c].astype("int64")
        return out

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q187_auc_evidence(sf_dir: str):
    """AUC AS A RANK-SUM STATISTIC with exact integer evidence — the
    Mann-Whitney U identity ties AUC to pure counting, so the driver
    hash needs no float: with label = (lang = 'en') and the q129
    integer scores, 2U = Σ_s [2·n_pos(s)·(negatives strictly below s)
    + n_pos(s)·n_neg(s)] (the n_pos·n_neg term is the tie ½-credit,
    doubled to stay integer); AUC = u2 / (2·n_pos·n_neg) is a derived
    epilogue. Shape: per-batch (score, n_pos, n_neg) partials → exact
    coarse reduce on the score VALUE (the distinct-score relation is
    bounded by the score range, not the corpus) → one ordered scan of
    that metadata relation."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            s = hashed_linear_score(token_items(t) if t else [], weights)
            a = acc.setdefault(s, [0, 0])
            if lang == "en":
                a[0] += 1
            else:
                a[1] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "score": pa.array(ks, pa.int64()),
                "np_": pa.array([acc[k][0] for k in ks], pa.int64()),
                "nn_": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("score", as_index=False).sum()
        return out.astype({"score": "int64", "np_": "int64", "nn_": "int64"})

    per_score = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "score", merge
    )

    def u_stat(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("score", kind="mergesort").reset_index(drop=True)
        npos = g["np_"].to_numpy(dtype=np.int64)
        nneg = g["nn_"].to_numpy(dtype=np.int64)
        cneg = np.cumsum(nneg) - nneg  # negatives strictly below
        u2 = int((2 * npos * cneg + npos * nneg).sum())
        return pd.DataFrame(
            {
                "n_pos": pd.array([int(npos.sum())], dtype="int64"),
                "n_neg": pd.array([int(nneg.sum())], dtype="int64"),
                "u2": pd.array([u2], dtype="int64"),
            }
        )

    # the per-score relation is metadata-sized: one constant-key group
    return (
        per_score.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: u_stat(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q188_longest_streak(sf_dir: str):
    """LONGEST CONSECUTIVE-DAY STREAK per user — the gaps-and-islands
    engagement metric every activity dashboard ships: distinct active
    days per user; a streak is a maximal run of day-distance-1 rows;
    output (user_id, n_active_days, longest_streak). Vectorized inside
    coarse user-hash groups: distinct (user, day) → island id = day −
    per-user rank (constant within a run — the classic identity) → one
    groupby size/max; no per-user Python loop. Day arithmetic is exact
    integer days-since-epoch."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "day": ts_us // DAY_US,
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(
            df.astype({"user_id": "int64", "day": "int64"}),
            preserve_index=False,
        )

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().sort_values(
            ["user_id", "day"], kind="mergesort"
        ).reset_index(drop=True)
        rk = g.groupby("user_id").cumcount()
        g = g.assign(island=g["day"] - rk)
        runs = g.groupby(["user_id", "island"], as_index=False).agg(
            run=("day", "size")
        )
        out = runs.groupby("user_id", as_index=False).agg(
            longest_streak=("run", "max")
        )
        days = g.groupby("user_id", as_index=False).agg(
            n_active_days=("day", "size")
        )
        out = days.merge(out, on="user_id")
        return out.astype(
            {
                "user_id": "int64", "n_active_days": "int64",
                "longest_streak": "int64",
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", streaks
    )


def q189_lang_overlap_matrix(sf_dir: str):
    """CROSS-SPLIT CONTAMINATION MATRIX — exact pairwise overlap of the
    unigram ∪ bigram feature sets between languages (the audit run
    between train/eval splits before training; q75's decontamination is
    its targeted cousin): for every lang pair (a < b), |F_a ∩ F_b| plus
    each side's |F|. Shape: per-batch distinct (feature, lang) rows →
    coarse groups of the FEATURE hash, where each feature's lang set
    emits one row per lang pair (C(k,2) per feature — bounded by the
    lang count, not the corpus) and one per lang for the sizes; a
    bounded pair-keyed Sum finishes. Features never meet except
    through their own hash group — no cross-product of vocabularies."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce, make_ngram_items

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def feat_partial(b: pa.Table) -> pa.Table:
        seen: set = set()
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            if not t or lang is None:
                continue
            toks = token_items(t)
            for f in toks:
                seen.add((f, lang))
            for f in make_ngram_items(2)(t):
                seen.add((f, lang))
        rows = sorted(seen)
        return pa.table(
            {
                "feature": pa.array([r[0] for r in rows], pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_n = [], [], []
        for _, g in df.drop_duplicates().groupby("feature"):
            langs = sorted(set(g["lang"]))
            for la in langs:
                out_a.append(la)
                out_b.append(la)  # diagonal carries |F_lang|
                out_n.append(1)
            for i in range(len(langs)):
                for j in range(i + 1, len(langs)):
                    out_a.append(langs[i])
                    out_b.append(langs[j])
                    out_n.append(1)
        return pd.DataFrame(
            {
                "lang_a": pd.array(out_a, dtype="object"),
                "lang_b": pd.array(out_b, dtype="object"),
                "n": pd.array(out_n, dtype="int64"),
            }
        )

    pairs = coarse_group_reduce(
        ds.map_batches(feat_partial, batch_format="pyarrow"),
        "feature",
        pair_counts,
    )
    out = (
        pairs.groupby(["lang_a", "lang_b"])  # bounded: ≤ L + C(L,2) keys
        .aggregate(Sum("n", alias_name="n_common"))
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "lang_a": b["lang_a"],
                "lang_b": b["lang_b"],
                "n_common": pc.cast(b["n_common"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q190_reshard_churn(sf_dir: str):
    """RESHARDING CHURN AUDIT — why consistent hashing exists, as data:
    growing 16 → 17 shards moves ~15/16 of all keys under naive
    ``hash % n`` but only ~1/17 under a consistent-hash ring (17 nodes
    × 8 vnodes, ring points md5-low-63 of 'node:i:v', a key goes to
    the first ring point ≥ its hash, wrapping to the ring minimum).
    Output one row: n_total, n_moved_mod, n_moved_ring. The ring is
    constant-sized and broadcast in the closure; per-batch assignment
    is one vectorized np.searchsorted; only three counters shuffle."""
    MASK = (1 << 63) - 1

    def ring(nodes: int):
        pts = []
        for i in range(nodes):
            for v in range(8):
                pts.append((_md5_low64(f"node:{i}:{v}") & MASK, i))
        pts.sort()
        return (
            np.asarray([p[0] for p in pts], dtype=np.uint64),
            np.asarray([p[1] for p in pts], dtype=np.int64),
        )

    r16_p, r16_n = ring(16)
    r17_p, r17_n = ring(17)

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        h = np.asarray(
            [
                _md5_low64(str(d)) & MASK
                for d in b["doc_id"].to_pylist()
            ],
            dtype=np.uint64,
        )
        moved_mod = int(((h % 16) != (h % 17)).sum())

        def owner(pts, nodes):
            idx = np.searchsorted(pts, h, side="left")
            idx[idx == len(pts)] = 0  # wrap to the ring minimum
            return nodes[idx]

        moved_ring = int(
            (owner(r16_p, r16_n) != owner(r17_p, r17_n)).sum()
        )
        return pa.table(
            {
                "n_total": pa.array([len(h)], pa.int64()),
                "n_moved_mod": pa.array([moved_mod], pa.int64()),
                "n_moved_ring": pa.array([moved_ring], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_total": pd.array([int(df["n_total"].sum())],
                                    dtype="int64"),
                "n_moved_mod": pd.array(
                    [int(df["n_moved_mod"].sum())], dtype="int64"),
                "n_moved_ring": pd.array(
                    [int(df["n_moved_ring"].sum())], dtype="int64"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


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


def q192_twap_evidence(sf_dir: str):
    """TIME-WEIGHTED AVERAGE evidence (the TWAP/billing integral) with
    exact integers: per user, Σ floor(1000·value)·Δseconds where Δ is
    the whole-second gap to the NEXT event (last event contributes 0) —
    quantized value × integer gap keeps every product and the per-user
    sum inside int64 in both engines. One sort + vectorized shift per
    coarse user group; output (user_id, n_events, span_s, qv_dt)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        ts_us = g["ts"].astype("datetime64[us]").astype("int64")
        nxt = ts_us.groupby(g["user_id"]).shift(-1)
        dt_s = ((nxt - ts_us) // 1_000_000).fillna(0).astype("int64")
        qv = np.floor(g["value"].to_numpy(dtype=np.float64) * 1000).astype(
            np.int64
        )
        g = g.assign(dt_s=dt_s, term=qv * dt_s, ts_us=ts_us)
        out = g.groupby("user_id", as_index=False).agg(
            n_events=("event_id", "size"),
            span_s=("dt_s", "sum"),
            qv_dt=("term", "sum"),
        )
        return out.astype(
            {
                "user_id": "int64", "n_events": "int64",
                "span_s": "int64", "qv_dt": "int64",
            }
        )

    return coarse_group_reduce(ds, "user_id", twap)


def q193_burst_rate(sf_dir: str):
    """PEAK BURST RATE per user — the rate-limiter audit: the maximum
    number of events inside ANY trailing 60-second window, under SQL
    RANGE-frame semantics (a window anchored at each event's timestamp
    includes ALL rows with equal ts — peers — not just earlier ones).
    Vectorized inside coarse user groups: per user, counts =
    searchsorted(ts, ts, 'right') − searchsorted(ts, ts − 60 s,
    'left') — two array passes, no per-event loop."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    WIN_US = 60_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def burst(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["user_id", "ts"], kind="mergesort").reset_index(
            drop=True
        )
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        users = g["user_id"].to_numpy()
        rows = []
        for u in pd.unique(users):
            m = users == u
            t = ts_us[m]
            counts = (
                np.searchsorted(t, t, side="right")
                - np.searchsorted(t, t - WIN_US, side="left")
            )
            rows.append((int(u), len(t), int(counts.max())))
        return pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_events": pd.array([r[1] for r in rows], dtype="int64"),
                "max_burst": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(ds, "user_id", burst)


def q194_benford_audit(sf_dir: str):
    """BENFORD FIRST-DIGIT AUDIT — the fraud/data-quality forensic over
    event values, engine-exact by integer digit extraction: iv =
    floor(100·value) (one double multiply + floor, exact both engines;
    zero values drop), first digit by repeated integer division — NO
    log10, whose last-bit rounding differs across libms exactly at the
    decade boundaries an audit cares about. Output per (event_type,
    digit): count. Partials carry ≤ |types|·9 rows per batch."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pylist()
        v = np.asarray(b["value"].to_pylist(), dtype=np.float64)
        iv = np.floor(v * 100).astype(np.int64)
        acc: dict[tuple, int] = {}
        for t, x in zip(et, iv):
            if x <= 0:
                continue
            while x >= 10:
                x //= 10
            k = (t, int(x))
            acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in ks], pa.string()),
                "digit": pa.array([k[1] for k in ks], pa.int64()),
                "n": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "digit"], as_index=False)["n"].sum()
        return out.astype({"digit": "int64", "n": "int64"})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "digit"],
        final,
    )


def q195_k_anonymity(sf_dir: str):
    """K-ANONYMITY AUDIT — the privacy gate before any data release:
    quasi-identifier = (lang, source, n_chars // 100 length band);
    output the equivalence-class size histogram (k → number of classes
    of that size). The release rule 'suppress classes with k < K' reads
    straight off the result; min k is the headline number. Two bounded
    reduces: per-QI counts in coarse composite-hash groups, then the
    size histogram."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "source": b["source"].to_pylist(),
                "band": np.asarray(
                    b["n_chars"].to_pylist(), dtype=np.int64
                ) // 100,
            }
        )
        out = df.groupby(
            ["lang", "source", "band"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"band": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["lang", "source", "band"], as_index=False
        )["n"].sum()
        return out.astype({"band": "int64", "n": "int64"})

    classes = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source", "band"],
        merge,
    )
    hist = (
        classes.map_batches(
            lambda b: pa.table({"k": pc.cast(b["n"], pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("k")  # bounded: ≤ max class size
        .aggregate(Count(alias_name="n_classes"))
    )
    return hist.map_batches(
        lambda b: pa.table(
            {
                "k": pc.cast(b["k"], pa.int64()),
                "n_classes": pc.cast(b["n_classes"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q196_join_size_exact(sf_dir: str):
    """EXACT JOIN-CARDINALITY computation WITHOUT the join — the
    optimizer statistic |orders ⋈ lineitem| = Σ_k cnt_o(k)·cnt_l(k):
    per-key counts reduce independently on each side (rows never meet),
    the two COUNT relations — key + int64 each — meet in one bucketed
    hash join whose per-bucket product-sums collapse to three scalars.
    The shuffle carries counts, not rows: estimating a 10⁹-row join
    costs two count scans + a key-sized exchange."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def count_side(ds, key, out):
        def partial(b: pa.Table) -> pa.Table:
            t = b.group_by(key).aggregate([([], "count_all")])
            return pa.table(
                {
                    "k": pc.cast(t[key], pa.int64()),
                    out: pc.cast(t["count_all"], pa.int64()),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            m = df.groupby("k", as_index=False)[out].sum()
            return m.astype({"k": "int64", out: "int64"})

        return coarse_group_reduce(
            ds.map_batches(partial, batch_format="pyarrow"), "k", merge
        )

    co = count_side(orders, "o_orderkey", "n_o")
    cl = count_side(lineitem, "l_orderkey", "n_l")

    joined = bucketed_hash_join(
        co, cl, key="k", left_columns=["n_o"], right_columns=["n_l"]
    )

    def partial_sums(b: pa.Table) -> pa.Table:
        n_o = b["n_o"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_l = b["n_l"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_keys": pa.array([len(n_o)], pa.int64()),
                "join_rows": pa.array([int((n_o * n_l).sum())], pa.int64()),
                "max_key_fanout": pa.array(
                    [int((n_o * n_l).max()) if len(n_o) else 0], pa.int64()
                ),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_keys": pd.array([int(df["n_keys"].sum())], dtype="int64"),
                "join_rows": pd.array(
                    [int(df["join_rows"].sum())], dtype="int64"),
                "max_key_fanout": pd.array(
                    [int(df["max_key_fanout"].max())], dtype="int64"),
            }
        )

    partials = joined.map_batches(partial_sums, batch_format="pyarrow")
    return (
        partials.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q197_gini_evidence(sf_dir: str):
    """GINI MEAN DIFFERENCE per language with exact integers — the
    inequality statistic behind corpus-balance dashboards: Σ_{i<j}
    |x_i − x_j| over doc lengths via the sorted-order identity
    Σ_i (2i − n − 1)·x_(i) (1-based i; tie-order-invariant because
    tied values contribute zero differences) — O(n log n), no pairwise
    loop, every term int64. The Gini coefficient itself is
    gini_num / (n·sum_x), a derived epilogue. One vectorized sort +
    cumcount per coarse language group."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["lang", "n_chars", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        x = g["n_chars"].to_numpy(dtype=np.int64)
        i1 = g.groupby("lang").cumcount().to_numpy() + 1  # 1-based
        n_per = g.groupby("lang")["n_chars"].transform("size").to_numpy()
        g = g.assign(term=(2 * i1 - n_per - 1) * x)
        out = g.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"),
            sum_x=("n_chars", "sum"),
            gini_num=("term", "sum"),
        )
        return out.astype(
            {"n": "int64", "sum_x": "int64", "gini_num": "int64"}
        )

    return coarse_group_reduce(ds, "lang", gini)


def q198_attribution(sf_dir: str):
    """LAST-TOUCH ATTRIBUTION — the marketing-analytics join: every
    purchase attributes to the user's LATEST click at-or-before it
    within a 7-day lookback (ties: highest event_id), else −1. One
    pd.merge_asof per coarse user group (tolerance = the lookback,
    backward; equal-ts rows sorted by event_id so the asof pick matches
    the SQL DESC-DESC row_number pick) — the q06 as-of discipline with
    a type-filtered self-join and an explicit unattributed contract.
    Output (purchase_id, click_id, gap_s), gap in whole seconds, −1
    when unattributed."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    LOOKBACK = pd.Timedelta(days=7)
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        clicks = df[df["event_type"] == "click"][
            ["user_id", "ts", "event_id"]
        ].sort_values(["ts", "event_id"], kind="mergesort")
        purch = df[df["event_type"] == "purchase"][
            ["user_id", "ts", "event_id"]
        ].sort_values(["ts", "event_id"], kind="mergesort")
        if len(purch) == 0:
            return pd.DataFrame(
                {
                    "purchase_id": pd.array([], dtype="int64"),
                    "click_id": pd.array([], dtype="int64"),
                    "gap_s": pd.array([], dtype="int64"),
                }
            )
        clicks = clicks.rename(
            columns={"event_id": "click_id", "ts": "click_ts"}
        )
        m = pd.merge_asof(
            purch,
            clicks,
            left_on="ts",
            right_on="click_ts",
            by="user_id",
            direction="backward",
            tolerance=LOOKBACK,
        )
        miss = m["click_ts"].isna()
        p_us = m["ts"].astype("datetime64[us]").astype("int64")
        c_us = (
            m["click_ts"].fillna(pd.Timestamp(0))
            .astype("datetime64[us]").astype("int64")
        )
        gap_s = ((p_us - c_us) // 1_000_000).mask(miss, -1).astype("int64")
        return pd.DataFrame(
            {
                "purchase_id": m["event_id"].astype("int64"),
                "click_id": m["click_id"].fillna(-1).astype("int64"),
                "gap_s": gap_s,
            }
        )

    return coarse_group_reduce(ds, "user_id", attribute)


def q199_kwic_contexts(sf_dir: str):
    """KWIC (KeyWord In Context) concordance — the corpus-linguistics
    view every annotation UI renders: for the corpus's most frequent
    token (tie: token asc), every occurrence with two tokens of left
    and right context. The keyword is a bounded top-1 scalar (the q176
    discipline); the context scan is one shifted-array pass per batch;
    context strings are built from the SAME token arrays both engines
    tokenize, so the driver hash checks the string assembly too."""
    from basicocr_ray.stages.wide import count_terms, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tok_counts = count_terms(ds, "text", token_items, "token")
    top = top_k(tok_counts, 1, "cnt", "token").take(1)
    kw = top[0]["token"]

    def contexts(b: pa.Table) -> pa.Table:
        out_d, out_p, out_l, out_r = [], [], [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if not t:
                continue
            toks = t.lower().split()
            arr = np.asarray(toks, dtype=object)
            for p in np.flatnonzero(arr == kw):
                p = int(p)
                out_d.append(did)
                out_p.append(p)
                out_l.append(" ".join(toks[max(0, p - 2):p]))
                out_r.append(" ".join(toks[p + 1:p + 3]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "left_ctx": pa.array(out_l, pa.string()),
                "right_ctx": pa.array(out_r, pa.string()),
            }
        )

    return ds.map_batches(contexts, batch_format="pyarrow")


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


def q201_ohlc_candles(sf_dir: str):
    """OHLC CANDLES — the metrics/finance downsample: per (event_type,
    4-hour bucket): open = first value by (ts, event_id), high, low,
    close = last. Values are CARRIED floats (never recomputed), so the
    driver hash is float-safe; open/close ties resolve by the unique
    event_id. One vectorized sort + groupby first/last/min/max per
    coarse (type, bucket) group; partials are per-batch candles (each
    carrying its extreme rows' order keys) so a bucket spanning many
    batches folds exactly."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    BUCKET_US = 4 * 3_600_000_000
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "bucket": ts_us - ts_us % BUCKET_US,
                "ts_us": ts_us,
                "event_id": b["event_id"].to_numpy(zero_copy_only=False),
                "value": b["value"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(
            ["event_type", "bucket", "ts_us", "event_id"], kind="mergesort"
        )
        g = df.groupby(["event_type", "bucket"], as_index=False)
        out = g.agg(
            o_ts=("ts_us", "first"), o_id=("event_id", "first"),
            open=("value", "first"), high=("value", "max"),
            low=("value", "min"), close=("value", "last"),
            c_ts=("ts_us", "last"), c_id=("event_id", "last"),
            n=("value", "size"),
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (et, bucket), g in df.groupby(["event_type", "bucket"]):
            go = g.sort_values(["o_ts", "o_id"], kind="mergesort").iloc[0]
            gc = g.sort_values(["c_ts", "c_id"], kind="mergesort").iloc[-1]
            rows.append(
                (
                    et, int(bucket), float(go["open"]),
                    float(g["high"].max()), float(g["low"].min()),
                    float(gc["close"]), int(g["n"].sum()),
                )
            )
        return pd.DataFrame(
            {
                "event_type": pd.array([r[0] for r in rows], dtype="object"),
                "bucket": pd.array([r[1] for r in rows], dtype="int64"),
                "open": pd.array([r[2] for r in rows], dtype="float64"),
                "high": pd.array([r[3] for r in rows], dtype="float64"),
                "low": pd.array([r[4] for r in rows], dtype="float64"),
                "close": pd.array([r[5] for r in rows], dtype="float64"),
                "n": pd.array([r[6] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket"],
        final,
    )


def q202_politeness_schedule(sf_dir: str):
    """CRAWL POLITENESS SCHEDULING — the sequential-looking recurrence
    t_i = max(arrival_i, t_{i-1} + gap) made embarrassingly parallel by
    the unrolled identity t_i = gap·i + running_max(arrival_j − gap·j)
    — a prefix MAX, not a sequential chain, so each host's schedule is
    one vectorized cummax inside its coarse group (and a window
    expression in SQL). Hosts = user_id mod 32, gap = 2 s, arrivals =
    event timestamps; output (event_id, host, fetch_us, delay_s) with
    every quantity exact integer microseconds."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    GAP_US = 2_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def add_host(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "host": pc.cast(
                    pc.bit_wise_and(
                        pc.cast(b["user_id"], pa.int64()), 31
                    ),
                    pa.int64(),
                ),
                "arr": ts_us,
            }
        )

    hosted = ds.map_batches(add_host, batch_format="pyarrow")

    def schedule(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["host", "arr", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        i0 = g.groupby("host").cumcount()  # 0-based position in host
        adj = g["arr"] - GAP_US * i0
        fetch = GAP_US * i0 + adj.groupby(g["host"]).cummax()
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "host": g["host"].astype("int64"),
                "fetch_us": fetch.astype("int64"),
                "delay_s": ((fetch - g["arr"]) // 1_000_000).astype("int64"),
            }
        )
        return out.reset_index(drop=True)

    return coarse_group_reduce(hosted, "host", schedule)


def q203_smoothed_series(sf_dir: str):
    """DYADIC-KERNEL SMOOTHING — the [1, 2, 1] moving average over each
    user's value series with EXACT float semantics: multiplying a
    double by 2 is exact, and both engines evaluate the same
    left-to-right three-term sum (prev + 2·cur) + next, so the smoothed
    values hash bit-for-bit with no integer quantization. Boundary rows
    (no prev/next) substitute the current value — the reflect-pad
    convention. One sort + shift per coarse user group."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def smooth(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        v = g["value"].astype("float64")
        prev = v.groupby(g["user_id"]).shift(1)
        nxt = v.groupby(g["user_id"]).shift(-1)
        prev = prev.fillna(v)
        nxt = nxt.fillna(v)
        sm = (prev.to_numpy() + 2.0 * v.to_numpy()) + nxt.to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "user_id": g["user_id"].astype("int64"),
                "smooth4": sm,  # 4× the average — exact; ÷4 is derived
            }
        )

    return coarse_group_reduce(ds, "user_id", smooth)


def q204_roaring_plan(sf_dir: str):
    """BITMAP-INDEX CONTAINER PLANNING (the Roaring decision, scaled to
    256-value containers): per (event_type, event_id >> 8 container),
    the distinct-value count decides array vs bitmap encoding (n ≥ 48 →
    bitmap, 32 bytes; else sorted array, 2n bytes) — the index-build
    cost model as data. Per-batch distinct (type, container) partials →
    exact coarse reduce; output (event_type, container, n, ctype,
    bytes), all integers."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    THRESH = 48
    ds = _read(sf_dir, "events", columns=["event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "container": np.asarray(
                    b["event_id"].to_pylist(), dtype=np.int64
                ) >> 8,
            }
        )
        out = df.groupby(
            ["event_type", "container"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"container": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["event_type", "container"], as_index=False
        )["n"].sum()
        out["ctype"] = (out["n"] >= THRESH).astype("int64")
        out["bytes"] = np.where(out["ctype"] == 1, 32, 2 * out["n"])
        return out.astype(
            {"container": "int64", "n": "int64", "bytes": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "container"],
        final,
    )


def q205_peak_concurrency(sf_dir: str):
    """PEAK CONCURRENCY — the sweep-line stabbing maximum (capacity
    planning over sessions): with the q170 interval rule, c(t) =
    #{intervals with s ≤ t < e} evaluated at distinct start times;
    output the maximum and the EARLIEST time it is reached. The
    endpoint deltas pre-aggregate per (hour-bucket, timestamp) — the
    per-timestamp grouping makes the profile deterministic under any
    intra-batch order — then the q185 ordered-bucket discipline turns
    the global running sum into metadata offsets + per-bucket local
    scans; the final max-reduce sees one candidate row per bucket."""
    from basicocr_ray.core.collect import collect_rows

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def deltas(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        dur = (
            np.asarray(b["event_id"].to_pylist(), dtype=np.int64) % 3600
            + 60
        ) * 1_000_000
        acc: dict[int, list] = {}
        for s, e in zip(ts_us, ts_us + dur):
            a = acc.setdefault(int(s), [0, 0])
            a[0] += 1
            a[1] = 1  # a start lives at this timestamp
            b2 = acc.setdefault(int(e), [0, 0])
            b2[0] -= 1
        ks = sorted(acc)
        return pa.table(
            {
                "t": pa.array(ks, pa.int64()),
                "d": pa.array([acc[k][0] for k in ks], pa.int64()),
                "is_start": pa.array([acc[k][1] for k in ks], pa.int64()),
                "rb": pa.array([k // HOUR_US for k in ks], pa.int64()),
            }
        )

    body = ds.map_batches(deltas, batch_format="pyarrow").materialize()

    def bucket_totals(b: pa.Table) -> pa.Table:
        t = b.group_by("rb").aggregate([("d", "sum")])
        return t.rename_columns(["rb", "v"])

    totals: dict[int, int] = {}
    for row in collect_rows(
        body.map_batches(bucket_totals, batch_format="pyarrow")
    ):
        totals[int(row["rb"])] = totals.get(int(row["rb"]), 0) + int(row["v"])
    offsets: dict[int, int] = {}
    acc = 0
    for rb in sorted(totals):
        offsets[rb] = acc
        acc += totals[rb]

    def local_max(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("t", as_index=False)
            .agg(d=("d", "sum"), is_start=("is_start", "max"))
            .sort_values("t", kind="mergesort")
        )
        run = offsets[int(df["rb"].iloc[0])] + g["d"].cumsum()
        m = g.assign(c=run)
        m = m[m["is_start"] == 1]  # maxima occur at start times
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "max_concurrency": pd.array([], dtype="int64"),
                    "at_us": pd.array([], dtype="int64"),
                }
            )
        best = int(m["c"].max())
        at = int(m[m["c"] == best]["t"].min())
        return pd.DataFrame(
            {
                "max_concurrency": pd.array([best], dtype="int64"),
                "at_us": pd.array([at], dtype="int64"),
            }
        )

    cands = body.groupby("rb").map_groups(local_max, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        best = int(df["max_concurrency"].max())
        at = int(df[df["max_concurrency"] == best]["at_us"].min())
        return pd.DataFrame(
            {
                "max_concurrency": pd.array([best], dtype="int64"),
                "at_us": pd.array([at], dtype="int64"),
            }
        )

    return (
        cands.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q206_coverage_k90(sf_dir: str):
    """VOCABULARY 90 %-COVERAGE POINT per language — the tokenizer-
    sizing statistic (how many types cover 90 % of tokens): k90 = the
    minimal k with 10·(top-k mass) ≥ 9·total. The open-vocabulary part
    stays distributed — per-(lang, token) counts — and only the
    COUNT-OF-COUNTS relation (lang, cnt, n_tokens), bounded by the
    number of DISTINCT count values, reaches the per-lang ordered scan;
    within the boundary count group the exact token remainder is
    j = ⌈(9T − 10m) / (10c)⌉, all integers."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def tok_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            if not t or lang is None:
                continue
            for tok in token_items(t):
                k = (lang, tok)
                acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "token": pa.array([k[1] for k in ks], pa.string()),
                "cnt": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def tok_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "token"], as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["lang", "token"],
        tok_merge,
    )

    def cc_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": b["lang"].to_pylist(), "cnt": b["cnt"].to_pylist()}
        )
        out = df.groupby(["lang", "cnt"], as_index=False).size().rename(
            columns={"size": "ntok"}
        )
        return pa.Table.from_pandas(
            out.astype({"cnt": "int64", "ntok": "int64"}),
            preserve_index=False,
        )

    cc = counts.map_batches(cc_partial, batch_format="pyarrow")

    def k90(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        agg = df.groupby(["lang", "cnt"], as_index=False)["ntok"].sum()
        for lang, g in agg.groupby("lang"):
            g = g.sort_values("cnt", ascending=False)
            T = int((g["cnt"] * g["ntok"]).sum())
            vocab = int(g["ntok"].sum())
            m = k = 0
            k_90 = vocab
            for _, r in g.iterrows():
                c, n = int(r["cnt"]), int(r["ntok"])
                if 10 * (m + c * n) >= 9 * T:
                    j = (9 * T - 10 * m + 10 * c - 1) // (10 * c)
                    k_90 = k + j
                    break
                m += c * n
                k += n
            rows.append((lang, vocab, T, k_90))
        return pd.DataFrame(
            {
                "lang": pd.array([r[0] for r in rows], dtype="object"),
                "vocab": pd.array([r[1] for r in rows], dtype="int64"),
                "total_tokens": pd.array(
                    [r[2] for r in rows], dtype="int64"),
                "k90": pd.array([r[3] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(cc, "lang", k90)


def q207_pruning_audit(sf_dir: str):
    """ZONE-MAP PRUNING AUDIT — how much a min/max-statistics scan
    planner would actually skip (the q168 zone maps put to work): with
    256-row groups (event_id // 256) and the predicate value ≥ 500, a
    group is PRUNED when its max < 500; output one row: group count,
    pruned count, rows the scan would read (surviving groups' rows),
    and the exact match count — the planner's selectivity ledger.
    Per-group (min, max, n, n_match) partials fold exactly in coarse
    groups; the final is four scalars."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "grp": np.asarray(
                    b["event_id"].to_pylist(), dtype=np.int64
                ) // 256,
                "v": np.asarray(b["value"].to_pylist(), dtype=np.float64),
            }
        )
        out = df.groupby("grp", as_index=False).agg(
            vmin=("v", "min"), vmax=("v", "max"), n=("v", "size"),
        )
        out["n_match"] = df.assign(m=(df["v"] >= 500.0)).groupby(
            "grp"
        )["m"].sum().to_numpy().astype("int64")
        return pa.Table.from_pandas(
            out.astype({"grp": "int64", "n": "int64", "n_match": "int64"}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("grp", as_index=False).agg(
            vmin=("vmin", "min"), vmax=("vmax", "max"),
            n=("n", "sum"), n_match=("n_match", "sum"),
        )
        return out.astype({"n": "int64", "n_match": "int64"})

    groups = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "grp", merge
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        pruned = df["vmax"] < 500.0
        return pd.DataFrame(
            {
                "n_groups": pd.array([len(df)], dtype="int64"),
                "n_pruned": pd.array([int(pruned.sum())], dtype="int64"),
                "rows_scanned": pd.array(
                    [int(df[~pruned]["n"].sum())], dtype="int64"),
                "rows_matched": pd.array(
                    [int(df["n_match"].sum())], dtype="int64"),
            }
        )

    return (
        groups.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q208_term_lattice(sf_dir: str):
    """BOOLEAN-QUERY SUPPORT LATTICE — the Apriori/itemset layer a
    search planner consults: for the corpus's 3 most frequent tokens
    (ties: token asc), count documents per containment mask (bit i set
    ⇔ doc contains token i) — all 8 AND-combinations in one pass. The
    top-3 is a bounded scalar; the mask scan is one per-batch set
    probe; the count reduce is an 8-key aggregate."""
    from basicocr_ray.stages.wide import coarse_group_reduce, count_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tok_counts = count_terms(ds, "text", token_items, "token")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(3)

    top3 = (
        tok_counts.map_batches(prune, batch_format="pandas")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(3)
        .take(3)
    )
    targets = [r["token"] for r in top3]

    def mask_partial(b: pa.Table) -> pa.Table:
        acc: dict[int, int] = {}
        for t in b["text"].to_pylist():
            toks = set(token_items(t)) if t else set()
            m = sum(1 << i for i, w in enumerate(targets) if w in toks)
            acc[m] = acc.get(m, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "mask": pa.array(ks, pa.int64()),
                "n_docs": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("mask", as_index=False)["n_docs"].sum()
        return out.astype({"mask": "int64", "n_docs": "int64"})

    return coarse_group_reduce(
        ds.map_batches(mask_partial, batch_format="pyarrow"), "mask", merge
    )


def q209_user_growth(sf_dir: str):
    """USER GROWTH ACCOUNTING — the cumulative-distinct curve every
    product dashboard opens with: each user's FIRST-SEEN day (a min
    reduce over metadata pairs), new-user counts per day, and the
    running cumulative. The per-day relation is calendar-sized, so the
    cumulative is one tiny ordered scan — the distinct-count curve
    with no day-over-day re-distinct."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "day": ts_us // DAY_US,
            }
        )
        out = df.groupby("user_id", as_index=False)["day"].min()
        return pa.Table.from_pandas(
            out.astype({"user_id": "int64", "day": "int64"}),
            preserve_index=False,
        )

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False)["day"].min()
        cnt = out.groupby("day", as_index=False).agg(
            new_users=("user_id", "size")
        )
        return cnt.astype({"day": "int64", "new_users": "int64"})

    per_day = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        first_seen,
    )

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("day", as_index=False)["new_users"].sum()
        g = g.sort_values("day", kind="mergesort").reset_index(drop=True)
        g["cum_users"] = g["new_users"].cumsum()
        return g.astype(
            {"day": "int64", "new_users": "int64", "cum_users": "int64"}
        )

    return (
        per_day.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: cum(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q210_ordered_funnel(sf_dir: str):
    """STRICT-ORDER FUNNEL (click → view → purchase, ≤ 1 day per hop) —
    the conversion metric q78's stage counter can't express because
    order matters: a view qualifies only with a strictly-preceding
    click inside the window, a purchase only with a strictly-preceding
    QUALIFIED view. The existence tests reduce to running maxima (the
    latest preceding stage event is the closest, so 'latest ≥ t − 1d' ⟺
    'exists in window'), giving two vectorized cummax+shift passes per
    coarse user group — no per-event scan back. Row order on timestamp
    ties is (ts, event_id), mirrored in the oracle's lexicographic
    EXISTS. Output per purchasing user: n_purchases, n_qualified."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    NEG = -(1 << 62)
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        t = g["ts"].astype("datetime64[us]").astype("int64")
        et = g["event_type"]
        click_t = t.where(et == "click", NEG)
        prev_click = (
            click_t.groupby(g["user_id"]).cummax()
            .groupby(g["user_id"]).shift(1, fill_value=NEG)
        )
        qual_view = (et == "view") & (prev_click >= t - DAY_US)
        qv_t = t.where(qual_view, NEG)
        prev_qview = (
            qv_t.groupby(g["user_id"]).cummax()
            .groupby(g["user_id"]).shift(1, fill_value=NEG)
        )
        qual_purch = (et == "purchase") & (prev_qview >= t - DAY_US)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "is_p": (et == "purchase").astype("int64"),
                "is_q": qual_purch.astype("int64"),
            }
        ).groupby("user_id", as_index=False).sum()
        out = out[out["is_p"] > 0].rename(
            columns={"is_p": "n_purchases", "is_q": "n_qualified"}
        )
        return out.astype(
            {
                "user_id": "int64", "n_purchases": "int64",
                "n_qualified": "int64",
            }
        ).reset_index(drop=True)

    return coarse_group_reduce(ds, "user_id", funnel)


def q211_datasheet(sf_dir: str):
    """PER-SOURCE DATASHEET — the 'nutrition label' a corpus release
    ships (Datasheets for Datasets, Gebru et al. 2018, reduced to its
    computable core): per source, docs, exact char mass, English share
    numerator, and DISTINCT text count (the within-source dup signal).
    The distinct count dedups (source, fp) pairs in coarse groups of
    the fingerprint hash — text never moves, an open corpus stays
    bounded; the other aggregates fold as per-batch partials."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["text", "lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for t, lang, src in zip(
            b["text"].to_pylist(), b["lang"].to_pylist(),
            b["source"].to_pylist(),
        ):
            src = src if src is not None else ""
            t = t if t is not None else ""
            a = acc.setdefault(src, [0, 0, 0])
            a[0] += 1
            a[1] += len(t)
            a[2] += 1 if lang == "en" else 0
        ks = sorted(acc)
        base = pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n_docs": pa.array([acc[k][0] for k in ks], pa.int64()),
                "sum_chars": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_en": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )
        return base

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", as_index=False).sum()
        return out.astype(
            {"n_docs": "int64", "sum_chars": "int64", "n_en": "int64"}
        )

    stats = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "source", merge
    )

    def fp_partial(b: pa.Table) -> pa.Table:
        pairs = set()
        for t, src in zip(
            b["text"].to_pylist(), b["source"].to_pylist()
        ):
            pairs.add(
                (
                    src if src is not None else "",
                    _md5_low64(t if t is not None else "") & MASK,
                )
            )
        rows = sorted(pairs)
        return pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "fp": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    def uniq_count(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.drop_duplicates()
            .groupby("source", as_index=False)
            .agg(n_uniq=("fp", "size"))
        )
        return out.astype({"n_uniq": "int64"})

    uniq = (
        coarse_group_reduce(
            ds.map_batches(fp_partial, batch_format="pyarrow"),
            ["source", "fp"],
            uniq_count,
        )
    )

    def uniq_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", as_index=False)["n_uniq"].sum()
        return out.astype({"n_uniq": "int64"})

    uniq_total = coarse_group_reduce(uniq, "source", uniq_merge)

    return bucketed_hash_join(
        stats, uniq_total, key="source",
        left_columns=["n_docs", "sum_chars", "n_en"],
        right_columns=["n_uniq"],
    )


def q212_incremental_rollup(sf_dir: str):
    """INCREMENTAL VIEW MAINTENANCE for an aggregate — the streaming
    upkeep pattern (the q162/q163 incremental discipline applied to a
    ROLLUP instead of an index): wave 1 (the events table) materializes
    a per-(type, hour) rollup to a persisted store; wave 2 (planted:
    every event re-keyed +100000 and shifted +36 h) folds ONTO the
    stored rollup by reading the ROLLUP (aggregate-sized), never
    rescanning wave-1 rows. Value mass is exact integer cents
    (floor(100·v)). The oracle computes both waves together — the
    merged view must equal the from-scratch one."""
    import tempfile

    from basicocr_ray.stages.wide import coarse_group_reduce

    HOUR_US = 3_600_000_000
    SHIFT_US = 36 * HOUR_US

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type",
                                          "value"])

    def rollup_partial(shift_us: int):
        def partial(b: pa.Table) -> pa.Table:
            ts_us = pc.cast(
                pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False) + shift_us
            df = pd.DataFrame(
                {
                    "event_type": b["event_type"].to_pylist(),
                    "hour_us": ts_us - ts_us % HOUR_US,
                    "cents": np.floor(
                        np.asarray(b["value"].to_pylist(),
                                   dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )
            out = df.groupby(
                ["event_type", "hour_us"], as_index=False
            ).agg(n=("cents", "size"), sum_cents=("cents", "sum"))
            return pa.Table.from_pandas(
                out.astype(
                    {"hour_us": "int64", "n": "int64", "sum_cents": "int64"}
                ),
                preserve_index=False,
            )

        return partial

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["event_type", "hour_us"], as_index=False
        ).agg(n=("n", "sum"), sum_cents=("sum_cents", "sum"))
        return out.astype(
            {"hour_us": "int64", "n": "int64", "sum_cents": "int64"}
        )

    store = tempfile.mkdtemp(prefix="q212_rollup_")
    # wave 1: materialize the rollup to the store
    coarse_group_reduce(
        ds.map_batches(rollup_partial(0), batch_format="pyarrow"),
        ["event_type", "hour_us"],
        merge,
    ).write_parquet(store)

    # wave 2: delta rollup + fold onto the STORED rollup (aggregate-
    # sized read — wave-1 rows are never rescanned)
    import ray.data

    stored = ray.data.read_parquet(store)
    delta = ds.map_batches(
        rollup_partial(SHIFT_US), batch_format="pyarrow"
    )
    merged = coarse_group_reduce(
        stored.union(delta), ["event_type", "hour_us"], merge
    )
    out = merged.to_pandas()
    import shutil

    shutil.rmtree(store, ignore_errors=True)
    return out


def q213_cusum_drift(sf_dir: str):
    """CUSUM CHANGE-POINT EVIDENCE per user — the drift detector's
    clamped recurrence S_i = max(0, S_{i-1} + (x_i − ref)) unrolled to
    S_i = P_i − min(0, P_1..P_i) over the prefix sums P (the q202
    trick: a sequential clamp is a running MIN in disguise), so the
    whole scan is one cumsum + one cummin per coarse user group, and a
    window expression in SQL. Values are exact integer cents against
    ref = 28000; output per user the peak CUSUM, the event where it is
    first reached (earliest by (ts, event_id)), and the final value."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    REF = 28000
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def cusum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        d = np.floor(
            g["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64) - REF
        p = pd.Series(d).groupby(g["user_id"]).cumsum()
        run_min = p.groupby(g["user_id"]).cummin().clip(upper=0)
        s = p - run_min
        g = g.assign(cusum=s.astype("int64"))
        rows = []
        for u, sub in g.groupby("user_id"):
            peak = int(sub["cusum"].max())
            first = sub[sub["cusum"] == peak].iloc[0]
            rows.append(
                (int(u), peak, int(first["event_id"]),
                 int(sub["cusum"].iloc[-1]))
            )
        return pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in rows], dtype="int64"),
                "peak": pd.array([r[1] for r in rows], dtype="int64"),
                "at_event": pd.array([r[2] for r in rows], dtype="int64"),
                "final": pd.array([r[3] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(ds, "user_id", cusum)


def q214_sequence_disorder(sf_dir: str):
    """SEQUENCE DISORDER (Kendall-tau distance between arrival order
    and value order) per user — the out-of-orderness audit a streaming
    ingest runs: inversions = #{i < j : x_i > x_j} over cents in
    (ts, event_id) order, ties uncounted, plus the pair denominator.
    The per-user count is one vectorized O(n²) comparison inside the
    coarse group — exact and branch-free; a user's event count bounds
    the quadratic term (the docstring contract; switch to a merge
    count if per-key sequences grow unbounded)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def disorder(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        g = g.assign(
            cents=np.floor(
                g["value"].to_numpy(dtype=np.float64) * 100
            ).astype(np.int64)
        )
        rows = []
        for u, sub in g.groupby("user_id"):
            x = sub["cents"].to_numpy()
            n = len(x)
            inv = int(np.triu(x[:, None] > x[None, :], k=1).sum())
            rows.append((int(u), n, inv, n * (n - 1) // 2))
        return pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_events": pd.array([r[1] for r in rows], dtype="int64"),
                "inversions": pd.array([r[2] for r in rows], dtype="int64"),
                "n_pairs": pd.array([r[3] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(ds, "user_id", disorder)


def q215_autocorr_evidence(sf_dir: str):
    """LAG-1 AUTOCORRELATION EVIDENCE per event type — the seasonality
    screen's moment sums with exact integers: over cents in
    (ts, event_id) order, n, Σc, Σc², and the adjacent-product sum
    Σ c_i·c_{i+1} (the correlation itself is a derived float epilogue).
    The adjacent products need each type's order only LOCALLY — one
    sort + shift-multiply per coarse type group; batch partials are not
    possible for the cross-boundary product, so the group IS the unit
    (types are bounded)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "event_type", "value"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["event_type", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        c = np.floor(
            g["value"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        g = g.assign(c=c)
        nxt = g.groupby("event_type")["c"].shift(-1)
        g = g.assign(
            lag_term=(g["c"] * nxt).fillna(0).astype("int64")
        )
        out = g.groupby("event_type", as_index=False).agg(
            n=("c", "size"),
            s1=("c", "sum"),
            s2_part=("c", lambda s: int((s.to_numpy() ** 2).sum())),
            lag_sum=("lag_term", "sum"),
        ).rename(columns={"s2_part": "s2"})
        return out.astype(
            {"n": "int64", "s1": "int64", "s2": "int64", "lag_sum": "int64"}
        )

    return coarse_group_reduce(ds, "event_type", moments)


def q216_weighted_jaccard(sf_dir: str):
    """WEIGHTED JACCARD between source corpora — multiset similarity
    J_w = Σ min(c_a, c_b) / Σ max(c_a, c_b) over token counts, with the
    max side NEVER enumerated: Σmax = T_a + T_b − Σmin, so only the
    MIN mass (co-present tokens) and the per-source token totals move.
    Shape: per-(token, source) counts reduce exactly; each token's
    per-source count vector meets ONLY in its own hash group and emits
    C(k,2) pair-min rows (k ≤ #sources); a bounded pair-keyed Sum and
    a tiny totals join finish. Output (source_a, source_b, sum_min,
    t_a, t_b) for co-present pairs; the ratio is a derived epilogue."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def tok_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t, src in zip(
            b["text"].to_pylist(), b["source"].to_pylist()
        ):
            if not t or src is None:
                continue
            for tok in token_items(t):
                k = (tok, src)
                acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "token": pa.array([k[0] for k in ks], pa.string()),
                "source": pa.array([k[1] for k in ks], pa.string()),
                "cnt": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def tok_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["token", "source"], as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token", "source"],
        tok_merge,
    ).materialize()

    def pair_mins(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["token", "source"], as_index=False)["cnt"].sum()
        out_a, out_b, out_m = [], [], []
        for _, g in agg.groupby("token"):
            items = sorted(zip(g["source"], g["cnt"]))
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    out_a.append(items[i][0])
                    out_b.append(items[j][0])
                    out_m.append(min(items[i][1], items[j][1]))
        return pd.DataFrame(
            {
                "source_a": pd.array(out_a, dtype="object"),
                "source_b": pd.array(out_b, dtype="object"),
                "m": pd.array(out_m, dtype="int64"),
            }
        )

    mins = (
        coarse_group_reduce(counts, "token", pair_mins)
        .groupby(["source_a", "source_b"])  # bounded: C(#sources, 2)
        .aggregate(Sum("m", alias_name="sum_min"))
    )

    totals = counts.map_batches(
        lambda b: pa.table(
            {
                "source": b["source"],
                "t": pc.cast(b["cnt"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).groupby("source").aggregate(Sum("t", alias_name="t"))
    tot = {
        r["source"]: int(r["t"])
        for r in totals.take_all()  # source-sized: bounded by definition
    }

    def attach(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source_a": b["source_a"],
                "source_b": b["source_b"],
                "sum_min": pc.cast(b["sum_min"], pa.int64()),
                "t_a": pa.array(
                    [tot[s] for s in b["source_a"].to_pylist()], pa.int64()
                ),
                "t_b": pa.array(
                    [tot[s] for s in b["source_b"].to_pylist()], pa.int64()
                ),
            }
        )

    return mins.map_batches(attach, batch_format="pyarrow")


def q217_graph_reciprocity(sf_dir: str):
    """HOST-GRAPH RECIPROCITY + degree-product evidence — the
    web-graph shape metrics after q103 (PageRank), q153 (triangles),
    q42 (components): from the q147 REAL-HTML outlink extraction,
    the distinct ordered edge set yields (a) reciprocity — how many
    ordered edges have their reverse — and (b) the assortativity
    numerator Σ outdeg(u)·indeg(v) over edges (the mixing evidence).
    The edge relation is host-bounded, so after the distinct-edge
    reduce everything is one tiny pass; the HTML scan is the only
    corpus-scale stage."""
    import re

    from basicocr_ray.sources.docpages import wrap_single
    from basicocr_ray.stages.wide import coarse_group_reduce

    HREF = re.compile(rb'href="(https?://[^"]+)"')

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def edges_partial(batch: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        seen = set()
        for i, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            page = wrap_single(t or "", i)
            links = (
                f'<p><a href="http://site{(3 * i + 1) % 7}.example.com'
                f'/p/{i % 100}">more</a> '
                f'<a href="https://site{(5 * i + 2) % 7}.example.com'
                f'/q/{i % 50}">src</a></p>'
            ).encode()
            page = page.replace(b"</article>", links + b"</article>")
            src = f"site{i % 7}"
            for m in HREF.finditer(page):
                host = urlsplit(m.group(1).decode()).hostname or ""
                seen.add((src, host.split(".")[0]))
        rows = sorted(seen)
        return pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.string()),
                "dst": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        e = df.drop_duplicates()
        eset = set(zip(e["src"], e["dst"]))
        outdeg: dict = {}
        indeg: dict = {}
        for u, v in eset:
            outdeg[u] = outdeg.get(u, 0) + 1
            indeg[v] = indeg.get(v, 0) + 1
        n_recip = sum(1 for u, v in eset if (v, u) in eset)
        degprod = sum(outdeg[u] * indeg[v] for u, v in eset)
        return pd.DataFrame(
            {
                "n_edges": pd.array([len(eset)], dtype="int64"),
                "n_recip": pd.array([n_recip], dtype="int64"),
                "sum_degprod": pd.array([degprod], dtype="int64"),
            }
        )

    edges = ds.map_batches(edges_partial, batch_format="pyarrow")
    return (
        edges.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")  # the distinct edge set is host-bounded
        .map_groups(
            lambda df: metrics(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q218_histogram_drift(sf_dir: str):
    """DISTRIBUTION DRIFT between the first and second halves of the
    event stream — the PSI/L1 monitoring primitive with exact integer
    evidence: the time midpoint (min+max)/2 splits the stream, values
    bucket at width 50, and each bucket reports both halves' counts
    plus |Δ| (the L1 term). Two scalar aggregates fix the split; the
    bucket reduce is bounded by the value range."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    lo = ds.min("ts")
    hi = ds.max("ts")
    mid_us = (
        int(np.datetime64(pd.Timestamp(lo), "us").astype("int64"))
        + int(np.datetime64(pd.Timestamp(hi), "us").astype("int64"))
    ) // 2

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        v = np.asarray(b["value"].to_pylist(), dtype=np.float64)
        bucket = np.floor(v / 50.0).astype(np.int64)
        first = ts_us < mid_us
        df = pd.DataFrame(
            {
                "bucket": bucket,
                "n_first": first.astype("int64"),
                "n_second": (~first).astype("int64"),
            }
        )
        out = df.groupby("bucket", as_index=False).sum()
        return pa.Table.from_pandas(
            out.astype(
                {"bucket": "int64", "n_first": "int64", "n_second": "int64"}
            ),
            preserve_index=False,
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bucket", as_index=False).sum()
        out["abs_diff"] = (out["n_first"] - out["n_second"]).abs()
        return out.astype(
            {
                "bucket": "int64", "n_first": "int64",
                "n_second": "int64", "abs_diff": "int64",
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "bucket", final
    )


def q219_encoding_advisor(sf_dir: str):
    """DICTIONARY-ENCODING ADVISOR — the Parquet writer's per-column
    decision as data: for each string column of `documents`, row count,
    distinct count, plain storage cost (Σ value length), dictionary
    cost (Σ distinct-value lengths + 4·rows for the codes), and the
    verdict. Distinct counting exchanges (column, fp, len) triples —
    the value's length rides with its fingerprint (same value → same
    length), so neither pass moves the values themselves. Final
    combine is a 3-row pandas join on the driver (column-bounded)."""
    MASK = (1 << 63) - 1
    COLS = ["text", "lang", "source"]
    ds = _read(sf_dir, "documents", columns=COLS)

    from basicocr_ray.stages.wide import coarse_group_reduce

    def fp_partial(b: pa.Table) -> pa.Table:
        seen: set = set()
        plain: dict[str, list[int]] = {c: [0, 0] for c in COLS}
        for row in zip(*[b[c].to_pylist() for c in COLS]):
            for c, v in zip(COLS, row):
                v = v if v is not None else ""
                plain[c][0] += 1
                plain[c][1] += len(v)
                seen.add((c, _md5_low64(v) & MASK, len(v)))
        rows = sorted(seen)
        t1 = pa.table(
            {
                "col": pa.array([r[0] for r in rows], pa.string()),
                "fp": pa.array([r[1] for r in rows], pa.int64()),
                "vlen": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        return t1

    def plain_partial(b: pa.Table) -> pa.Table:
        out_c, out_n, out_l = [], [], []
        for c in COLS:
            vals = b[c].to_pylist()
            out_c.append(c)
            out_n.append(len(vals))
            out_l.append(sum(len(v) if v is not None else 0 for v in vals))
        return pa.table(
            {
                "col": pa.array(out_c, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "plain_chars": pa.array(out_l, pa.int64()),
            }
        )

    def uniq_reduce(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["col", "fp"])
        out = d.groupby("col", as_index=False).agg(
            n_distinct=("fp", "size"), dist_chars=("vlen", "sum")
        )
        return out.astype({"n_distinct": "int64", "dist_chars": "int64"})

    uniq = coarse_group_reduce(
        ds.map_batches(fp_partial, batch_format="pyarrow"),
        ["col", "fp"],
        uniq_reduce,
    ).to_pandas()  # ≤ #columns × #salts rows
    uniq = uniq.groupby("col", as_index=False).sum()

    plain = (
        ds.map_batches(plain_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("col", as_index=False)
        .sum()
    )

    out = plain.merge(uniq, on="col")
    out["dict_cost"] = out["dist_chars"] + 4 * out["n"]
    out["use_dict"] = (out["dict_cost"] < out["plain_chars"]).astype(
        "int64"
    )
    return out.astype(
        {
            "n": "int64", "plain_chars": "int64", "n_distinct": "int64",
            "dist_chars": "int64", "dict_cost": "int64",
        }
    )[["col", "n", "plain_chars", "n_distinct", "dist_chars",
       "dict_cost", "use_dict"]]


def q220_next_event_baseline(sf_dir: str):
    """NEXT-EVENT MAJORITY BASELINE — the accuracy floor any sequence
    model must beat: from per-user (current → next) transition counts
    (the q111 relation), predict the modal next type per current type;
    evidence = per current type: total transitions and the modal count
    (accuracy = n_correct / n_total is the derived epilogue, and the
    modal COUNT is tie-free even when the argmax type is tied)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        nxt = g.groupby("user_id")["event_type"].shift(-1)
        out = pd.DataFrame(
            {"cur": g["event_type"], "nxt": nxt}
        ).dropna().groupby(["cur", "nxt"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        return out.astype({"n": "int64"})

    trans = coarse_group_reduce(ds, "user_id", pairs)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["cur", "nxt"], as_index=False)["n"].sum()
        out = agg.groupby("cur", as_index=False).agg(
            n_total=("n", "sum"), n_correct=("n", "max")
        )
        return out.astype({"n_total": "int64", "n_correct": "int64"})

    return coarse_group_reduce(trans, "cur", fold)


def q221_dedup_savings(sf_dir: str):
    """DEDUP SAVINGS ESTIMATE — the business case for the dedup stage,
    computed entirely on the FINGERPRINT relation (same text → same
    token count, so the per-fp row carries multiplicity + one token
    count and the corpus never re-tokenizes survivors): one row with
    docs, distinct docs, whitespace tokens before dedup, and tokens
    after keep-one-per-text dedup."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for t in b["text"].to_pylist():
            t = t if t is not None else ""
            fp = _md5_low64(t) & MASK
            a = acc.setdefault(fp, [0, len(t.split())])
            a[0] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "fp": pa.array(ks, pa.int64()),
                "n_dups": pa.array([acc[k][0] for k in ks], pa.int64()),
                "tok_cnt": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("fp", as_index=False).agg(
            n_dups=("n_dups", "sum"), tok_cnt=("tok_cnt", "first")
        )
        return pd.DataFrame(
            {
                "n_docs": pd.array([int(g["n_dups"].sum())], dtype="int64"),
                "n_unique": pd.array([len(g)], dtype="int64"),
                "tokens_all": pd.array(
                    [int((g["n_dups"] * g["tok_cnt"]).sum())],
                    dtype="int64"),
                "tokens_unique": pd.array(
                    [int(g["tok_cnt"].sum())], dtype="int64"),
            }
        )

    partials = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "fp", fold
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                c: pd.array([int(df[c].sum())], dtype="int64")
                for c in ["n_docs", "n_unique", "tokens_all",
                          "tokens_unique"]
            }
        )

    return (
        partials.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q222_fd_discovery(sf_dir: str):
    """FUNCTIONAL-DEPENDENCY DISCOVERY (the Metanome-style profiling
    pass a schema-inference tool runs): for every ordered column pair
    (A → B) over (lang, source, n_chars-band), the FD holds iff
    |distinct A| = |distinct (A, B)|; the violation magnitude is their
    difference. Distinct counts exchange fingerprints of the value
    pairs only — one coarse dedup per candidate, all six candidates in
    ONE batch pass."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    COLS = ["lang", "source", "band"]

    def partial(b: pa.Table) -> pa.Table:
        vals = {
            "lang": [v if v is not None else "" for v in
                     b["lang"].to_pylist()],
            "source": [v if v is not None else "" for v in
                       b["source"].to_pylist()],
            "band": [str(v // 100) for v in b["n_chars"].to_pylist()],
        }
        seen: set = set()
        n = len(vals["lang"])
        for i in range(n):
            for a in COLS:
                seen.add((f"{a}", _md5_low64(vals[a][i]) & MASK))
                for bcol in COLS:
                    if a == bcol:
                        continue
                    seen.add(
                        (
                            f"{a}>{bcol}",
                            _md5_low64(
                                vals[a][i] + "\x1f" + vals[bcol][i]
                            ) & MASK,
                        )
                    )
        rows = sorted(seen)
        return pa.table(
            {
                "key": pa.array([r[0] for r in rows], pa.string()),
                "fp": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = d.groupby("key", as_index=False).agg(n=("fp", "size"))
        return out.astype({"n": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), ["key", "fp"], uniq
    ).to_pandas()  # ≤ (3 + 6) × #salts rows — metadata
    counts = counts.groupby("key", as_index=False)["n"].sum()
    cmap = dict(zip(counts["key"], counts["n"]))

    rows = []
    for a in COLS:
        for bcol in COLS:
            if a == bcol:
                continue
            n_lhs = int(cmap[a])
            n_pair = int(cmap[f"{a}>{bcol}"])
            rows.append(
                (a, bcol, n_lhs, n_pair,
                 1 if n_lhs == n_pair else 0, n_pair - n_lhs)
            )
    return pd.DataFrame(
        {
            "lhs": pd.array([r[0] for r in rows], dtype="object"),
            "rhs": pd.array([r[1] for r in rows], dtype="object"),
            "n_lhs": pd.array([r[2] for r in rows], dtype="int64"),
            "n_pair": pd.array([r[3] for r in rows], dtype="int64"),
            "fd_holds": pd.array([r[4] for r in rows], dtype="int64"),
            "violations": pd.array([r[5] for r in rows], dtype="int64"),
        }
    )


def q223_join_stats_moments(sf_dir: str):
    """FREQUENCY-MOMENT JOIN STATISTICS (the AMS F0/F1/F2 suite an
    optimizer keeps per join key): for orders and lineitem on the order
    key — per side F0 (distinct keys), F1 (rows), F2 (Σ n(k)² = the
    SELF-join size), plus the exact cross-join size Σ n_o·n_l (q196's
    statistic, here alongside its moment family). All from per-key
    count relations; rows never meet."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def count_side(src, key):
        def partial(b: pa.Table) -> pa.Table:
            t = b.group_by(key).aggregate([([], "count_all")])
            return pa.table(
                {
                    "k": pc.cast(t[key], pa.int64()),
                    "n": pc.cast(t["count_all"], pa.int64()),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            m = df.groupby("k", as_index=False)["n"].sum()
            return m.astype({"k": "int64", "n": "int64"})

        return coarse_group_reduce(
            src.map_batches(partial, batch_format="pyarrow"), "k", merge
        ).materialize()

    co = count_side(orders, "o_orderkey")
    cl = count_side(lineitem, "l_orderkey")

    def side_moments(cnts, side):
        def m(b: pa.Table) -> pa.Table:
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "side": pa.array([side], pa.string()),
                    "f0": pa.array([len(n)], pa.int64()),
                    "f1": pa.array([int(n.sum())], pa.int64()),
                    "f2": pa.array([int((n * n).sum())], pa.int64()),
                }
            )

        return cnts.map_batches(m, batch_format="pyarrow")

    cross = bucketed_hash_join(
        co.map_batches(
            lambda b: pa.table({"k": b["k"], "n_o": b["n"]}),
            batch_format="pyarrow",
        ),
        cl.map_batches(
            lambda b: pa.table({"k": b["k"], "n_l": b["n"]}),
            batch_format="pyarrow",
        ),
        key="k", left_columns=["n_o"], right_columns=["n_l"],
    ).map_batches(
        lambda b: pa.table(
            {
                "side": pa.array(["cross"], pa.string()),
                "f0": pa.array([len(b)], pa.int64()),
                "f1": pa.array([0], pa.int64()),
                "f2": pa.array(
                    [
                        int(
                            (
                                b["n_o"].to_numpy(zero_copy_only=False)
                                .astype(np.int64)
                                * b["n_l"].to_numpy(zero_copy_only=False)
                                .astype(np.int64)
                            ).sum()
                        )
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    allm = side_moments(co, "orders").union(
        side_moments(cl, "lineitem")
    ).union(cross)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("side", as_index=False).agg(
            f0=("f0", "sum"), f1=("f1", "sum"), f2=("f2", "sum")
        )
        return out.astype({"f0": "int64", "f1": "int64", "f2": "int64"})

    return (
        allm.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q224_json_profile(sf_dir: str):
    """SEMI-STRUCTURED SCHEMA PROFILING over the `props` JSON column —
    the discovery pass a lakehouse runs before promoting JSON to typed
    columns: per key, presence count, integer-parse count, and the
    exact integer value sum (the promotion evidence). Per-batch
    json.loads (stdlib, stateless) into per-key partials; a bounded
    key-cardinality reduce."""
    import json

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["props"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for p in b["props"].to_pylist():
            if not p:
                continue
            try:
                obj = json.loads(p)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            for k, v in obj.items():
                a = acc.setdefault(k, [0, 0, 0])
                a[0] += 1
                if isinstance(v, int) and not isinstance(v, bool):
                    a[1] += 1
                    a[2] += v
        ks = sorted(acc)
        return pa.table(
            {
                "key": pa.array(ks, pa.string()),
                "n_present": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_int": pa.array([acc[k][1] for k in ks], pa.int64()),
                "sum_int": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("key", as_index=False).sum()
        return out.astype(
            {"n_present": "int64", "n_int": "int64", "sum_int": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "key", final
    )


def q225_assoc_rules(sf_dir: str):
    """ASSOCIATION RULES over document token sets (the market-basket
    layer q208's 3-token lattice samples): every DIRECTED rule a → b
    with co-occurrence support ≥ 20 docs, with the exact confidence
    evidence (n_ab, n_ant). Shape: each doc emits C(k,2) distinct-token
    pairs (k = per-doc distinct tokens — the per-basket bound that
    makes Apriori tractable), pair counts and token doc-frequencies
    reduce independently, and ONE bucketed join on the antecedent
    attaches n_ant — no vocabulary centralizes."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    MIN_SUPP = 20
    ds = _read(sf_dir, "documents", columns=["text"])

    def pair_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t in b["text"].to_pylist():
            if not t:
                continue
            toks = sorted(set(token_items(t)))
            for i in range(len(toks)):
                for j in range(i + 1, len(toks)):
                    k = (toks[i], toks[j])
                    acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "a": pa.array([k[0] for k in ks], pa.string()),
                "b": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def pair_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False)["n"].sum()
        out = out[out["n"] >= MIN_SUPP]
        return out.astype({"n": "int64"}).reset_index(drop=True)

    pairs = coarse_group_reduce(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["a", "b"],
        pair_merge,
    )

    def df_partial(b: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for t in b["text"].to_pylist():
            if not t:
                continue
            for tok in set(token_items(t)):
                acc[tok] = acc.get(tok, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "tok": pa.array(ks, pa.string()),
                "df_cnt": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def df_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("tok", as_index=False)["df_cnt"].sum()
        return out.astype({"df_cnt": "int64"})

    dfreq = coarse_group_reduce(
        ds.map_batches(df_partial, batch_format="pyarrow"), "tok", df_merge
    )

    # directed rules: (a→b) and (b→a) from each unordered pair
    def directed(b: pa.Table) -> pa.Table:
        a = b["a"].to_pylist()
        bb = b["b"].to_pylist()
        n = b["n"].to_pylist()
        return pa.table(
            {
                "ant": pa.array(a + bb, pa.string()),
                "cons": pa.array(bb + a, pa.string()),
                "n_ab": pa.array(n + n, pa.int64()),
            }
        )

    rules = pairs.map_batches(directed, batch_format="pyarrow")
    out = bucketed_hash_join(
        rules,
        dfreq.map_batches(
            lambda b: pa.table(
                {"ant": b["tok"], "n_ant": pc.cast(b["df_cnt"], pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        key="ant", left_columns=["cons", "n_ab"], right_columns=["n_ant"],
    )
    return out


def q226_fairness_evidence(sf_dir: str):
    """JAIN'S FAIRNESS INDEX evidence over per-host load (the scheduler
    -audit scalar): with x_h = events on host (user mod 32), Jain =
    (Σx)² / (n·Σx²) — the output is the exact integer triple
    (n_hosts, sum_x, sum_x2); the index is a derived epilogue. Host
    counts fold in a bounded aggregate; three scalars shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        hosts = (
            np.asarray(b["user_id"].to_pylist(), dtype=np.int64) % 32
        )
        df = pd.DataFrame({"host": hosts})
        out = df.groupby("host", as_index=False).size().rename(
            columns={"size": "x"}
        )
        return pa.Table.from_pandas(
            out.astype({"host": "int64", "x": "int64"}),
            preserve_index=False,
        )

    per_host = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")  # bounded: 32 keys
        .aggregate(Sum("x", alias_name="x"))
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        x = df["x"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "n_hosts": pd.array([len(x)], dtype="int64"),
                "sum_x": pd.array([int(x.sum())], dtype="int64"),
                "sum_x2": pd.array([int((x * x).sum())], dtype="int64"),
            }
        )

    return (
        per_host.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q227_erasure_plan(sf_dir: str):
    """CROSS-TABLE ERASURE PLAN (the GDPR/right-to-be-forgotten
    manifest): the deletion set doc_id ≡ 0 mod 101 cascades from
    `documents` to the `embeddings` rows keyed by the same id; per
    table the plan reports row count and an order-insensitive XOR
    digest of the doomed rows (the q165 checksum — the executor can
    verify the erasure touched exactly these rows). Per-batch partials
    carry one row per table; ids and digests move, payloads don't."""
    ds_docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds_emb = _read(sf_dir, "embeddings", columns=["vec_id"])

    MASK = (1 << 63) - 1

    def docs_partial(b: pa.Table) -> pa.Table:
        n, chk = 0, 0
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            if did % 101 != 0:
                continue
            n += 1
            chk ^= _md5_low64(
                f"{did}:{t if t is not None else ''}"
            ) & MASK
        return pa.table(
            {
                "tbl": pa.array(["documents"], pa.string()),
                "n_rows": pa.array([n], pa.int64()),
                "chk": pa.array([chk], pa.int64()),
            }
        )

    def emb_partial(b: pa.Table) -> pa.Table:
        n, chk = 0, 0
        for vid in b["vec_id"].to_pylist():
            if vid % 101 != 0:
                continue
            n += 1
            chk ^= _md5_low64(str(vid)) & MASK
        return pa.table(
            {
                "tbl": pa.array(["embeddings"], pa.string()),
                "n_rows": pa.array([n], pa.int64()),
                "chk": pa.array([chk], pa.int64()),
            }
        )

    parts = ds_docs.map_batches(
        docs_partial, batch_format="pyarrow"
    ).union(ds_emb.map_batches(emb_partial, batch_format="pyarrow"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for tbl, g in df.groupby("tbl"):
            chk = 0
            for v in g["chk"]:
                chk ^= int(v)
            rows.append((tbl, int(g["n_rows"].sum()), chk))
        return pd.DataFrame(
            {
                "tbl": pd.array([r[0] for r in rows], dtype="object"),
                "n_rows": pd.array([r[1] for r in rows], dtype="int64"),
                "chk": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return (
        parts.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: final(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q228_familiarity_score(sf_dir: str):
    """CORPUS-FAMILIARITY SCORE per document — the integer core of
    LM-perplexity quality ranking (CCNet's "how typical is this doc"
    signal without the float log): each document's bigrams join the
    corpus bigram-count table, and the doc reports n_bigrams plus the
    exact Σ corpus-count over its bigrams (high mass ⇔ formulaic/
    familiar text; the per-bigram ratio is a derived epilogue). One
    bucketed hash join on the bigram string — the count table never
    broadcasts, the q48 open-vocabulary discipline."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import (
        coarse_group_reduce, count_terms, make_ngram_items,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    corpus = count_terms(ds, "text", make_ngram_items(2), "bigram")

    def explode(b: pa.Table) -> pa.Table:
        out_d, out_g = [], []
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            if not t:
                continue
            for g in make_ngram_items(2)(t):
                out_d.append(did)
                out_g.append(g)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "bigram": pa.array(out_g, pa.string()),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_hash_join(
        pairs, corpus, key="bigram",
        left_columns=["doc_id"], right_columns=["cnt"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).agg(
            n_bigrams=("cnt", "size"), mass=("cnt", "sum")
        )
        return out.astype(
            {"doc_id": "int64", "n_bigrams": "int64", "mass": "int64"}
        )

    return coarse_group_reduce(joined, "doc_id", fold)


def q229_rle_estimate(sf_dir: str):
    """DISTRIBUTED RUN-LENGTH ESTIMATE — the RLE-encoding size a
    columnar writer predicts for the `lang` column in doc_id order:
    runs = value CHANGES + 1, computed without a global sort-scan:
    each 64-id bucket counts its internal changes and exports its
    (first, last) boundary values (metadata); the driver stitches
    buckets by comparing adjacent boundaries — the distributed
    adjacency primitive. Output: n_rows, n_runs."""
    from basicocr_ray.core.collect import collect_rows

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def bucket_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": np.asarray(
                    b["doc_id"].to_pylist(), dtype=np.int64
                ),
                "lang": [
                    v if v is not None else ""
                    for v in b["lang"].to_pylist()
                ],
            }
        ).sort_values("doc_id", kind="mergesort")
        df = df.assign(rb=df["doc_id"] // 64)
        rows = []
        for rb, g in df.groupby("rb"):
            vals = g["lang"].to_numpy()
            changes = int((vals[1:] != vals[:-1]).sum())
            rows.append(
                (
                    int(rb), len(g), changes,
                    int(g["doc_id"].iloc[0]), vals[0],
                    int(g["doc_id"].iloc[-1]), vals[-1],
                )
            )
        return pa.table(
            {
                "rb": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "changes": pa.array([r[2] for r in rows], pa.int64()),
                "lo_id": pa.array([r[3] for r in rows], pa.int64()),
                "lo_v": pa.array([r[4] for r in rows], pa.string()),
                "hi_id": pa.array([r[5] for r in rows], pa.int64()),
                "hi_v": pa.array([r[6] for r in rows], pa.string()),
            }
        )

    # bucket summaries are metadata-sized; stitch on the driver
    frags: dict[int, list] = {}
    for row in collect_rows(
        ds.map_batches(bucket_partial, batch_format="pyarrow")
    ):
        frags.setdefault(int(row["rb"]), []).append(row)

    n_rows = 0
    n_changes = 0
    bounds = {}
    for rb, parts in frags.items():
        # a bucket may split across read batches: stitch its fragments
        parts.sort(key=lambda r: r["lo_id"])
        n_rows += sum(r["n"] for r in parts)
        n_changes += sum(r["changes"] for r in parts)
        for a, b in zip(parts, parts[1:]):
            if a["hi_v"] != b["lo_v"]:
                n_changes += 1
        bounds[rb] = (parts[0]["lo_v"], parts[-1]["hi_v"])
    # stitch consecutive buckets in id order (sparse ids just make the
    # "next" bucket non-adjacent — the comparison is the same)
    rbs = sorted(bounds)
    for a, b in zip(rbs, rbs[1:]):
        if bounds[a][1] != bounds[b][0]:
            n_changes += 1

    return pd.DataFrame(
        {
            "n_rows": pd.array([n_rows], dtype="int64"),
            "n_runs": pd.array(
                [n_changes + 1 if n_rows else 0], dtype="int64"),
        }
    )


def q230_tukey_outliers(sf_dir: str):
    """TUKEY-FENCE OUTLIER COUNTS per source — the boxplot audit with
    EXACT discrete quartiles (`grouped_quantile_disc`, the two-pass
    histogram refinement — no per-group sort): fences at Q1 − 3·IQR/2
    and Q3 + 3·IQR/2 on 2·n_chars (doubled so the 3/2 stays integer);
    output per source n, q1_2x, q3_2x and the counts outside each
    fence. The quartile relation is group-sized and broadcasts into
    the counting scan."""
    from basicocr_ray.stages.wide import grouped_quantile_disc

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def doubled(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "x2": pc.multiply(
                    pc.cast(b["n_chars"], pa.int64()), 2
                ),
            }
        )

    d2 = ds.map_batches(doubled, batch_format="pyarrow")
    q1 = grouped_quantile_disc(
        d2, "source", "x2", 1, 4, out_name="q1_2x"
    ).to_pandas()
    q3 = grouped_quantile_disc(
        d2, "source", "x2", 3, 4, out_name="q3_2x"
    ).to_pandas()
    fences = q1.merge(q3, on="source")
    fences["lo"] = fences["q1_2x"] - 3 * (
        fences["q3_2x"] - fences["q1_2x"]
    ) // 2
    fences["hi"] = fences["q3_2x"] + 3 * (
        fences["q3_2x"] - fences["q1_2x"]
    ) // 2
    fmap = {
        r["source"]: (int(r["lo"]), int(r["hi"]),
                      int(r["q1_2x"]), int(r["q3_2x"]))
        for _, r in fences.iterrows()
    }  # source-bounded: broadcast in the closure

    def count_out(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for src, x in zip(
            b["source"].to_pylist(), b["n_chars"].to_pylist()
        ):
            lo, hi, _, _ = fmap[src]
            a = acc.setdefault(src, [0, 0, 0])
            a[0] += 1
            if 2 * x < lo:
                a[1] += 1
            elif 2 * x > hi:
                a[2] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "source": pa.array(ks, pa.string()),
                "n": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_low": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_high": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    from basicocr_ray.stages.wide import coarse_group_reduce

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", as_index=False).sum()
        out["q1_2x"] = [fmap[s][2] for s in out["source"]]
        out["q3_2x"] = [fmap[s][3] for s in out["source"]]
        return out.astype(
            {
                "n": "int64", "n_low": "int64", "n_high": "int64",
                "q1_2x": "int64", "q3_2x": "int64",
            }
        )

    return coarse_group_reduce(
        ds.map_batches(count_out, batch_format="pyarrow"), "source", fold
    )


def q231_two_hop_paths(sf_dir: str):
    """TWO-HOP PATH COUNTS on the q153 citation-style doc graph — the
    friends-of-friends expansion an entity-resolution or recommender
    pass runs: paths(v) = Σ_{v→m} outdeg(m), computed by joining the
    edge relation against the out-degree relation on the MIDDLE vertex
    (one bucketed hash join; degrees are a node-sized relation, never
    broadcast). Directed edges i → {(i+1), (i+2), (3i+1)} mod N,
    deduplicated; output per source vertex the exact 2-path count."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        srcs = np.concatenate([i, i, i])
        dsts = np.concatenate(
            [(i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs]
        )
        df = pd.DataFrame({"src": srcs, "dst": dsts}).drop_duplicates()
        return pa.Table.from_pandas(
            df.astype({"src": "int64", "dst": "int64"}),
            preserve_index=False,
        )

    edge_ds = ds.map_batches(edges, batch_format="pyarrow")

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().reset_index(drop=True)

    # materialized because TWO consumers (degrees + the join's left
    # side) read it — object-store blocks, spillable, never the driver
    uniq_edges = coarse_group_reduce(
        edge_ds, ["src", "dst"], dedup_edges
    ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        t = b.group_by("src").aggregate([([], "count_all")])
        return pa.table(
            {
                "mid": pc.cast(t["src"], pa.int64()),
                "outdeg": pc.cast(t["count_all"], pa.int64()),
            }
        )

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("mid", as_index=False)["outdeg"].sum()
        return out.astype({"mid": "int64", "outdeg": "int64"})

    degrees = coarse_group_reduce(
        uniq_edges.map_batches(deg_partial, batch_format="pyarrow"),
        "mid",
        deg_merge,
    )

    joined = bucketed_hash_join(
        uniq_edges.map_batches(
            lambda b: pa.table(
                {"mid": pc.cast(b["dst"], pa.int64()), "src": b["src"]}
            ),
            batch_format="pyarrow",
        ),
        degrees,
        key="mid", left_columns=["src"], right_columns=["outdeg"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("src", as_index=False).agg(
            n_2paths=("outdeg", "sum")
        )
        return out.astype({"src": "int64", "n_2paths": "int64"})

    return coarse_group_reduce(joined, "src", fold)


def q232_norm_histogram(sf_dir: str):
    """EMBEDDING NORM SPECTRUM per label — the geometry sanity check
    before cosine vs dot decisions, hash-exact via per-dim
    quantization: q_i = floor(1e3·x_i) is an exact int, so ‖q‖² is an
    exact integer whose 10⁵-wide bucket is engine-identical (no float
    norm ever compares). Output per (label, bucket): count. One numpy
    pass per batch; a bounded (labels × buckets) reduce."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    W = 100_000
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        labels = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Q = np.floor(V * 1e3).astype(np.int64)
        n2 = (Q * Q).sum(axis=1)
        df = pd.DataFrame({"label": labels, "bucket": n2 // W})
        out = df.groupby(["label", "bucket"], as_index=False).size().rename(
            columns={"size": "n"}
        )
        return pa.Table.from_pandas(
            out.astype({"label": "int64", "bucket": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["label", "bucket"], as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "bucket"],
        final,
    )


def q233_session_paths(sf_dir: str):
    """SESSIONIZED PATH MINING — the top event-type PATHS of length 3
    WITHIN sessions (q17's 30-minute-gap windows), the clickstream
    pattern report q111's global transitions can't give because a path
    must not straddle a session boundary. Per coarse user group:
    session ids by one gap-cumsum, two shifts build the trigram paths,
    local counts; a bounded path-keyed reduce and a top-10 by (count
    desc, path asc) finish."""
    from basicocr_ray.stages.wide import coarse_group_reduce, top_k

    GAP_US = 30 * 60 * 1_000_000
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        t = g["ts"].astype("datetime64[us]").astype("int64")
        gap = t.groupby(g["user_id"]).diff()
        new_sess = gap.isna() | (gap > GAP_US)
        sess = new_sess.cumsum()  # globally unique session ids in-group
        et = g["event_type"]
        e1 = et.groupby(sess).shift(-1)
        e2 = et.groupby(sess).shift(-2)
        ok = e1.notna() & e2.notna()
        path = et[ok] + ">" + e1[ok] + ">" + e2[ok]
        out = (
            pd.DataFrame({"path": path})
            .groupby("path", as_index=False).size()
            .rename(columns={"size": "n"})
        )
        return out.astype({"n": "int64"})

    per_group = coarse_group_reduce(ds, "user_id", paths)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("path", as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    counts = coarse_group_reduce(per_group, "path", merge)
    return top_k(counts, 10, "n", "path")


def q234_type_distance_matrix(sf_dir: str):
    """PAIRWISE DISTRIBUTION-DISTANCE MATRIX between event types — the
    metric-clustering input (which metrics behave alike): per type a
    width-50 value histogram; per type pair the exact L1 distance
    Σ_bucket |n_a − n_b| plus both masses. The histogram relation is
    (types × buckets)-bounded, so the pairwise fold is one tiny pass;
    rows never shuffle — only per-batch bucket partials."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "bucket": np.floor(
                    np.asarray(b["value"].to_pylist(), dtype=np.float64)
                    / 50.0
                ).astype(np.int64),
            }
        )
        out = df.groupby(
            ["event_type", "bucket"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"bucket": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "bucket"], as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    hist = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket"],
        merge,
    )

    def matrix(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["event_type", "bucket"], as_index=False)["n"].sum()
        piv = agg.pivot_table(
            index="bucket", columns="event_type", values="n", fill_value=0
        )
        types = sorted(piv.columns)
        rows = []
        for i, a in enumerate(types):
            for b2 in types[i + 1:]:
                l1 = int((piv[a] - piv[b2]).abs().sum())
                rows.append(
                    (a, b2, l1, int(piv[a].sum()), int(piv[b2].sum()))
                )
        return pd.DataFrame(
            {
                "type_a": pd.array([r[0] for r in rows], dtype="object"),
                "type_b": pd.array([r[1] for r in rows], dtype="object"),
                "l1": pd.array([r[2] for r in rows], dtype="int64"),
                "n_a": pd.array([r[3] for r in rows], dtype="int64"),
                "n_b": pd.array([r[4] for r in rows], dtype="int64"),
            }
        )

    return (
        hist.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")  # (types × buckets)-bounded relation
        .map_groups(
            lambda df: matrix(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q235_seasonality_peak(sf_dir: str):
    """HOUR-OF-WEEK SEASONALITY PEAKS — the traffic heatmap's headline
    per event type: counts per (day-of-week, hour) cell (both derived
    by exact integer epoch arithmetic — the Unix epoch is a Thursday,
    dow = (days + 4) mod 7), and the peak cell with the earliest
    (dow, hour) tie-break. The cell relation is 168·types-bounded."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        days = ts_us // DAY_US
        dow = (days + 4) % 7
        hour = (ts_us % DAY_US) // HOUR_US
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "dow": dow,
                "hour": hour,
            }
        )
        out = df.groupby(
            ["event_type", "dow", "hour"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"dow": "int64", "hour": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def peak(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(
            ["event_type", "dow", "hour"], as_index=False
        )["n"].sum()
        rows = []
        for et, g in agg.groupby("event_type"):
            g = g.sort_values(
                ["n", "dow", "hour"], ascending=[False, True, True],
                kind="mergesort",
            )
            top = g.iloc[0]
            rows.append(
                (et, int(top["dow"]), int(top["hour"]), int(top["n"]),
                 int(g["n"].sum()))
            )
        return pd.DataFrame(
            {
                "event_type": pd.array(
                    [r[0] for r in rows], dtype="object"),
                "peak_dow": pd.array([r[1] for r in rows], dtype="int64"),
                "peak_hour": pd.array([r[2] for r in rows], dtype="int64"),
                "peak_n": pd.array([r[3] for r in rows], dtype="int64"),
                "total": pd.array([r[4] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        "event_type",
        peak,
    )


def q236_char_profile(sf_dir: str):
    """CHARACTER-CLASS COMPOSITION per language — the mojibake/quality
    profile (letters / digits / spaces / other) with exact integer
    counts, classes chosen from the Python-re ∩ RE2 common subset
    ([a-z], [0-9], the literal space — the q148 engine-parity
    discipline) over the lowercased text. Per-batch vectorized counts;
    a bounded per-lang reduce."""
    import re as _re

    from basicocr_ray.stages.wide import coarse_group_reduce

    RE_L = _re.compile(r"[a-z]")
    RE_D = _re.compile(r"[0-9]")

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            t = (t if t is not None else "").lower()
            lang = lang if lang is not None else ""
            a = acc.setdefault(lang, [0, 0, 0, 0])
            nl = len(RE_L.findall(t))
            nd = len(RE_D.findall(t))
            ns = t.count(" ")
            a[0] += len(t)
            a[1] += nl
            a[2] += nd
            a[3] += ns
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n_chars": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_letters": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_digits": pa.array([acc[k][2] for k in ks], pa.int64()),
                "n_spaces": pa.array([acc[k][3] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        out["n_other"] = (
            out["n_chars"] - out["n_letters"] - out["n_digits"]
            - out["n_spaces"]
        )
        return out.astype({c: "int64" for c in out.columns if c != "lang"})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q237_max_drawdown(sf_dir: str):
    """MAXIMUM DRAWDOWN per user — the risk metric's sequential scan
    unrolled (the q202/q213 discipline, third member of the family):
    dd_i = running_max(c) − c_i over cents in (ts, event_id) order, so
    the whole thing is one cummax per coarse user group and a window
    MAX in SQL. Output per user: peak drawdown, the event where it is
    first realized (earliest by order), and the series peak."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    )

    def drawdown(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        c = pd.Series(
            np.floor(g["value"].to_numpy(dtype=np.float64) * 100)
            .astype(np.int64)
        )
        peak = c.groupby(g["user_id"]).cummax()
        dd = peak - c
        g = g.assign(dd=dd.astype("int64"), peak=peak.astype("int64"))
        rows = []
        for u, sub in g.groupby("user_id"):
            mx = int(sub["dd"].max())
            first = sub[sub["dd"] == mx].iloc[0]
            rows.append(
                (int(u), mx, int(first["event_id"]),
                 int(sub["peak"].max()))
            )
        return pd.DataFrame(
            {
                "user_id": pd.array([r[0] for r in rows], dtype="int64"),
                "max_dd": pd.array([r[1] for r in rows], dtype="int64"),
                "at_event": pd.array([r[2] for r in rows], dtype="int64"),
                "peak_cents": pd.array(
                    [r[3] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(ds, "user_id", drawdown)


def q238_series_corr_evidence(sf_dir: str):
    """ALIGNED-SERIES CORRELATION EVIDENCE between event types — the
    Pearson moment sums over hourly count vectors on a COMMON grid
    (q234's L1 is the distribution view; this is the time-co-movement
    view): per type pair, n grid cells, Σa, Σb, Σab, Σa², Σb² — all
    integer counts, correlation is the derived epilogue. The hourly
    count relation is (types × hours)-bounded; the pairwise fold is
    one pass over its pivot."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "hour": ts_us - ts_us % HOUR_US,
            }
        )
        out = df.groupby(
            ["event_type", "hour"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"hour": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "hour"], as_index=False)["n"].sum()
        return out.astype({"n": "int64"})

    hourly = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"],
        merge,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["event_type", "hour"], as_index=False)["n"].sum()
        piv = agg.pivot_table(
            index="hour", columns="event_type", values="n", fill_value=0
        )
        types = sorted(piv.columns)
        rows = []
        for i, a in enumerate(types):
            va = piv[a].to_numpy(dtype=np.int64)
            for b2 in types[i + 1:]:
                vb = piv[b2].to_numpy(dtype=np.int64)
                rows.append(
                    (
                        a, b2, len(piv), int(va.sum()), int(vb.sum()),
                        int((va * vb).sum()), int((va * va).sum()),
                        int((vb * vb).sum()),
                    )
                )
        return pd.DataFrame(
            {
                "type_a": pd.array([r[0] for r in rows], dtype="object"),
                "type_b": pd.array([r[1] for r in rows], dtype="object"),
                "n_cells": pd.array([r[2] for r in rows], dtype="int64"),
                "sa": pd.array([r[3] for r in rows], dtype="int64"),
                "sb": pd.array([r[4] for r in rows], dtype="int64"),
                "sab": pd.array([r[5] for r in rows], dtype="int64"),
                "saa": pd.array([r[6] for r in rows], dtype="int64"),
                "sbb": pd.array([r[7] for r in rows], dtype="int64"),
            }
        )

    return (
        hourly.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")  # (types × hours)-bounded relation
        .map_groups(
            lambda df: moments(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q239_keyness_terms(sf_dir: str):
    """KEYNESS TERMS per language — the distinctive-vocabulary report
    (corpus linguistics' log-odds keyness, ranked WITHOUT the float:
    token t is more distinctive for lang L than t' iff
    n_in·T_out − n_out·T_in is larger — the exact cross-multiplied
    integer the log-odds ratio orders by at equal totals): per lang
    the top-5 tokens by that score (ties: token asc), with the full
    evidence (n_in, n_out, T_in, T_out). Per-(lang, token) counts
    reduce exactly; per-token lang vectors meet in their own hash
    group to emit in/out splits; a per-lang top-k prune finishes."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def tok_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            if not t or lang is None:
                continue
            for tok in token_items(t):
                k = (tok, lang)
                acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "token": pa.array([k[0] for k in ks], pa.string()),
                "lang": pa.array([k[1] for k in ks], pa.string()),
                "cnt": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def tok_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["token", "lang"], as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token", "lang"],
        tok_merge,
    ).materialize()

    # per-lang total masses: lang-bounded partials, driver dict
    from basicocr_ray.core.collect import collect_rows

    totals: dict[str, int] = {}
    for row in collect_rows(
        counts.map_batches(
            lambda b: b.group_by("lang").aggregate([("cnt", "sum")])
            .rename_columns(["lang", "cnt"]),
            batch_format="pyarrow",
        )
    ):
        totals[row["lang"]] = totals.get(row["lang"], 0) + int(row["cnt"])
    T = sum(totals.values())

    def in_out(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["token", "lang"], as_index=False)["cnt"].sum()
        tok_tot = agg.groupby("token")["cnt"].transform("sum")
        agg = agg.assign(n_in=agg["cnt"], n_out=tok_tot - agg["cnt"])
        agg["t_in"] = [totals[g] for g in agg["lang"]]
        agg["t_out"] = T - agg["t_in"]
        agg["score"] = (
            agg["n_in"] * agg["t_out"] - agg["n_out"] * agg["t_in"]
        )
        return agg[
            ["lang", "token", "n_in", "n_out", "t_in", "t_out", "score"]
        ].astype(
            {
                "n_in": "int64", "n_out": "int64", "t_in": "int64",
                "t_out": "int64", "score": "int64",
            }
        )

    scored = coarse_group_reduce(counts, "token", in_out)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["lang", "score", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby("lang").head(5).reset_index(drop=True)

    return coarse_group_reduce(scored, "lang", topk)


def q240_debounce_audit(sf_dir: str):
    """DEBOUNCE AUDIT — how many events a 5-minute per-(user, type)
    suppression window would have dropped (the rate-limiter sizing
    question before turning it on): an event is SUPPRESSED if the
    previous same-key event is ≤ 5 minutes before it (the lag
    formulation — window-expressible, unlike true chained debounce).
    Output per event type: total events, suppressed count, and the
    affected-user count. One lag per coarse (user)-grouped sort;
    per-type partials reduce bounded."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    WIN_US = 5 * 60 * 1_000_000
    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "event_type", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        t = g["ts"].astype("datetime64[us]").astype("int64")
        prev = t.groupby([g["user_id"], g["event_type"]]).shift(1)
        sup = (t - prev) <= WIN_US
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "sup": sup.fillna(False).astype("int64"),
            }
        )
        per_ut = out.groupby(
            ["event_type", "user_id"], as_index=False
        ).agg(n=("sup", "size"), n_sup=("sup", "sum"))
        res = per_ut.groupby("event_type", as_index=False).agg(
            n_events=("n", "sum"),
            n_suppressed=("n_sup", "sum"),
            n_users_affected=("n_sup", lambda s: int((s > 0).sum())),
        )
        return res.astype(
            {
                "n_events": "int64", "n_suppressed": "int64",
                "n_users_affected": "int64",
            }
        )

    # group by user: all of a user's events land together, so per-
    # (user, type) lags are exact; per-type partials then fold
    per_group = coarse_group_reduce(ds, "user_id", audit)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).sum()
        return out.astype(
            {
                "n_events": "int64", "n_suppressed": "int64",
                "n_users_affected": "int64",
            }
        )

    return coarse_group_reduce(per_group, "event_type", merge)


def q241_repartition_manifest(sf_dir: str):
    """CHECKSUM-VERIFIED REPARTITION MANIFEST — the artifact a
    weighted range repartition (q185) ships with: per planned part,
    row count, total weight, covered id range AND the q165
    order-insensitive XOR digest of the member rows — so the executor
    of the plan can prove every row landed in its assigned range.
    Same metadata-offset shape as q185 with the digest folded into
    the same pass."""
    from basicocr_ray.core.collect import collect_rows
    from basicocr_ray.stages.wide import coarse_group_reduce

    S = 8
    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def add_rb(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        digs = [
            _md5_low64(f"{i}:{t if t is not None else ''}") & MASK
            for i, t in zip(
                b["doc_id"].to_pylist(), b["text"].to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "wt": pc.cast(b["n_chars"], pa.int64()),
                "digest": pa.array(digs, pa.int64()),
                "rb": pa.array(ids // 64, pa.int64()),
            }
        )

    body = ds.map_batches(add_rb, batch_format="pyarrow").materialize()

    totals: dict[int, int] = {}
    for row in collect_rows(
        body.map_batches(
            lambda b: b.group_by("rb").aggregate([("wt", "sum")])
            .rename_columns(["rb", "v"]),
            batch_format="pyarrow",
        )
    ):
        totals[int(row["rb"])] = totals.get(int(row["rb"]), 0) + int(row["v"])
    W = sum(totals.values())
    target = (W + S - 1) // S
    offsets: dict[int, int] = {}
    acc = 0
    for rb in sorted(totals):
        offsets[rb] = acc
        acc += totals[rb]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        w = df["wt"].to_numpy(dtype=np.int64)
        pre = offsets[int(df["rb"].iloc[0])] + np.cumsum(w) - w
        df = df.assign(part=(pre // target).astype("int64"))
        rows = []
        for part, g in df.groupby("part"):
            chk = 0
            for v in g["digest"]:
                chk ^= int(v)
            rows.append(
                (int(part), len(g), int(g["wt"].sum()),
                 int(g["doc_id"].min()), int(g["doc_id"].max()), chk)
            )
        return pd.DataFrame(
            {
                "part": pd.array([r[0] for r in rows], dtype="int64"),
                "n_docs": pd.array([r[1] for r in rows], dtype="int64"),
                "tot_weight": pd.array(
                    [r[2] for r in rows], dtype="int64"),
                "id_lo": pd.array([r[3] for r in rows], dtype="int64"),
                "id_hi": pd.array([r[4] for r in rows], dtype="int64"),
                "chk": pd.array([r[5] for r in rows], dtype="int64"),
            }
        )

    partials = body.groupby("rb").map_groups(assign, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for part, g in df.groupby("part"):
            chk = 0
            for v in g["chk"]:
                chk ^= int(v)
            rows.append(
                (int(part), int(g["n_docs"].sum()),
                 int(g["tot_weight"].sum()), int(g["id_lo"].min()),
                 int(g["id_hi"].max()), chk)
            )
        return pd.DataFrame(
            {
                "part": pd.array([r[0] for r in rows], dtype="int64"),
                "n_docs": pd.array([r[1] for r in rows], dtype="int64"),
                "tot_weight": pd.array(
                    [r[2] for r in rows], dtype="int64"),
                "id_lo": pd.array([r[3] for r in rows], dtype="int64"),
                "id_hi": pd.array([r[4] for r in rows], dtype="int64"),
                "chk": pd.array([r[5] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(partials, "part", merge)


def q242_freq_spectrum(sf_dir: str):
    """TOKEN FREQUENCY SPECTRUM per language — the Zipf diagnostic
    (how many types live in each frequency octave [2^k, 2^{k+1})) plus
    each octave's token mass; the count-of-counts relation that q206's
    coverage scan walks, surfaced as the artifact itself. The octave
    is an exact bit-length, so both engines bucket identically."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def tok_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            if not t or lang is None:
                continue
            for tok in token_items(t):
                k = (lang, tok)
                acc[k] = acc.get(k, 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "token": pa.array([k[1] for k in ks], pa.string()),
                "cnt": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def tok_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "token"], as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["lang", "token"],
        tok_merge,
    )

    def spectrum_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "cnt": b["cnt"].to_pylist(),
            }
        )
        df["octave"] = [int(c).bit_length() - 1 for c in df["cnt"]]
        out = df.groupby(["lang", "octave"], as_index=False).agg(
            n_types=("cnt", "size"), mass=("cnt", "sum")
        )
        return pa.Table.from_pandas(
            out.astype(
                {"octave": "int64", "n_types": "int64", "mass": "int64"}
            ),
            preserve_index=False,
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "octave"], as_index=False).sum()
        return out.astype({"n_types": "int64", "mass": "int64"})

    return coarse_group_reduce(
        counts.map_batches(spectrum_partial, batch_format="pyarrow"),
        ["lang", "octave"],
        final,
    )


def q243_first_relevant_rank(sf_dir: str):
    """FIRST-RELEVANT RANK — the MRR/recall eval's integer core: for
    every query vector (vec_id ≡ 0 mod 10), rank candidates by the
    exact quantized integer dot (the q182 discipline — no float enters
    the driver hash; ties break on cand_id asc) and report the 1-based
    rank of the first candidate sharing the query's LABEL (the
    relevance proxy), or −1 if none. Two bounded passes instead of an
    n×q pair shuffle: pass A reduces each batch to ≤1 champion row per
    query (the batch's best relevant candidate), pass B broadcasts the
    per-query champion (dot*, id*) and counts candidates strictly
    ahead of it — shuffle traffic is O(queries) per batch in both
    passes, and the driver holds only the probe-set-sized results
    (the same O(q) footprint as the broadcast query matrix itself)."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    qlabels = np.asarray(qsel["label"].to_pylist(), dtype=np.int64)
    Qq = np.floor(
        np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64) * 1e3
    ).astype(np.int64)
    qref = ray.put((qids, qlabels, Qq))
    I64_MIN = np.iinfo(np.int64).min
    I64_MAX = np.iinfo(np.int64).max

    def _batch_dots(b: pa.Table, Qq_b: np.ndarray):
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        clab = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        Vq = np.floor(
            np.asarray(b["embedding"].to_pylist(), dtype=np.float64) * 1e3
        ).astype(np.int64)
        return cids, clab, Vq @ Qq_b.T  # dots: (batch, queries)

    # ---- pass A: per-query champion relevant candidate -----------------
    def champion_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, qlab, Qq_b = _ray.get(qref)
        cids, clab, dots = _batch_dots(b, Qq_b)
        relok = (clab[:, None] == qlab[None, :]) & (
            cids[:, None] != ids_np[None, :]
        )
        best = np.where(relok, dots, I64_MIN).max(axis=0)
        has = relok.any(axis=0)
        tie = relok & (dots == best[None, :])
        best_id = np.where(tie, cids[:, None], I64_MAX).min(axis=0)
        return pa.table(
            {
                "query_id": pa.array(ids_np[has], pa.int64()),
                "dot": pa.array(best[has], pa.int64()),
                "cand_id": pa.array(best_id[has], pa.int64()),
            }
        )

    def champion_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["query_id", "dot", "cand_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby("query_id", as_index=False).first()

    ds_a = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                                "label"])
    champs = coarse_group_reduce(
        ds_a.map_batches(champion_partial, batch_format="pyarrow"),
        "query_id", champion_final,
    ).to_pandas()

    d_star = np.full(len(qids), I64_MIN, dtype=np.int64)
    id_star = np.full(len(qids), I64_MAX, dtype=np.int64)
    has_rel = np.zeros(len(qids), dtype=bool)
    pos = {int(q): i for i, q in enumerate(qids)}
    for q, d, c in champs[["query_id", "dot", "cand_id"]].itertuples(
        index=False
    ):
        i = pos[int(q)]
        d_star[i], id_star[i], has_rel[i] = int(d), int(c), True
    thr_ref = ray.put((qids, d_star, id_star, has_rel))

    # ---- pass B: count candidates ahead of the champion ----------------
    def ahead_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, qlab, Qq_b = _ray.get(qref)
        tids, td, tc, thas = _ray.get(thr_ref)
        cids, clab, dots = _batch_dots(b, Qq_b)
        valid = cids[:, None] != tids[None, :]
        ahead = (dots > td[None, :]) | (
            (dots == td[None, :]) & (cids[:, None] < tc[None, :])
        )
        n = (ahead & valid).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "query_id": pa.array(tids[thas], pa.int64()),
                "n_ahead": pa.array(n[thas], pa.int64()),
            }
        )

    def ahead_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("query_id", as_index=False)["n_ahead"].sum()
        return out.astype({"query_id": "int64", "n_ahead": "int64"})

    ds_b = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                                "label"])
    counts = coarse_group_reduce(
        ds_b.map_batches(ahead_partial, batch_format="pyarrow"),
        "query_id", ahead_final,
    ).to_pandas()

    rank = np.full(len(qids), -1, dtype=np.int64)
    for q, n in counts[["query_id", "n_ahead"]].itertuples(index=False):
        rank[pos[int(q)]] = int(n) + 1
    return pd.DataFrame(
        {
            "query_id": pd.array(qids, dtype="int64"),
            "first_rel_rank": pd.array(rank, dtype="int64"),
        }
    )


def q244_time_in_state(sf_dir: str):
    """TIME-IN-STATE attribution — the state-machine analytics metric
    (how long users SIT in each state): the whole-second gap to the
    next event is attributed to the CURRENT event's type (q192's TWAP
    weights values; this attributes the time itself); last events
    contribute 0. Output per event type: transitions out (gaps
    counted) and total attributed seconds."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        t = g["ts"].astype("datetime64[us]").astype("int64")
        nxt = t.groupby(g["user_id"]).shift(-1)
        dt_s = ((nxt - t) // 1_000_000).fillna(0).astype("int64")
        has_next = nxt.notna().astype("int64")
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_gaps": has_next,
                "dwell_s": dt_s,
            }
        ).groupby("event_type", as_index=False).sum()
        return out.astype({"n_gaps": "int64", "dwell_s": "int64"})

    per_group = coarse_group_reduce(ds, "user_id", attribute)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).sum()
        return out.astype({"n_gaps": "int64", "dwell_s": "int64"})

    return coarse_group_reduce(per_group, "event_type", merge)


def q245_catalog_digest(sf_dir: str):
    """CATALOG DIGEST — the migration smoke artifact both engines
    compute first: per table, the distributed row count, the column
    count, and an order-sensitive md5-low-63 digest of the column-name
    list (schema drift shows up before any value does). Row counts are
    per-batch partials; schemas are file metadata (driver-side,
    bounded by the catalog size)."""
    import ray.data

    TABLES = ["documents", "events", "embeddings", "orders", "lineitem"]
    MASK = (1 << 63) - 1

    rows = []
    for tbl in TABLES:
        schema = pq.read_schema(_p(sf_dir, tbl))
        names = list(schema.names)
        dig = _md5_low64(",".join(names)) & MASK
        n = ray.data.read_parquet(
            _p(sf_dir, tbl), columns=[names[0]]
        ).count()
        rows.append((tbl, int(n), len(names), dig))
    return pd.DataFrame(
        {
            "tbl": pd.array([r[0] for r in rows], dtype="object"),
            "n_rows": pd.array([r[1] for r in rows], dtype="int64"),
            "n_cols": pd.array([r[2] for r in rows], dtype="int64"),
            "schema_chk": pd.array([r[3] for r in rows], dtype="int64"),
        }
    )


def q246_promo_revenue_share(sf_dir: str):
    """PROMO REVENUE SHARE — TPC-H Q14 re-expressed on this schema:
    per ship month, the exact cents of revenue from PROMO-type parts
    vs all revenue (the share itself is a division the consumer does —
    only integers enter the driver hash). The part dimension reduces
    to ONE BIT per partkey: a sorted int64 partkey array of promo
    parts is ray.put ONCE and probed with np.searchsorted inside every
    batch — no shuffle touches the fact table beyond the bounded
    month rollup."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ptab = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pk = np.asarray(ptab["p_partkey"].to_pylist(), dtype=np.int64)
    is_promo = np.asarray(
        pc.equal(ptab["p_type"], "PROMO").to_pylist(), dtype=bool
    )
    promo_keys = np.sort(pk[is_promo])
    pref = ray.put(promo_keys)

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        promo = _ray.get(pref)
        keys = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(promo, keys)
        idx[idx >= len(promo)] = max(len(promo) - 1, 0)
        hit = (
            promo[idx] == keys if len(promo) else np.zeros(len(keys), bool)
        )
        month = (
            pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False) * 100
            + pc.month(b["l_shipdate"]).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = np.floor(
            b["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - b["l_discount"].combine_chunks().to_numpy())
            * 100.0
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "ship_month": month,
                "promo_cents": np.where(hit, cents, 0),
                "total_cents": cents,
                "n_lines": np.ones(len(keys), dtype=np.int64),
            }
        ).groupby("ship_month", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("ship_month", as_index=False).sum()
        return out.astype(
            {
                "ship_month": "int64", "promo_cents": "int64",
                "total_cents": "int64", "n_lines": "int64",
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "ship_month", final
    )


def q247_slow_orders(sf_dir: str):
    """SLOW-ORDER PRIORITY AUDIT — TPC-H Q4's EXISTS semi-join on this
    schema: orders with at least one line shipped more than 90 days
    after the order date, counted per priority (plus the earliest such
    orderkey as evidence). Both sides are fact-scale, so the join is
    the single-shuffle bucketed hash join with the per-order ANY and
    the per-priority partial count FUSED into the bucket task — the
    driver sees five rows."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAYS90_US = 90 * 86_400 * 1_000_000

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pa.table(
            {
                "okey": b["l_orderkey"],
                "ship_us": pc.cast(
                    pc.cast(b["l_shipdate"], pa.timestamp("us")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b["o_orderkey"],
                "odate_us": pc.cast(
                    pc.cast(b["o_orderdate"], pa.timestamp("us")), pa.int64()
                ),
                "prio": b["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )

    def bucket_agg(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_slow_orders": pa.array([], pa.int64()),
                    "first_orderkey": pa.array([], pa.int64()),
                }
            )
        df = tbl.to_pandas()
        df["slow"] = df["ship_us"] > df["odate_us"] + DAYS90_US
        per_order = df.groupby(["okey", "prio"], as_index=False)["slow"].any()
        hit = per_order[per_order["slow"]]
        out = hit.groupby("prio", as_index=False).agg(
            n_slow_orders=("okey", "size"), first_orderkey=("okey", "min")
        )
        return pa.table(
            {
                "o_orderpriority": pa.array(out["prio"], pa.string()),
                "n_slow_orders": pa.array(
                    out["n_slow_orders"].astype("int64"), pa.int64()
                ),
                "first_orderkey": pa.array(
                    out["first_orderkey"].astype("int64"), pa.int64()
                ),
            }
        )

    joined = bucketed_hash_join(
        li, od, "okey", ["ship_us"], ["odate_us", "prio"],
        bucket_post_fn=bucket_agg,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderpriority", as_index=False).agg(
            n_slow_orders=("n_slow_orders", "sum"),
            first_orderkey=("first_orderkey", "min"),
        )
        return out.astype(
            {"n_slow_orders": "int64", "first_orderkey": "int64"}
        )

    return coarse_group_reduce(joined, "o_orderpriority", final)


def q248_supplier_diversity(sf_dir: str):
    """SUPPLIER DIVERSITY — TPC-H Q16 re-expressed without partsupp:
    per (p_brand, p_size), the number of DISTINCT suppliers observed
    shipping that part in lineitem, excluding credit-watch suppliers
    (s_acctbal < 1000 — the schema's stand-in for Q16's complaint
    filter). Part attrs and the exclusion set are broadcast
    dimensions; each batch pre-dedups to its distinct (brand, size,
    suppkey) triples so shuffle traffic is bounded by the
    dimension-cross product, never the fact row count."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ptab = pq.read_table(
        _p(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = np.asarray(ptab["p_partkey"].to_pylist(), dtype=np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    brands = np.asarray(ptab["p_brand"].to_pylist(), dtype=object)[order]
    sizes = np.asarray(
        ptab["p_size"].to_pylist(), dtype=np.int64
    )[order]
    stab = pq.read_table(
        _p(sf_dir, "supplier"), columns=["s_suppkey", "s_acctbal"]
    )
    bad = np.sort(
        np.asarray(
            stab.filter(pc.less(stab["s_acctbal"], 1000.0))["s_suppkey"]
            .to_pylist(),
            dtype=np.int64,
        )
    )
    dref = ray.put((pk, brands, sizes, bad))

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def triples(b: pa.Table) -> pa.Table:
        import ray as _ray

        pkeys, pbrand, psize, badkeys = _ray.get(dref)
        keys = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        supp = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(badkeys):
            bi = np.searchsorted(badkeys, supp)
            bi[bi >= len(badkeys)] = len(badkeys) - 1
            keep = badkeys[bi] != supp
            keys, supp = keys[keep], supp[keep]
        pi = np.searchsorted(pkeys, keys)
        df = pd.DataFrame(
            {
                "p_brand": pbrand[pi],
                "p_size": psize[pi],
                "suppkey": supp.astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["p_brand", "p_size"], as_index=False).agg(
            n_supp=("suppkey", "nunique")
        )
        return out.astype({"p_size": "int64", "n_supp": "int64"})

    return coarse_group_reduce(
        ds.map_batches(triples, batch_format="pyarrow"),
        ["p_brand", "p_size"],
        final,
    )


def q249_bow_dup_groups(sf_dir: str):
    """BAG-OF-WORDS DUP GROUPS — order-insensitive exact dedup (the
    gap between q10's byte-exact and q22's near-dup): signature =
    md5-low-63 of the sorted DISTINCT token set, groups with ≥2 docs
    reported with size + earliest member. Shuffle carries (sig,
    doc_id) only — never text — and the signature groupby rides the
    coarse-salt exchange like the rest of the dedup family."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def sig_batch(b: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if t is None:
                continue
            ids.append(did)
            sigs.append(
                _md5_low64(" ".join(sorted(set(token_items(t))))) & MASK
            )
        return pa.table(
            {
                "sig": pa.array(sigs, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sig", as_index=False).agg(
            n_docs=("doc_id", "size"), first_doc=("doc_id", "min")
        )
        g = g[g["n_docs"] >= 2]
        return g.astype(
            {"sig": "int64", "n_docs": "int64", "first_doc": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(sig_batch, batch_format="pyarrow"), "sig", final
    )


def q250_readability_evidence(sf_dir: str):
    """READABILITY EVIDENCE per language — the integer components a
    Flesch-style score divides (words/sentences, vowel-groups/words)
    WITHOUT the division: docs, whitespace words, non-empty [.!?]+
    sentence segments, and [aeiou]+ vowel groups (the engine-portable
    syllable proxy). Compiled regexes, per-doc kernel (the same
    irreducible per-record compute class as extraction), bounded
    per-lang rollup."""
    import re as _re

    from basicocr_ray.stages.wide import coarse_group_reduce

    SENT_RE = _re.compile(r"[.!?]+")
    VOWEL_RE = _re.compile(r"[aeiou]+")
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for t, lang in zip(b["text"].to_pylist(), b["lang"].to_pylist()):
            if t is None or lang is None:
                continue
            a = acc.setdefault(lang, [0, 0, 0, 0])
            a[0] += 1
            a[1] += len(token_items(t))
            a[2] += sum(1 for s in SENT_RE.split(t) if s != "")
            a[3] += len(VOWEL_RE.findall(t.lower()))
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n_docs": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_words": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n_sentences": pa.array([acc[k][2] for k in ks], pa.int64()),
                "n_vowel_groups": pa.array(
                    [acc[k][3] for k in ks], pa.int64()
                ),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        return out.astype(
            {
                "n_docs": "int64", "n_words": "int64",
                "n_sentences": "int64", "n_vowel_groups": "int64",
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q251_order_cadence(sf_dir: str):
    """ORDER CADENCE per customer — the CRM re-engagement metric:
    order count, lifetime cents, and the LOWER-MEDIAN whole-day gap
    between consecutive orders (index (m−1)//2 of the sorted gap list
    — an exact integer both engines select identically; −1 for
    single-order customers). Orders co-locate per customer on the
    coarse exchange; each group computes its gaps vectorized."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"]
    )

    def cadence(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        ).reset_index(drop=True)
        t = g["o_orderdate"].astype("datetime64[us]").astype("int64")
        cents = np.floor(
            g["o_totalprice"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        rows = []
        start = 0
        cust = g["o_custkey"].to_numpy()
        for i in range(1, len(g) + 1):
            if i == len(g) or cust[i] != cust[start]:
                tt = t.iloc[start:i].to_numpy()
                gaps = np.sort((tt[1:] - tt[:-1]) // DAY_US)
                med = int(gaps[(len(gaps) - 1) // 2]) if len(gaps) else -1
                rows.append(
                    (int(cust[start]), i - start,
                     int(cents[start:i].sum()), med)
                )
                start = i
        return pd.DataFrame(
            {
                "custkey": pd.array([r[0] for r in rows], dtype="int64"),
                "n_orders": pd.array([r[1] for r in rows], dtype="int64"),
                "total_cents": pd.array([r[2] for r in rows], dtype="int64"),
                "median_gap_days": pd.array(
                    [r[3] for r in rows], dtype="int64"
                ),
            }
        )

    return coarse_group_reduce(ds, "o_custkey", cadence)


def q252_rfm_segments(sf_dir: str):
    """RFM SEGMENTATION — the classic CRM cube with EXACT integer
    tercile thresholds: per customer R = whole days from last order to
    the corpus max date, F = order count, M = lifetime cents; each
    metric bucketed at the ceil(n/3)/ceil(2n/3) order statistics
    (grouped_quantile_disc — the q60/q99 two-pass histogram machinery,
    no global sort), then the ≤27-cell segment rollup. The customer-dim
    RFM relation is materialized ONCE and scanned by the six quantile
    probes + the bucket pass."""
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        grouped_quantile_disc,
    )

    DAY_US = 86_400_000_000
    ds = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    gmax_us = int(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "t": pa.array(
                        [
                            pc.max(
                                pc.cast(
                                    pc.cast(
                                        b["o_orderdate"], pa.timestamp("us")
                                    ),
                                    pa.int64(),
                                )
                            ).as_py()
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).max("t")
    )

    def rfm(df: pd.DataFrame) -> pd.DataFrame:
        t = df["o_orderdate"].astype("datetime64[us]").astype("int64")
        cents = np.floor(
            df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        g = pd.DataFrame(
            {"custkey": df["o_custkey"], "t": t, "cents": cents}
        ).groupby("custkey", as_index=False).agg(
            last_t=("t", "max"), f_orders=("t", "size"),
            m_cents=("cents", "sum"),
        )
        g["r_days"] = (gmax_us - g["last_t"]) // DAY_US
        return g[["custkey", "r_days", "f_orders", "m_cents"]].astype(
            {
                "custkey": "int64", "r_days": "int64",
                "f_orders": "int64", "m_cents": "int64",
            }
        )

    rfm_ds = coarse_group_reduce(ds, "o_custkey", rfm).materialize()

    one = rfm_ds.map_batches(
        lambda b: b.append_column(
            "g", pa.array(np.zeros(len(b), dtype=np.int32))
        ),
        batch_format="pyarrow",
    )
    thr = {}
    for col in ("r_days", "f_orders", "m_cents"):
        t1 = int(
            collect_rows(grouped_quantile_disc(one, "g", col, 1, 3))[0][
                "q_value"
            ]
        )
        t2 = int(
            collect_rows(grouped_quantile_disc(one, "g", col, 2, 3))[0][
                "q_value"
            ]
        )
        thr[col] = (t1, t2)

    def bucketize(b: pa.Table) -> pa.Table:
        out = {}
        for col, seg in (
            ("r_days", "r_seg"), ("f_orders", "f_seg"), ("m_cents", "m_seg")
        ):
            v = b[col].combine_chunks().to_numpy(zero_copy_only=False)
            t1, t2 = thr[col]
            out[seg] = np.where(v <= t1, 0, np.where(v <= t2, 1, 2)).astype(
                np.int64
            )
        out["n_customers"] = np.ones(b.num_rows, dtype=np.int64)
        return pa.table(out)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["r_seg", "f_seg", "m_seg"], as_index=False
        )["n_customers"].sum()
        return out.astype({"n_customers": "int64"})

    return coarse_group_reduce(
        rfm_ds.map_batches(bucketize, batch_format="pyarrow"),
        ["r_seg", "f_seg", "m_seg"],
        final,
    )


def q253_neighborhood_purity(sf_dir: str):
    """ANN NEIGHBORHOOD PURITY@10 — the embedding-space label-
    coherence eval: for each query vector (vec_id ≡ 0 mod 10), how
    many of its top-10 neighbors by exact int-quantized dot (ties on
    cand_id asc) share its label. Per-batch LOCAL top-10 per query is
    the only thing shuffled (≤ 10·|queries| rows per batch — the q15
    brute-force discipline with the q182 integer ranking)."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    qlabels = np.asarray(qsel["label"].to_pylist(), dtype=np.int64)
    Qq = np.floor(
        np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64) * 1e3
    ).astype(np.int64)
    qref = ray.put((qids, qlabels, Qq))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding",
                                              "label"])

    def local_topk(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, qlab, Qq_b = _ray.get(qref)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        clab = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        Vq = np.floor(
            np.asarray(b["embedding"].to_pylist(), dtype=np.float64) * 1e3
        ).astype(np.int64)
        dots = Vq @ Qq_b.T
        out_q, out_d, out_c, out_s = [], [], [], []
        for j, qid in enumerate(ids_np):
            ok = cids != qid
            col, sid, slab = dots[ok, j], cids[ok], clab[ok]
            top = np.lexsort((sid, -col))[:10]
            out_q.extend([int(qid)] * len(top))
            out_d.extend(col[top].tolist())
            out_c.extend(sid[top].tolist())
            out_s.extend((slab[top] == qlab[j]).astype(np.int64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "dot": pa.array(out_d, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "same": pa.array(out_s, pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["dot", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(10)
            rows.append((int(qid), int(g["same"].sum()), len(g)))
        return pd.DataFrame(
            {
                "query_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_same_label": pd.array(
                    [r[1] for r in rows], dtype="int64"
                ),
                "k_used": pd.array([r[2] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(local_topk, batch_format="pyarrow"),
        "query_id", final,
    )


def q254_dq_constraint_suite(sf_dir: str):
    """DATA-QUALITY CONSTRAINT SUITE — the Deequ/Great-Expectations
    verification artifact: five declarative constraints over events
    (completeness, value range, payload pattern, type set membership,
    key uniqueness) evaluated in ONE vectorized pass plus one keyed
    exchange for uniqueness; per rule: rows checked, violations, and
    the earliest offending event_id (−1 when clean). Zeros are
    evidence too — the suite proves the corpus passes."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    OK_TYPES = {"click", "view", "signup", "purchase", "error"}
    ds = _read(
        sf_dir, "events",
        columns=["event_id", "value", "props", "event_type"],
    )

    def flags(b: pa.Table) -> pa.Table:
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = b["value"].combine_chunks().to_numpy(zero_copy_only=False)
        props = b["props"].to_pylist()
        etype = b["event_type"].to_pylist()
        viol = {
            "completeness_props": np.array(
                [p is None for p in props], dtype=bool
            ),
            "range_value_0_300": (val < 0) | (val > 300),
            "pattern_props_object": np.array(
                [p is not None and not p.startswith("{") for p in props],
                dtype=bool,
            ),
            "set_event_type": np.array(
                [t not in OK_TYPES for t in etype], dtype=bool
            ),
        }
        rules, checked, nviol, first = [], [], [], []
        for rule, m in viol.items():
            rules.append(rule)
            checked.append(len(eid))
            nviol.append(int(m.sum()))
            first.append(int(eid[m].min()) if m.any() else -1)
        return pa.table(
            {
                "rule": pa.array(rules, pa.string()),
                "n_checked": pa.array(checked, pa.int64()),
                "n_violations": pa.array(nviol, pa.int64()),
                "first_bad_id": pa.array(first, pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        def mmin(s):
            pos = s[s >= 0]
            return int(pos.min()) if len(pos) else -1

        out = df.groupby("rule", as_index=False).agg(
            n_checked=("n_checked", "sum"),
            n_violations=("n_violations", "sum"),
            first_bad_id=("first_bad_id", mmin),
        )
        return out.astype(
            {
                "n_checked": "int64", "n_violations": "int64",
                "first_bad_id": "int64",
            }
        )

    scalar_rules = coarse_group_reduce(
        ds.map_batches(flags, batch_format="pyarrow"), "rule", merge
    ).to_pandas()

    # uniqueness: keyed exchange; ids with multiplicity >= 2 violate
    def id_counts(b: pa.Table) -> pa.Table:
        eid = b["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        u, c = np.unique(eid, return_counts=True)
        return pa.table(
            {
                "event_id": pa.array(u.astype(np.int64), pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def dup_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_id", as_index=False)["cnt"].sum()
        d = g[g["cnt"] >= 2]
        return pd.DataFrame(
            {
                "n_total": pd.array([int(g["cnt"].sum())], dtype="int64"),
                "n_dup": pd.array([int(d["cnt"].sum())], dtype="int64"),
                "first_dup": pd.array(
                    [int(d["event_id"].min()) if len(d) else -1],
                    dtype="int64",
                ),
            }
        )

    dup = coarse_group_reduce(
        ds.map_batches(id_counts, batch_format="pyarrow"),
        "event_id", dup_stats,
    ).to_pandas()
    firsts = dup["first_dup"][dup["first_dup"] >= 0]
    uniq_row = pd.DataFrame(
        {
            "rule": ["unique_event_id"],
            "n_checked": pd.array([int(dup["n_total"].sum())], dtype="int64"),
            "n_violations": pd.array(
                [int(dup["n_dup"].sum())], dtype="int64"
            ),
            "first_bad_id": pd.array(
                [int(firsts.min()) if len(firsts) else -1], dtype="int64"
            ),
        }
    )
    return pd.concat([scalar_rules, uniq_row], ignore_index=True)


def q255_bm25_evidence(sf_dir: str):
    """BM25 COMPONENT EVIDENCE — everything a BM25 scorer divides,
    for a deterministic probe set (per lang: top-3 tokens by corpus
    tf, ties token asc): total tf, doc frequency, the lang's doc
    count and token mass. All integers — the idf/length-norm floats
    are the consumer's. One corpus scan builds (lang, token,
    tf, df) partials; the materialized count table feeds BOTH the
    probe top-3 and the lang token-mass rollup; lang doc counts are a
    column-pruned second scan."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def tok_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, list[int]] = {}
        for t, lang in zip(b["text"].to_pylist(), b["lang"].to_pylist()):
            if t is None or lang is None:
                continue
            cnt: dict[str, int] = {}
            for tok in token_items(t):
                cnt[tok] = cnt.get(tok, 0) + 1
            for tok, c in cnt.items():
                a = acc.setdefault((lang, tok), [0, 0])
                a[0] += c
                a[1] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "token": pa.array([k[1] for k in ks], pa.string()),
                "tf": pa.array([acc[k][0] for k in ks], pa.int64()),
                "df": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    def tok_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "token"], as_index=False).sum()
        return out.astype({"tf": "int64", "df": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["lang", "token"],
        tok_merge,
    ).materialize()

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang"):
            g = g.sort_values(
                ["tf", "token"], ascending=[False, True], kind="mergesort"
            ).head(3)
            rows.append(g)
        return pd.concat(rows, ignore_index=True) if rows else df.iloc[:0]

    probe = coarse_group_reduce(counts, "lang", top3).to_pandas()

    def mass(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).agg(
            lang_tokens=("tf", "sum")
        )
        return out.astype({"lang_tokens": "int64"})

    lang_tokens = coarse_group_reduce(counts, "lang", mass).to_pandas()

    def doc_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(b["text"]), pc.is_valid(b["lang"])
        )
        sel = b.filter(m)
        df = pd.DataFrame({"lang": sel["lang"].to_pylist()})
        out = df.groupby("lang", as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(out["lang"], pa.string()),
                "lang_docs": pa.array(
                    out["size"].astype("int64"), pa.int64()
                ),
            }
        )

    def doc_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False)["lang_docs"].sum()
        return out.astype({"lang_docs": "int64"})

    lang_docs = coarse_group_reduce(
        _read(sf_dir, "documents", columns=["text", "lang"]).map_batches(
            doc_partial, batch_format="pyarrow"
        ),
        "lang", doc_merge,
    ).to_pandas()

    out = probe.rename(columns={"token": "term", "tf": "tf_total"})
    out = out.merge(lang_tokens, on="lang").merge(lang_docs, on="lang")
    return out[
        ["lang", "term", "tf_total", "df", "lang_docs", "lang_tokens"]
    ].astype(
        {
            "tf_total": "int64", "df": "int64",
            "lang_docs": "int64", "lang_tokens": "int64",
        }
    )


def q256_freshness_report(sf_dir: str):
    """FRESHNESS / HEARTBEAT REPORT per event type — the pipeline-ops
    staleness artifact: event count, whole-second lag of the type's
    last event behind the corpus max, and the LARGEST inter-event gap
    (−1 for single-event types). The gap needs a per-type total order
    — instead of dragging a whole type into one task, each (type,
    hour) bucket reduces to (n, min, max, max internal gap) and the
    driver merges the BOUNDED bucket chain per type (boundary gaps =
    next bucket's min − previous bucket's max, which also spans empty
    hours)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    HOUR_US = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.divide(t, HOUR_US),
                "t": t,
            }
        )

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (et, hr), grp in df.groupby(["event_type", "hour"]):
            tt = np.sort(grp["t"].to_numpy())
            mig = int((tt[1:] - tt[:-1]).max()) if len(tt) > 1 else -1
            rows.append((et, int(hr), len(tt), int(tt[0]), int(tt[-1]), mig))
        return pd.DataFrame(
            {
                "event_type": [r[0] for r in rows],
                "hour": pd.array([r[1] for r in rows], dtype="int64"),
                "n": pd.array([r[2] for r in rows], dtype="int64"),
                "t_min": pd.array([r[3] for r in rows], dtype="int64"),
                "t_max": pd.array([r[4] for r in rows], dtype="int64"),
                "gap_in": pd.array([r[5] for r in rows], dtype="int64"),
            }
        )

    buckets = coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "hour"],
        bucket_stats,
    ).to_pandas()

    gmax = int(buckets["t_max"].max())
    rows = []
    for et, g in buckets.groupby("event_type"):
        g = g.sort_values("hour")
        n = int(g["n"].sum())
        gap = int(g["gap_in"].max())
        bmax = g["t_max"].to_numpy()
        bmin = g["t_min"].to_numpy()
        if len(g) > 1:
            gap = max(gap, int((bmin[1:] - bmax[:-1]).max()))
        rows.append(
            (
                et, n, (gmax - int(bmax[-1])) // 1_000_000,
                gap // 1_000_000 if gap >= 0 else -1,
            )
        )
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "n_events": pd.array([r[1] for r in rows], dtype="int64"),
            "last_seen_lag_s": pd.array(
                [r[2] for r in rows], dtype="int64"
            ),
            "max_gap_s": pd.array([r[3] for r in rows], dtype="int64"),
        }
    )


def q257_daily_value_bands(sf_dir: str):
    """DAILY VALUE BANDS — the ops-dashboard percentile ribbon: per
    (event_type, day), the EXACT p50/p90 order statistics of the
    cents-quantized value (positions ceil(n/2) / ceil(9n/10) — the
    grouped_quantile_disc two-pass histogram, no per-group sort) plus
    the count. Composite groups ride a derived key column."""
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        grouped_quantile_disc,
    )

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        day = pc.divide(t, DAY_US)
        cents = pc.cast(
            pc.floor(pc.multiply(b["value"], 100.0)), pa.int64()
        )
        gk = pc.binary_join_element_wise(
            pc.cast(b["event_type"], pa.string()),
            pc.cast(day, pa.string()),
            "|",
        )
        return pa.table(
            {"gk": gk, "event_type": b["event_type"], "day": day,
             "cents": cents}
        )

    base = ds.map_batches(prep, batch_format="pyarrow").materialize()

    p50 = {
        r["gk"]: int(r["q_value"])
        for r in collect_rows(grouped_quantile_disc(base, "gk", "cents", 1, 2))
    }
    p90 = {
        r["gk"]: int(r["q_value"])
        for r in collect_rows(grouped_quantile_disc(base, "gk", "cents", 9, 10))
    }

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["gk", "event_type", "day"], as_index=False).size()
        out = out.rename(columns={"size": "n_events"})
        return out.astype({"day": "int64", "n_events": "int64"})

    counts = coarse_group_reduce(base, "gk", cnt).to_pandas()
    counts["p50_cents"] = pd.array(
        [p50[k] for k in counts["gk"]], dtype="int64"
    )
    counts["p90_cents"] = pd.array(
        [p90[k] for k in counts["gk"]], dtype="int64"
    )
    return counts[
        ["event_type", "day", "n_events", "p50_cents", "p90_cents"]
    ]


def q258_split_leakage(sf_dir: str):
    """SPLIT LEAKAGE AUDIT — the train/eval contamination check run
    before any training export (q75's decontamination targets a known
    eval set; this audits the engine's OWN q81 hash split): for every
    split pair, the number of bag-of-words duplicate groups (q249
    signatures) with members on BOTH sides, plus each side's doc
    count inside those groups. Shuffle carries (sig, split, n) —
    bounded by the signature cardinality, output by the 3 pairs."""
    from basicocr_ray.stages.sample import hash_split
    from basicocr_ray.stages.wide import coarse_group_reduce

    MASK = (1 << 63) - 1
    ds = hash_split(
        _read(sf_dir, "documents", columns=["doc_id", "text"]), "doc_id"
    )

    def sig_partial(b: pa.Table) -> pa.Table:
        acc: dict[tuple, int] = {}
        for t, sp in zip(b["text"].to_pylist(), b["split"].to_pylist()):
            if t is None:
                continue
            sig = _md5_low64(" ".join(sorted(set(token_items(t))))) & MASK
            acc[(sig, sp)] = acc.get((sig, sp), 0) + 1
        ks = sorted(acc)
        return pa.table(
            {
                "sig": pa.array([k[0] for k in ks], pa.int64()),
                "split": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([acc[k] for k in ks], pa.int64()),
            }
        )

    def pair_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["sig", "split"], as_index=False)["n"].sum()
        rows = []
        for sig, grp in g.groupby("sig"):
            if len(grp) < 2:
                continue
            recs = sorted(grp[["split", "n"]].itertuples(index=False))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    rows.append(
                        (recs[i][0], recs[j][0], 1,
                         int(recs[i][1]), int(recs[j][1]))
                    )
        return pd.DataFrame(
            {
                "split_a": [r[0] for r in rows],
                "split_b": [r[1] for r in rows],
                "n_leaky_groups": pd.array(
                    [r[2] for r in rows], dtype="int64"
                ),
                "n_docs_a": pd.array([r[3] for r in rows], dtype="int64"),
                "n_docs_b": pd.array([r[4] for r in rows], dtype="int64"),
            }
        )

    per_sig = coarse_group_reduce(
        ds.map_batches(sig_partial, batch_format="pyarrow"),
        "sig", pair_rows,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["split_a", "split_b"], as_index=False).sum()
        return out.astype(
            {
                "n_leaky_groups": "int64",
                "n_docs_a": "int64", "n_docs_b": "int64",
            }
        )

    return coarse_group_reduce(per_sig, ["split_a", "split_b"], final)


def q259_encoding_weight(sf_dir: str):
    """UTF-8 ENCODING WEIGHT per language — the storage planner's
    byte-vs-char profile (CJK text budgets ~3 bytes/char, Latin ~1):
    docs, characters, and encoded bytes, entirely in zero-copy Arrow
    kernels (utf8_length / binary_length) — no Python row loop."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b["text"]), pc.is_valid(b["lang"]))
        sel = b.filter(m)
        chars = pc.cast(pc.utf8_length(sel["text"]), pa.int64())
        nbytes = pc.cast(
            pc.binary_length(pc.cast(sel["text"], pa.binary())), pa.int64()
        )
        df = pd.DataFrame(
            {
                "lang": sel["lang"].to_pylist(),
                "n_docs": 1,
                "sum_chars": chars.to_numpy(zero_copy_only=False),
                "sum_bytes": nbytes.to_numpy(zero_copy_only=False),
            }
        ).groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        return out.astype(
            {"n_docs": "int64", "sum_chars": "int64", "sum_bytes": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q260_co_engagement(sf_dir: str):
    """CO-ENGAGEMENT MATRIX — for every unordered event-type pair, the
    number of users who did BOTH and the total co-engagement strength
    Σ_user min(count_a, count_b) (the bipartite projection of the
    user–type graph; q189 projects langs over features, this projects
    types over users). Per-user type counts co-locate on the user
    exchange; each user emits ≤ C(|types|, 2) pair rows."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def user_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["user_id", "event_type"], as_index=False
        ).size()
        rows = []
        for uid, grp in g.groupby("user_id"):
            recs = sorted(grp[["event_type", "size"]].itertuples(index=False))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    rows.append(
                        (recs[i][0], recs[j][0], 1,
                         min(int(recs[i][1]), int(recs[j][1])))
                    )
        return pd.DataFrame(
            {
                "type_a": [r[0] for r in rows],
                "type_b": [r[1] for r in rows],
                "n_users": pd.array([r[2] for r in rows], dtype="int64"),
                "strength": pd.array([r[3] for r in rows], dtype="int64"),
            }
        )

    per_user = coarse_group_reduce(ds, "user_id", user_pairs)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["type_a", "type_b"], as_index=False).sum()
        return out.astype({"n_users": "int64", "strength": "int64"})

    return coarse_group_reduce(per_user, ["type_a", "type_b"], final)


def q261_retention_plan(sf_dir: str):
    """SNAPSHOT RETENTION PLAN — the backup-GC policy artifact (keep
    the last 7 dailies, the last 4 week-closers, the last 3
    month-closers; first matching reason wins, everything else
    drops): applied to the corpus' distinct event days. The week key
    is the pure-integer ISO week (epoch_day + 3) // 7 — no calendar
    library on either engine. Distinct days reduce to bounded
    metadata; the policy is driver arithmetic."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts"])

    def day_partial(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        days = np.unique(
            (t.to_numpy(zero_copy_only=False) // DAY_US).astype(np.int64)
        )
        return pa.table({"day": pa.array(days, pa.int64())})

    def day_merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"day": pd.array(sorted(df["day"].unique()), dtype="int64")}
        )

    days = np.sort(
        coarse_group_reduce(
            ds.map_batches(day_partial, batch_format="pyarrow"),
            "day", day_merge,
        ).to_pandas()["day"].to_numpy()
    )

    daily = set(days[-7:].tolist())
    week = (days + 3) // 7
    week_close = {}
    for d, w in zip(days.tolist(), week.tolist()):
        week_close[w] = d  # days sorted asc -> last wins = week max
    weekly = set(
        [week_close[w] for w in sorted(week_close)[-4:]]
    )
    month_key = []
    for d in days.tolist():
        dt = datetime.utcfromtimestamp(d * 86_400)
        month_key.append(dt.year * 12 + dt.month)
    month_close = {}
    for d, m in zip(days.tolist(), month_key):
        month_close[m] = d
    monthly = set([month_close[m] for m in sorted(month_close)[-3:]])

    reasons = []
    for d in days.tolist():
        if d in daily:
            reasons.append("daily")
        elif d in weekly:
            reasons.append("weekly")
        elif d in monthly:
            reasons.append("monthly")
        else:
            reasons.append("drop")
    return pd.DataFrame(
        {
            "day": pd.array(days, dtype="int64"),
            "action": reasons,
        }
    )


def q262_topk_movers(sf_dir: str):
    """DAY-OVER-DAY TOP MOVERS — the anomaly dashboard's headline: per
    event type, the 3 largest absolute day-over-day count changes on
    the dense calendar grid (missing days count 0; ties earliest day
    first). Per-(type, day) counts are the only exchange; the dense
    diff runs on bounded metadata."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pylist(),
                "day": (
                    t.to_numpy(zero_copy_only=False) // DAY_US
                ).astype(np.int64),
            }
        ).groupby(["event_type", "day"], as_index=False).size()
        df = df.rename(columns={"size": "n"})
        return pa.Table.from_pandas(df, preserve_index=False)

    def cnt_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "day"], as_index=False)["n"].sum()
        return out.astype({"day": "int64", "n": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(cnt_partial, batch_format="pyarrow"),
        ["event_type", "day"],
        cnt_merge,
    ).to_pandas()

    d0, d1 = int(counts["day"].min()), int(counts["day"].max())
    grid = np.arange(d0, d1 + 1, dtype=np.int64)
    rows = []
    for et, g in counts.groupby("event_type"):
        dense = np.zeros(len(grid), dtype=np.int64)
        dense[g["day"].to_numpy() - d0] = g["n"].to_numpy()
        delta = dense[1:] - dense[:-1]
        order = np.lexsort((grid[1:], -np.abs(delta)))[:3]
        for i in order:
            rows.append(
                (et, int(grid[i + 1]), int(dense[i]), int(dense[i + 1]),
                 int(delta[i]))
            )
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in rows],
            "day": pd.array([r[1] for r in rows], dtype="int64"),
            "prev_n": pd.array([r[2] for r in rows], dtype="int64"),
            "n": pd.array([r[3] for r in rows], dtype="int64"),
            "delta": pd.array([r[4] for r in rows], dtype="int64"),
        }
    )


def q263_band_migration(sf_dir: str):
    """VALUE-BAND MIGRATION MATRIX — the cohort-health report: split
    the corpus at the calendar midpoint, band each user's window spend
    into exact terciles AMONG THAT WINDOW'S ACTIVE USERS (ceil(n/3) /
    ceil(2n/3) order statistics), and count users per (band_w1,
    band_w2) cell with −1 = inactive. Both windows' totals co-locate
    on one user exchange; thresholds come from the two-pass histogram
    quantile over the materialized per-user relation."""
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        grouped_quantile_disc,
    )

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def day_bounds(b: pa.Table) -> pa.Table:
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        d = t.to_numpy(zero_copy_only=False) // DAY_US
        return pa.table(
            {
                "lo": pa.array([int(d.min())], pa.int64()),
                "hi": pa.array([int(d.max())], pa.int64()),
            }
        )

    bounds = ds.map_batches(day_bounds, batch_format="pyarrow")
    lo = int(bounds.min("lo"))
    hi = int(bounds.max("hi"))
    split_day = (lo + hi + 1) // 2

    def user_windows(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].astype("datetime64[us]").astype("int64")
        day = (t // DAY_US).to_numpy()
        cents = np.floor(
            df["value"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        w = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "w1": np.where(day < split_day, cents, 0),
                "w2": np.where(day >= split_day, cents, 0),
                "a1": (day < split_day).astype(np.int64),
                "a2": (day >= split_day).astype(np.int64),
            }
        ).groupby("user_id", as_index=False).sum()
        return w.astype(
            {
                "user_id": "int64", "w1": "int64", "w2": "int64",
                "a1": "int64", "a2": "int64",
            }
        )

    users = coarse_group_reduce(ds, "user_id", user_windows).materialize()

    thr = {}
    for col, active in (("w1", "a1"), ("w2", "a2")):
        act = users.map_batches(
            lambda b, a=active: b.filter(pc.greater(b[a], 0)),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: b.append_column(
                "g", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        t1 = int(
            collect_rows(grouped_quantile_disc(act, "g", col, 1, 3))[0][
                "q_value"
            ]
        )
        t2 = int(
            collect_rows(grouped_quantile_disc(act, "g", col, 2, 3))[0][
                "q_value"
            ]
        )
        thr[col] = (t1, t2)

    def bucketize(b: pa.Table) -> pa.Table:
        out = {}
        for col, active, seg in (
            ("w1", "a1", "band_w1"), ("w2", "a2", "band_w2")
        ):
            v = b[col].combine_chunks().to_numpy(zero_copy_only=False)
            a = b[active].combine_chunks().to_numpy(zero_copy_only=False)
            t1, t2 = thr[col]
            band = np.where(v <= t1, 0, np.where(v <= t2, 1, 2))
            out[seg] = np.where(a > 0, band, -1).astype(np.int64)
        out["n_users"] = np.ones(b.num_rows, dtype=np.int64)
        return pa.table(out)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["band_w1", "band_w2"], as_index=False
        )["n_users"].sum()
        return out.astype({"n_users": "int64"})

    return coarse_group_reduce(
        users.map_batches(bucketize, batch_format="pyarrow"),
        ["band_w1", "band_w2"],
        final,
    )


def _sorted_lookup(sorted_keys: np.ndarray, values: np.ndarray, keys: np.ndarray):
    """Vectorized dimension probe: map ``keys`` through the broadcast
    (sorted_keys -> values) association; misses return -1 (int) so the
    caller can mask (inner-join semantics). The house searchsorted
    pattern (q246/q248) factored out for the multi-dimension TPC-H
    joins."""
    if len(sorted_keys) == 0:
        return np.full(len(keys), -1, dtype=np.int64)
    idx = np.searchsorted(sorted_keys, keys)
    idx[idx >= len(sorted_keys)] = len(sorted_keys) - 1
    hit = sorted_keys[idx] == keys
    out = values[idx].astype(np.int64)
    out[~hit] = -1
    return out


def q264_trade_flows(sf_dir: str):
    """CROSS-BORDER TRADE FLOWS — TPC-H Q7 generalized to every nation
    pair: exact revenue cents shipped from a supplier nation to a
    DIFFERENT customer nation, per ship year. The two fact tables meet
    in ONE single-shuffle bucketed hash join on orderkey; every
    dimension (customer->nation, supplier->nation, nation names) is a
    broadcast probe on the fact side, and the (cust_nation, supp_nation,
    year) rollup is FUSED into the join bucket so only a bounded
    25x25x|years| relation leaves the join."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ctab = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    ck = np.asarray(ctab["c_custkey"].to_pylist(), dtype=np.int64)
    cv = np.asarray(ctab["c_nationkey"].to_pylist(), dtype=np.int64)
    co = np.argsort(ck)
    stab = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sk = np.asarray(stab["s_suppkey"].to_pylist(), dtype=np.int64)
    sv = np.asarray(stab["s_nationkey"].to_pylist(), dtype=np.int64)
    so = np.argsort(sk)
    dref = ray.put((ck[co], cv[co], sk[so], sv[so]))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b["l_orderkey"],
                "skey": b["l_suppkey"],
                "ship_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64()),
                "cents": pa.array(
                    np.floor(
                        b["l_extendedprice"].combine_chunks().to_numpy()
                        * (1.0 - b["l_discount"].combine_chunks().to_numpy())
                        * 100.0
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pa.table({"okey": b["o_orderkey"], "ckey": b["o_custkey"]}),
        batch_format="pyarrow",
    )

    def bucket_agg(tbl: pa.Table) -> pa.Table:
        import ray as _ray

        if tbl.num_rows == 0:
            return pa.table(
                {
                    "c_nat": pa.array([], pa.int64()),
                    "s_nat": pa.array([], pa.int64()),
                    "ship_year": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        cks, cvs, sks, svs = _ray.get(dref)
        c_nat = _sorted_lookup(
            cks, cvs, tbl["ckey"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        s_nat = _sorted_lookup(
            sks, svs, tbl["skey"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        keep = (c_nat >= 0) & (s_nat >= 0) & (c_nat != s_nat)
        df = pd.DataFrame(
            {
                "c_nat": c_nat[keep],
                "s_nat": s_nat[keep],
                "ship_year": tbl["ship_year"]
                .combine_chunks().to_numpy(zero_copy_only=False)[keep],
                "revenue_cents": tbl["cents"]
                .combine_chunks().to_numpy(zero_copy_only=False)[keep],
            }
        )
        df["n_lines"] = np.int64(1)
        out = df.groupby(
            ["c_nat", "s_nat", "ship_year"], as_index=False
        ).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    joined = bucketed_hash_join(
        li, od, "okey", ["skey", "ship_year", "cents"], ["ckey"],
        bucket_post_fn=bucket_agg,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["c_nat", "s_nat", "ship_year"], as_index=False).sum()
        return out.astype({"revenue_cents": "int64", "n_lines": "int64"})

    reduced = coarse_group_reduce(joined, ["c_nat", "s_nat", "ship_year"], final)

    ntab = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    names = dict(
        zip(ntab["n_nationkey"].to_pylist(), ntab["n_name"].to_pylist())
    )

    def to_names(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cust_nation": pa.array(
                    [names[int(k)] for k in b["c_nat"].to_pylist()], pa.string()
                ),
                "supp_nation": pa.array(
                    [names[int(k)] for k in b["s_nat"].to_pylist()], pa.string()
                ),
                "ship_year": pc.cast(b["ship_year"], pa.int64()),
                "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
                "n_lines": pc.cast(b["n_lines"], pa.int64()),
            }
        )

    return reduced.map_batches(to_names, batch_format="pyarrow")


def q265_brand_profit_topk(sf_dir: str):
    """BRAND PROFIT LEADERS — TPC-H Q9's product-profit rollup on this
    schema (no partsupp: the unit cost basis is floor(p_retailprice*100)
    cents), restricted Q9-style to parts whose name contains 'widget',
    with the per-brand top-3 parts by total profit (ties: lower
    partkey). The part dimension broadcasts ONCE; per-batch partials
    group by partkey so the exchange is bounded by |part|, and the
    top-k runs per brand on that bounded relation."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ptab = pq.read_table(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice"],
    )
    keep = pc.match_substring(ptab["p_name"], "widget")
    ptab = ptab.filter(keep)
    pk = np.asarray(ptab["p_partkey"].to_pylist(), dtype=np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    cost = np.floor(
        np.asarray(ptab["p_retailprice"].to_pylist(), dtype=np.float64) * 100.0
    ).astype(np.int64)[order]
    brands = np.asarray(ptab["p_brand"].to_pylist(), dtype=object)[order]
    dref = ray.put((pk, cost))

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        pkeys, costs = _ray.get(dref)
        keys = b["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        unit = _sorted_lookup(pkeys, costs, keys)
        hit = unit >= 0
        qty = np.floor(
            b["l_quantity"].combine_chunks().to_numpy()
        ).astype(np.int64)
        rev = np.floor(
            b["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - b["l_discount"].combine_chunks().to_numpy())
            * 100.0
        ).astype(np.int64)
        profit = rev - unit * qty
        df = pd.DataFrame(
            {"p_partkey": keys[hit], "profit_cents": profit[hit]}
        ).groupby("p_partkey", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    per_part = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        "p_partkey",
        lambda df: df.groupby("p_partkey", as_index=False)["profit_cents"]
        .sum().astype({"profit_cents": "int64"}),
    )

    brand_of = dict(zip(pk.tolist(), brands.tolist()))

    def tag_brand(b: pa.Table) -> pa.Table:
        return b.append_column(
            "p_brand",
            pa.array(
                [brand_of[int(k)] for k in b["p_partkey"].to_pylist()],
                pa.string(),
            ),
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["p_brand", "profit_cents", "p_partkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        df["rnk"] = df.groupby("p_brand").cumcount() + 1
        out = df[df["rnk"] <= 3].reset_index(drop=True)
        return out.astype(
            {"p_partkey": "int64", "profit_cents": "int64", "rnk": "int64"}
        )

    return coarse_group_reduce(
        per_part.map_batches(tag_brand, batch_format="pyarrow"),
        "p_brand",
        topk,
    )


def q266_domestic_share(sf_dir: str):
    """DOMESTIC REVENUE SHARE — TPC-H Q8 re-aimed at a schema-native
    question: per (customer region, order year), the exact cents of
    revenue where the supplier sits in the CUSTOMER'S OWN nation vs all
    revenue (the share is the consumer's division — only integers enter
    the driver hash). Same single-shuffle fact join as q264; the
    nation->region hop is a second broadcast probe inside the bucket."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ctab = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    ck = np.asarray(ctab["c_custkey"].to_pylist(), dtype=np.int64)
    cv = np.asarray(ctab["c_nationkey"].to_pylist(), dtype=np.int64)
    co = np.argsort(ck)
    stab = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sk = np.asarray(stab["s_suppkey"].to_pylist(), dtype=np.int64)
    sv = np.asarray(stab["s_nationkey"].to_pylist(), dtype=np.int64)
    so = np.argsort(sk)
    ntab = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"])
    nk = np.asarray(ntab["n_nationkey"].to_pylist(), dtype=np.int64)
    nv = np.asarray(ntab["n_regionkey"].to_pylist(), dtype=np.int64)
    no = np.argsort(nk)
    dref = ray.put((ck[co], cv[co], sk[so], sv[so], nk[no], nv[no]))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b["l_orderkey"],
                "skey": b["l_suppkey"],
                "cents": pa.array(
                    np.floor(
                        b["l_extendedprice"].combine_chunks().to_numpy()
                        * (1.0 - b["l_discount"].combine_chunks().to_numpy())
                        * 100.0
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "okey": b["o_orderkey"],
                "ckey": b["o_custkey"],
                "order_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def bucket_agg(tbl: pa.Table) -> pa.Table:
        import ray as _ray

        if tbl.num_rows == 0:
            return pa.table(
                {
                    "rkey": pa.array([], pa.int64()),
                    "order_year": pa.array([], pa.int64()),
                    "domestic_cents": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        cks, cvs, sks, svs, nks, nvs = _ray.get(dref)
        c_nat = _sorted_lookup(
            cks, cvs, tbl["ckey"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        s_nat = _sorted_lookup(
            sks, svs, tbl["skey"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        rkey = _sorted_lookup(nks, nvs, c_nat)
        keep = (c_nat >= 0) & (s_nat >= 0) & (rkey >= 0)
        cents = tbl["cents"].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        df = pd.DataFrame(
            {
                "rkey": rkey[keep],
                "order_year": tbl["order_year"]
                .combine_chunks().to_numpy(zero_copy_only=False)[keep],
                "domestic_cents": np.where(
                    c_nat[keep] == s_nat[keep], cents, 0
                ),
                "total_cents": cents,
            }
        )
        df["n_lines"] = np.int64(1)
        out = df.groupby(["rkey", "order_year"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    joined = bucketed_hash_join(
        li, od, "okey", ["skey", "cents"], ["ckey", "order_year"],
        bucket_post_fn=bucket_agg,
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["rkey", "order_year"], as_index=False).sum()
        return out.astype(
            {
                "domestic_cents": "int64", "total_cents": "int64",
                "n_lines": "int64",
            }
        )

    reduced = coarse_group_reduce(joined, ["rkey", "order_year"], final)

    rtab = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    rnames = dict(
        zip(rtab["r_regionkey"].to_pylist(), rtab["r_name"].to_pylist())
    )

    def to_names(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": pa.array(
                    [rnames[int(k)] for k in b["rkey"].to_pylist()], pa.string()
                ),
                "order_year": pc.cast(b["order_year"], pa.int64()),
                "domestic_cents": pc.cast(b["domestic_cents"], pa.int64()),
                "total_cents": pc.cast(b["total_cents"], pa.int64()),
                "n_lines": pc.cast(b["n_lines"], pa.int64()),
            }
        )

    return reduced.map_batches(to_names, batch_format="pyarrow")


def q267_kcore_peel(sf_dir: str):
    """K-CORE PEELING (k=3, three unrolled rounds) on the undirected
    q153 citation-style doc graph — the spam-farm / dense-community
    extraction pass a web-graph pipeline runs after components (q42)
    and PageRank (q103). Each round is fully join-based: degrees are a
    coarse-salted reduce over stacked endpoints, survivors (deg >= k)
    filter the edge set through TWO bucketed left-semi joins (one per
    endpoint), and nothing node- or edge-scale ever touches the
    driver. Output: the round-3 surviving vertices with their residual
    degree inside the surviving edge set (0 if their last neighbor was
    peeled with them)."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 3
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def gen_edges(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        x = np.concatenate([i, i, i])
        y = np.concatenate(
            [(i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs]
        )
        keep = x != y
        x, y = x[keep], y[keep]
        df = pd.DataFrame(
            {"a": np.minimum(x, y), "b": np.maximum(x, y)}
        ).drop_duplicates()
        return pa.Table.from_pandas(
            df.astype({"a": "int64", "b": "int64"}), preserve_index=False
        )

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().reset_index(drop=True)

    edges = coarse_group_reduce(
        ds.map_batches(gen_edges, batch_format="pyarrow"),
        ["a", "b"], dedup_edges,
    ).materialize()

    def degrees(edge_ds, out_key: str):
        def partial(b: pa.Table) -> pa.Table:
            u = np.concatenate(
                [
                    b["a"].combine_chunks().to_numpy(zero_copy_only=False),
                    b["b"].combine_chunks().to_numpy(zero_copy_only=False),
                ]
            )
            df = pd.DataFrame({out_key: u})
            df["dg"] = np.int64(1)
            out = df.groupby(out_key, as_index=False).sum()
            return pa.Table.from_pandas(out, preserve_index=False)

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(out_key, as_index=False)["dg"].sum()
            return out.astype({out_key: "int64", "dg": "int64"})

        return coarse_group_reduce(
            edge_ds.map_batches(partial, batch_format="pyarrow"),
            out_key, merge,
        )

    alive = None
    for _ in range(3):
        deg = degrees(edges, "u")
        alive = deg.map_batches(
            lambda b: pa.table(
                {"u": b.filter(pc.greater_equal(b["dg"], K))["u"]}
            ),
            batch_format="pyarrow",
        ).materialize()
        edges = bucketed_hash_join(
            edges,
            alive.map_batches(
                lambda b: pa.table({"a": b["u"]}), batch_format="pyarrow"
            ),
            "a", ["b"], [], join_type="left semi",
        )
        edges = bucketed_hash_join(
            edges,
            alive.map_batches(
                lambda b: pa.table({"b": b["u"]}), batch_format="pyarrow"
            ),
            "b", ["a"], [], join_type="left semi",
        ).materialize()

    residual = degrees(edges, "v").map_batches(
        lambda b: pa.table(
            {"v": b["v"], "residual_deg": pc.cast(b["dg"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = bucketed_hash_join(
        alive.map_batches(
            lambda b: pa.table({"v": b["u"]}), batch_format="pyarrow"
        ),
        residual,
        "v", [], ["residual_deg"], join_type="left outer",
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "v": pc.cast(b["v"], pa.int64()),
                "residual_deg": pc.cast(
                    pc.coalesce(b["residual_deg"], pa.scalar(0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q268_next_higher(sf_dir: str):
    """NEXT-GREATER-ELEMENT over each user's event sequence — the
    "how long until a better offer" primitive (stock-span family):
    for every event, the number of sequence steps to the FIRST later
    event of the same user with a strictly higher value (cents), -1 if
    none. One exchange co-locates each user; the per-group kernel is
    the O(n) monotonic stack (per-user sequences are memory-bounded,
    the house sessionize assumption). The SQL twin is the O(n^2)
    self-join — exact on the same input."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
                "c": pa.array(
                    np.floor(
                        b["value"].combine_chunks().to_numpy() * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["t", "event_id"], kind="mergesort")
            c = g["c"].to_numpy()
            n = len(c)
            res = np.full(n, -1, dtype=np.int64)
            stack: list[int] = []
            for i in range(n):
                ci = c[i]
                while stack and c[stack[-1]] < ci:
                    j = stack.pop()
                    res[j] = i - j
                stack.append(i)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(n, uid, dtype=np.int64),
                        "event_id": g["event_id"].to_numpy(),
                        "steps_to_higher": res,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "event_id": pd.array([], dtype="int64"),
                    "steps_to_higher": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", per_user
    )


def q269_waterfill_alloc(sf_dir: str):
    """WATER-FILLING CRAWL-SLOT ALLOCATION — max-min fair division of
    a global budget (half the corpus) across hosts (doc_id % 64, demand
    = host doc count): every host gets min(demand, L) for the largest
    integer level L that fits the budget, and the remainder goes one
    unit each to the lowest-numbered still-unsatisfied hosts. The
    corpus-scale work is ONE per-host count reduce; the allocation is
    exact integer arithmetic on the bounded 64-row demand relation
    (q226 measures fairness — this PLANS it)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        h = (
            b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False) % 64
        ).astype(np.int64)
        df = pd.DataFrame({"host": h})
        df["demand"] = np.int64(1)
        return pa.Table.from_pandas(
            df.groupby("host", as_index=False).sum(), preserve_index=False
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("host", as_index=False)["demand"].sum()
        return out.astype({"host": "int64", "demand": "int64"})

    rows = collect_rows(
        coarse_group_reduce(
            ds.map_batches(partial, batch_format="pyarrow"), "host", merge
        )
    )
    hosts = np.array(sorted(r["host"] for r in rows), dtype=np.int64)
    dem = {r["host"]: r["demand"] for r in rows}
    d = np.array([dem[h] for h in hosts], dtype=np.int64)
    budget = int(d.sum()) // 2

    levels = np.arange(0, int(d.max()) + 1, dtype=np.int64)
    fills = np.minimum.outer(d, levels).sum(axis=0)
    level = int(levels[fills <= budget].max())
    base = np.minimum(d, level)
    rem = budget - int(base.sum())
    unsat = np.flatnonzero(d > level)
    alloc = base.copy()
    alloc[unsat[:rem]] += 1
    return pd.DataFrame(
        {
            "host": pd.array(hosts, dtype="int64"),
            "demand": pd.array(d, dtype="int64"),
            "alloc": pd.array(alloc, dtype="int64"),
        }
    )


def q270_frontcode_savings(sf_dir: str):
    """FRONT-CODING SAVINGS of the globally-sorted text column — the
    Lucene/RocksDB term-dictionary planning number: total chars the
    sorted corpus would save by prefix-compressing each string against
    its sorted predecessor (LCP capped at 64 chars, the usual
    front-coding prefix bound). The hard part at scale is GLOBAL sorted
    adjacency without a global sort-to-one-task: order-preserving
    range buckets learned from a first-character histogram (equal first
    chars share a bucket, so bucket ranges are sorted-order prefixes),
    per-bucket local sort + adjacent-LCP reduce, and the ≤B cross-bucket
    boundary pairs (each bucket's 64-char min/max slice — metadata)
    stitch on the driver. One corpus scan after the histogram pass;
    nothing string-scale leaves the buckets."""
    from os.path import commonprefix

    from basicocr_ray.core.collect import collect_rows as _cr

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def p1(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            pc.utf8_slice_codeunits(b["text"], 0, 1).combine_chunks()
        )
        return pa.table(
            {"ch": vc.field("values"), "n": vc.field("counts")}
        )

    counts: dict = {}
    for row in _cr(ds.map_batches(p1, batch_format="pyarrow")):
        counts[row["ch"]] = counts.get(row["ch"], 0) + int(row["n"])
    chars = sorted(counts)
    total_n = sum(counts.values())
    B = 64
    per = max(1, -(-total_n // B))
    char_bucket: dict = {}
    bid, acc = 0, 0
    for ch in chars:
        if acc >= per and bid < B - 1:
            bid, acc = bid + 1, 0
        char_bucket[ch] = bid
        acc += counts[ch]

    def tag(b: pa.Table) -> pa.Table:
        first = pc.utf8_slice_codeunits(b["text"], 0, 1).to_pylist()
        return pa.table(
            {
                "text": b["text"],
                "_b": pa.array(
                    [char_bucket[c] for c in first], pa.int64()
                ),
            }
        )

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        texts = sorted(df["text"].tolist())
        saved = 0
        for a, c in zip(texts, texts[1:]):
            saved += len(commonprefix((a[:64], c[:64])))
        return pd.DataFrame(
            {
                "_b": pd.array([int(df["_b"].iloc[0])], dtype="int64"),
                "n": pd.array([len(texts)], dtype="int64"),
                "chars": pd.array(
                    [sum(len(t) for t in texts)], dtype="int64"
                ),
                "saved": pd.array([saved], dtype="int64"),
                "lo": [texts[0][:64]],
                "hi": [texts[-1][:64]],
            }
        )

    rows = sorted(
        collect_rows(
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(reduce_bucket, batch_format="pandas")
        ),
        key=lambda r: r["_b"],
    )
    n = sum(r["n"] for r in rows)
    chars_total = sum(r["chars"] for r in rows)
    saved = sum(r["saved"] for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        saved += len(commonprefix((prev["hi"], cur["lo"])))
    return pd.DataFrame(
        {
            "n_strings": pd.array([n], dtype="int64"),
            "sum_chars": pd.array([chars_total], dtype="int64"),
            "n_pairs": pd.array([max(0, n - 1)], dtype="int64"),
            "saved_chars": pd.array([saved], dtype="int64"),
        }
    )


def q271_bfs_dist(sf_dir: str):
    """MULTI-SOURCE BFS shortest-path distance (≤3 hops) on the
    undirected q153 doc graph from the deterministic seed set
    doc_id % 97 == 0 — the crawl-frontier / influence-radius primitive,
    fully join-based: each round is ONE bucketed semi-join (edges whose
    source is in the frontier), a coarse-salted distinct on the
    candidate targets, and ONE bucketed anti-join against the visited
    set — so a round's cost scales with the frontier's edge
    neighborhood, not the graph. Nothing node- or edge-scale touches
    the driver; visited accumulates as a materialized union with the
    round number as the (exact, BFS-minimal) distance."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        js = [(i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs]
        ii = np.concatenate([i, i, i])
        jj = np.concatenate(js)
        keep = ii != jj
        src = np.concatenate([ii[keep], jj[keep]])
        dst = np.concatenate([jj[keep], ii[keep]])
        return pa.table(
            {
                "ek": pa.array(src * (1 << 32) + dst, pa.int64()),
                "node": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    def dedup_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("ek")[["node", "dst"]]

    E = coarse_group_reduce(
        ds.map_batches(edges, batch_format="pyarrow"), "ek", dedup_first
    ).materialize()

    def seed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        node = ids[ids % 97 == 0]
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "dist": pa.array(
                    np.zeros(len(node), dtype=np.int64), pa.int64()
                ),
            }
        )

    frontier = ds.map_batches(seed, batch_format="pyarrow").materialize()
    visited = frontier

    def dedup_node(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")[["node"]]

    for r in (1, 2, 3):
        reached = bucketed_hash_join(
            E,
            frontier.map_batches(
                lambda b: b.select(["node"]), batch_format="pyarrow"
            ),
            key="node",
            left_columns=["dst"],
            right_columns=[],
            join_type="left semi",
        )
        cand = coarse_group_reduce(
            reached.map_batches(
                lambda b: pa.table({"node": b["dst"]}),
                batch_format="pyarrow",
            ),
            "node",
            dedup_node,
        )
        fresh = bucketed_hash_join(
            cand,
            visited.map_batches(
                lambda b: b.select(["node"]), batch_format="pyarrow"
            ),
            key="node",
            left_columns=[],
            right_columns=[],
            join_type="left anti",
        )
        frontier = fresh.map_batches(
            lambda b, _r=r: pa.table(
                {
                    "node": b["node"],
                    "dist": pa.array(
                        np.full(b.num_rows, _r, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        visited = visited.union(frontier).materialize()

    return visited.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "dist": b["dist"]}),
        batch_format="pyarrow",
    )


def q272_weighted_median(sf_dir: str):
    """EXACT per-group LOWER WEIGHTED MEDIAN — per return flag, the
    smallest extended-price (cents) v such that twice the quantity mass
    at or below v covers the group's total quantity — the
    inventory-planner's "half the units move at or under this price"
    number. Runs in `grouped_weighted_median`'s two-pass
    histogram-refinement shape (stages/wide.py): two metadata reduces
    locate the candidate value bucket per group, and only that bucket's
    rows trickle to the exact in-bucket selection — no per-group sort,
    no full-row shuffle, weight-skew-proof."""
    from basicocr_ray.stages.wide import grouped_weighted_median

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "cents": pa.array(
                    np.floor(
                        b["l_extendedprice"].combine_chunks().to_numpy()
                        * 100.0
                    ).astype(np.int64)
                ),
                "qty": pc.cast(b["l_quantity"], pa.int64()),
            }
        )

    return grouped_weighted_median(
        ds.map_batches(prep, batch_format="pyarrow"),
        "l_returnflag",
        "cents",
        "qty",
        out_name="wmedian_cents",
    )


def q273_kendall_evidence(sf_dir: str):
    """KENDALL-TAU EVIDENCE per user — exact integer pair counts between
    time order and value order (inversions = discordant, tie pairs,
    concordant) — the trend-monotonicity audit behind "is this user's
    spend drifting up". The engine kernel is the O(n log n)
    Fenwick-tree inversion count per co-located user sequence; the SQL
    twin is the O(n²) self-join over the same pairs — exact on the same
    input. One exchange; per-user sequences are memory-bounded (the
    house sessionize assumption)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
                "c": pa.array(
                    np.floor(
                        b["value"].combine_chunks().to_numpy() * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["t", "event_id"], kind="mergesort")
            c = g["c"].to_numpy()
            n = len(c)
            _, ranks, mult = np.unique(
                c, return_inverse=True, return_counts=True
            )
            ranks = ranks + 1
            m = len(mult)
            bit = np.zeros(m + 1, dtype=np.int64)
            inv = 0
            for i, r in enumerate(ranks):
                # seen-so-far strictly greater = i - count_seen(<= r)
                j, seen_le = int(r), 0
                while j > 0:
                    seen_le += bit[j]
                    j -= j & -j
                inv += i - seen_le
                j = int(r)
                while j <= m:
                    bit[j] += 1
                    j += j & -j
            ties = int((mult * (mult - 1) // 2).sum())
            total = n * (n - 1) // 2
            outs.append(
                (int(uid), n, int(inv), ties, total - int(inv) - ties)
            )
        cols = ["user_id", "n_events", "inversions", "tie_pairs",
                "concordant"]
        if not outs:
            return pd.DataFrame(
                {c: pd.array([], dtype="int64") for c in cols}
            )
        arr = np.array(outs, dtype=np.int64)
        return pd.DataFrame(
            {c: arr[:, i] for i, c in enumerate(cols)}
        )

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", per_user
    )


def q274_greedy_set_cover(sf_dir: str):
    """GREEDY SET COVER (keyword selection), 3 unrolled rounds — "which
    3 probe terms reach the most documents": universe = doc ids, sets =
    tokens (a token covers the docs containing it); each round picks
    the token covering the most still-uncovered docs (ties:
    lexicographically smallest token). Both the (doc, token) incidence
    relation AND the covered-doc set stay DISTRIBUTED: each round is
    one bucketed ANTI-join on doc_id, a per-token count reduce, and a
    distributed top-1 (`top_k`) — the driver only ever sees ONE row per
    round, never the open vocabulary. Rounds with nothing left to
    cover emit no row — greedy's natural stop."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_items(b: pa.Table) -> pa.Table:
        ids, toks = [], []
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            for tok in set(ws_tokens(t)):
                ids.append(i)
                toks.append(tok)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
            }
        )

    pairs = ds.map_batches(
        pair_items, batch_format="pyarrow"
    ).materialize()
    # (doc_id, token) pairs are distinct by construction (set() per doc)

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("token", as_index=False).agg(
            nc=("doc_id", "size")
        )
        return out.astype({"nc": "int64"})

    covered = None
    rows = []
    covered_total = 0
    for rnd in (1, 2, 3):
        remaining = (
            pairs
            if covered is None
            else bucketed_hash_join(
                pairs,
                covered,
                key="doc_id",
                left_columns=["token"],
                right_columns=[],
                join_type="left anti",
            )
        )
        winner = top_k(
            coarse_group_reduce(remaining, "token", tok_counts),
            1,
            "nc",
            "token",
        ).to_pandas()
        if winner.empty or int(winner["nc"].iloc[0]) == 0:
            break
        best = str(winner["token"].iloc[0])
        newly = int(winner["nc"].iloc[0])
        covered_total += newly
        rows.append((rnd, best, newly, covered_total))
        new_docs = remaining.map_batches(
            lambda b, _b=best: b.filter(
                pc.equal(b["token"], _b)
            ).select(["doc_id"]),
            batch_format="pyarrow",
        )
        covered = (
            new_docs if covered is None else covered.union(new_docs)
        ).materialize()
    return pd.DataFrame(
        {
            "round": pd.array([r[0] for r in rows], dtype="int64"),
            "token": [r[1] for r in rows],
            "newly_covered": pd.array(
                [r[2] for r in rows], dtype="int64"
            ),
            "covered_total": pd.array(
                [r[3] for r in rows], dtype="int64"
            ),
        }
    )


def q275_minhash_walk(sf_dir: str):
    """DETERMINISTIC "RANDOM" WALK, 3 steps, on the q153 doc graph —
    the reproducible crawl-sampling primitive (node2vec/PPR-style
    exploration without RNG state): from each seed (doc_id % 101 == 0)
    the walker moves to the out-neighbor minimizing the keyed hash
    md5_low64("step:src:dst") — partition/retry-invariant and
    SQL-reproducible via DuckDB's md5_number_lower. Each step is ONE
    bucketed join of the current (seed → node) relation against the
    edge table plus a per-seed argmin reduce; work per step is
    |seeds| × avg-degree, never graph-scale on the driver."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def edges(batch: pa.Table) -> pa.Table:
        i = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        js = [(i + 1) % n_docs, (i + 2) % n_docs, (3 * i + 1) % n_docs]
        ii = np.concatenate([i, i, i])
        jj = np.concatenate(js)
        keep = ii != jj
        src = np.concatenate([ii[keep], jj[keep]])
        dst = np.concatenate([jj[keep], ii[keep]])
        return pa.table(
            {
                "ek": pa.array(src * (1 << 32) + dst, pa.int64()),
                "node": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    def dedup_first(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("ek")[["node", "dst"]]

    E = coarse_group_reduce(
        ds.map_batches(edges, batch_format="pyarrow"), "ek", dedup_first
    ).materialize()

    def seed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        s = ids[ids % 101 == 0]
        return pa.table(
            {
                "seed": pa.array(s, pa.int64()),
                "node": pa.array(s, pa.int64()),
            }
        )

    cur = ds.map_batches(seed, batch_format="pyarrow").materialize()
    out = [cur]

    for step in (1, 2, 3):
        stepped = bucketed_hash_join(
            E,
            cur,
            key="node",
            left_columns=["dst"],
            right_columns=["seed"],
        )

        def hash_steps(b: pa.Table, _s=step) -> pa.Table:
            node = b["node"].to_pylist()
            dst = b["dst"].to_pylist()
            h = [
                _md5_low64(f"{_s}:{u}:{v}") for u, v in zip(node, dst)
            ]
            return pa.table(
                {
                    "seed": b["seed"],
                    "dst": b["dst"],
                    "h": pa.array(h, pa.uint64()),
                }
            )

        def pick_min(df: pd.DataFrame) -> pd.DataFrame:
            d = df.sort_values(["h", "dst"], kind="mergesort")
            d = d.drop_duplicates("seed", keep="first")
            return pd.DataFrame(
                {
                    "seed": d["seed"].to_numpy(),
                    "node": d["dst"].to_numpy(),
                }
            )

        cur = coarse_group_reduce(
            stepped.map_batches(hash_steps, batch_format="pyarrow"),
            "seed",
            pick_min,
        ).materialize()
        out.append(cur)

    def stamp(stp: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "seed": b["seed"],
                    "step": pa.array(
                        np.full(b.num_rows, stp, dtype=np.int64)
                    ),
                    "node": b["node"],
                }
            )

        return fn

    res = out[0].map_batches(stamp(0), batch_format="pyarrow")
    for stp, d in enumerate(out[1:], start=1):
        res = res.union(d.map_batches(stamp(stp), batch_format="pyarrow"))
    return res


def q276_mutual_nn_pairs(sf_dir: str):
    """MUTUAL NEAREST-NEIGHBOR PAIRS over the embedding table — the
    entity-resolution / translation-mining primitive (two vectors that
    are each other's top-1 by exact int-quantized dot, ties cand_id
    asc). Per-batch brute top-1 against the ray.put-broadcast quantized
    matrix (the q15/q253 brute baseline — broadcast-bounded, the IVF
    path in stages/embed.py is the open-scale variant), then the
    mutuality check is ONE coarse-salted reduce on the canonical pair
    key: each vector emits exactly one (min·2³²+max) row, so a key with
    both directions present (count == 2) IS a mutual pair — no second
    join, nothing pair-scale on the driver."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    tab = pq.read_table(_p(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding"])
    all_ids = np.asarray(tab["vec_id"].to_pylist(), dtype=np.int64)
    Mq = np.floor(
        np.asarray(tab["embedding"].to_pylist(), dtype=np.float64) * 1e3
    ).astype(np.int64)
    ref = ray.put((all_ids, Mq))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def local_nn(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_all, M = _ray.get(ref)
        vids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = np.floor(
            np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
            * 1e3
        ).astype(np.int64)
        dots = V @ M.T
        # exclude self, argmax by (dot desc, cand asc)
        nn_ids = np.empty(len(vids), dtype=np.int64)
        nn_dots = np.empty(len(vids), dtype=np.int64)
        for i, vid in enumerate(vids):
            row = dots[i]
            ok = ids_all != vid
            cand, d = ids_all[ok], row[ok]
            j = np.lexsort((cand, -d))[0]
            nn_ids[i] = cand[j]
            nn_dots[i] = d[j]
        a = np.minimum(vids, nn_ids)
        bb = np.maximum(vids, nn_ids)
        return pa.table(
            {
                "pk": pa.array(a * (1 << 32) + bb, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bb, pa.int64()),
                "dot": pa.array(nn_dots, pa.int64()),
            }
        )

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pk", as_index=False).agg(
            n=("pk", "size"), a=("a", "first"), b=("b", "first"),
            dot=("dot", "first"),
        )
        g = g[g["n"] == 2][["a", "b", "dot"]]
        return g.astype({"a": "int64", "b": "int64", "dot": "int64"})

    return coarse_group_reduce(
        ds.map_batches(local_nn, batch_format="pyarrow"), "pk", mutual
    )


def q277_rank_overlap_depth(sf_dir: str):
    """SPLIT-HALF RANK-LIST AGREEMENT — overlap@depth between the
    top-20 token lists of the two corpus halves (doc_id parity), the
    integer evidence under rank-biased-overlap-style list-similarity
    metrics (the consumer applies its own weights). Corpus-scale work
    is the two distributed token counts + two distributed top-20s
    (`top_k` local-prune discipline); the driver sees 40 rows and the
    depth sweep is bounded arithmetic."""
    from basicocr_ray.stages.wide import count_terms

    def half(parity: int):
        d = _read(sf_dir, "documents", columns=["doc_id", "text"])
        filt = d.map_batches(
            lambda b, _p_=parity: b.filter(
                pc.equal(
                    pc.bit_wise_and(b["doc_id"], 1), _p_
                )
            ),
            batch_format="pyarrow",
        )
        counts = count_terms(filt, "text", token_items)
        return top_k(counts, 20, "cnt", "token").to_pandas()

    t0, t1 = half(0), half(1)

    def ranks(df: pd.DataFrame) -> dict:
        df = df.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        return {t: i + 1 for i, t in enumerate(df["token"])}

    r0, r1 = ranks(t0), ranks(t1)
    common = [(r0[t], r1[t]) for t in r0 if t in r1]
    depths = np.arange(1, 21, dtype=np.int64)
    overlap = np.array(
        [sum(1 for ra, rb in common if ra <= d and rb <= d)
         for d in depths],
        dtype=np.int64,
    )
    return pd.DataFrame(
        {
            "depth": pd.array(depths, dtype="int64"),
            "overlap": pd.array(overlap, dtype="int64"),
        }
    )


def q278_pointer_doubling(sf_dir: str):
    """POINTER DOUBLING / BINARY LIFTING — f⁸(u) for every doc under
    the successor map f(u) = (3u+1) mod N in THREE self-join squarings
    (f→f², f²→f⁴, f⁴→f⁸) instead of eight sequential hops — the
    list-ranking / chained-redirect-resolution primitive every
    distributed graph engine needs. Each squaring is ONE bucketed
    hash join of the relation with itself (compose a.v = b.u);
    round count is log₂(k), not k. The SQL twin composes the same
    three squarings."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    def succ(batch: pa.Table) -> pa.Table:
        u = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array((3 * u + 1) % n_docs, pa.int64()),
            }
        )

    S = ds.map_batches(succ, batch_format="pyarrow").materialize()
    for _ in range(3):  # f -> f^2 -> f^4 -> f^8
        left = S.map_batches(
            lambda b: pa.table({"k": b["v"], "u": b["u"]}),
            batch_format="pyarrow",
        )
        right = S.map_batches(
            lambda b: pa.table({"k": b["u"], "v2": b["v"]}),
            batch_format="pyarrow",
        )
        S = bucketed_hash_join(
            left, right, key="k",
            left_columns=["u"], right_columns=["v2"],
        ).map_batches(
            lambda b: pa.table({"u": b["u"], "v": b["v2"]}),
            batch_format="pyarrow",
        ).materialize()

    return S.map_batches(
        lambda b: pa.table({"doc_id": b["u"], "f8": b["v"]}),
        batch_format="pyarrow",
    )


def q279_hits_scores(sf_dir: str):
    """HITS hubs-and-authorities (Kleinberg) over the derived host
    graph — the second classic link-analysis op next to q103's
    PageRank, as ALTERNATING integer SpMV: two rounds of
    auth ← AᵀΒ·hub, hub ← A·auth, each round two
    `propagate_sum_int` passes (one bucketed join + one union-groupby
    zero-fill each; nothing node/edge-scale on the driver). Hash-exact
    because the iteration is run UN-normalized from the integer
    document-mass seed — magnitudes grow ≤ out_degree² per round
    (≤ 81·N after 2 rounds), so int64 holds to N ≈ 10¹⁷ and the
    consumer normalizes once at the end if it wants unit vectors."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.graph import propagate_sum_int

    H = 64
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hostify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(ids % H, pa.int64())})

    nodes = (
        ds.map_batches(hostify, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="mass"))
        .materialize()
    )

    def mk_edges(b: pa.Table, rev: bool = False) -> pa.Table:
        hs = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.repeat(hs, 3)
        dst = np.stack(
            [(3 * hs + 1) % H, (5 * hs + 2) % H, (7 * hs + 4) % H], axis=1
        ).reshape(-1)
        if rev:
            src, dst = dst, src
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    edges = nodes.map_batches(
        mk_edges, batch_format="pyarrow"
    ).materialize()
    rev_edges = nodes.map_batches(
        lambda b: mk_edges(b, rev=True), batch_format="pyarrow"
    ).materialize()

    hub = nodes.map_batches(
        lambda b: pa.table({"h": b["h"], "x": b["mass"]}),
        batch_format="pyarrow",
    ).materialize()
    auth = None
    for _ in range(2):
        # auth(v) = Σ_{u→v} hub(u); hub(u) = Σ_{u→v} auth(v)
        auth = propagate_sum_int(
            hub, edges, nodes, num_buckets=4
        ).materialize()
        hub = propagate_sum_int(
            auth, rev_edges, nodes, num_buckets=4
        ).materialize()

    # final (h, mass, hub, auth) assembly: every relation is keyed by h
    # and each contributes exactly one row per node, so ONE union +
    # coarse-grouped merge replaces two bucketed joins (one shuffle,
    # not two)
    from basicocr_ray.stages.wide import coarse_group_reduce

    def _tag(col):
        def f(b: pa.Table, _c=col) -> pa.Table:
            n = b.num_rows
            z = pa.array(np.zeros(n, dtype=np.int64))
            vals = {"mass": z, "hub": z, "auth": z}
            vals[_c] = pc.cast(b["mass" if _c == "mass" else "x"], pa.int64())
            return pa.table({"h": b["h"], **vals})

        return f

    parts = nodes.map_batches(_tag("mass"), batch_format="pyarrow").union(
        hub.map_batches(_tag("hub"), batch_format="pyarrow"),
        auth.map_batches(_tag("auth"), batch_format="pyarrow"),
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", as_index=False).agg(
            mass=("mass", "sum"), hub=("hub", "sum"), auth=("auth", "sum")
        )
        return g.astype(
            {"h": "int64", "mass": "int64", "hub": "int64", "auth": "int64"}
        )

    return coarse_group_reduce(parts, "h", merge, num_salt=4)


def q280_lis_per_lang(sf_dir: str):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE length of each
    language's doc-length sequence (n_chars in doc_id order) — the
    order-statistics-of-order primitive behind "how sorted is this
    shard" planners (q214 counts inversions; this measures the sorted
    CORE). One exchange co-locates each lang; the per-group kernel is
    O(n log n) patience sorting (bisect on the tails array). The SQL
    twin is the O(n²·L) recursive-chain DP — exact on the same
    input."""
    import bisect

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            g = g.sort_values("doc_id", kind="mergesort")
            tails: list[int] = []
            for v in g["n_chars"].to_numpy():
                v = int(v)
                i = bisect.bisect_left(tails, v)
                if i == len(tails):
                    tails.append(v)
                else:
                    tails[i] = v
            out.append((lang, len(tails)))
        return pd.DataFrame(
            {
                "lang": pd.array(
                    [l for l, _ in out], dtype="object"
                ),
                "lis_len": pd.array(
                    [n for _, n in out], dtype="int64"
                ),
            }
        )

    filt = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b["lang"])),
        batch_format="pyarrow",
    )
    return coarse_group_reduce(filt, "lang", per_lang)


def q281_unpivot_metrics(sf_dir: str):
    """DISTRIBUTED UNPIVOT/MELT — the wide→long relational verb (the
    inverse of q80's pivot): each document row fans out to one
    (doc_id, metric, value) row per derived metric (codepoint count,
    UTF-8 byte count, space count), all three computed with Arrow
    kernels (utf8_length / binary_length / count_substring) and the
    fan-out built by numpy repeat/tile — a pure per-batch flat map, no
    shuffle at all, the shape a feature-store export runs at corpus
    scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def melt(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        txt = b["text"].combine_chunks()
        chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        nbytes = pc.binary_length(txt).to_numpy(zero_copy_only=False)
        spaces = pc.count_substring(txt, " ").to_numpy(zero_copy_only=False)
        n = len(ids)
        vals = np.stack([chars, nbytes, spaces], axis=1).reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 3), pa.int64()),
                "metric": pa.array(
                    np.tile(np.array(["chars", "bytes", "spaces"]), n)
                ),
                "value": pa.array(vals.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def q282_greedy_matching(sf_dir: str):
    """LOCAL-DOMINANCE BIPARTITE MATCHING (the distributed greedy
    matching used for graph coarsening / crawl-slot assignment): an
    edge (user, type, w=count) is matched in a round iff it is BOTH its
    user's best edge (w desc, type asc) and its type's best edge
    (w desc, user asc) — the handshake needs no coordination, just two
    per-side top-1 reduces and the q276 mutual-agreement trick (union
    the two pick relations on the edge key; a key present twice IS a
    handshake). Two rounds, matched endpoints removed between rounds.
    The matched relation per round is ≤ |event types| rows — the
    broadcast-filter side stays bounded by the small side of the
    bipartition."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        return g.rename(columns={"size": "w"})

    def merge_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["w"].sum()
        return g.astype({"user_id": "int64", "w": "int64"})

    edges = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id", "event_type"],
        merge_sum,
    ).materialize()

    def top1(by: str, tie: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                [by, "w", tie], ascending=[True, False, True],
                kind="mergesort",
            )
            return df.groupby(by, as_index=False).head(1)

        return f

    matched_rounds = []
    for rnd in (1, 2):
        pick_u = coarse_group_reduce(edges, "user_id", top1("user_id", "event_type"))
        pick_t = coarse_group_reduce(edges, "event_type", top1("event_type", "user_id"))

        def agree(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["user_id", "event_type"], as_index=False).agg(
                n=("w", "size"), w=("w", "first")
            )
            g = g[g["n"] == 2][["user_id", "event_type", "w"]]
            return g.astype({"user_id": "int64", "w": "int64"})

        matched = pd.DataFrame(
            collect_rows(
                coarse_group_reduce(
                    pick_u.union(pick_t), ["user_id", "event_type"], agree
                )
            ),
            columns=["user_id", "event_type", "w"],
        )
        matched["round"] = np.int64(rnd)
        matched_rounds.append(matched)
        if rnd == 2:
            break
        mu = ray.put(
            pa.array(sorted(set(matched["user_id"].tolist())), pa.int64())
        )
        mt = ray.put(
            pa.array(
                sorted(set(matched["event_type"].tolist())), pa.string()
            )
        )

        def survives(b: pa.Table) -> pa.Table:
            import ray as _ray

            us, ts = _ray.get(mu), _ray.get(mt)
            keep = pc.and_(
                pc.invert(pc.is_in(b["user_id"], value_set=us)),
                pc.invert(pc.is_in(b["event_type"], value_set=ts)),
            )
            return b.filter(keep)

        edges = edges.map_batches(
            survives, batch_format="pyarrow"
        ).materialize()

    out = pd.concat(matched_rounds, ignore_index=True)
    return out.astype(
        {"user_id": "int64", "w": "int64", "round": "int64"}
    )[["user_id", "event_type", "w", "round"]]


def q283_global_kth_value(sf_dir: str):
    """EXACT GLOBAL ORDER STATISTIC WITHOUT A SORT — the lower median
    of lineitem price cents by HISTOGRAM DESCENT: O(log_B(range))
    full-column passes, each a vectorized per-batch bincount whose
    shuffle payload is ≤ B=4096 (bucket, count) rows; the driver only
    ever walks a 4096-row histogram to pick the bucket holding rank k,
    then recurses into it. This is how a 10¹²-row engine computes an
    exact percentile when `sort` (an all-to-all exchange of every row)
    is off the table — the grouped quantile family (q60/q66) co-locates
    per group; this is the single-giant-group escape
    (`stages/wide.py:global_order_stats` is the multi-k generalization;
    this asks it for one rank)."""
    from basicocr_ray.stages.wide import global_order_stats

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["l_extendedprice"].combine_chunks().to_numpy()
        return pa.table(
            {"c": pa.array(np.floor(v * 100.0).astype(np.int64))}
        )

    cds = ds.map_batches(cents, batch_format="pyarrow").materialize()
    n = cds.count()
    k = (n + 1) // 2
    kth = global_order_stats(cds, [k])[k]
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "k": pd.array([k], dtype="int64"),
            "kth_value": pd.array([kth], dtype="int64"),
        }
    )


def q284_ks_statistic(sf_dir: str):
    """TWO-SAMPLE KOLMOGOROV–SMIRNOV EVIDENCE between the value
    distributions of the two lexicographically-first event types, as
    the EXACT INTEGER numerator D·n1·n2 = max over thresholds of
    |cum1·n2 − cum2·n1| (the consumer divides once for D). The ordered
    cumulative max never sorts rows: per-value counts reduce in coarse
    hash groups, each count row lands in one of 256 RANGE buckets, the
    in-bucket prefix extrema (min/max of the running diff) reduce per
    bucket, and the driver chains 256 bounded summaries with a running
    offset — the q35 two-phase-scan discipline applied to a max-of-
    prefix functional. int64-exact while n1·n2 < 2⁶³ (document: rescale
    counts for larger corpora)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    types = sorted(
        t for t in ds.unique("event_type") if t is not None
    )[:2]
    ta, tb = types[0], types[1]

    def per_value(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        keep = et.isin([ta, tb]).to_numpy()
        v = np.floor(
            b["value"].combine_chunks().to_numpy()[keep] * 100.0
        ).astype(np.int64)
        is_a = (et[keep] == ta).to_numpy()
        df = pd.DataFrame(
            {
                "v": v,
                "c1": is_a.astype(np.int64),
                "c2": (~is_a).astype(np.int64),
            }
        ).groupby("v", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False)[["c1", "c2"]].sum()
        return g.astype({"v": "int64", "c1": "int64", "c2": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(per_value, batch_format="pyarrow"), "v", merge
    ).materialize()

    # totals (tiny scalar reduce), then 256 range buckets
    from ray.data.aggregate import Max, Min, Sum

    tot = counts.aggregate(
        Sum("c1", alias_name="n1"), Sum("c2", alias_name="n2"),
        Min("v", alias_name="vlo"), Max("v", alias_name="vhi"),
    )
    n1, n2 = int(tot["n1"]), int(tot["n2"])
    vlo, vhi = int(tot["vlo"]), int(tot["vhi"]) + 1
    NB = 256
    w = -(-(vhi - vlo) // NB)

    def add_rb(b: pa.Table) -> pa.Table:
        v = b["v"].combine_chunks().to_numpy()
        return b.append_column(
            "rb", pa.array(((v - vlo) // w).astype(np.int64))
        )

    def bucket_summary(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rb, g in df.groupby("rb"):
            g = g.sort_values("v", kind="mergesort")
            d = (g["c1"].to_numpy() * n2 - g["c2"].to_numpy() * n1).cumsum()
            out.append(
                (
                    int(rb),
                    int(g["c1"].sum()),
                    int(g["c2"].sum()),
                    int(d.min()),
                    int(d.max()),
                )
            )
        return pd.DataFrame(
            out, columns=["rb", "s1", "s2", "dmin", "dmax"]
        ).astype("int64")

    summaries = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                counts.map_batches(add_rb, batch_format="pyarrow"),
                "rb",
                bucket_summary,
            )
        ),
        columns=["rb", "s1", "s2", "dmin", "dmax"],
    ).sort_values("rb")

    off = 0
    d_num = 0
    for _, r in summaries.iterrows():
        d_num = max(d_num, abs(off + int(r["dmax"])), abs(off + int(r["dmin"])))
        off += int(r["s1"]) * n2 - int(r["s2"]) * n1
    return pd.DataFrame(
        {
            "type_a": pd.array([ta], dtype="object"),
            "type_b": pd.array([tb], dtype="object"),
            "n1": pd.array([n1], dtype="int64"),
            "n2": pd.array([n2], dtype="int64"),
            "d_num": pd.array([d_num], dtype="int64"),
        }
    )


def q285_decile_grid(sf_dir: str):
    """JOINT DECILE GRID — the 2-D rank-dependence audit (a discrete
    copula): every event lands in a (value-decile, user-activity-decile)
    cell and the 10×10 contingency matrix falls out. Both decile ladders
    are EXACT order statistics t_j at ranks ceil(j·n/10), computed by
    ONE simultaneous histogram descent each
    (`stages/wide.py:global_order_stats` — O(log_B range) scans total
    for all 9 thresholds, never a sort); band(x) = 1 + #{j: x > t_j}.
    The user's activity band joins back to events through a bucketed
    hash join (user count relation is fact-scale — never broadcast),
    and the grid is a bounded coarse reduce."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import (
        coarse_group_reduce,
        global_order_stats,
    )

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].combine_chunks().to_numpy()
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "v": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    ev = ds.map_batches(cents, batch_format="pyarrow").materialize()
    n = ev.count()
    vks = sorted({-(-(j * n) // 10) for j in range(1, 10)})
    v_stats = global_order_stats(ev, vks, column="v")
    v_thresh = np.array(
        [v_stats[-(-(j * n) // 10)] for j in range(1, 10)], dtype=np.int64
    )

    # per-user activity counts (fact-scale relation, stays distributed)
    def upart(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b["user_id"])
        return pa.table(
            {
                "user_id": pc.cast(vc.field("values"), pa.int64()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def umerge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["cnt"].sum()
        return g.astype({"user_id": "int64", "cnt": "int64"})

    ucnt = coarse_group_reduce(
        ev.map_batches(upart, batch_format="pyarrow"), "user_id", umerge
    ).materialize()
    nu = ucnt.count()
    uks = sorted({-(-(j * nu) // 10) for j in range(1, 10)})
    u_stats = global_order_stats(ucnt, uks, column="cnt")
    u_thresh = np.array(
        [u_stats[-(-(j * nu) // 10)] for j in range(1, 10)], dtype=np.int64
    )

    def uband(b: pa.Table) -> pa.Table:
        c = b["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        # band counts STRICTLY smaller thresholds (ties stay low)
        band = 1 + (c[:, None] > u_thresh[None, :]).sum(axis=1)
        return pa.table(
            {
                "user_id": b["user_id"],
                "uband": pa.array(band.astype(np.int64)),
            }
        )

    ubands = ucnt.map_batches(uband, batch_format="pyarrow")

    def vband(b: pa.Table) -> pa.Table:
        v = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        band = 1 + (v[:, None] > v_thresh[None, :]).sum(axis=1)
        return pa.table(
            {
                "user_id": b["user_id"],
                "vband": pa.array(band.astype(np.int64)),
            }
        )

    joined = bucketed_hash_join(
        ev.map_batches(vband, batch_format="pyarrow"),
        ubands,
        key="user_id",
        left_columns=["vband"],
        right_columns=["uband"],
    )

    def grid(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["vband", "uband"], as_index=False).size()
        g = g.rename(columns={"size": "n_events"})
        return g.astype(
            {"vband": "int64", "uband": "int64", "n_events": "int64"}
        )

    return coarse_group_reduce(joined, ["vband", "uband"], grid)


def q286_apportionment(sf_dir: str):
    """LARGEST-REMAINDER (Hamilton) APPORTIONMENT of a 1000-slot sample
    budget across languages ∝ document counts — THE sampling-plan
    operator a corpus curator runs before q47's stratified draw: base =
    ⌊S·cnt/total⌋ per lang, and the S − Σbase leftover slots go one
    each to the largest remainders S·cnt mod total (ties: lang asc).
    Corpus-scale work is one per-lang count reduce; the apportionment
    is exact integer arithmetic on the bounded lang relation (compare
    q269's max-min waterfill — this one is proportional)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    S = 1000
    ds = _read(sf_dir, "documents", columns=["lang"])

    def part(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(
            b["lang"].combine_chunks().filter(
                pc.is_valid(b["lang"].combine_chunks())
            )
        )
        return pa.table(
            {
                "lang": pc.cast(vc.field("values"), pa.string()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", as_index=False)["cnt"].sum()
        return g.astype({"cnt": "int64"})

    rows = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                ds.map_batches(part, batch_format="pyarrow"), "lang", merge
            )
        ),
        columns=["lang", "cnt"],
    ).sort_values("lang").reset_index(drop=True)

    total = int(rows["cnt"].sum())
    base = (S * rows["cnt"].to_numpy()) // total
    rem = (S * rows["cnt"].to_numpy()) % total
    leftover = S - int(base.sum())
    order = np.lexsort((rows["lang"].to_numpy(), -rem))
    extra = np.zeros(len(rows), dtype=np.int64)
    extra[order[:leftover]] = 1
    return pd.DataFrame(
        {
            "lang": rows["lang"],
            "n_docs": rows["cnt"].astype("int64"),
            "slots": pd.array(base + extra, dtype="int64"),
        }
    )


def q287_survival_at_risk(sf_dir: str):
    """KAPLAN–MEIER-STYLE SURVIVAL EVIDENCE for user lifetimes: per
    observed lifetime d (whole days between a user's first and last
    event), how many users END at d and how many were still AT RISK
    (lifetime ≥ d) — the exact integer columns under any survival-curve
    estimator. One exchange co-locates each user (first/last reduce),
    lifetimes histogram in a bounded coarse reduce (the day domain is
    calendar-bounded), and the at-risk suffix sum walks the bounded
    histogram driver-side (the q261/q269 bounded-relation discipline)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "t": pc.cast(
                    pc.cast(b["ts"], pa.timestamp("us")), pa.int64()
                ),
            }
        )

    def upart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["t"].agg(["min", "max"])
        return g.reset_index(drop=True).astype(
            {"user_id": "int64", "min": "int64", "max": "int64"}
        )

    spans = coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow").map_batches(
            upart, batch_format="pandas"
        ),
        "user_id",
        lambda df: df.groupby("user_id", as_index=False)
        .agg({"min": "min", "max": "max"})
        .astype({"user_id": "int64", "min": "int64", "max": "int64"}),
    )

    def lifetime(b: pa.Table) -> pa.Table:
        lo = b["min"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = b["max"].combine_chunks().to_numpy(zero_copy_only=False)
        d = (hi - lo) // 86_400_000_000
        out = pd.DataFrame({"d": d.astype(np.int64)})
        out["n_ending"] = np.int64(1)
        g = out.groupby("d", as_index=False)["n_ending"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                spans.map_batches(lifetime, batch_format="pyarrow"),
                "d",
                lambda df: df.groupby("d", as_index=False)["n_ending"]
                .sum()
                .astype({"d": "int64", "n_ending": "int64"}),
            )
        ),
        columns=["d", "n_ending"],
    ).sort_values("d", ascending=False)

    hist["n_at_risk"] = hist["n_ending"].cumsum()
    hist = hist.sort_values("d").reset_index(drop=True)
    return hist.astype(
        {"d": "int64", "n_ending": "int64", "n_at_risk": "int64"}
    )[["d", "n_ending", "n_at_risk"]]


def q288_gram_matrix(sf_dir: str):
    """DISTRIBUTED GRAM MATRIX — the PCA/whitening prep primitive:
    G = EᵀE over the int-quantized embedding matrix, computed as
    per-batch d×d numpy matmul PARTIALS (the k-means
    broadcast-partials discipline, `stages/kmeans.py`): each batch
    ships at most d(d+1)/2 = 2080 upper-triangle rows regardless of
    row count, a bounded coarse reduce sums them, and nothing
    row-scale ever shuffles. int64-exact: |q| ≤ 10³ per element keeps
    Σq_iq_j < 2⁶³ to 9·10¹² rows (rescale the quantizer beyond)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        V = np.floor(
            np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
            * 1e3
        ).astype(np.int64)
        G = V.T @ V
        d = G.shape[0]
        iu = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu[0].astype(np.int64) + 1),
                "j": pa.array(iu[1].astype(np.int64) + 1),
                "gram": pa.array(G[iu]),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["i", "j"], as_index=False)["gram"].sum()
        return g.astype({"i": "int64", "j": "int64", "gram": "int64"})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), ["i", "j"], merge
    )


def q289_snake_draft_shards(sf_dir: str):
    """SNAKE-DRAFT SHARD BALANCING — the closed-form load-balancing
    heuristic (boustrophedon assignment): hosts ranked by demand desc
    (ties host asc) deal into 8 shards forward-then-backward, so every
    shard gets one pick per round and pick quality alternates — the
    deterministic, coordination-free cousin of LPT bin packing a
    planner can compute INSIDE a row expression. Corpus-scale work is
    one per-host count reduce; ranking + assignment is exact integer
    arithmetic on the bounded 64-row demand relation."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    S = 8
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def part(b: pa.Table) -> pa.Table:
        h = (
            b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
            % 64
        ).astype(np.int64)
        df = pd.DataFrame({"host": h})
        df["demand"] = np.int64(1)
        return pa.Table.from_pandas(
            df.groupby("host", as_index=False).sum(), preserve_index=False
        )

    rows = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                ds.map_batches(part, batch_format="pyarrow"),
                "host",
                lambda df: df.groupby("host", as_index=False)["demand"]
                .sum()
                .astype({"host": "int64", "demand": "int64"}),
            )
        ),
        columns=["host", "demand"],
    )
    order = np.lexsort((rows["host"].to_numpy(), -rows["demand"].to_numpy()))
    r = np.empty(len(rows), dtype=np.int64)  # 0-based rank
    r[order] = np.arange(len(rows))
    rnd, pos = r // S, r % S
    shard = np.where(rnd % 2 == 0, pos, S - 1 - pos)
    out = pd.DataFrame(
        {"shard": shard, "demand": rows["demand"].to_numpy()}
    ).groupby("shard", as_index=False).agg(
        n_hosts=("demand", "size"), total_demand=("demand", "sum")
    )
    return out.astype(
        {"shard": "int64", "n_hosts": "int64", "total_demand": "int64"}
    )


def q290_minplus_apsp(sf_dir: str):
    """ALL-PAIRS SHORTEST PATHS BY MIN-PLUS SQUARING — q278's
    pointer-doubling lifted to the (min, +) semiring: D_{2k}[u,v] =
    min over m of D_k[u,m] + D_k[m,v], so THREE squarings give every
    ≤8-hop shortest path over the weighted host graph (64 nodes, 3
    out-edges of weight 1+(u+v) mod 5, plus zero self-loops). Each
    squaring is ONE bucketed self-join on the middle vertex with the
    per-(u,v) min fused into the join bucket, then a coarse min-reduce
    — log₂(h) rounds instead of h relaxation sweeps, the matrix path
    a distributed engine takes when diameters are shallow."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    H = 64
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hostify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(np.unique(ids % H), pa.int64())})

    def hmerge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop_duplicates("h")
            .astype({"h": "int64"})
            .reset_index(drop=True)
        )

    hosts = coarse_group_reduce(
        ds.map_batches(hostify, batch_format="pyarrow"), "h", hmerge
    ).materialize()

    def seed(b: pa.Table) -> pa.Table:
        hs = b["h"].combine_chunks().to_numpy(zero_copy_only=False)
        u = np.concatenate([np.repeat(hs, 3), hs])
        v = np.concatenate(
            [
                np.stack(
                    [(3 * hs + 1) % H, (5 * hs + 2) % H, (7 * hs + 4) % H],
                    axis=1,
                ).reshape(-1),
                hs,
            ]
        )
        w = np.concatenate(
            [
                (1 + (np.repeat(hs, 3) + np.stack(
                    [(3 * hs + 1) % H, (5 * hs + 2) % H, (7 * hs + 4) % H],
                    axis=1,
                ).reshape(-1)) % 5),
                np.zeros(len(hs), dtype=np.int64),
            ]
        )
        df = pd.DataFrame({"u": u, "v": v, "w": w})
        df = df.groupby(["u", "v"], as_index=False)["w"].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    D = hosts.map_batches(seed, batch_format="pyarrow").materialize()

    def min_uv(t: pa.Table) -> pa.Table:
        out = (
            pa.table(
                {
                    "u": t["u"],
                    "v": t["v2"],
                    "w": pc.add(t["wl"], t["wr"]),
                }
            )
            .group_by(["u", "v"])
            .aggregate([("w", "min")])
        )
        return pa.table(
            {"u": out["u"], "v": out["v"], "w": out["w_min"]}
        )

    for _ in range(3):  # D -> D2 -> D4 -> D8
        left = D.map_batches(
            lambda b: pa.table({"m": b["v"], "u": b["u"], "wl": b["w"]}),
            batch_format="pyarrow",
        )
        right = D.map_batches(
            lambda b: pa.table({"m": b["u"], "v2": b["v"], "wr": b["w"]}),
            batch_format="pyarrow",
        )
        joined = bucketed_hash_join(
            left, right, key="m",
            left_columns=["u", "wl"], right_columns=["v2", "wr"],
            bucket_post_fn=min_uv, num_buckets=4,
        )

        def dmin(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["u", "v"], as_index=False)["w"].min()
            return g.astype({"u": "int64", "v": "int64", "w": "int64"})

        D = coarse_group_reduce(
            joined, ["u", "v"], dmin, num_salt=4
        ).materialize()

    return D.map_batches(
        lambda b: pa.table(
            {"u": b["u"], "v": b["v"], "dist": b["w"]}
        ),
        batch_format="pyarrow",
    )


def q291_rendezvous_placement(sf_dir: str):
    """RENDEZVOUS (HRW) PLACEMENT CHURN — the consistent-placement
    audit every storage planner runs before resharding: each doc goes
    to argmax over nodes of md5(doc:node), and growing the ring 8→9
    nodes moves only the docs whose new node wins (≈1/9), while
    mod-placement reshuffles ≈8/9. Both assignments are pure per-row
    kernels (no shuffle at all); the verdict is one scalar reduce of
    three counters. The md5 ladder is the house DuckDB-exact hash
    (`md5_number_lower` semantics via core.textstats.md5_low64), so
    the oracle reproduces every argmax bit-for-bit."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def place(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        moved_hrw = 0
        moved_mod = 0
        for did in ids:
            hs = [
                _md5_low64(f"{did}:{node}") for node in range(9)
            ]
            n8 = int(np.argmax(hs[:8]))
            n9 = int(np.argmax(hs))
            if n8 != n9:
                moved_hrw += 1
            if did % 8 != did % 9:
                moved_mod += 1
        return pa.table(
            {
                "n_total": pa.array([len(ids)], pa.int64()),
                "moved_hrw": pa.array([moved_hrw], pa.int64()),
                "moved_mod": pa.array([moved_mod], pa.int64()),
            }
        )

    agg = ds.map_batches(place, batch_format="pyarrow").aggregate(
        Sum("n_total", alias_name="n_total"),
        Sum("moved_hrw", alias_name="moved_hrw"),
        Sum("moved_mod", alias_name="moved_mod"),
    )
    return pd.DataFrame(
        {
            "n_total": pd.array([int(agg["n_total"])], dtype="int64"),
            "moved_hrw": pd.array([int(agg["moved_hrw"])], dtype="int64"),
            "moved_mod": pd.array([int(agg["moved_mod"])], dtype="int64"),
        }
    )


def q292_mannwhitney_u(sf_dir: str):
    """MANN–WHITNEY U EVIDENCE — q284's rank-test sibling: for the two
    lexicographically-first event types, the EXACT INTEGER
    u2 = 2·#{(a,b): vₐ > v_b} + #{vₐ = v_b} (= 2U for sample a; the
    consumer halves/normalizes once). Same scale discipline as the KS
    chain: per-value count reduce → 256 range buckets, each emitting
    (Σc1, Σc2, in-bucket Σc1·prefix2, Σc1·c2) — the cross-bucket term
    is LINEAR in the incoming cum2 offset, so 256 bounded summaries
    chain exactly on the driver. No sort, no pair materialization;
    int64-exact while n1·n2 < 2⁶²."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    types = sorted(
        t for t in ds.unique("event_type") if t is not None
    )[:2]
    ta, tb = types[0], types[1]

    def per_value(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        keep = et.isin([ta, tb]).to_numpy()
        v = np.floor(
            b["value"].combine_chunks().to_numpy()[keep] * 100.0
        ).astype(np.int64)
        is_a = (et[keep] == ta).to_numpy()
        df = pd.DataFrame(
            {
                "v": v,
                "c1": is_a.astype(np.int64),
                "c2": (~is_a).astype(np.int64),
            }
        ).groupby("v", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False)[["c1", "c2"]].sum()
        return g.astype({"v": "int64", "c1": "int64", "c2": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(per_value, batch_format="pyarrow"), "v", merge
    ).materialize()

    from ray.data.aggregate import Max, Min, Sum

    tot = counts.aggregate(
        Sum("c1", alias_name="n1"), Sum("c2", alias_name="n2"),
        Min("v", alias_name="vlo"), Max("v", alias_name="vhi"),
    )
    n1, n2 = int(tot["n1"]), int(tot["n2"])
    vlo, vhi = int(tot["vlo"]), int(tot["vhi"]) + 1
    NB = 256
    w = -(-(vhi - vlo) // NB)

    def add_rb(b: pa.Table) -> pa.Table:
        v = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column(
            "rb", pa.array(((v - vlo) // w).astype(np.int64))
        )

    def bucket_summary(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rb, g in df.groupby("rb"):
            g = g.sort_values("v", kind="mergesort")
            c1 = g["c1"].to_numpy()
            c2 = g["c2"].to_numpy()
            pre2 = np.concatenate([[0], c2.cumsum()[:-1]])
            out.append(
                (
                    int(rb),
                    int(c1.sum()),
                    int(c2.sum()),
                    int((c1 * pre2).sum()),
                    int((c1 * c2).sum()),
                )
            )
        return pd.DataFrame(
            out, columns=["rb", "s1", "s2", "inner_gt", "inner_tie"]
        ).astype("int64")

    summaries = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                counts.map_batches(add_rb, batch_format="pyarrow"),
                "rb",
                bucket_summary,
            )
        ),
        columns=["rb", "s1", "s2", "inner_gt", "inner_tie"],
    ).sort_values("rb")

    gt = tie = 0
    cum2 = 0
    for _, r in summaries.iterrows():
        gt += int(r["inner_gt"]) + cum2 * int(r["s1"])
        tie += int(r["inner_tie"])
        cum2 += int(r["s2"])
    return pd.DataFrame(
        {
            "type_a": pd.array([ta], dtype="object"),
            "type_b": pd.array([tb], dtype="object"),
            "n1": pd.array([n1], dtype="int64"),
            "n2": pd.array([n2], dtype="int64"),
            "u2": pd.array([2 * gt + tie], dtype="int64"),
        }
    )


def q293_ntile_assign(sf_dir: str):
    """DISTRIBUTED NTILE — the row-splitting decile (vs q285's
    value-threshold bands): every event gets its exact
    ``ntile(10) OVER (ORDER BY cents, event_id)`` tile with NO global
    sort, via `stages/sample.py:value_rank` (range-bucket by value →
    O(B) driver offset prefix → per-bucket local sort + arange);
    the tile is then pure closed-form arithmetic on the 0-based rank
    (first n%k tiles get ⌈n/k⌉ rows). Output is the per-tile audit
    (row count + value span) a partitioner would act on."""
    from basicocr_ray.stages.sample import value_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 10
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].combine_chunks().to_numpy()
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "c": pa.array(np.floor(v * 100.0).astype(np.int64)),
            }
        )

    ev = ds.map_batches(cents, batch_format="pyarrow").materialize()
    n = ev.count()
    ranked = value_rank(ev, "c", "event_id")
    q, m = divmod(n, K)

    def tile_of(b: pa.Table) -> pa.Table:
        r = b["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        big = (q + 1) * m  # rows living in the m larger tiles
        tile = np.where(
            r < big, r // (q + 1) + 1, m + (r - big) // q + 1
        ).astype(np.int64)
        return pa.table(
            {"tile": pa.array(tile), "c": b["c"]}
        )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tile", as_index=False).agg(
            n_rows=("c", "size"), min_c=("c", "min"), max_c=("c", "max")
        )
        return g.astype(
            {
                "tile": "int64",
                "n_rows": "int64",
                "min_c": "int64",
                "max_c": "int64",
            }
        )

    return coarse_group_reduce(
        ranked.map_batches(tile_of, batch_format="pyarrow"), "tile", audit
    )


def q294_spearman_evidence(sf_dir: str):
    """SPEARMAN RANK-CORRELATION EVIDENCE between event value and
    event time — q273's Kendall sibling on the rank-difference side:
    exact integers (n, Σd², tie terms Σ(t³−t) for both variables),
    where d uses DOUBLED tie-averaged ranks r2 = 2·cum_lt + cnt + 1
    (so .5 average ranks stay integer and d = r2x − r2y is exact; the
    consumer computes ρ once from the four numbers). Ranks come from
    per-value count reduces + a 256-range-bucket offset chain (the
    q284/q292 two-phase-scan discipline), each row learns its two
    ranks through bucketed hash joins (rank relations are fact-scale,
    never broadcast), and Σd² is one scalar reduce."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = np.floor(
            b["value"].combine_chunks().to_numpy() * 100.0
        ).astype(np.int64)
        t = (
            pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {"x": pa.array(v), "y": pa.array(t)}
        )

    rows = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def ranks_of(col: str):
        """(value, r2, cnt) relation with r2 = 2*cum_lt + cnt + 1, via
        range-bucketed offset chain; plus the Σ(t³−t) tie term."""

        def part(b: pa.Table) -> pa.Table:
            vc = pc.value_counts(b[col].combine_chunks())
            return pa.table(
                {
                    "v": pc.cast(vc.field("values"), pa.int64()),
                    "cnt": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("v", as_index=False)["cnt"].sum()
            return g.astype({"v": "int64", "cnt": "int64"})

        cnts = coarse_group_reduce(
            rows.map_batches(part, batch_format="pyarrow"), "v", merge
        ).materialize()

        from ray.data.aggregate import Max, Min

        agg = cnts.aggregate(
            Min("v", alias_name="lo"), Max("v", alias_name="hi")
        )
        lo, hi = int(agg["lo"]), int(agg["hi"]) + 1
        NB = 256
        w = -(-(hi - lo) // NB)

        def add_rb(b: pa.Table) -> pa.Table:
            v = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
            return b.append_column(
                "rb", pa.array(((v - lo) // w).astype(np.int64))
            )

        bucketed = cnts.map_batches(
            add_rb, batch_format="pyarrow"
        ).materialize()

        sums = pd.DataFrame(
            collect_rows(
                coarse_group_reduce(
                    bucketed,
                    "rb",
                    lambda df: df.groupby("rb", as_index=False)
                    .agg(s=("cnt", "sum"), t3=("cnt", lambda c: int(
                        (c.to_numpy() ** 3 - c.to_numpy()).sum()
                    )))
                    .astype({"rb": "int64", "s": "int64", "t3": "int64"}),
                )
            ),
            columns=["rb", "s", "t3"],
        ).sort_values("rb")
        offs = {}
        acc = 0
        for _, r in sums.iterrows():
            offs[int(r["rb"])] = acc
            acc += int(r["s"])
        tie_term = int(sums["t3"].sum())

        def number(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("v", kind="mergesort")
            pre = np.concatenate([[0], df["cnt"].to_numpy().cumsum()[:-1]])
            base = offs[int(df["rb"].iloc[0])]
            df["r2"] = 2 * (base + pre) + df["cnt"].to_numpy() + 1
            return df[["v", "r2"]].astype({"v": "int64", "r2": "int64"})

        ranked = bucketed.groupby("rb").map_groups(
            number, batch_format="pandas"
        )
        return ranked, tie_term

    rx, tie_x = ranks_of("x")
    ry, tie_y = ranks_of("y")

    jx = bucketed_hash_join(
        rows.map_batches(
            lambda b: pa.table({"v": b["x"], "y": b["y"]}),
            batch_format="pyarrow",
        ),
        rx.map_batches(
            lambda b: pa.table({"v": b["v"], "r2x": b["r2"]}),
            batch_format="pyarrow",
        ),
        key="v",
        left_columns=["y"],
        right_columns=["r2x"],
    )
    jxy = bucketed_hash_join(
        jx.map_batches(
            lambda b: pa.table({"k": b["y"], "r2x": b["r2x"]}),
            batch_format="pyarrow",
        ),
        ry.map_batches(
            lambda b: pa.table({"k": b["v"], "r2y": b["r2"]}),
            batch_format="pyarrow",
        ),
        key="k",
        left_columns=["r2x"],
        right_columns=["r2y"],
    )

    from ray.data.aggregate import Count, Sum

    def d2(b: pa.Table) -> pa.Table:
        dx = b["r2x"].combine_chunks().to_numpy(zero_copy_only=False)
        dy = b["r2y"].combine_chunks().to_numpy(zero_copy_only=False)
        d = dx - dy
        return pa.table({"d2": pa.array(d * d)})

    agg = jxy.map_batches(d2, batch_format="pyarrow").aggregate(
        Count(alias_name="n"), Sum("d2", alias_name="sum_d2")
    )
    return pd.DataFrame(
        {
            "n": pd.array([int(agg["n"])], dtype="int64"),
            "sum_d2": pd.array([int(agg["sum_d2"])], dtype="int64"),
            "tie_x": pd.array([tie_x], dtype="int64"),
            "tie_y": pd.array([tie_y], dtype="int64"),
        }
    )


def q295_chi2_contingency(sf_dir: str):
    """CHI-SQUARE CONTINGENCY EVIDENCE over the (lang × source) table:
    per cell the observed count o, its margins r=Σrow c=Σcol, and the
    EXACT integer deviation numerator dev2 = (n·o − r·c)² — the
    consumer divides by n·r·c once per cell to get χ² (expected =
    r·c/n; (o−e)²/e = dev2/(n·r·c)). One partial+final count reduce
    builds the bounded contingency; margins and deviations are
    arithmetic on that bounded relation. int64-exact while n·o < 2⁶³
    (n < 3·10⁹; rescale beyond)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["lang", "source"])
        g = df.groupby(["lang", "source"], as_index=False).size()
        return g.rename(columns={"size": "o"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False)["o"].sum()
        return g.astype({"o": "int64"})

    cells = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                ds.map_batches(part, batch_format="pandas"),
                ["lang", "source"],
                merge,
            )
        ),
        columns=["lang", "source", "o"],
    )
    n = int(cells["o"].sum())
    r = cells.groupby("lang")["o"].transform("sum").to_numpy()
    c = cells.groupby("source")["o"].transform("sum").to_numpy()
    o = cells["o"].to_numpy()
    dev2 = (n * o - r * c) ** 2
    return pd.DataFrame(
        {
            "lang": cells["lang"],
            "source": cells["source"],
            "o": pd.array(o, dtype="int64"),
            "r": pd.array(r, dtype="int64"),
            "c": pd.array(c, dtype="int64"),
            "dev2": pd.array(dev2, dtype="int64"),
        }
    )


def q296_id_gap_audit(sf_dir: str):
    """ID-SPACE GAP AUDIT — the ingestion-completeness probe: bucket
    the orderkey space by ⌊key/1000⌋ and report, per bucket, how many
    ids are present vs missing inside the bucket's OBSERVED span
    (max−min+1−distinct). A silent loader gap shows up as missing > 0
    without any row-level scan of what *should* exist. Per-batch
    partials carry (bucket, min, max, distinct-set summary) — here
    distinct-per-bucket is exact via in-group pandas nunique after a
    coarse-salted exchange keyed on the bucket (ids of one bucket
    co-locate; buckets are 1000-wide so groups are memory-bounded)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "orders", columns=["o_orderkey"])

    def prep(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array((k // 1000).astype(np.int64)),
                "k": pa.array(k.astype(np.int64)),
            }
        )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bkt")["k"].agg(["min", "max", "nunique"])
        g = g.reset_index()
        out = pd.DataFrame(
            {
                "bkt": g["bkt"].astype("int64"),
                "n_present": g["nunique"].astype("int64"),
                "n_missing": (
                    g["max"] - g["min"] + 1 - g["nunique"]
                ).astype("int64"),
            }
        )
        return out

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"), "bkt", audit
    )


def q297_dict_encode(sf_dir: str):
    """GLOBAL DICTIONARY ENCODING — the columnar-engine verb behind
    every categorical column: build ONE corpus-wide dense code table
    (distinct langs in sorted order → codes 0..G−1; exactly
    ``dense_rank() − 1``) and stamp every row with its code. The
    dictionary build is a distinct reduce (bounded by category
    cardinality), the stamping a broadcast searchsorted — the same
    small-side-broadcast discipline as J1, because a dictionary that
    does NOT fit in a broadcast has no business being dictionary-
    encoded."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def dpart(b: pa.Table) -> pa.Table:
        arr = b["lang"].combine_chunks()
        u = pc.unique(arr.filter(pc.is_valid(arr)))
        return pa.table({"lang": u})

    dic = sorted(
        set(
            pd.DataFrame(
                collect_rows(
                    coarse_group_reduce(
                        ds.map_batches(dpart, batch_format="pyarrow"),
                        "lang",
                        lambda df: df.drop_duplicates("lang").reset_index(
                            drop=True
                        ),
                    )
                ),
                columns=["lang"],
            )["lang"].tolist()
        )
    )
    codes = np.arange(len(dic), dtype=np.int64)
    ref = ray.put((np.array(dic, dtype=object), codes))

    def stamp(b: pa.Table) -> pa.Table:
        import ray as _ray

        vocab, cds = _ray.get(ref)
        b = b.filter(pc.is_valid(b["lang"]))
        langs = b["lang"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vocab, langs)
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang_code": pa.array(cds[idx]),
            }
        )

    return ds.map_batches(stamp, batch_format="pyarrow")


def q298_merge_upsert(sf_dir: str):
    """MERGE INTO — the upsert/delete verb (Delta/Iceberg's core
    mutation) as ONE full-outer bucketed hash join of base vs delta on
    the key, then a vectorized outcome classification: matched+delete
    → deleted, matched+update → updated, matched-only → unchanged,
    delta-only insert → inserted (delete beats update when both
    qualify — the deterministic conflict rule). The delta here derives
    from the base (update ids %7, delete ids %13, 5 fresh inserts) so
    the oracle rebuilds it exactly; at scale the join IS the merge —
    neither side broadcasts, keys shuffle once. Output: per-outcome
    row counts plus the post-merge total."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_docs = ds.count()

    base = ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "in_base": pa.array(
                    np.ones(b.num_rows, dtype=np.int8)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def mk_delta(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        dels = ids[ids % 13 == 0]
        upds = ids[(ids % 7 == 0) & (ids % 13 != 0)]
        # fresh inserts ride along with the batch containing doc_id 0
        ins = (
            np.arange(5, dtype=np.int64) + 10_000_000
            if (ids == 0).any()
            else np.empty(0, dtype=np.int64)
        )
        # op codes: 1=update, 2=delete, 3=insert
        did = np.concatenate([upds, dels, ins])
        op = np.concatenate(
            [
                np.full(len(upds), 1, dtype=np.int8),
                np.full(len(dels), 2, dtype=np.int8),
                np.full(len(ins), 3, dtype=np.int8),
            ]
        )
        return pa.table(
            {
                "doc_id": pa.array(did),
                "op": pa.array(op),
            }
        )

    delta = ds.map_batches(mk_delta, batch_format="pyarrow")

    merged = bucketed_hash_join(
        base, delta, key="doc_id",
        left_columns=["in_base"], right_columns=["op"],
        join_type="full outer",
    )

    def classify(b: pa.Table) -> pa.Table:
        inb = b["in_base"].combine_chunks().to_numpy(zero_copy_only=False)
        op = b["op"].combine_chunks().to_numpy(zero_copy_only=False)
        inb = np.nan_to_num(inb.astype(np.float64), nan=0).astype(np.int8)
        op = np.nan_to_num(op.astype(np.float64), nan=0).astype(np.int8)
        outcome = np.where(
            (inb == 1) & (op == 2), "deleted",
            np.where(
                (inb == 1) & (op == 1), "updated",
                np.where(
                    (inb == 1), "unchanged",
                    np.where(op == 3, "inserted", "orphan_delta"),
                ),
            ),
        )
        df = pd.DataFrame({"outcome": outcome})
        df["n_rows"] = np.int64(1)
        g = df.groupby("outcome", as_index=False)["n_rows"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                merged.map_batches(classify, batch_format="pyarrow"),
                "outcome",
                lambda df: df.groupby("outcome", as_index=False)["n_rows"]
                .sum()
                .astype({"n_rows": "int64"}),
            )
        ),
        columns=["outcome", "n_rows"],
    )
    d = dict(zip(counts["outcome"], counts["n_rows"]))
    final = (
        n_docs - int(d.get("deleted", 0)) + int(d.get("inserted", 0))
    )
    counts = pd.concat(
        [counts, pd.DataFrame({"outcome": ["final"], "n_rows": [final]})],
        ignore_index=True,
    )
    return counts.astype({"n_rows": "int64"})


def q299_rolling_extrema(sf_dir: str):
    """BOUNDED-FRAME ROLLING MIN/MAX — `min/max OVER (... ROWS 2
    PRECEDING)` per user sequence, the monotonic-DEQUE primitive
    (sliding-window minimum; q268's stack sibling): one exchange
    co-locates each user, the in-group kernel is O(n) amortized with
    a two-ended candidate queue — not the O(n·w) rescan the naive
    window does — and the SQL twin is the window frame itself."""
    from collections import deque

    from basicocr_ray.stages.wide import coarse_group_reduce

    W = 3
    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "t": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
                "c": pa.array(
                    np.floor(
                        b["value"].combine_chunks().to_numpy() * 100.0
                    ).astype(np.int64)
                ),
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["t", "event_id"], kind="mergesort")
            c = g["c"].to_numpy()
            n = len(c)
            rmin = np.empty(n, dtype=np.int64)
            rmax = np.empty(n, dtype=np.int64)
            qmin: deque[int] = deque()
            qmax: deque[int] = deque()
            for i in range(n):
                while qmin and qmin[0] <= i - W:
                    qmin.popleft()
                while qmax and qmax[0] <= i - W:
                    qmax.popleft()
                while qmin and c[qmin[-1]] >= c[i]:
                    qmin.pop()
                while qmax and c[qmax[-1]] <= c[i]:
                    qmax.pop()
                qmin.append(i)
                qmax.append(i)
                rmin[i] = c[qmin[0]]
                rmax[i] = c[qmax[0]]
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": np.full(n, uid, dtype=np.int64),
                        "event_id": g["event_id"].to_numpy(),
                        "rmin": rmin,
                        "rmax": rmax,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="int64"),
                    "event_id": pd.array([], dtype="int64"),
                    "rmin": pd.array([], dtype="int64"),
                    "rmax": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"), "user_id", per_user
    )


def q300_cluster_sample(sf_dir: str):
    """TWO-STAGE CLUSTER SAMPLING — the survey-sampling design a
    crawl auditor runs (sample hosts, then docs WITHIN hosts, instead
    of a flat doc draw): stage 1 keeps the 8 hosts with the smallest
    md5('h:'+host) (the bounded host relation ranks driver-side);
    stage 2 keeps each kept host's 5 smallest md5('d:'+doc_id) docs —
    a per-group deterministic bottom-k (q46's discipline, grouped),
    partition/retry-invariant and SQL-reproducible. Output carries
    the within-host rank so downstream weighting can invert the
    inclusion probabilities."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def hostify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(np.unique(ids % 64), pa.int64())})

    hosts = sorted(
        set(
            pd.DataFrame(
                collect_rows(
                    coarse_group_reduce(
                        ds.map_batches(hostify, batch_format="pyarrow"),
                        "h",
                        lambda df: df.drop_duplicates("h").reset_index(
                            drop=True
                        ),
                    )
                ),
                columns=["h"],
            )["h"].tolist()
        )
    )
    kept = set(
        sorted(hosts, key=lambda h: (_md5_low64(f"h:{h}"), h))[:8]
    )

    def stage2_part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        h = (ids % 64).astype(np.int64)
        m = np.isin(h, list(kept))
        ids, h = ids[m], h[m]
        keys = np.array(
            [_md5_low64(f"d:{d}") for d in ids], dtype=np.uint64
        )
        df = pd.DataFrame({"host": h, "doc_id": ids, "k": keys})
        # local prune: keep each host's 5 smallest keys per batch
        df = df.sort_values(["host", "k"], kind="mergesort")
        df = df.groupby("host", as_index=False).head(5)
        return pa.Table.from_pandas(df, preserve_index=False)

    def stage2_final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "k"], kind="mergesort")
        df = df.groupby("host", as_index=False).head(5)
        df["rank_in_host"] = df.groupby("host").cumcount() + 1
        return df[["host", "doc_id", "rank_in_host"]].astype(
            {"host": "int64", "doc_id": "int64", "rank_in_host": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(stage2_part, batch_format="pyarrow"),
        "host",
        stage2_final,
    )


def q301_type_bitmask(sf_dir: str):
    """BEHAVIOR FINGERPRINT BITMASKS — each user's SET of event types
    folded to one integer (bit per dense type code), then the corpus
    histogram of masks: the set-valued aggregate every cohort tool
    runs ("who does exactly {click, view}?"). Type codes come from the
    bounded type dictionary (q297's discipline); the per-user OR is a
    partial-OR inside map_batches then an OR-merge coarse reduce —
    the shuffle carries one int per (user, batch), never event rows —
    and the mask histogram is a second bounded reduce."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    types = sorted(
        t for t in ds.unique("event_type") if t is not None
    )
    code = {t: i for i, t in enumerate(types)}

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=["event_type"]).copy()
        df["m"] = df["event_type"].map(
            lambda t: np.int64(1) << code[t]
        ).astype("int64")
        g = df.groupby("user_id", as_index=False)["m"].agg(
            lambda s: np.bitwise_or.reduce(s.to_numpy())
        )
        return g.astype({"user_id": "int64", "m": "int64"})

    def or_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False)["m"].agg(
            lambda s: np.bitwise_or.reduce(s.to_numpy())
        )
        return g.astype({"user_id": "int64", "m": "int64"})

    masks = coarse_group_reduce(
        ds.map_batches(part, batch_format="pandas"), "user_id", or_merge
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("m", as_index=False).size()
        return g.rename(columns={"m": "mask", "size": "n_users"}).astype(
            {"mask": "int64", "n_users": "int64"}
        )

    return coarse_group_reduce(
        masks.map_batches(
            lambda b: pa.table({"m": b["m"]}), batch_format="pyarrow"
        ),
        "m",
        hist,
    )


def q302_degree_assortativity(sf_dir: str):
    """DEGREE-ASSORTATIVITY EVIDENCE of the user–type bipartite graph:
    over the distinct edge set, the exact integer moments (|E|, Σdu,
    Σdt, Σdu·dt, Σdu², Σdt²) under the Pearson-on-degrees coefficient
    (the consumer forms r once). Edges are a distinct reduce; each
    endpoint degree is a count over the edge relation; edges learn
    BOTH degrees through two bucketed hash joins (degree relations are
    fact-scale — never broadcast) and the six sums are one scalar
    aggregate."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def dpart(df: pd.DataFrame) -> pd.DataFrame:
        return df.dropna(subset=["event_type"]).drop_duplicates(
            ["user_id", "event_type"]
        )

    edges = coarse_group_reduce(
        ds.map_batches(dpart, batch_format="pandas"),
        ["user_id", "event_type"],
        lambda df: df.drop_duplicates(["user_id", "event_type"]).reset_index(
            drop=True
        ),
    ).materialize()

    def deg_of(key: str, out: str):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(key, as_index=False).size()
            return g.rename(columns={"size": out})

        return coarse_group_reduce(
            edges.map_batches(part, batch_format="pandas"),
            key,
            lambda df, _o=out, _k=key: df.groupby(_k, as_index=False)[_o]
            .sum()
            .astype({_o: "int64"}),
        )

    du = deg_of("user_id", "du")
    dt = deg_of("event_type", "dt")

    e1 = bucketed_hash_join(
        edges, du, key="user_id",
        left_columns=["event_type"], right_columns=["du"],
    )
    e2 = bucketed_hash_join(
        e1.map_batches(
            lambda b: pa.table(
                {"event_type": b["event_type"], "du": b["du"]}
            ),
            batch_format="pyarrow",
        ),
        dt,
        key="event_type",
        left_columns=["du"],
        right_columns=["dt"],
    )

    def moments(b: pa.Table) -> pa.Table:
        u = b["du"].combine_chunks().to_numpy(zero_copy_only=False)
        t = b["dt"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_edges": pa.array([len(u)], pa.int64()),
                "sum_du": pa.array([int(u.sum())], pa.int64()),
                "sum_dt": pa.array([int(t.sum())], pa.int64()),
                "sum_dudt": pa.array([int((u * t).sum())], pa.int64()),
                "sum_du2": pa.array([int((u * u).sum())], pa.int64()),
                "sum_dt2": pa.array([int((t * t).sum())], pa.int64()),
            }
        )

    agg = e2.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("n_edges", alias_name="n_edges"),
        Sum("sum_du", alias_name="sum_du"),
        Sum("sum_dt", alias_name="sum_dt"),
        Sum("sum_dudt", alias_name="sum_dudt"),
        Sum("sum_du2", alias_name="sum_du2"),
        Sum("sum_dt2", alias_name="sum_dt2"),
    )
    return pd.DataFrame(
        {
            k: pd.array([int(agg[k])], dtype="int64")
            for k in (
                "n_edges", "sum_du", "sum_dt", "sum_dudt",
                "sum_du2", "sum_dt2",
            )
        }
    )


def q303_number_mining(sf_dir: str):
    """NUMERIC FIELD MINING — pull every digit run out of raw text
    (the price/date/id harvesting step of semi-structured extraction):
    per doc, how many integers appear and their exact sum (runs longer
    than 12 digits are skipped on BOTH sides — overflow fence). The
    kernel is the per-row parse loop the extraction-engine brief
    exempts (compiled regex, findall); everything around it is
    columnar and the op is embarrassingly parallel — no shuffle."""
    import re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pat = re.compile(r"[0-9]+")

    def mine(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n_out = np.zeros(len(ids), dtype=np.int64)
        s_out = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(b["text"].to_pylist()):
            runs = [r for r in pat.findall(t) if len(r) <= 12]
            n_out[i] = len(runs)
            s_out[i] = sum(int(r) for r in runs)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_numbers": pa.array(n_out),
                "sum_numbers": pa.array(s_out),
            }
        )

    return ds.map_batches(mine, batch_format="pyarrow")


def q304_histogram_intersection(sf_dir: str):
    """HISTOGRAM INTERSECTION KERNEL between the two
    lexicographically-first event types — the L∞/L1 family's third
    member (q284 KS, q305 Wasserstein): Σ_v min(c1[v], c2[v]), the
    shared probability mass under the intersection similarity. Needs
    NO prefix chain at all — min is pointwise per value — so it is
    one per-value count reduce with the min folded into the final
    group and a scalar sum: the cheapest of the three tests, worth
    having precisely because of that."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    types = sorted(
        t for t in ds.unique("event_type") if t is not None
    )[:2]
    ta, tb = types[0], types[1]

    def per_value(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        keep = et.isin([ta, tb]).to_numpy()
        v = np.floor(
            b["value"].combine_chunks().to_numpy()[keep] * 100.0
        ).astype(np.int64)
        is_a = (et[keep] == ta).to_numpy()
        df = pd.DataFrame(
            {
                "v": v,
                "c1": is_a.astype(np.int64),
                "c2": (~is_a).astype(np.int64),
            }
        ).groupby("v", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False)[["c1", "c2"]].sum()
        g["inter"] = np.minimum(g["c1"], g["c2"])
        return g.astype(
            {"v": "int64", "c1": "int64", "c2": "int64", "inter": "int64"}
        )

    counts = coarse_group_reduce(
        ds.map_batches(per_value, batch_format="pyarrow"), "v", merge
    )
    agg = counts.aggregate(
        Sum("c1", alias_name="n1"), Sum("c2", alias_name="n2"),
        Sum("inter", alias_name="inter"),
    )
    return pd.DataFrame(
        {
            "type_a": pd.array([ta], dtype="object"),
            "type_b": pd.array([tb], dtype="object"),
            "n1": pd.array([int(agg["n1"])], dtype="int64"),
            "n2": pd.array([int(agg["n2"])], dtype="int64"),
            "inter": pd.array([int(agg["inter"])], dtype="int64"),
        }
    )


def q305_wasserstein_evidence(sf_dir: str):
    """WASSERSTEIN-1 (EARTH MOVER) EVIDENCE between the two
    lexicographically-first event types: the exact integer numerator
    Σ_v |cum1·n2 − cum2·n1| · Δv (consumer divides by n1·n2 once) —
    q284's L∞ statistic integrated into the L1 transport cost. The
    absolute value breaks the single-pass linear-offset trick, so this
    runs the TWO-PASS bounded chain: pass 1 reduces per-range-bucket
    (Σc1, Σc2, vmin, vmax) so the driver derives every bucket's
    incoming (cum1, cum2) offsets and its boundary gap to the next
    bucket; pass 2 re-walks each bucket's values WITH its known offset
    (broadcast, ≤256 entries) and emits one partial transport sum.
    Still nothing row-scale on the driver; still no sort."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    types = sorted(
        t for t in ds.unique("event_type") if t is not None
    )[:2]
    ta, tb = types[0], types[1]

    def per_value(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_pandas()
        keep = et.isin([ta, tb]).to_numpy()
        v = np.floor(
            b["value"].combine_chunks().to_numpy()[keep] * 100.0
        ).astype(np.int64)
        is_a = (et[keep] == ta).to_numpy()
        df = pd.DataFrame(
            {
                "v": v,
                "c1": is_a.astype(np.int64),
                "c2": (~is_a).astype(np.int64),
            }
        ).groupby("v", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False)[["c1", "c2"]].sum()
        return g.astype({"v": "int64", "c1": "int64", "c2": "int64"})

    counts = coarse_group_reduce(
        ds.map_batches(per_value, batch_format="pyarrow"), "v", merge
    ).materialize()

    from ray.data.aggregate import Max, Min

    tot = counts.aggregate(
        Min("v", alias_name="vlo"), Max("v", alias_name="vhi"),
    )
    vlo, vhi = int(tot["vlo"]), int(tot["vhi"]) + 1
    NB = 256
    w = -(-(vhi - vlo) // NB)

    def add_rb(b: pa.Table) -> pa.Table:
        v = b["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column(
            "rb", pa.array(((v - vlo) // w).astype(np.int64))
        )

    bucketed = counts.map_batches(
        add_rb, batch_format="pyarrow"
    ).materialize()

    # pass 1: bounded per-bucket summaries -> offsets + boundary gaps
    summ = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                bucketed,
                "rb",
                lambda df: df.groupby("rb", as_index=False).agg(
                    s1=("c1", "sum"), s2=("c2", "sum"),
                    vmin=("v", "min"), vmax=("v", "max"),
                ).astype("int64"),
            )
        ),
        columns=["rb", "s1", "s2", "vmin", "vmax"],
    ).sort_values("rb").reset_index(drop=True)
    n1 = int(summ["s1"].sum())
    n2 = int(summ["s2"].sum())

    meta: dict[int, tuple[int, int, int]] = {}
    cum1 = cum2 = 0
    for i, r in summ.iterrows():
        nxt = (
            int(summ.iloc[i + 1]["vmin"]) if i + 1 < len(summ) else -1
        )
        meta[int(r["rb"])] = (cum1, cum2, nxt)
        cum1 += int(r["s1"])
        cum2 += int(r["s2"])

    # pass 2: per-bucket transport partial with known offsets
    def transport(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for rb, g in df.groupby("rb"):
            off1, off2, nxt = meta[int(rb)]
            g = g.sort_values("v", kind="mergesort")
            v = g["v"].to_numpy()
            d = (
                (off1 + g["c1"].to_numpy().cumsum()) * n2
                - (off2 + g["c2"].to_numpy().cumsum()) * n1
            )
            if nxt >= 0:
                gaps = np.concatenate([np.diff(v), [nxt - v[-1]]])
            else:
                gaps = np.concatenate([np.diff(v), [0]])
            out.append((int(rb), int((np.abs(d) * gaps).sum())))
        return pd.DataFrame(out, columns=["rb", "part"]).astype("int64")

    parts = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(bucketed, "rb", transport)
        ),
        columns=["rb", "part"],
    )
    return pd.DataFrame(
        {
            "type_a": pd.array([ta], dtype="object"),
            "type_b": pd.array([tb], dtype="object"),
            "n1": pd.array([n1], dtype="int64"),
            "n2": pd.array([n2], dtype="int64"),
            "emd_num": pd.array([int(parts["part"].sum())], dtype="int64"),
        }
    )


def q306_peak_detection(sf_dir: str):
    """CALENDAR PEAK DETECTION — strict local maxima with prominence
    ≥ 2 on each type's DENSE daily count series (missing days count 0,
    the q262 dense-grid discipline): the anomaly-headline primitive
    ("which days spiked"). One bounded (type, day) count reduce; each
    type's calendar-bounded series co-locates and the peak scan is one
    vectorized pass over the dense grid."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = (
            pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "day": (t // 86_400_000_000).astype(np.int64),
            }
        ).dropna(subset=["event_type"])
        g = df.groupby(["event_type", "day"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "c"}), preserve_index=False
        )

    def peaks(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        g0 = df.groupby(["event_type", "day"], as_index=False)["c"].sum()
        for et, g in g0.groupby("event_type"):
            lo, hi = int(g["day"].min()), int(g["day"].max())
            dense = np.zeros(hi - lo + 1, dtype=np.int64)
            dense[g["day"].to_numpy() - lo] = g["c"].to_numpy()
            if len(dense) >= 3:
                mid = dense[1:-1]
                nb = np.maximum(dense[:-2], dense[2:])
                n_peaks = int(((mid > nb) & (mid - nb >= 2)).sum())
            else:
                n_peaks = 0
            out.append((et, hi - lo + 1, n_peaks))
        return pd.DataFrame(
            out, columns=["event_type", "n_days", "n_peaks"]
        ).astype({"n_days": "int64", "n_peaks": "int64"})

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"), "event_type", peaks
    )


def q307_dow_profile(sf_dir: str):
    """DAY-OF-WEEK LOAD PROFILE — the calendar-dimension conformance
    rollup, computed WITHOUT a calendar library: dow = (epoch_day + 4)
    mod 7 (1970-01-01 was a Thursday → 4; 0=Sunday..6=Saturday), pure
    int64
    Arrow arithmetic per batch, partial counts, bounded final — the
    shape every capacity planner and crawl scheduler starts from."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = (
            pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "dow": ((t // 86_400_000_000 + 4) % 7).astype(np.int64),
            }
        ).dropna(subset=["event_type"])
        g = df.groupby(["event_type", "dow"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    return coarse_group_reduce(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "dow"],
        lambda df: df.groupby(["event_type", "dow"], as_index=False)["n"]
        .sum()
        .astype({"dow": "int64", "n": "int64"}),
    )


def q308_lorenz_points(sf_dir: str):
    """LORENZ CURVE POINTS — the inequality curve under q197's Gini:
    users ranked by total spend (asc, ties user asc) split into exact
    ntile(10) deciles, each reporting its user count, its cents, and
    the RUNNING cents through it — (decile, cum_cents) IS the Lorenz
    curve in integers. Per-user totals reduce once; the global
    spend-order rank is `stages/sample.py:value_rank` (range-bucketed,
    no sort); the 10-row cumulative walk is driver arithmetic."""
    from basicocr_ray.stages.sample import value_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 10
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def upart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c"] = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        g = df.groupby("user_id", as_index=False)["c"].sum()
        return g.astype({"user_id": "int64", "c": "int64"})

    totals = coarse_group_reduce(
        ds.map_batches(upart, batch_format="pandas"),
        "user_id",
        lambda df: df.groupby("user_id", as_index=False)["c"]
        .sum()
        .astype({"user_id": "int64", "c": "int64"}),
    ).materialize()
    n = totals.count()
    ranked = value_rank(totals, "c", "user_id")
    q, m = divmod(n, K)

    def tile_sum(df: pd.DataFrame) -> pd.DataFrame:
        r = df["pos"].to_numpy()
        big = (q + 1) * m
        tile = np.where(
            r < big, r // (q + 1) + 1, m + (r - big) // q + 1
        ).astype(np.int64)
        df = pd.DataFrame({"decile": tile, "c": df["c"].to_numpy()})
        g = df.groupby("decile", as_index=False).agg(
            n_users=("c", "size"), cents=("c", "sum")
        )
        return g.astype(
            {"decile": "int64", "n_users": "int64", "cents": "int64"}
        )

    rows = pd.DataFrame(
        collect_rows(
            coarse_group_reduce(
                ranked.map_batches(tile_sum, batch_format="pandas"),
                "decile",
                lambda df: df.groupby("decile", as_index=False)
                .agg(n_users=("n_users", "sum"), cents=("cents", "sum"))
                .astype("int64"),
            )
        ),
        columns=["decile", "n_users", "cents"],
    ).sort_values("decile").reset_index(drop=True)
    rows["cum_cents"] = rows["cents"].cumsum()
    return rows.astype(
        {
            "decile": "int64",
            "n_users": "int64",
            "cents": "int64",
            "cum_cents": "int64",
        }
    )


def q309_casefold_collisions(sf_dir: str):
    """CASEFOLD COLLISION AUDIT — the normalization-risk probe every
    text pipeline should run before lowercasing: lowercase token
    classes that contain MORE THAN ONE distinct raw surface form
    ("The"/"the"/"THE"), with the class's total count, its distinct
    form count, and its winning raw form (count desc, form asc) — the
    dictionary a case-restoring detokenizer would need. Per-batch
    (lower, raw) partial counts on CASE-PRESERVING whitespace tokens
    (token_items lowercases — exactly what this audits, so the split
    here keeps the surface form); one coarse reduce keyed on the
    lowercase class does the class-level fold."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["text"])

    def part(b: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for t in b["text"].to_pylist():
            if t:
                for tok in t.split():
                    cnt[(tok.lower(), tok)] += 1
        rows = sorted(cnt.items())
        return pa.table(
            {
                "lower": pa.array([k[0] for k, _ in rows], pa.string()),
                "raw": pa.array([k[1] for k, _ in rows], pa.string()),
                "cnt": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lower", "raw"], as_index=False)["cnt"].sum()
        out = []
        for lo, grp in g.groupby("lower"):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(
                ["cnt", "raw"], ascending=[False, True], kind="mergesort"
            )
            out.append(
                (
                    lo,
                    int(grp["cnt"].sum()),
                    len(grp),
                    grp["raw"].iloc[0],
                )
            )
        return pd.DataFrame(
            out, columns=["lower", "total", "n_forms", "top_form"]
        ).astype({"total": "int64", "n_forms": "int64"})

    out = coarse_group_reduce(
        ds.map_batches(part, batch_format="pyarrow"), "lower", fold
    ).to_pandas()
    if len(out.columns) == 0:  # empty Datasets surface schema-less
        out = pd.DataFrame(
            {
                "lower": pd.array([], dtype="object"),
                "total": pd.array([], dtype="int64"),
                "n_forms": pd.array([], dtype="int64"),
                "top_form": pd.array([], dtype="object"),
            }
        )
    return out


def q310_control_char_audit(sf_dir: str):
    """CONTROL/INVISIBLE-CHARACTER AUDIT — the cleaning probe for
    copy-paste artifacts: per doc, counts of C0 control chars
    (excluding \\t \\n \\r), zero-width/invisible code points (ZWSP
    ZWNJ ZWJ WJ BOM SHY), and replacement chars U+FFFD — the three
    classes a crawl sanitizer strips or flags. One compiled-regex
    count per class per row (the parse-kernel exemption), no shuffle;
    only flagged docs are emitted so the result is sparse."""
    import re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ctrl = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")
    zw = re.compile(r"[​‌‍⁠﻿­]")
    rep = re.compile(r"�")

    def audit(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        nc = np.zeros(len(ids), dtype=np.int64)
        nz = np.zeros(len(ids), dtype=np.int64)
        nr = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(b["text"].to_pylist()):
            nc[i] = len(ctrl.findall(t))
            nz[i] = len(zw.findall(t))
            nr[i] = len(rep.findall(t))
        keep = (nc + nz + nr) > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64)),
                "n_ctrl": pa.array(nc[keep]),
                "n_zero_width": pa.array(nz[keep]),
                "n_replacement": pa.array(nr[keep]),
            }
        )

    out = ds.map_batches(audit, batch_format="pyarrow").to_pandas()
    if len(out.columns) == 0:  # empty Datasets surface schema-less
        out = pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "n_ctrl": pd.array([], dtype="int64"),
                "n_zero_width": pd.array([], dtype="int64"),
                "n_replacement": pd.array([], dtype="int64"),
            }
        )
    return out


def q311_token_period(sf_dir: str):
    """TOKEN-SEQUENCE PERIOD (KMP failure function) — template/loop
    detection: the smallest p such that token i equals token i+p
    everywhere (p = n − fail[n]; p = n means aperiodic), over each
    doc's first 50 tokens. A doc whose period ≪ length is machine-
    repeated boilerplate. O(n) per doc via the prefix function versus
    the oracle's O(n²·p) candidate scan — same answer. Output: docs
    with n_tokens ≥ 2, their period, and repeats = n // p (≥ 2 flags
    a template)."""
    from basicocr_ray.stages.wide import token_items

    CAP = 50
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def period(toks: list[str]) -> int:
        n = len(toks)
        fail = [0] * (n + 1)
        k = 0
        for i in range(1, n):
            while k and toks[i] != toks[k]:
                k = fail[k]
            if toks[i] == toks[k]:
                k += 1
            fail[i + 1] = k
        return n - fail[n]

    def mine(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_n, out_p = [], [], []
        for i, t in enumerate(b["text"].to_pylist()):
            toks = token_items(t)[:CAP]
            if len(toks) < 2:
                continue
            p = period(toks)
            out_id.append(int(ids[i]))
            out_n.append(len(toks))
            out_p.append(p)
        rep = [n // p for n, p in zip(out_n, out_p)]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "period": pa.array(out_p, pa.int64()),
                "repeats": pa.array(rep, pa.int64()),
            }
        )

    return ds.map_batches(mine, batch_format="pyarrow")


def q312_html_table_extract(sf_dir: str):
    """HTML <table> STRUCTURED-DATA EXTRACTION ROUNDTRIP — the
    table-lifting verb of a crawl curator: orders rows are rendered
    into deterministic HTML pages (boilerplate nav, a 2-column layout
    decoy table, a script whose BODY contains markup-looking '<td>'
    text, then the 3-column data table with a <th> header), and a real
    tag-soup table parser (`core/structured.parse_tables`, built on
    the flagship lexer) must recover every (orderkey, status,
    total_cents) exactly. Render+parse stay inside one map_batches —
    the same per-page scan shape as the flagship extractor; the data
    row filter is structural (exactly 3 <td> cells)."""
    from basicocr_ray.core.structured import parse_tables

    ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    PER_PAGE = 25

    def render(rows: list[tuple[int, str, int]]) -> str:
        body = "".join(
            "<tr><td>%d</td><td>%s</td><td>%d.%02d</td></tr>"
            % (k, _html_escape(s), c // 100, c % 100)
            for k, s, c in rows
        )
        return (
            "<html><head><title>Orders</title>"
            "<script>var cell = '<td>99999</td><tr><td>0</td></tr>';</script>"
            "</head><body>"
            "<table class='nav'><tr><td>Home</td><td>Login</td></tr></table>"
            "<table class='data'>"
            "<tr><th>Order</th><th>Status</th><th>Total</th></tr>"
            + body
            + "</table><p>footer &amp; legal</p></body></html>"
        )

    def roundtrip(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        stats = b["o_orderstatus"].to_pylist()
        cents = np.rint(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100
        ).astype(np.int64)
        out_k, out_s, out_c = [], [], []
        for lo in range(0, len(keys), PER_PAGE):
            rows = [
                (int(keys[i]), stats[i], int(cents[i]))
                for i in range(lo, min(lo + PER_PAGE, len(keys)))
            ]
            page = render(rows)
            for grid in parse_tables(page):
                for row in grid:
                    cells = [c for c in row if c[0] == "td"]
                    if len(row) != len(cells) or len(cells) != 3:
                        continue  # header (th) or layout decoy
                    whole, frac = cells[2][1].split(".")
                    out_k.append(int(cells[0][1]))
                    out_s.append(cells[1][1])
                    out_c.append(int(whole) * 100 + int(frac))
        return pa.table(
            {
                "orderkey": pa.array(out_k, pa.int64()),
                "status": pa.array(out_s, pa.string()),
                "total_cents": pa.array(out_c, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def q313_jsonld_extract(sf_dir: str):
    """JSON-LD METADATA EXTRACTION — the schema.org lifting verb:
    each documents row is rendered as a page whose <head> carries a
    plain-JS decoy script, a WebSite-typed ld+json decoy, and an
    Article-typed ld+json block holding (identifier, inLanguage,
    contentSize); the body is the escaped document text (so scanning
    runs over realistic page bulk). `core/structured.extract_jsonld`
    must locate the Article block among the decoys, json-parse it and
    emit the fields — per-page kernel, no shuffle."""
    import json as _json

    from basicocr_ray.core.structured import extract_jsonld

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def roundtrip(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        langs = b["lang"].to_pylist()
        ncs = b["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_lang, out_n = [], [], []
        for i, t in enumerate(b["text"].to_pylist()):
            meta = {
                "@context": "https://schema.org",
                "@type": "Article",
                "identifier": int(ids[i]),
                "inLanguage": langs[i],
                "contentSize": int(ncs[i]),
            }
            page = (
                "<html><head>"
                "<script>var t = {'@type': 'Article', 'identifier': -1};</script>"
                '<script type="application/ld+json">'
                '{"@type": "WebSite", "identifier": -2}</script>'
                '<script type="application/ld+json">'
                + _json.dumps(meta)
                + "</script></head><body><p>"
                + _html_escape(t)
                + "</p></body></html>"
            )
            arts = extract_jsonld(page, want_type="Article")
            if arts:
                out_id.append(int(arts[0]["identifier"]))
                out_lang.append(arts[0]["inLanguage"])
                out_n.append(int(arts[0]["contentSize"]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def q314_index_coincidence(sf_dir: str):
    """INDEX-OF-COINCIDENCE EVIDENCE — the classic letter-collision
    statistic (Friedman's IC, the language-vs-random detector a crawl
    sanitizer runs on suspect payloads): per doc, n_letters = Σ c_ℓ and
    ic_num = Σ c_ℓ·(c_ℓ−1) over the 26 lowercase ascii letters — the
    exact-integer numerator of IC = Σc(c−1)/(n(n−1)). 26 C-level
    substring counts per row (the same replace-length trick the SQL
    twin uses), map-only, no shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]

    def ic(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        n_l = np.zeros(len(texts), dtype=np.int64)
        num = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tot = 0
            s = 0
            for ch in letters:
                c = t.count(ch)
                tot += c
                s += c * (c - 1)
            n_l[i] = tot
            num[i] = s
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "n_letters": pa.array(n_l),
                "ic_num": pa.array(num),
            }
        )

    return ds.map_batches(ic, batch_format="pyarrow")


# ===========================================================================
# Registry + oracle SQL
# ===========================================================================

QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_orders_topk": q02_orders_topk,
    "q03_revenue_by_status": q03_revenue_by_status,
    "q04_region_rollup": q04_region_rollup,
    "q05_events_hourly": q05_events_hourly,
    "q06_events_asof": q06_events_asof,
    "q07_token_freq": q07_token_freq,
    "q08_bigram_freq": q08_bigram_freq,
    "q09_lang_rollup": q09_lang_rollup,
    "q10_dedup_exact": q10_dedup_exact,
    "q11_fingerprint": q11_fingerprint,
    "q12_token_count": q12_token_count,
    "q13_extract_roundtrip": q13_extract_roundtrip,
    "q14_extract_multiblock": q14_extract_multiblock,
    "q15_ann_cosine": q15_ann_cosine,
    "q16_quality": q16_quality,
    "q17_sessionize": q17_sessionize,
    "q18_topk_per_group": q18_topk_per_group,
    "q19_distinct_langs": q19_distinct_langs,
    "q20_ac_strip": q20_ac_strip,
    "q21_trie_correct": q21_trie_correct,
    "q22_minhash_neardup": q22_minhash_neardup,
    "q23_simhash_dup": q23_simhash_dup,
    "q24_embed_dup_pairs": q24_embed_dup_pairs,
    "q25_normalize": q25_normalize,
    "q26_trigram_freq": q26_trigram_freq,
    "q27_vocab_roundtrip": q27_vocab_roundtrip,
    "q28_events_scalar": q28_events_scalar,
    "q29_orders_by_segment": q29_orders_by_segment,
    "q30_union_distinct": q30_union_distinct,
    "q31_events_sliding": q31_events_sliding,
    "q32_lm_score": q32_lm_score,
    "q40_cjk_segment": q40_cjk_segment,
    "q41_audio_frames": q41_audio_frames,
    "q42_neardup_components": q42_neardup_components,
    "q43_video_frames": q43_video_frames,
    "q44_range_join": q44_range_join,
    "q45_heavy_hitters": q45_heavy_hitters,
    "q46_bottomk_sample": q46_bottomk_sample,
    "q47_stratified_sample": q47_stratified_sample,
    "q48_tf_df": q48_tf_df,
    "q49_trigram_lm_score": q49_trigram_lm_score,
    "q50_conformance_accuracy": q50_conformance_accuracy,
    "q51_jaccard_join_exact": q51_jaccard_join_exact,
    "q52_pii_redact": q52_pii_redact,
    "q53_url_host_rollup": q53_url_host_rollup,
    "q54_grouped_string_agg": q54_grouped_string_agg,
    "q55_global_rank": q55_global_rank,
    "q56_weighted_sample": q56_weighted_sample,
    "q57_anti_join_customers": q57_anti_join_customers,
    "q58_rollup_docs": q58_rollup_docs,
    "q59_knn_join_label": q59_knn_join_label,
    "q60_group_quantile": q60_group_quantile,
    "q61_chained_join_returns": q61_chained_join_returns,
    "q62_skew_join_nation_revenue": q62_skew_join_nation_revenue,
    "q63_lag_delta": q63_lag_delta,
    "q64_tfidf_topk": q64_tfidf_topk,
    "q65_distinct_users": q65_distinct_users,
    "q66_group_quantile_cont": q66_group_quantile_cont,
    "q67_left_join_order_counts": q67_left_join_order_counts,
    "q68_edit1_fuzzy_pairs": q68_edit1_fuzzy_pairs,
    "q69_window_rank": q69_window_rank,
    "q70_mode_user": q70_mode_user,
    "q71_value_histogram": q71_value_histogram,
    "q72_repetition_stats": q72_repetition_stats,
    "q73_props_json_sum": q73_props_json_sum,
    "q74_except_users": q74_except_users,
    "q75_decontaminate": q75_decontaminate,
    "q76_chunk_dedup": q76_chunk_dedup,
    "q77_hopping_window": q77_hopping_window,
    "q78_funnel_stages": q78_funnel_stages,
    "q79_cube_events": q79_cube_events,
    "q80_pivot_user_counts": q80_pivot_user_counts,
    "q81_hash_split": q81_hash_split,
    "q82_intersect_users": q82_intersect_users,
    "q83_share_of_total": q83_share_of_total,
    "q84_full_outer_counts": q84_full_outer_counts,
    "q85_bpe_token_stats": q85_bpe_token_stats,
    "q86_dense_rank_tokens": q86_dense_rank_tokens,
    "q87_oov_rate": q87_oov_rate,
    "q88_curate_corpus": q88_curate_corpus,
    "q89_group_variance": q89_group_variance,
    "q90_value_k_corr": q90_value_k_corr,
    "q91_neardup_survivors": q91_neardup_survivors,
    "q92_kmeans_assign": q92_kmeans_assign,
    "q93_cohort_retention": q93_cohort_retention,
    "q94_lang_mix_weights": q94_lang_mix_weights,
    "q95_pmi_collocations": q95_pmi_collocations,
    "q96_top_supplier_per_part": q96_top_supplier_per_part,
    "q97_ngram_langid": q97_ngram_langid,
    "q98_importance_ratio": q98_importance_ratio,
    "q99_quantile_floor": q99_quantile_floor,
    "q100_sequence_packing": q100_sequence_packing,
    "q101_crawl_diff": q101_crawl_diff,
    "q102_warc_roundtrip": q102_warc_roundtrip,
    "q103_pagerank_hosts": q103_pagerank_hosts,
    "q104_bpe_merges": q104_bpe_merges,
    "q105_source_lang_entropy": q105_source_lang_entropy,
    "q106_url_canonicalize": q106_url_canonicalize,
    "q107_temperature_mix_sample": q107_temperature_mix_sample,
    "q108_vocab_growth": q108_vocab_growth,
    "q109_lsh_calibration": q109_lsh_calibration,
    "q110_robots_filter": q110_robots_filter,
    "q111_event_transitions": q111_event_transitions,
    "q112_late_events": q112_late_events,
    "q113_chunk_windows": q113_chunk_windows,
    "q114_blocklist_filter": q114_blocklist_filter,
    "q115_ivf_ann_int": q115_ivf_ann_int,
    "q116_gopher_rules": q116_gopher_rules,
    "q117_hll_registers": q117_hll_registers,
    "q118_inverted_index": q118_inverted_index,
    "q119_latest_by_url": q119_latest_by_url,
    "q120_epoch_upsample": q120_epoch_upsample,
    "q121_image_phash_dup": q121_image_phash_dup,
    "q122_cms_audit": q122_cms_audit,
    "q123_simhash_hamming": q123_simhash_hamming,
    "q124_rare_feature_pairs": q124_rare_feature_pairs,
    "q125_crawl_budget": q125_crawl_budget,
    "q126_padding_waste": q126_padding_waste,
    "q127_video_scene_cuts": q127_video_scene_cuts,
    "q128_bloom_semi_audit": q128_bloom_semi_audit,
    "q129_quality_classifier": q129_quality_classifier,
    "q130_embedding_outliers": q130_embedding_outliers,
    "q131_validity_intervals": q131_validity_intervals,
    "q132_png_metadata": q132_png_metadata,
    "q133_audio_silence": q133_audio_silence,
    "q134_duplicate_spans": q134_duplicate_spans,
    "q135_priority_dedup": q135_priority_dedup,
    "q136_winnow_fingerprints": q136_winnow_fingerprints,
    "q137_trailing_distinct": q137_trailing_distinct,
    "q138_group_mad": q138_group_mad,
    "q139_cdc_chunks": q139_cdc_chunks,
    "q140_sorted_neighborhood": q140_sorted_neighborhood,
    "q141_snapshot_chunk_reuse": q141_snapshot_chunk_reuse,
    "q142_profile_columns": q142_profile_columns,
    "q143_bpe_apply": q143_bpe_apply,
    "q144_ref_integrity": q144_ref_integrity,
    "q145_conversion_latency": q145_conversion_latency,
    "q146_crawl_plan": q146_crawl_plan,
    "q147_link_graph": q147_link_graph,
    "q148_pii_scrub_net": q148_pii_scrub_net,
    "q149_negative_samples": q149_negative_samples,
    "q150_thumbnail_dedup": q150_thumbnail_dedup,
    "q151_boilerplate_paras": q151_boilerplate_paras,
    "q152_sparse_dot_topk": q152_sparse_dot_topk,
    "q153_doc_triangles": q153_doc_triangles,
    "q154_group_regression": q154_group_regression,
    "q155_pareto_docs": q155_pareto_docs,
    "q156_semdedup": q156_semdedup,
    "q157_event_pairs_window": q157_event_pairs_window,
    "q158_large_orders": q158_large_orders,
    "q159_span_cut": q159_span_cut,
    "q160_token_budget_mix": q160_token_budget_mix,
    "q161_percent_rank_hist": q161_percent_rank_hist,
    "q162_incremental_neardup": q162_incremental_neardup,
    "q163_incremental_exact": q163_incremental_exact,
    "q164_audio_fp_match": q164_audio_fp_match,
    "q165_migration_checksum": q165_migration_checksum,
    "q166_rrf_fusion": q166_rrf_fusion,
    "q167_margin_mining": q167_margin_mining,
    "q168_zorder_cells": q168_zorder_cells,
    "q169_shingle_containment": q169_shingle_containment,
    "q170_interval_coverage": q170_interval_coverage,
    "q171_edit2_fuzzy_pairs": q171_edit2_fuzzy_pairs,
    "q172_decay_leaderboard": q172_decay_leaderboard,
    "q173_kmv_sketch_ops": q173_kmv_sketch_ops,
    "q174_grouped_covariance": q174_grouped_covariance,
    "q175_neyman_sample": q175_neyman_sample,
    "q176_phrase_positions": q176_phrase_positions,
    "q177_locf_gapfill": q177_locf_gapfill,
    "q178_anchor_text_index": q178_anchor_text_index,
    "q179_merkle_bucket_diff": q179_merkle_bucket_diff,
    "q180_compaction_plan": q180_compaction_plan,
    "q181_skipgram_pairs": q181_skipgram_pairs,
    "q182_quant_recall": q182_quant_recall,
    "q183_feature_hash_collisions": q183_feature_hash_collisions,
    "q184_calibration_bins": q184_calibration_bins,
    "q185_range_splits": q185_range_splits,
    "q186_classifier_agreement": q186_classifier_agreement,
    "q187_auc_evidence": q187_auc_evidence,
    "q188_longest_streak": q188_longest_streak,
    "q189_lang_overlap_matrix": q189_lang_overlap_matrix,
    "q190_reshard_churn": q190_reshard_churn,
    "q191_weighted_draws": q191_weighted_draws,
    "q192_twap_evidence": q192_twap_evidence,
    "q193_burst_rate": q193_burst_rate,
    "q194_benford_audit": q194_benford_audit,
    "q195_k_anonymity": q195_k_anonymity,
    "q196_join_size_exact": q196_join_size_exact,
    "q197_gini_evidence": q197_gini_evidence,
    "q198_attribution": q198_attribution,
    "q199_kwic_contexts": q199_kwic_contexts,
    "q200_release_funnel": q200_release_funnel,
    "q201_ohlc_candles": q201_ohlc_candles,
    "q202_politeness_schedule": q202_politeness_schedule,
    "q203_smoothed_series": q203_smoothed_series,
    "q204_roaring_plan": q204_roaring_plan,
    "q205_peak_concurrency": q205_peak_concurrency,
    "q206_coverage_k90": q206_coverage_k90,
    "q207_pruning_audit": q207_pruning_audit,
    "q208_term_lattice": q208_term_lattice,
    "q209_user_growth": q209_user_growth,
    "q210_ordered_funnel": q210_ordered_funnel,
    "q211_datasheet": q211_datasheet,
    "q212_incremental_rollup": q212_incremental_rollup,
    "q213_cusum_drift": q213_cusum_drift,
    "q214_sequence_disorder": q214_sequence_disorder,
    "q215_autocorr_evidence": q215_autocorr_evidence,
    "q216_weighted_jaccard": q216_weighted_jaccard,
    "q217_graph_reciprocity": q217_graph_reciprocity,
    "q218_histogram_drift": q218_histogram_drift,
    "q219_encoding_advisor": q219_encoding_advisor,
    "q220_next_event_baseline": q220_next_event_baseline,
    "q221_dedup_savings": q221_dedup_savings,
    "q222_fd_discovery": q222_fd_discovery,
    "q223_join_stats_moments": q223_join_stats_moments,
    "q224_json_profile": q224_json_profile,
    "q225_assoc_rules": q225_assoc_rules,
    "q226_fairness_evidence": q226_fairness_evidence,
    "q227_erasure_plan": q227_erasure_plan,
    "q228_familiarity_score": q228_familiarity_score,
    "q229_rle_estimate": q229_rle_estimate,
    "q230_tukey_outliers": q230_tukey_outliers,
    "q231_two_hop_paths": q231_two_hop_paths,
    "q232_norm_histogram": q232_norm_histogram,
    "q233_session_paths": q233_session_paths,
    "q234_type_distance_matrix": q234_type_distance_matrix,
    "q235_seasonality_peak": q235_seasonality_peak,
    "q236_char_profile": q236_char_profile,
    "q237_max_drawdown": q237_max_drawdown,
    "q238_series_corr_evidence": q238_series_corr_evidence,
    "q239_keyness_terms": q239_keyness_terms,
    "q240_debounce_audit": q240_debounce_audit,
    "q241_repartition_manifest": q241_repartition_manifest,
    "q242_freq_spectrum": q242_freq_spectrum,
    "q243_first_relevant_rank": q243_first_relevant_rank,
    "q244_time_in_state": q244_time_in_state,
    "q245_catalog_digest": q245_catalog_digest,
    "q246_promo_revenue_share": q246_promo_revenue_share,
    "q247_slow_orders": q247_slow_orders,
    "q248_supplier_diversity": q248_supplier_diversity,
    "q249_bow_dup_groups": q249_bow_dup_groups,
    "q250_readability_evidence": q250_readability_evidence,
    "q251_order_cadence": q251_order_cadence,
    "q252_rfm_segments": q252_rfm_segments,
    "q253_neighborhood_purity": q253_neighborhood_purity,
    "q254_dq_constraint_suite": q254_dq_constraint_suite,
    "q255_bm25_evidence": q255_bm25_evidence,
    "q256_freshness_report": q256_freshness_report,
    "q257_daily_value_bands": q257_daily_value_bands,
    "q258_split_leakage": q258_split_leakage,
    "q259_encoding_weight": q259_encoding_weight,
    "q260_co_engagement": q260_co_engagement,
    "q261_retention_plan": q261_retention_plan,
    "q262_topk_movers": q262_topk_movers,
    "q263_band_migration": q263_band_migration,
    "q264_trade_flows": q264_trade_flows,
    "q265_brand_profit_topk": q265_brand_profit_topk,
    "q266_domestic_share": q266_domestic_share,
    "q267_kcore_peel": q267_kcore_peel,
    "q268_next_higher": q268_next_higher,
    "q269_waterfill_alloc": q269_waterfill_alloc,
    "q270_frontcode_savings": q270_frontcode_savings,
    "q271_bfs_dist": q271_bfs_dist,
    "q272_weighted_median": q272_weighted_median,
    "q273_kendall_evidence": q273_kendall_evidence,
    "q274_greedy_set_cover": q274_greedy_set_cover,
    "q275_minhash_walk": q275_minhash_walk,
    "q276_mutual_nn_pairs": q276_mutual_nn_pairs,
    "q277_rank_overlap_depth": q277_rank_overlap_depth,
    "q278_pointer_doubling": q278_pointer_doubling,
    "q279_hits_scores": q279_hits_scores,
    "q280_lis_per_lang": q280_lis_per_lang,
    "q281_unpivot_metrics": q281_unpivot_metrics,
    "q282_greedy_matching": q282_greedy_matching,
    "q283_global_kth_value": q283_global_kth_value,
    "q284_ks_statistic": q284_ks_statistic,
    "q285_decile_grid": q285_decile_grid,
    "q286_apportionment": q286_apportionment,
    "q287_survival_at_risk": q287_survival_at_risk,
    "q288_gram_matrix": q288_gram_matrix,
    "q289_snake_draft_shards": q289_snake_draft_shards,
    "q290_minplus_apsp": q290_minplus_apsp,
    "q291_rendezvous_placement": q291_rendezvous_placement,
    "q292_mannwhitney_u": q292_mannwhitney_u,
    "q293_ntile_assign": q293_ntile_assign,
    "q294_spearman_evidence": q294_spearman_evidence,
    "q295_chi2_contingency": q295_chi2_contingency,
    "q296_id_gap_audit": q296_id_gap_audit,
    "q297_dict_encode": q297_dict_encode,
    "q298_merge_upsert": q298_merge_upsert,
    "q299_rolling_extrema": q299_rolling_extrema,
    "q300_cluster_sample": q300_cluster_sample,
    "q301_type_bitmask": q301_type_bitmask,
    "q302_degree_assortativity": q302_degree_assortativity,
    "q303_number_mining": q303_number_mining,
    "q304_histogram_intersection": q304_histogram_intersection,
    "q305_wasserstein_evidence": q305_wasserstein_evidence,
    "q306_peak_detection": q306_peak_detection,
    "q307_dow_profile": q307_dow_profile,
    "q308_lorenz_points": q308_lorenz_points,
    "q309_casefold_collisions": q309_casefold_collisions,
    "q310_control_char_audit": q310_control_char_audit,
    "q311_token_period": q311_token_period,
    "q312_html_table_extract": q312_html_table_extract,
    "q313_jsonld_extract": q313_jsonld_extract,
    "q314_index_coincidence": q314_index_coincidence,
    "q34_bucketed_join_revenue": q34_bucketed_join_revenue,
    "q35_running_totals": q35_running_totals,
    "q36_distinct_pairs": q36_distinct_pairs,
    "q37_event_stats": q37_event_stats,
    "q38_event_median": q38_event_median,
    "q39_staged_extract": q39_staged_extract,
    "q33_image_features": q33_image_features,
}

_TOKS = r"regexp_split_to_array(lower(text), '\s+')"

# 16-bit Morton interleave of two 8-bit ints x, y (x on even bits)
_MORTON16 = " + ".join(
    f"((x >> {i}) & 1) * {1 << (2 * i)} + "
    f"((y >> {i}) & 1) * {1 << (2 * i + 1)}"
    for i in range(8)
)


def _bpe_oracle_sql(steps: int = 5) -> str:
    """Unrolled SQL twin of q104: `steps` rounds of weighted pair count →
    argmax (cnt desc, pair asc) → space-padded non-overlapping replace."""
    parts = [
        f"""WITH w0 AS (
          SELECT trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({_TOKS}) AS token FROM documents)
          WHERE token <> '' GROUP BY 1
        )"""
    ]
    for r in range(1, steps + 1):
        prev = f"w{r - 1}"
        parts.append(
            f""", p{r} AS (
          SELECT pr AS pair, CAST(sum(c) AS BIGINT) AS cnt FROM (
            SELECT c, unnest(list_transform(
              range(1, len(a)), i -> a[i] || ' ' || a[i+1]
            )) AS pr
            FROM (SELECT c, string_split(s, ' ') AS a FROM {prev})
          ) GROUP BY 1
        ), m{r} AS (
          SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
        ), w{r} AS (
          SELECT trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s, c FROM {prev}
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, pair, cnt FROM m{r}"
        for r in range(1, steps + 1)
    )
    parts.append(f" SELECT * FROM ({selects})")
    return "".join(parts)


def _bpe_apply_oracle_sql(steps: int = 5) -> str:
    """Unrolled SQL twin of q143: learn `steps` merges with q104's CTEs
    (weighted pair count over the corpus word-frequency table), apply
    the same replaces to a DISTINCT word map, and roll per-lang
    word/piece totals through a join of the token stream to the map."""
    parts = [
        f"""WITH lt AS (
          SELECT lang, unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        w0 AS (
          SELECT trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({_TOKS}) AS token FROM documents)
          WHERE token <> '' GROUP BY 1
        ),
        v0 AS (
          SELECT DISTINCT token,
                 trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s
          FROM lt
        )"""
    ]
    for r in range(1, steps + 1):
        prev = f"w{r - 1}"
        parts.append(
            f""", p{r} AS (
          SELECT pr AS pair, CAST(sum(c) AS BIGINT) AS cnt FROM (
            SELECT c, unnest(list_transform(
              range(1, len(a)), i -> a[i] || ' ' || a[i+1]
            )) AS pr
            FROM (SELECT c, string_split(s, ' ') AS a FROM {prev})
          ) GROUP BY 1
        ), m{r} AS (
          SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
        ), w{r} AS (
          SELECT trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s, c FROM {prev}
        ), v{r} AS (
          SELECT token, trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s FROM v{r - 1}
        )"""
        )
    parts.append(
        f""" SELECT lt.lang, count(*) AS n_words,
               CAST(sum(len(string_split(v{steps}.s, ' '))) AS BIGINT)
                 AS n_pieces
        FROM lt JOIN v{steps} ON lt.token = v{steps}.token
        GROUP BY 1"""
    )
    return "".join(parts)


ORACLE_SQL = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_orders_topk": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q03_revenue_by_status": """
        SELECT l_linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
    "q04_region_rollup": """
        SELECT r_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q05_events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q06_events_asof": """
        SELECT e.event_id,
               o.event_id AS prior_event_id,
               epoch_us(e.ts) - epoch_us(o.ts) AS gap_us
        FROM events e
        ASOF JOIN events o
          ON e.user_id = o.user_id AND e.ts > o.ts
        WHERE e.event_type = 'purchase'
    """,
    "q07_token_freq": f"""
        SELECT token, count(*) AS cnt FROM (
          SELECT unnest({_TOKS}) AS token FROM documents
        ) WHERE token <> ''
        GROUP BY token ORDER BY cnt DESC, token LIMIT 100
    """,
    "q08_bigram_freq": f"""
        SELECT bigram, count(*) AS cnt FROM (
          SELECT unnest(list_transform(
            range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]
          )) AS bigram
          FROM (SELECT {_TOKS} AS toks FROM documents)
        ) GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 100
    """,
    "q26_trigram_freq": f"""
        SELECT trigram, count(*) AS cnt FROM (
          SELECT unnest(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS trigram
          FROM (SELECT {_TOKS} AS toks FROM documents)
        ) GROUP BY trigram ORDER BY cnt DESC, trigram LIMIT 100
    """,
    "q09_lang_rollup": """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_chars
        FROM documents GROUP BY lang
    """,
    "q10_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q11_fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    "q12_token_count": f"""
        SELECT doc_id,
               len(list_filter({_TOKS}, t -> t <> '')) AS n_tokens
        FROM documents
    """,
    "q13_extract_roundtrip": """
        SELECT doc_id, text AS main_text FROM documents
    """,
    "q14_extract_multiblock": """
        SELECT doc_id, text AS main_text FROM documents
    """,
    "q15_ann_cosine": """
        SELECT e2.vec_id,
               round(list_cosine_similarity(
                 CAST(e1.embedding AS DOUBLE[]),
                 CAST(e2.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e1, embeddings e2
        WHERE e1.vec_id = 0 AND e2.vec_id <> 0
        ORDER BY list_cosine_similarity(
                 CAST(e1.embedding AS DOUBLE[]),
                 CAST(e2.embedding AS DOUBLE[])) DESC, e2.vec_id
        LIMIT 10
    """,
    "q16_quality": f"""
        SELECT doc_id,
               len(list_filter(toks, t -> t <> '')) AS n_tokens,
               len(list_filter(toks,
                   t -> t IN ('the','a','data','key','value'))) AS n_stop,
               CASE WHEN len(list_filter(toks, t -> t <> '')) = 0 THEN 0.0
                    ELSE round(
                      len(list_filter(toks,
                        t -> t IN ('the','a','data','key','value')))::DOUBLE
                      / len(list_filter(toks, t -> t <> '')), 6)
               END AS stop_ratio
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    """,
    "q17_sessionize": """
        SELECT user_id, count(*) AS n_events,
               CAST(sum(is_new) AS BIGINT) AS n_sessions
        FROM (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                      THEN 1 ELSE 0 END AS is_new
          FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
          )
        ) GROUP BY user_id
    """,
    "q18_topk_per_group": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 2
    """,
    "q19_distinct_langs": "SELECT DISTINCT lang FROM documents",
    "q20_ac_strip": """
        SELECT doc_id,
               replace(replace(text, 'vector window', ''),
                       'hash scan', '') AS stripped_text
        FROM documents
    """,
    "q21_trie_correct": f"""
        WITH tl AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        toks AS (
          SELECT doc_id, CAST(r.i AS BIGINT) AS i, tl.toks[CAST(r.i AS BIGINT) + 1] AS tok
          FROM tl, range(2000) r(i) WHERE r.i < len(tl.toks)
        ),
        ctoks AS (
          SELECT doc_id, i,
                 CASE WHEN (doc_id + i) % 7 = 0 AND len(tok) > 3
                      THEN substr(tok, 1, len(tok) - 1) ELSE tok END AS ctok
          FROM toks
        ),
        dict AS (
          SELECT tok AS word, count(*) AS freq FROM toks GROUP BY tok
        ),
        distinct_c AS (SELECT DISTINCT ctok FROM ctoks),
        best AS (
          SELECT ctok, word FROM (
            SELECT c.ctok, d.word,
                   row_number() OVER (
                     PARTITION BY c.ctok
                     ORDER BY levenshtein(c.ctok, d.word),
                              CASE WHEN len(d.word) = len(c.ctok)
                                   THEN 0 ELSE 1 END,
                              d.freq DESC, d.word) AS rn
            FROM distinct_c c CROSS JOIN dict d
            WHERE levenshtein(c.ctok, d.word) <= 4
          ) WHERE rn = 1
        )
        SELECT t.doc_id,
               string_agg(COALESCE(b.word, t.ctok), ' ' ORDER BY t.i)
                 AS corrected_text
        FROM ctoks t LEFT JOIN best b ON b.ctok = t.ctok
        GROUP BY t.doc_id
    """,
    "q22_minhash_neardup": """
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (len(list_intersect(a.g, b.g))::DOUBLE
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) >= 0.8
    """,
    "q23_simhash_dup": """
        SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents
    """,
    "q24_embed_dup_pairs": """
        SELECT vec_id AS id_a, vec_id + 10000 AS id_b FROM embeddings
    """,
    "q25_normalize": """
        SELECT doc_id, lower(text) AS norm_text FROM documents
    """,
    "q27_vocab_roundtrip": """
        SELECT doc_id,
               length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
                 AS n_codes,
               TRUE AS roundtrip_ok
        FROM documents
    """,
    "q31_events_sliding": """
        SELECT user_id, window_start, count(*) AS n FROM (
          SELECT user_id,
                 -- integer µs floor-division: epoch(ts)::BIGINT would
                 -- ROUND fractional seconds and shift boundary events
                 unnest([ (epoch_us(ts) // 1800000000) * 1800,
                          (epoch_us(ts) // 1800000000) * 1800 - 1800 ])
                   AS window_start
          FROM events
        ) GROUP BY user_id, window_start
    """,
    "q32_lm_score": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1]
          )) AS bigram
          FROM toks
        ),
        cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
        per_doc AS (
          SELECT bg.doc_id, CAST(sum(cnt.c) AS BIGINT) AS sum_bigram_count
          FROM bg JOIN cnt USING (bigram) GROUP BY bg.doc_id
        )
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               COALESCE(p.sum_bigram_count, 0) AS sum_bigram_count
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
    "q40_cjk_segment": f"""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_segments,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_segments
        FROM (SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
              FROM documents)
    """,
    "q45_heavy_hitters": f"""
        SELECT token, count(*) AS cnt FROM (
          SELECT unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ) GROUP BY token HAVING count(*) >= 40
    """,
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
    "q48_tf_df": f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks
          GROUP BY doc_id, token HAVING count(*) >= 2
        ),
        df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
        )
        SELECT tf.doc_id, tf.token, tf.tf, df.df
        FROM tf JOIN df USING (token)
    """,
    "q65_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q73_props_json_sum": """
        SELECT event_type,
               CAST(sum(TRY_CAST(
                 regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT))
                 AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q74_except_users": """
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click' AND value > 95
        EXCEPT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 95
    """,
    "q69_window_rank": """
        SELECT event_id, event_type,
               ROW_NUMBER() OVER w AS rn,
               NTILE(4) OVER w AS tile,
               PERCENT_RANK() OVER w AS pr
        FROM events
        WHERE value IS NOT NULL
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    "q70_mode_user": """
        WITH c AS (
          SELECT event_type, user_id, count(*) AS n
          FROM events GROUP BY event_type, user_id
        ), r AS (
          SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY n DESC, user_id ASC
          ) AS rn FROM c
        )
        SELECT event_type, user_id AS mode_user, n AS n_events
        FROM r WHERE rn = 1
    """,
    "q71_value_histogram": """
        WITH s AS (
          SELECT event_type, min(value) AS lo, max(value) AS hi
          FROM events WHERE value IS NOT NULL GROUP BY event_type
        )
        SELECT e.event_type,
               CASE WHEN s.hi = s.lo THEN 0
                    ELSE least(
                      CAST(floor((e.value - s.lo) / ((s.hi - s.lo) / 16)) AS BIGINT),
                      15)
               END AS bin,
               count(*) AS n
        FROM events e JOIN s ON e.event_type = s.event_type
        WHERE e.value IS NOT NULL
        GROUP BY 1, 2
    """,
    "q72_repetition_stats": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        )
        SELECT doc_id,
               greatest(len(ts) - 1, 0) AS n_bigrams,
               CASE WHEN len(ts) < 2 THEN 0
                    ELSE len(list_distinct(list_transform(
                           generate_series(1, CAST(len(ts) - 1 AS BIGINT)),
                           i -> ts[i] || chr(31) || ts[i+1])))
               END AS n_distinct
        FROM toks
    """,
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
    "q76_chunk_dedup": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        ), chunks AS (
          SELECT doc_id,
                 unnest(generate_series(1, nch)) AS idx,
                 unnest(list_transform(
                   generate_series(1, nch),
                   i -> array_to_string(ts[(i-1)*10+1 : i*10], ' '))) AS chunk
          FROM (SELECT doc_id, ts,
                       CAST(ceil(len(ts) / 10.0) AS BIGINT) AS nch
                FROM toks)
        ), kept AS (
          SELECT doc_id, idx, chunk FROM (
            SELECT doc_id, idx, chunk,
                   row_number() OVER (
                     PARTITION BY chunk ORDER BY doc_id, idx) AS rn
            FROM chunks)
          WHERE rn = 1
        )
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY idx) AS clean_text,
               count(*) AS n_chunks
        FROM kept GROUP BY doc_id
    """,
    "q77_hopping_window": """
        WITH e AS (
          SELECT time_bucket(INTERVAL '30 minutes', ts) AS f,
                 event_type, value
          FROM events
        ), fan AS (
          SELECT unnest([f, f - INTERVAL '30 minutes']) AS wstart,
                 event_type, value
          FROM e
        )
        SELECT wstart, event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM fan GROUP BY 1, 2
    """,
    "q78_funnel_stages": """
        WITH s AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ), c AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s.t1
          GROUP BY e.user_id
        ), p AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id
        )
        SELECT s.user_id,
               CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         ELSE 1 END AS BIGINT) AS stage
        FROM s
        LEFT JOIN c ON s.user_id = c.user_id
        LEFT JOIN p ON s.user_id = p.user_id
    """,
    "q79_cube_events": """
        SELECT event_type, strftime(ts, '%a') AS dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events
        GROUP BY CUBE(event_type, strftime(ts, '%a'))
    """,
    "q80_pivot_user_counts": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                 AS n_click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                 AS n_error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                 AS n_purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
                 AS n_signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                 AS n_view
        FROM events GROUP BY user_id
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
    "q82_intersect_users": """
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click' AND value > 95
        INTERSECT
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 95
    """,
    "q83_share_of_total": """
        WITH s AS (
          SELECT event_type,
                 sum(CAST(round(value * 100) AS BIGINT)) AS sc
          FROM events GROUP BY event_type
        )
        SELECT event_type, CAST(sc AS BIGINT) AS sum_cents,
               CAST(sc AS DOUBLE) / CAST(sum(sc) OVER () AS DOUBLE)
                 AS share
        FROM s
    """,
    "q84_full_outer_counts": """
        WITH c AS (
          SELECT user_id, count(*) AS n_click FROM events
          WHERE event_type = 'click' AND value > 95 GROUP BY user_id
        ), p AS (
          SELECT user_id, count(*) AS n_purchase FROM events
          WHERE event_type = 'purchase' AND value > 95 GROUP BY user_id
        )
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               c.n_click, p.n_purchase
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    """,
    "q85_bpe_token_stats": """
        WITH t AS (
          SELECT doc_id, lower(coalesce(text, '')) AS s FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s, '[a-z]+')) AS BIGINT)
                 AS n_alpha,
               CAST(len(regexp_extract_all(s, '[0-9]+')) AS BIGINT)
                 AS n_num,
               CAST(len(regexp_extract_all(s, '[^a-z0-9 \\t\\n\\r\\f]'))
                 AS BIGINT) AS n_other,
               CAST(len(regexp_extract_all(s, '[a-z]+'))
                    + len(regexp_extract_all(s, '[0-9]+'))
                    + len(regexp_extract_all(s, '[^a-z0-9 \\t\\n\\r\\f]'))
                 AS BIGINT) AS n_bpe_tokens
        FROM t
    """,
    "q86_dense_rank_tokens": """
        WITH tok AS (
          SELECT lang,
                 unnest(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '')) AS token
          FROM documents
        ), c AS (
          SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
        ), r AS (
          SELECT *, dense_rank() OVER (
            PARTITION BY lang ORDER BY n DESC) AS rnk
          FROM c
        )
        SELECT lang, token, CAST(n AS BIGINT) AS n,
               CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 2
    """,
    "q87_oov_rate": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '')) AS token
          FROM documents
        ), cnt AS (
          SELECT token, count(*) AS n FROM tok GROUP BY token
        ), vocab AS (
          SELECT token FROM cnt ORDER BY n DESC, token ASC LIMIT 100
        ), per AS (
          SELECT t.doc_id,
                 count(*) AS n_tokens,
                 count(*) FILTER (
                   t.token NOT IN (SELECT token FROM vocab)) AS n_oov
          FROM tok t GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "q88_curate_corpus": """
        WITH toks AS (
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
          SELECT * FROM dedup
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
    "q89_group_variance": """
        WITH m AS (
          SELECT event_type, count(*) AS n,
                 sum(c) AS s, sum(c * c) AS s2
          FROM (SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events)
          GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(n * s2 - s * s AS DOUBLE)
                 / (CAST(n * (n - 1) AS DOUBLE) * 10000.0) AS var_value
        FROM m
    """,
    "q90_value_k_corr": """
        WITH src AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS x,
                 TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                   AS BIGINT) AS y
          FROM events
        ), f AS (
          SELECT * FROM src WHERE x IS NOT NULL AND y IS NOT NULL
        ), m AS (
          SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sx2, sum(y * y) AS sy2,
                 sum(x * y) AS sxy
          FROM f GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr_vk
        FROM m
    """,
    "q68_edit1_fuzzy_pairs": """
        WITH vocab AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL
            UNION
            SELECT source AS tok FROM documents WHERE source IS NOT NULL
          ) WHERE tok <> ''
        )
        SELECT a.tok AS tok_a, b.tok AS tok_b
        FROM vocab a JOIN vocab b ON a.tok < b.tok
        WHERE levenshtein(a.tok, b.tok) <= 1
    """,
    "q67_left_join_order_counts": """
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    "q66_group_quantile_cont": """
        SELECT event_type, quantile_cont(value, 0.75) AS q_value
        FROM events GROUP BY event_type
    """,
    "q64_tfidf_topk": f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks
          GROUP BY doc_id, token HAVING count(*) >= 2
        ),
        df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
        ),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 (tf.tf * (SELECT count(*) FROM documents))
                   / CAST(df.df AS DOUBLE) AS score
          FROM tf JOIN df USING (token)
        )
        SELECT doc_id, token, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token
          ) AS rn FROM scored
        ) WHERE rn <= 3
    """,
    "q49_trigram_lm_score": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        tg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS trigram
          FROM toks
        ),
        cnt AS (SELECT trigram, count(*) AS c FROM tg GROUP BY trigram),
        per_doc AS (
          SELECT tg.doc_id, CAST(sum(cnt.c) AS BIGINT) AS sum_trigram_count
          FROM tg JOIN cnt USING (trigram) GROUP BY tg.doc_id
        )
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               COALESCE(p.sum_trigram_count, 0) AS sum_trigram_count
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
    "q50_conformance_accuracy": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE doc_id % 7 <> 0) AS BIGINT)
                 AS n_exact
        FROM documents GROUP BY lang
    """,
    "q51_jaccard_join_exact": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS s
          FROM toks
        ),
        sized AS (SELECT doc_id, s, len(s) AS n FROM sets),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.s, b.s)) AS n_inter,
                 a.n + b.n - len(list_intersect(a.s, b.s)) AS n_union
          FROM sized a JOIN sized b
            ON a.doc_id < b.doc_id
           AND least(a.n, b.n) >= 0.6 * greatest(a.n, b.n)
        )
        SELECT id_a, id_b,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST(n_union AS BIGINT) AS n_union
        FROM cand
        WHERE n_union > 0 AND n_inter >= 0.6 * n_union
    """,
    "q52_pii_redact": r"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' contact-' || CAST(doc_id AS VARCHAR)
                           || '@example.com'
                      ELSE text END AS t
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
               )) AS BIGINT) AS n_emails,
               CAST(length(t) - length(regexp_replace(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'
               )) AS BIGINT) AS n_removed,
               md5(regexp_replace(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'
               )) AS redacted_md5
        FROM planted
    """,
    "q53_url_host_rollup": """
        WITH planted AS (
          SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                 || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url,
                 n_chars
          FROM documents
        )
        SELECT split_part(url, '/', 3) AS host,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM planted GROUP BY host
    """,
    "q54_grouped_string_agg": """
        WITH ranked AS (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        )
        SELECT o_orderstatus,
               string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY o_totalprice DESC, o_orderkey) AS top_keys
        FROM ranked WHERE rn <= 3 GROUP BY o_orderstatus
    """,
    "q55_global_rank": """
        SELECT doc_id,
               row_number() OVER (
                 ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS pos
        FROM documents
    """,
    "q150_thumbnail_dedup": """
        -- analytic contract: every (i, i+10000) clone pair survives the
        -- decode -> box-resize -> re-encode -> aHash chain, and ONLY
        -- those pairs (round-half-up mean commutes with the +1 shift)
        SELECT vec_id AS id1, CAST(vec_id + 10000 AS BIGINT) AS id2
        FROM embeddings
    """,
    "q151_boilerplate_paras": """
        -- planted page structure: [text, host footer] (+ promo banner
        -- on even doc_ids); boilerplate = paragraphs in a strict
        -- majority of the host's docs (2*df > n_docs, exact integers)
        WITH d AS (
          SELECT doc_id, 'site' || (doc_id % 7) AS host,
                 CASE WHEN doc_id % 2 = 0 THEN
                   [coalesce(text, ''),
                    'host site' || (doc_id % 7)
                      || ' footer navigation copyright terms privacy'
                      || ' contact',
                    'subscribe newsletter promo banner site'
                      || (doc_id % 7)]
                 ELSE
                   [coalesce(text, ''),
                    'host site' || (doc_id % 7)
                      || ' footer navigation copyright terms privacy'
                      || ' contact']
                 END AS paras
          FROM documents
        ),
        p AS (
          SELECT doc_id, host, unnest(paras) AS para,
                 unnest(range(1, len(paras) + 1)) AS pos
          FROM d
        ),
        hn AS (SELECT host, count(*) AS n_docs FROM d GROUP BY host),
        fdf AS (
          SELECT host, md5(para) AS pm,
                 count(DISTINCT doc_id) AS df
          FROM p GROUP BY 1, 2
        ),
        boiler AS (
          SELECT fdf.host, fdf.pm
          FROM fdf JOIN hn ON fdf.host = hn.host
          WHERE 2 * fdf.df > hn.n_docs
        ),
        kept AS (
          SELECT p.doc_id, p.para, p.pos
          FROM p LEFT JOIN boiler b
            ON p.host = b.host AND md5(p.para) = b.pm
          WHERE b.pm IS NULL
        )
        SELECT d.doc_id,
               CAST(len(d.paras) AS BIGINT) AS n_paras,
               CAST(len(d.paras) - count(k.para) AS BIGINT) AS n_removed,
               md5(coalesce(
                 string_agg(k.para, chr(10) ORDER BY k.pos), ''
               )) AS cleaned_md5
        FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
        GROUP BY d.doc_id, len(d.paras)
    """,
    "q152_sparse_dot_topk": """
        WITH toks AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(text), '\\s+') AS t
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(t)), i -> t[i] || ' ' || t[i+1]
          )) AS term
          FROM toks
        ),
        tf AS (
          SELECT term, doc_id, count(*) AS tf
          FROM bg GROUP BY 1, 2
        ),
        rare AS (
          SELECT term FROM tf GROUP BY term
          HAVING count(*) BETWEEN 2 AND 20
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(sum(x.tf * y.tf) AS BIGINT) AS score
          FROM tf x
          JOIN tf y ON x.term = y.term AND x.doc_id < y.doc_id
          JOIN rare r ON x.term = r.term
          GROUP BY 1, 2
        )
        SELECT a, b, score FROM pairs
        ORDER BY score DESC, a, b LIMIT 20
    """,
    "q153_doc_triangles": """
        -- same graph, id-ordered enumeration (the triangle SET is
        -- orientation-invariant); per-vertex participation counts
        WITH nn AS (SELECT count(*) AS cnt FROM documents),
        e0 AS (
          SELECT doc_id AS i, (doc_id + 1) % cnt AS j FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + 2) % cnt FROM documents, nn
          UNION ALL
          SELECT doc_id, (3 * doc_id + 1) % cnt FROM documents, nn
        ),
        e AS (
          SELECT DISTINCT least(i, j) AS u, greatest(i, j) AS v
          FROM e0 WHERE i <> j
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1
          JOIN e e2 ON e2.u = e1.v
          JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT vertex, count(*) AS n_triangles
        FROM (SELECT unnest([a, b, c]) AS vertex FROM tri)
        GROUP BY vertex
    """,
    "q154_group_regression": """
        -- HUGEINT sufficient statistics, ONE double division per
        -- coefficient, expression shapes identical to the Ray side
        WITH c AS (
          SELECT event_type,
                 CAST(extract(hour FROM ts) AS HUGEINT) AS x,
                 CAST(round(value * 100) AS HUGEINT) AS y
          FROM events
        ),
        m AS (
          SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                 sum(x * y) AS sxy, sum(y * y) AS syy
          FROM c GROUP BY event_type
        ),
        d AS (
          SELECT event_type, n, sx, sy,
                 n * sxx - sx * sx AS dxx,
                 n * sxy - sx * sy AS dxy,
                 n * syy - sy * sy AS dyy
          FROM m
        )
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(dxy AS DOUBLE)
                 / (CAST(dxx AS DOUBLE) * 100.0) AS slope,
               CAST(sy * dxx - dxy * sx AS DOUBLE)
                 / (CAST(n * dxx AS DOUBLE) * 100.0) AS intercept,
               CASE WHEN dxx * dyy = 0 THEN NULL
                    ELSE CAST(dxy * dxy AS DOUBLE)
                         / CAST(dxx * dyy AS DOUBLE) END AS r2
        FROM d
    """,
    "q155_pareto_docs": """
        WITH m AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(len(list_filter(
                   list_distinct(
                     regexp_split_to_array(lower(text), '\\s+')
                   ), t -> t <> ''
                 )) AS BIGINT) AS n_uniq
          FROM documents
        )
        SELECT a.lang, a.doc_id, a.n_chars, a.n_uniq
        FROM m a
        WHERE NOT EXISTS (
          SELECT 1 FROM m b
          WHERE b.lang = a.lang AND b.doc_id <> a.doc_id
            AND b.n_chars >= a.n_chars AND b.n_uniq >= a.n_uniq
            AND (b.n_chars > a.n_chars OR b.n_uniq > a.n_uniq)
        )
    """,
    "q156_semdedup": """
        -- q92's fixed-centroid assignment over corpus ∪ exact clones,
        -- then the SemDeDup lower-id prune; threshold 0.9 sits in the
        -- measured (0.48, 1.0) cosine gap so float noise cannot flip it
        WITH all_v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
          UNION ALL
          SELECT vec_id + 10000, CAST(embedding AS DOUBLE[])
          FROM embeddings
        ),
        cen AS (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 8
        ),
        a AS (
          SELECT all_v.vec_id, cid, v,
                 row_number() OVER (
                   PARTITION BY all_v.vec_id
                   ORDER BY list_distance(v, cvec), cid
                 ) AS rn
          FROM all_v CROSS JOIN cen
        ),
        asg AS (
          SELECT vec_id, cid AS cluster, v FROM a WHERE rn = 1
        )
        SELECT s.vec_id, CAST(s.cluster AS BIGINT) AS cluster
        FROM asg s
        WHERE NOT EXISTS (
          SELECT 1 FROM asg t
          WHERE t.cluster = s.cluster AND t.vec_id < s.vec_id
            AND list_cosine_similarity(t.v, s.v) >= 0.9
        )
    """,
    "q157_event_pairs_window": """
        SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts
         AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
         AND (b.ts > a.ts
              OR (b.ts = a.ts AND b.event_id > a.event_id))
    """,
    "q158_large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(l_quantity) AS BIGINT) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250
        )
        SELECT b.l_orderkey, b.total_qty, o.o_custkey, o.o_totalprice
        FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
    """,
    "q159_span_cut": r"""
        -- q134's maximal duplicated spans, then CUT: md5 of the
        -- space-rejoined kept tokens proves the rewrite byte-for-byte
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(
                   lower(coalesce(text, '')), '\s+'), x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 ) AS fps
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (
          SELECT doc_id, unnest(fps) AS fp,
                 unnest(range(1, len(fps) + 1)) - 1 AS pos
          FROM g0
        ),
        dup AS (
          SELECT fp FROM g GROUP BY fp
          HAVING count(DISTINCT doc_id) >= 2
        ),
        d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (fp)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                      ) <= 5 THEN 0 ELSE 1 END AS brk
          FROM d
        ),
        sp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                 ) AS sid
          FROM isl
        ),
        spans AS (
          SELECT doc_id, sid, min(pos) AS a, max(pos) + 5 AS b
          FROM sp GROUP BY 1, 2
        ),
        pos AS (
          SELECT doc_id, unnest(range(0, len(tk))) AS p FROM toks
        ),
        posw AS (
          SELECT pos.doc_id, p, t.tk[p + 1] AS w
          FROM pos JOIN toks t USING (doc_id)
        ),
        kept AS (
          SELECT doc_id, p, w FROM posw
          WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = posw.doc_id
              AND posw.p >= s.a AND posw.p < s.b
          )
        )
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_words,
               CAST(len(t.tk) - count(k.p) AS BIGINT) AS n_cut,
               md5(coalesce(string_agg(k.w, ' ' ORDER BY k.p), ''))
                 AS kept_md5
        FROM toks t LEFT JOIN kept k ON k.doc_id = t.doc_id
        GROUP BY t.doc_id, len(t.tk)
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
    "q161_percent_rank_hist": """
        -- strict within-lang rank of character length + group size:
        -- integer evidence for percent_rank = n_smaller / (n_lang - 1)
        WITH d AS (
          SELECT doc_id, coalesce(lang, '') AS lang,
                 length(coalesce(text, '')) AS n_chars
          FROM documents
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(rank() OVER (
                 PARTITION BY lang ORDER BY n_chars
               ) - 1 AS BIGINT) AS n_smaller,
               CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                 AS n_lang
        FROM d
    """,
    "q162_incremental_neardup": """
        -- q22's brute-force Jaccard restricted to pairs involving a
        -- wave-2 doc (id_a < id_b and wave-2 ids are the upper range,
        -- so "at least one new" == id_b >= 250)
        WITH sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE b.doc_id >= 250
          AND (len(list_intersect(a.g, b.g))::DOUBLE
               / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) >= 0.8
    """,
    "q164_audio_fp_match": """
        -- analytic contract: every planted 1-second clip (v+10000, cut
        -- from v's tone at sample 4096) matches its source and ONLY it
        -- (measured aligned-match score over all 500 sources: 11 for
        -- true pairs, <=3 else; threshold 7 sits mid-gap)
        SELECT CAST(vec_id + 10000 AS BIGINT) AS clip_id,
               vec_id AS orig_id
        FROM embeddings WHERE vec_id % 4 = 0
    """,
    "q240_debounce_audit": """
        -- suppressed = previous same-(user, type) event within 5 min
        WITH o AS (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS pt
          FROM events
        ),
        f AS (
          SELECT user_id, event_type,
                 CASE WHEN pt IS NOT NULL AND t - pt <= 300000000
                      THEN 1 ELSE 0 END AS sup
          FROM o
        ),
        pu AS (
          SELECT event_type, user_id, count(*) AS n, sum(sup) AS ns
          FROM f GROUP BY 1, 2
        )
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(ns) AS BIGINT) AS n_suppressed,
               CAST(sum(CASE WHEN ns > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_users_affected
        FROM pu GROUP BY 1
    """,
    "q241_repartition_manifest": """
        -- q185's plan + the q165 XOR digest per planned part
        WITH w AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS wt,
                 CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':'
                        || coalesce(text, ''))
                      & 9223372036854775807 AS BIGINT) AS digest
          FROM documents
        ),
        t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w),
        p AS (
          SELECT doc_id, wt, digest,
                 coalesce(sum(wt) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS pre
          FROM w
        ),
        parts AS (
          SELECT *, pre // (SELECT (tot + 7) // 8 FROM t) AS part
          FROM p
        )
        SELECT CAST(part AS BIGINT) AS part, count(*) AS n_docs,
               CAST(sum(wt) AS BIGINT) AS tot_weight,
               min(doc_id) AS id_lo, max(doc_id) AS id_hi,
               CAST(bit_xor(digest) AS BIGINT) AS chk
        FROM parts GROUP BY 1
    """,
    "q242_freq_spectrum": f"""
        -- octave = bit-length − 1 (exact in both engines; no log2)
        WITH toks AS (
          SELECT lang,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        tc AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2)
        SELECT lang, CAST(length(bin(cnt)) - 1 AS BIGINT) AS octave,
               count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS mass
        FROM tc GROUP BY 1, 2
    """,
    "q243_first_relevant_rank": """
        -- rank by exact int-quantized dot (floor(1e3·x) per dim),
        -- ties on cand_id asc; first candidate sharing the query's
        -- label, -1 if the label never recurs
        WITH qv AS (
          SELECT vec_id, label,
                 list_transform(
                   embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
          FROM embeddings
        ),
        pairs AS (
          SELECT a.vec_id AS query_id, a.label AS qlab,
                 b.vec_id AS cand_id, b.label AS clab,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
          FROM qv a JOIN qv b
            ON a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        ranked AS (
          SELECT query_id, (clab = qlab) AS rel,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, cand_id) AS rn
          FROM pairs
        ),
        frr AS (
          SELECT query_id, min(rn) AS r FROM ranked WHERE rel GROUP BY 1
        )
        SELECT q.vec_id AS query_id,
               CAST(coalesce(f.r, -1) AS BIGINT) AS first_rel_rank
        FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) q
        LEFT JOIN frr f ON f.query_id = q.vec_id
    """,
    "q244_time_in_state": """
        -- whole-second gap to the NEXT event of the same user is
        -- attributed to the CURRENT event's type; last events add 0
        WITH o AS (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nt
          FROM events
        )
        SELECT event_type,
               CAST(sum(CASE WHEN nt IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gaps,
               CAST(sum(CASE WHEN nt IS NOT NULL
                             THEN (nt - t) // 1000000 ELSE 0 END)
                    AS BIGINT) AS dwell_s
        FROM o GROUP BY 1
    """,
    "q245_catalog_digest": """
        -- per-table row count, column count, and an order-sensitive
        -- md5-low-63 digest of the comma-joined column-name list
        WITH cols AS (
          SELECT table_name AS tbl,
                 string_agg(column_name, ','
                            ORDER BY ordinal_position) AS names,
                 count(*) AS n_cols
          FROM information_schema.columns
          WHERE table_name IN ('documents', 'events', 'embeddings',
                               'orders', 'lineitem')
          GROUP BY 1
        ),
        cnts AS (
          SELECT 'documents' AS tbl, count(*) AS n FROM documents
          UNION ALL SELECT 'events', count(*) FROM events
          UNION ALL SELECT 'embeddings', count(*) FROM embeddings
          UNION ALL SELECT 'orders', count(*) FROM orders
          UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        )
        SELECT c.tbl, CAST(n.n AS BIGINT) AS n_rows,
               CAST(c.n_cols AS BIGINT) AS n_cols,
               CAST(md5_number_lower(c.names)
                    & 9223372036854775807 AS BIGINT) AS schema_chk
        FROM cols c JOIN cnts n ON n.tbl = c.tbl
    """,
    "q246_promo_revenue_share": """
        -- TPC-H Q14 on this schema; exact cents, the share is the
        -- consumer's division
        SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                    AS BIGINT) AS ship_month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN floor(l_extendedprice * (1 - l_discount) * 100)
                        ELSE 0 END) AS BIGINT) AS promo_cents,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                    AS BIGINT) AS total_cents,
               count(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1
    """,
    "q247_slow_orders": """
        -- TPC-H Q4's EXISTS: any line shipped > 90 days after the
        -- order date (90 d = 7776000000000 us)
        SELECT o_orderpriority,
               count(*) AS n_slow_orders,
               min(o_orderkey) AS first_orderkey
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND epoch_us(l.l_shipdate)
                > epoch_us(o.o_orderdate) + 7776000000000)
        GROUP BY 1
    """,
    "q248_supplier_diversity": """
        -- TPC-H Q16 without partsupp: suppliers observed in lineitem,
        -- credit-watch suppliers (acctbal < 1000) excluded
        SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        GROUP BY 1, 2
    """,
    "q249_bow_dup_groups": f"""
        -- order-insensitive exact dup: md5-low-63 of the sorted
        -- DISTINCT token set (coalesce: empty token list -> '')
        WITH s AS (
          SELECT doc_id,
                 CAST(md5_number_lower(coalesce(array_to_string(
                        list_sort(list_distinct(
                          list_filter({_TOKS}, x -> x <> ''))), ' '), ''))
                      & 9223372036854775807 AS BIGINT) AS sig
          FROM documents WHERE text IS NOT NULL
        )
        SELECT sig, count(*) AS n_docs, min(doc_id) AS first_doc
        FROM s GROUP BY 1 HAVING count(*) >= 2
    """,
    "q250_readability_evidence": f"""
        -- integer Flesch components: words, [.!?]+ sentence segments,
        -- [aeiou]+ vowel groups (syllable proxy); no division
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(list_filter({_TOKS}, x -> x <> '')))
                    AS BIGINT) AS n_words,
               CAST(sum(len(list_filter(
                      regexp_split_to_array(text, '[.!?]+'),
                      x -> x <> ''))) AS BIGINT) AS n_sentences,
               CAST(sum(len(regexp_extract_all(lower(text), '[aeiou]+')))
                    AS BIGINT) AS n_vowel_groups
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL
        GROUP BY 1
    """,
    "q251_order_cadence": """
        -- lower-median whole-day gap between consecutive orders
        -- (element (m-1)//2 of the sorted gap list; -1 if < 2 orders)
        WITH o AS (
          SELECT o_custkey, epoch_us(o_orderdate) AS t,
                 floor(o_totalprice * 100) AS cents,
                 lead(epoch_us(o_orderdate)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS nt
          FROM orders
        ),
        agg AS (
          SELECT o_custkey AS custkey, count(*) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS total_cents
          FROM o GROUP BY 1
        ),
        med AS (
          SELECT o_custkey AS custkey,
                 list_sort(list((nt - t) // 86400000000)) AS gl
          FROM o WHERE nt IS NOT NULL GROUP BY 1
        )
        SELECT a.custkey, a.n_orders, a.total_cents,
               CAST(coalesce(
                 m.gl[CAST((len(m.gl) - 1) // 2 AS INT) + 1], -1
               ) AS BIGINT) AS median_gap_days
        FROM agg a LEFT JOIN med m ON m.custkey = a.custkey
    """,
    "q252_rfm_segments": """
        -- tercile thresholds are the EXACT order statistics at
        -- 1-indexed positions ceil(n/3) and ceil(2n/3) (quantile_disc
        -- convention); bucket: <= t1 -> 0, <= t2 -> 1, else 2
        WITH gm AS (SELECT epoch_us(max(o_orderdate)) AS gmax FROM orders),
        rfm AS (
          SELECT o_custkey,
                 CAST((gm.gmax - epoch_us(max(o_orderdate)))
                      // 86400000000 AS BIGINT) AS r_days,
                 count(*) AS f_orders,
                 CAST(sum(floor(o_totalprice * 100)) AS BIGINT) AS m_cents
          FROM orders, gm GROUP BY o_custkey, gm.gmax
        ),
        t AS (
          SELECT list_sort(list(r_days)) AS rl,
                 list_sort(list(f_orders)) AS fl,
                 list_sort(list(m_cents)) AS ml,
                 count(*) AS n
          FROM rfm
        )
        SELECT CAST(CASE WHEN r_days <= rl[CAST((n + 2) // 3 AS INT)] THEN 0
                    WHEN r_days <= rl[CAST((2 * n + 2) // 3 AS INT)] THEN 1
                    ELSE 2 END AS BIGINT) AS r_seg,
               CAST(CASE WHEN f_orders <= fl[CAST((n + 2) // 3 AS INT)] THEN 0
                    WHEN f_orders <= fl[CAST((2 * n + 2) // 3 AS INT)] THEN 1
                    ELSE 2 END AS BIGINT) AS f_seg,
               CAST(CASE WHEN m_cents <= ml[CAST((n + 2) // 3 AS INT)] THEN 0
                    WHEN m_cents <= ml[CAST((2 * n + 2) // 3 AS INT)] THEN 1
                    ELSE 2 END AS BIGINT) AS m_seg,
               count(*) AS n_customers
        FROM rfm, t GROUP BY 1, 2, 3
    """,
    "q253_neighborhood_purity": """
        -- top-10 by int-quantized dot (ties cand_id asc); count
        -- neighbors sharing the query's label
        WITH qv AS (
          SELECT vec_id, label,
                 list_transform(
                   embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
          FROM embeddings
        ),
        qsim AS (
          SELECT a.vec_id AS query_id, a.label AS qlab,
                 b.vec_id AS cand_id, b.label AS clab,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
          FROM qv a JOIN qv b
            ON a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        r AS (
          SELECT query_id, qlab, clab,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, cand_id) AS rn
          FROM qsim
        )
        SELECT query_id,
               CAST(sum(CASE WHEN clab = qlab THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_same_label,
               count(*) AS k_used
        FROM r WHERE rn <= 10 GROUP BY 1
    """,
    "q254_dq_constraint_suite": """
        -- Deequ-style constraint verification: per rule, rows
        -- checked, violations, earliest offender (-1 when clean)
        WITH tot AS (SELECT count(*) AS n FROM events)
        SELECT 'completeness_props' AS rule, tot.n AS n_checked,
               CAST(count(*) FILTER (WHERE props IS NULL)
                    AS BIGINT) AS n_violations,
               CAST(coalesce(min(event_id) FILTER (WHERE props IS NULL),
                             -1) AS BIGINT) AS first_bad_id
        FROM events, tot GROUP BY tot.n
        UNION ALL
        SELECT 'range_value_0_300', tot.n,
               CAST(count(*) FILTER (WHERE value < 0 OR value > 300)
                    AS BIGINT),
               CAST(coalesce(min(event_id) FILTER
                      (WHERE value < 0 OR value > 300), -1) AS BIGINT)
        FROM events, tot GROUP BY tot.n
        UNION ALL
        SELECT 'pattern_props_object', tot.n,
               CAST(count(*) FILTER
                      (WHERE props IS NOT NULL AND props NOT LIKE '{%')
                    AS BIGINT),
               CAST(coalesce(min(event_id) FILTER
                      (WHERE props IS NOT NULL AND props NOT LIKE '{%'),
                      -1) AS BIGINT)
        FROM events, tot GROUP BY tot.n
        UNION ALL
        SELECT 'set_event_type', tot.n,
               CAST(count(*) FILTER (WHERE event_type IS NULL OR
                      event_type NOT IN ('click', 'view', 'signup',
                                         'purchase', 'error'))
                    AS BIGINT),
               CAST(coalesce(min(event_id) FILTER
                      (WHERE event_type IS NULL OR
                       event_type NOT IN ('click', 'view', 'signup',
                                          'purchase', 'error')), -1)
                    AS BIGINT)
        FROM events, tot GROUP BY tot.n
        UNION ALL
        SELECT 'unique_event_id', tot.n,
               (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM
                 (SELECT count(*) AS c FROM events
                  GROUP BY event_id HAVING count(*) >= 2)),
               (SELECT CAST(coalesce(min(event_id), -1) AS BIGINT) FROM
                 (SELECT event_id FROM events
                  GROUP BY event_id HAVING count(*) >= 2))
        FROM tot
    """,
    "q255_bm25_evidence": f"""
        -- probe = per-lang top-3 tokens by tf (ties token asc);
        -- all-integer BM25 components, the floats are the consumer's
        WITH toks AS (
          SELECT doc_id, lang,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        tc AS (
          SELECT lang, token, count(*) AS tf,
                 count(DISTINCT doc_id) AS df
          FROM toks GROUP BY 1, 2
        ),
        probe AS (
          SELECT lang, token, tf, df,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY tf DESC, token) AS rn
          FROM tc
        ),
        lt AS (SELECT lang, CAST(sum(tf) AS BIGINT) AS lang_tokens
               FROM tc GROUP BY 1),
        ld AS (SELECT lang, count(*) AS lang_docs FROM documents
               WHERE text IS NOT NULL AND lang IS NOT NULL GROUP BY 1)
        SELECT p.lang, p.token AS term, CAST(p.tf AS BIGINT) AS tf_total,
               CAST(p.df AS BIGINT) AS df, ld.lang_docs, lt.lang_tokens
        FROM probe p JOIN lt USING (lang) JOIN ld USING (lang)
        WHERE p.rn <= 3
    """,
    "q256_freshness_report": """
        -- staleness per type: lag behind the corpus max and the
        -- largest inter-event gap, whole seconds (floor is monotonic
        -- so max of floored gaps = floored max gap)
        WITH o AS (
          SELECT event_type, epoch_us(ts) AS t,
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS nt
          FROM events
        ),
        gm AS (SELECT max(epoch_us(ts)) AS g FROM events)
        SELECT event_type, count(*) AS n_events,
               CAST((gm.g - max(t)) // 1000000 AS BIGINT)
                 AS last_seen_lag_s,
               CAST(coalesce(max((nt - t) // 1000000), -1) AS BIGINT)
                 AS max_gap_s
        FROM o, gm GROUP BY event_type, gm.g
    """,
    "q257_daily_value_bands": """
        -- exact p50/p90 order statistics at 1-indexed positions
        -- ceil(n/2) and ceil(9n/10) of the sorted cents
        WITH v AS (
          SELECT event_type,
                 CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events
        ),
        s AS (
          SELECT event_type, day, list_sort(list(cents)) AS cl,
                 count(*) AS n
          FROM v GROUP BY 1, 2
        )
        SELECT event_type, day, CAST(n AS BIGINT) AS n_events,
               CAST(cl[CAST((n + 1) // 2 AS INT)] AS BIGINT) AS p50_cents,
               CAST(cl[CAST((9 * n + 9) // 10 AS INT)] AS BIGINT)
                 AS p90_cents
        FROM s
    """,
    "q258_split_leakage": f"""
        -- BOW dup groups (q249 signature) spanning q81 hash splits
        WITH d AS (
          SELECT CAST(md5_number_lower(coalesce(array_to_string(
                   list_sort(list_distinct(
                     list_filter({_TOKS}, x -> x <> ''))), ' '), ''))
                 & 9223372036854775807 AS BIGINT) AS sig,
                 CASE WHEN CAST('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                        % 100 < 80 THEN 'train'
                      WHEN CAST('0x' || substr(
                        md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                        % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents WHERE text IS NOT NULL
        ),
        g AS (SELECT sig, split, count(*) AS n FROM d GROUP BY 1, 2)
        SELECT x.split AS split_a, y.split AS split_b,
               count(*) AS n_leaky_groups,
               CAST(sum(x.n) AS BIGINT) AS n_docs_a,
               CAST(sum(y.n) AS BIGINT) AS n_docs_b
        FROM g x JOIN g y ON x.sig = y.sig AND x.split < y.split
        GROUP BY 1, 2
    """,
    "q259_encoding_weight": """
        -- chars vs encoded bytes per lang (length = codepoints,
        -- strlen = utf-8 bytes)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS sum_chars,
               CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes
        FROM documents
        WHERE text IS NOT NULL AND lang IS NOT NULL
        GROUP BY 1
    """,
    "q260_co_engagement": """
        -- bipartite projection of user-type counts: users doing both
        -- + sum of min(count_a, count_b)
        WITH c AS (
          SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_users,
               CAST(sum(least(a.n, b.n)) AS BIGINT) AS strength
        FROM c a JOIN c b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "q261_retention_plan": """
        -- keep last 7 dailies, last 4 week-closers, last 3
        -- month-closers; first reason wins. ISO week = (day+3)//7.
        WITH d AS (
          SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events
        ),
        r AS (
          SELECT day,
                 row_number() OVER (ORDER BY day DESC) AS rd,
                 (day + 3) // 7 AS wk,
                 year(make_timestamp(day * 86400000000)) * 12
                   + month(make_timestamp(day * 86400000000)) AS mo
          FROM d
        ),
        wmax AS (SELECT wk, max(day) AS wday FROM r GROUP BY wk),
        wrank AS (SELECT wday,
                         row_number() OVER (ORDER BY wk DESC) AS rw
                  FROM wmax),
        mmax AS (SELECT mo, max(day) AS mday FROM r GROUP BY mo),
        mrank AS (SELECT mday,
                         row_number() OVER (ORDER BY mo DESC) AS rm
                  FROM mmax)
        SELECT r.day,
               CASE WHEN r.rd <= 7 THEN 'daily'
                    WHEN w.rw IS NOT NULL AND w.rw <= 4 THEN 'weekly'
                    WHEN m.rm IS NOT NULL AND m.rm <= 3 THEN 'monthly'
                    ELSE 'drop' END AS action
        FROM r
        LEFT JOIN wrank w ON w.wday = r.day
        LEFT JOIN mrank m ON m.mday = r.day
    """,
    "q262_topk_movers": """
        -- dense-calendar day-over-day deltas; top-3 |delta| per type,
        -- ties earliest day
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        b AS (SELECT min(day) AS d0, max(day) AS d1 FROM c),
        days AS (
          SELECT unnest(range((SELECT d0 FROM b),
                              (SELECT d1 FROM b) + 1)) AS day
        ),
        tt AS (SELECT DISTINCT event_type FROM c),
        grid AS (
          SELECT tt.event_type, days.day, coalesce(c.n, 0) AS n
          FROM tt CROSS JOIN days
          LEFT JOIN c ON c.event_type = tt.event_type
                     AND c.day = days.day
        ),
        d AS (
          SELECT event_type, day, n,
                 lag(n) OVER (PARTITION BY event_type
                              ORDER BY day) AS pn
          FROM grid
        ),
        r AS (
          SELECT event_type, day, pn, n, n - pn AS delta,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY abs(n - pn) DESC, day) AS rn
          FROM d WHERE pn IS NOT NULL
        )
        SELECT event_type, day, CAST(pn AS BIGINT) AS prev_n,
               CAST(n AS BIGINT) AS n, CAST(delta AS BIGINT) AS delta
        FROM r WHERE rn <= 3
    """,
    "q263_band_migration": """
        -- windows split at the calendar midpoint; terciles among each
        -- window's ACTIVE users at ceil(n/3)/ceil(2n/3); -1 inactive
        WITH b AS (
          SELECT min(epoch_us(ts) // 86400000000) AS lo,
                 max(epoch_us(ts) // 86400000000) AS hi
          FROM events
        ),
        sp AS (SELECT (lo + hi + 1) // 2 AS sd FROM b),
        u AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 < sp.sd
                          THEN floor(value * 100) ELSE 0 END)
                      AS BIGINT) AS w1,
                 CAST(sum(CASE WHEN epoch_us(ts) // 86400000000 >= sp.sd
                          THEN floor(value * 100) ELSE 0 END)
                      AS BIGINT) AS w2,
                 sum(CASE WHEN epoch_us(ts) // 86400000000 < sp.sd
                     THEN 1 ELSE 0 END) AS a1,
                 sum(CASE WHEN epoch_us(ts) // 86400000000 >= sp.sd
                     THEN 1 ELSE 0 END) AS a2
          FROM events, sp GROUP BY user_id, sp.sd
        ),
        t1 AS (SELECT list_sort(list(w1)) AS l, count(*) AS n
               FROM u WHERE a1 > 0),
        t2 AS (SELECT list_sort(list(w2)) AS l, count(*) AS n
               FROM u WHERE a2 > 0),
        banded AS (
          SELECT CASE WHEN a1 = 0 THEN -1
                      WHEN w1 <= t1.l[CAST((t1.n + 2) // 3 AS INT)]
                        THEN 0
                      WHEN w1 <= t1.l[CAST((2 * t1.n + 2) // 3 AS INT)]
                        THEN 1
                      ELSE 2 END AS band_w1,
                 CASE WHEN a2 = 0 THEN -1
                      WHEN w2 <= t2.l[CAST((t2.n + 2) // 3 AS INT)]
                        THEN 0
                      WHEN w2 <= t2.l[CAST((2 * t2.n + 2) // 3 AS INT)]
                        THEN 1
                      ELSE 2 END AS band_w2
          FROM u, t1, t2
        )
        SELECT CAST(band_w1 AS BIGINT) AS band_w1,
               CAST(band_w2 AS BIGINT) AS band_w2,
               count(*) AS n_users
        FROM banded GROUP BY 1, 2
    """,
    "q264_trade_flows": """
        -- TPC-H Q7 generalized to all cross-border nation pairs;
        -- exact cents, ship-year grain
        SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                    AS BIGINT) AS revenue_cents,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        JOIN nation ns ON ns.n_nationkey = s_nationkey
        WHERE c_nationkey <> s_nationkey
        GROUP BY 1, 2, 3
    """,
    "q265_brand_profit_topk": """
        -- Q9-style product profit (unit cost = floor(retailprice*100)
        -- cents), widget parts only; per-brand top-3, ties lower partkey
        WITH per_part AS (
          SELECT p_brand, p_partkey,
                 CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100)
                          - CAST(floor(p_retailprice * 100) AS BIGINT)
                            * CAST(floor(l_quantity) AS BIGINT))
                      AS BIGINT) AS profit_cents
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%widget%'
          GROUP BY 1, 2
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY profit_cents DESC, p_partkey
                 ) AS rnk
          FROM per_part
        )
        SELECT p_brand, p_partkey, profit_cents, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 3
    """,
    "q266_domestic_share": """
        -- Q8 re-aimed: per (customer region, order year), cents from
        -- same-nation suppliers vs all; share is the consumer's division
        SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(sum(CASE WHEN s_nationkey = c_nationkey
                        THEN floor(l_extendedprice * (1 - l_discount) * 100)
                        ELSE 0 END) AS BIGINT) AS domestic_cents,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 100))
                    AS BIGINT) AS total_cents,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation nc ON nc.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = nc.n_regionkey
        GROUP BY 1, 2
    """,
    "q267_kcore_peel": """
        -- 3 unrolled peel rounds, k=3, undirected q153 graph;
        -- survivors with residual degree over the surviving edges
        WITH nn AS (SELECT count(*) AS c FROM documents),
        vv AS (SELECT doc_id AS v FROM documents),
        raw AS (
          SELECT v, (v + 1) % c AS w FROM vv, nn
          UNION ALL SELECT v, (v + 2) % c FROM vv, nn
          UNION ALL SELECT v, (3 * v + 1) % c FROM vv, nn
        ),
        e0 AS (
          SELECT DISTINCT least(v, w) AS a, greatest(v, w) AS b
          FROM raw WHERE v <> w
        ),
        d1 AS (SELECT u, count(*) AS dg FROM
               (SELECT a AS u FROM e0 UNION ALL SELECT b FROM e0)
               GROUP BY u),
        a1 AS (SELECT u FROM d1 WHERE dg >= 3),
        e1 AS (SELECT a, b FROM e0
               WHERE a IN (SELECT u FROM a1)
                 AND b IN (SELECT u FROM a1)),
        d2 AS (SELECT u, count(*) AS dg FROM
               (SELECT a AS u FROM e1 UNION ALL SELECT b FROM e1)
               GROUP BY u),
        a2 AS (SELECT u FROM d2 WHERE dg >= 3),
        e2 AS (SELECT a, b FROM e1
               WHERE a IN (SELECT u FROM a2)
                 AND b IN (SELECT u FROM a2)),
        d3 AS (SELECT u, count(*) AS dg FROM
               (SELECT a AS u FROM e2 UNION ALL SELECT b FROM e2)
               GROUP BY u),
        a3 AS (SELECT u FROM d3 WHERE dg >= 3),
        e3 AS (SELECT a, b FROM e2
               WHERE a IN (SELECT u FROM a3)
                 AND b IN (SELECT u FROM a3)),
        d4 AS (SELECT u, count(*) AS dg FROM
               (SELECT a AS u FROM e3 UNION ALL SELECT b FROM e3)
               GROUP BY u)
        SELECT a3.u AS v,
               CAST(coalesce(d4.dg, 0) AS BIGINT) AS residual_deg
        FROM a3 LEFT JOIN d4 ON d4.u = a3.u
    """,
    "q268_next_higher": """
        -- first strictly-higher later event per user; -1 if none
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 CAST(floor(value * 100) AS BIGINT) AS c
          FROM events
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                 ) AS rn
          FROM o
        )
        SELECT r.user_id, r.event_id,
               CAST(coalesce(min(r2.rn) - r.rn, -1) AS BIGINT)
                 AS steps_to_higher
        FROM r LEFT JOIN r r2
          ON r2.user_id = r.user_id AND r2.rn > r.rn AND r2.c > r.c
        GROUP BY r.user_id, r.event_id, r.rn
    """,
    "q269_waterfill_alloc": """
        -- max-min fair: min(demand, L) for the largest feasible
        -- integer L; remainder one unit each to the lowest unsat hosts
        WITH h AS (
          SELECT doc_id % 64 AS host, count(*) AS demand
          FROM documents GROUP BY 1
        ),
        b AS (SELECT CAST(sum(demand) AS BIGINT) // 2 AS budget FROM h),
        lv AS (
          SELECT max(l) AS level FROM (
            SELECT unnest(range(0, (SELECT max(demand) FROM h) + 1)) AS l
          )
          WHERE (SELECT sum(least(demand, l)) FROM h)
                <= (SELECT budget FROM b)
        ),
        base AS (
          SELECT host, demand,
                 least(demand, (SELECT level FROM lv)) AS base
          FROM h
        ),
        r AS (SELECT (SELECT budget FROM b) - sum(base) AS rem FROM base),
        unsat AS (
          SELECT host, row_number() OVER (ORDER BY host) AS rk
          FROM base WHERE demand > (SELECT level FROM lv)
        )
        SELECT base.host, CAST(base.demand AS BIGINT) AS demand,
               CAST(base.base
                    + CASE WHEN unsat.rk IS NOT NULL
                               AND unsat.rk <= (SELECT rem FROM r)
                           THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM base LEFT JOIN unsat ON unsat.host = base.host
    """,
    "q270_frontcode_savings": """
        -- chars saved by front-coding each sorted string against its
        -- predecessor (LCP capped at 64 chars)
        WITH ordered AS (
          SELECT text, lag(text) OVER (ORDER BY text, doc_id) AS prev,
                 row_number() OVER (ORDER BY text, doc_id) AS rn
          FROM documents
        ),
        pairs AS (
          SELECT rn, text, prev FROM ordered WHERE prev IS NOT NULL
        ),
        series AS (
          SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i
        ),
        lcps AS (
          -- prefix equality is monotone in i, so max(i) == LCP
          SELECT p.rn, coalesce(max(s.i), 0) AS lcp
          FROM pairs p LEFT JOIN series s
            ON s.i <= least(length(p.text), length(p.prev), 64)
           AND substr(p.text, 1, s.i) = substr(p.prev, 1, s.i)
          GROUP BY p.rn
        )
        SELECT (SELECT count(*) FROM documents) AS n_strings,
               (SELECT CAST(sum(length(text)) AS BIGINT)
                FROM documents) AS sum_chars,
               count(*) AS n_pairs,
               CAST(coalesce(sum(lcp), 0) AS BIGINT) AS saved_chars
        FROM lcps
    """,
    "q271_bfs_dist": """
        -- multi-source BFS distance <= 3 hops on the q153 graph;
        -- min over all <=3-step walks == BFS first-reach distance
        WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
        vv AS (SELECT doc_id AS v FROM documents),
        raw AS (
          SELECT v, (v + 1) % c AS w FROM vv, nn
          UNION ALL SELECT v, (v + 2) % c FROM vv, nn
          UNION ALL SELECT v, (3 * v + 1) % c FROM vv, nn
        ),
        eu AS (
          SELECT v AS src, w AS dst FROM raw WHERE v <> w
          UNION
          SELECT w, v FROM raw WHERE v <> w
        ),
        walk(node, d) AS (
          SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
          UNION ALL
          SELECT eu.dst, w.d + 1
          FROM walk w JOIN eu ON eu.src = w.node
          WHERE w.d < 3
        )
        SELECT node AS doc_id, CAST(min(d) AS BIGINT) AS dist
        FROM walk GROUP BY node
    """,
    "q272_weighted_median": """
        -- lower weighted median: smallest cents v with
        -- 2 * sum(qty where cents <= v) >= total qty, per return flag
        WITH w AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem
        ),
        c AS (
          SELECT l_returnflag, cents, sum(qty) AS qw
          FROM w GROUP BY 1, 2
        ),
        cum AS (
          SELECT l_returnflag, cents,
                 sum(qw) OVER (PARTITION BY l_returnflag
                               ORDER BY cents) AS cw,
                 sum(qw) OVER (PARTITION BY l_returnflag) AS tw
          FROM c
        )
        SELECT l_returnflag,
               CAST(min(CASE WHEN 2 * cw >= tw THEN cents END)
                    AS BIGINT) AS wmedian_cents,
               CAST(min(tw) AS BIGINT) AS w_total
        FROM cum GROUP BY l_returnflag
    """,
    "q273_kendall_evidence": """
        -- exact Kendall pair counts per user: O(n^2) self-join twin of
        -- the engine's O(n log n) Fenwick inversion count
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 CAST(floor(value * 100) AS BIGINT) AS c
          FROM events
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                 ) AS rn
          FROM o
        ),
        p AS (
          SELECT a.user_id,
                 sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS inv,
                 sum(CASE WHEN a.c = b.c THEN 1 ELSE 0 END) AS tie
          FROM r a JOIN r b
            ON b.user_id = a.user_id AND b.rn > a.rn
          GROUP BY a.user_id
        ),
        n AS (SELECT user_id, count(*) AS ne FROM r GROUP BY user_id)
        SELECT n.user_id,
               CAST(n.ne AS BIGINT) AS n_events,
               CAST(coalesce(p.inv, 0) AS BIGINT) AS inversions,
               CAST(coalesce(p.tie, 0) AS BIGINT) AS tie_pairs,
               CAST(n.ne * (n.ne - 1) // 2
                    - coalesce(p.inv, 0)
                    - coalesce(p.tie, 0) AS BIGINT) AS concordant
        FROM n LEFT JOIN p ON p.user_id = n.user_id
    """,
    "q274_greedy_set_cover": f"""
        -- 3 unrolled greedy keyword-selection rounds; tie: smallest
        -- token; a round with nothing left to cover emits no row
        WITH dt AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest({_TOKS}) AS token FROM documents
          ) WHERE token <> ''
        ),
        r1 AS (SELECT token, count(*) AS nc FROM dt
               GROUP BY token ORDER BY nc DESC, token LIMIT 1),
        c1 AS (SELECT doc_id FROM dt
               WHERE token = (SELECT token FROM r1)),
        d2 AS (SELECT doc_id, token FROM dt
               WHERE doc_id NOT IN (SELECT doc_id FROM c1)),
        r2 AS (SELECT token, count(*) AS nc FROM d2
               GROUP BY token ORDER BY nc DESC, token LIMIT 1),
        c2 AS (SELECT doc_id FROM d2
               WHERE token = (SELECT token FROM r2)),
        d3 AS (SELECT doc_id, token FROM d2
               WHERE doc_id NOT IN (SELECT doc_id FROM c2)),
        r3 AS (SELECT token, count(*) AS nc FROM d3
               GROUP BY token ORDER BY nc DESC, token LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS round, token,
               CAST(nc AS BIGINT) AS newly_covered,
               CAST(nc AS BIGINT) AS covered_total
        FROM r1
        UNION ALL
        SELECT 2, token, CAST(nc AS BIGINT),
               CAST(nc + (SELECT nc FROM r1) AS BIGINT)
        FROM r2
        UNION ALL
        SELECT 3, token, CAST(nc AS BIGINT),
               CAST(nc + (SELECT nc FROM r1)
                       + (SELECT nc FROM r2) AS BIGINT)
        FROM r3
    """,
    "q275_minhash_walk": """
        -- 3 deterministic argmin-hash steps from each seed;
        -- md5_number_lower('step:src:dst') is the engine's md5_low64
        WITH nn AS (SELECT count(*) AS c FROM documents),
        vv AS (SELECT doc_id AS v FROM documents),
        raw AS (
          SELECT v, (v + 1) % c AS w FROM vv, nn
          UNION ALL SELECT v, (v + 2) % c FROM vv, nn
          UNION ALL SELECT v, (3 * v + 1) % c FROM vv, nn
        ),
        eu AS (
          SELECT v AS src, w AS dst FROM raw WHERE v <> w
          UNION
          SELECT w, v FROM raw WHERE v <> w
        ),
        s0 AS (SELECT doc_id AS seed, doc_id AS node
               FROM documents WHERE doc_id % 101 = 0),
        p1 AS (
          SELECT s0.seed, eu.dst,
                 row_number() OVER (PARTITION BY s0.seed ORDER BY
                   md5_number_lower('1:' || CAST(eu.src AS VARCHAR)
                     || ':' || CAST(eu.dst AS VARCHAR)), eu.dst) AS rk
          FROM s0 JOIN eu ON eu.src = s0.node
        ),
        s1 AS (SELECT seed, dst AS node FROM p1 WHERE rk = 1),
        p2 AS (
          SELECT s1.seed, eu.dst,
                 row_number() OVER (PARTITION BY s1.seed ORDER BY
                   md5_number_lower('2:' || CAST(eu.src AS VARCHAR)
                     || ':' || CAST(eu.dst AS VARCHAR)), eu.dst) AS rk
          FROM s1 JOIN eu ON eu.src = s1.node
        ),
        s2 AS (SELECT seed, dst AS node FROM p2 WHERE rk = 1),
        p3 AS (
          SELECT s2.seed, eu.dst,
                 row_number() OVER (PARTITION BY s2.seed ORDER BY
                   md5_number_lower('3:' || CAST(eu.src AS VARCHAR)
                     || ':' || CAST(eu.dst AS VARCHAR)), eu.dst) AS rk
          FROM s2 JOIN eu ON eu.src = s2.node
        ),
        s3 AS (SELECT seed, dst AS node FROM p3 WHERE rk = 1)
        SELECT seed, CAST(0 AS BIGINT) AS step, seed AS node FROM s0
        UNION ALL SELECT seed, 1, node FROM s1
        UNION ALL SELECT seed, 2, node FROM s2
        UNION ALL SELECT seed, 3, node FROM s3
    """,
    "q276_mutual_nn_pairs": """
        -- vectors that are each other's top-1 by int-quantized dot
        -- (ties cand_id asc); one row per mutual pair, a < b
        WITH qv AS (
          SELECT vec_id,
                 list_transform(
                   embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
          FROM embeddings
        ),
        sim AS (
          SELECT a.vec_id AS va, b.vec_id AS vb,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
          FROM qv a JOIN qv b ON b.vec_id <> a.vec_id
        ),
        r AS (
          SELECT va, vb, dot,
                 row_number() OVER (PARTITION BY va
                                    ORDER BY dot DESC, vb) AS rn
          FROM sim
        ),
        nn AS (SELECT va, vb, dot FROM r WHERE rn = 1)
        SELECT x.va AS a, x.vb AS b, x.dot
        FROM nn x JOIN nn y ON y.va = x.vb AND y.vb = x.va
        WHERE x.va < x.vb
    """,
    "q277_rank_overlap_depth": f"""
        -- overlap@depth between the two halves' top-20 token lists
        WITH t0 AS (
          SELECT token, count(*) AS cnt FROM (
            SELECT unnest({_TOKS}) AS token FROM documents
            WHERE doc_id % 2 = 0
          ) WHERE token <> '' GROUP BY token
        ),
        t1 AS (
          SELECT token, count(*) AS cnt FROM (
            SELECT unnest({_TOKS}) AS token FROM documents
            WHERE doc_id % 2 = 1
          ) WHERE token <> '' GROUP BY token
        ),
        r0 AS (SELECT token, row_number() OVER
                 (ORDER BY cnt DESC, token) AS ra FROM t0),
        r1 AS (SELECT token, row_number() OVER
                 (ORDER BY cnt DESC, token) AS rb FROM t1),
        m AS (
          SELECT ra, rb FROM r0 JOIN r1 USING (token)
          WHERE ra <= 20 AND rb <= 20
        ),
        d AS (SELECT CAST(unnest(range(1, 21)) AS BIGINT) AS depth)
        SELECT depth,
               CAST((SELECT count(*) FROM m
                     WHERE ra <= depth AND rb <= depth)
                    AS BIGINT) AS overlap
        FROM d
    """,
    "q278_pointer_doubling": """
        -- f^8 via three join squarings; f(u) = (3u+1) mod N
        WITH nn AS (SELECT count(*) AS c FROM documents),
        s AS (SELECT doc_id AS u, (3 * doc_id + 1) % c AS v
              FROM documents, nn),
        t1 AS (SELECT a.u, b.v FROM s a JOIN s b ON b.u = a.v),
        t2 AS (SELECT a.u, b.v FROM t1 a JOIN t1 b ON b.u = a.v),
        t3 AS (SELECT a.u, b.v FROM t2 a JOIN t2 b ON b.u = a.v)
        SELECT u AS doc_id, v AS f8 FROM t3
    """,
    "q279_hits_scores": """
        -- two un-normalized HITS rounds from the mass seed over the
        -- q103 host graph (3 out-edges per host, mod-64 ids)
        WITH hosts AS (
          SELECT doc_id % 64 AS h, CAST(count(*) AS BIGINT) AS mass
          FROM documents GROUP BY 1
        ),
        e AS (
          SELECT h AS src, (3 * h + 1) % 64 AS dst FROM hosts
          UNION ALL SELECT h, (5 * h + 2) % 64 FROM hosts
          UNION ALL SELECT h, (7 * h + 4) % 64 FROM hosts
        ),
        -- contributions to ids absent from hosts are dropped
        el AS (SELECT src, dst FROM e
               WHERE dst IN (SELECT h FROM hosts)),
        a1 AS (SELECT ho.h, COALESCE(sum(s.mass), 0) AS v
               FROM hosts ho
               LEFT JOIN el ON el.dst = ho.h
               LEFT JOIN hosts s ON s.h = el.src
               GROUP BY 1),
        h1 AS (SELECT ho.h, COALESCE(sum(a.v), 0) AS v
               FROM hosts ho
               LEFT JOIN el ON el.src = ho.h
               LEFT JOIN a1 a ON a.h = el.dst
               GROUP BY 1),
        a2 AS (SELECT ho.h, COALESCE(sum(s.v), 0) AS v
               FROM hosts ho
               LEFT JOIN el ON el.dst = ho.h
               LEFT JOIN h1 s ON s.h = el.src
               GROUP BY 1),
        h2 AS (SELECT ho.h, COALESCE(sum(a.v), 0) AS v
               FROM hosts ho
               LEFT JOIN el ON el.src = ho.h
               LEFT JOIN a2 a ON a.h = el.dst
               GROUP BY 1)
        SELECT ho.h, ho.mass,
               CAST(h2.v AS BIGINT) AS hub, CAST(a2.v AS BIGINT) AS auth
        FROM hosts ho JOIN h2 ON h2.h = ho.h JOIN a2 ON a2.h = ho.h
    """,
    "q280_lis_per_lang": """
        -- longest strictly-increasing subsequence of n_chars in doc_id
        -- order, per lang: recursive chain DP (k = chain length)
        WITH RECURSIVE seq AS (
          SELECT lang, doc_id, n_chars FROM documents
          WHERE lang IS NOT NULL
        ),
        r AS (
          SELECT lang, doc_id, n_chars, 1 AS k FROM seq
          UNION
          SELECT s.lang, s.doc_id, s.n_chars, r.k + 1
          FROM r JOIN seq s
            ON s.lang = r.lang AND s.doc_id > r.doc_id
           AND s.n_chars > r.n_chars
        )
        SELECT lang, CAST(max(k) AS BIGINT) AS lis_len
        FROM r GROUP BY 1
    """,
    "q281_unpivot_metrics": """
        -- wide -> long melt: one (doc_id, metric, value) row per
        -- derived metric (codepoints, utf-8 bytes, spaces)
        WITH w AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS m_chars,
                 CAST(strlen(text) AS BIGINT) AS m_bytes,
                 CAST(length(text) - length(replace(text, ' ', ''))
                      AS BIGINT) AS m_spaces
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, 'chars' AS metric, m_chars AS value FROM w
        UNION ALL SELECT doc_id, 'bytes', m_bytes FROM w
        UNION ALL SELECT doc_id, 'spaces', m_spaces FROM w
    """,
    "q282_greedy_matching": """
        -- two rounds of local-dominance matching: an edge is matched
        -- iff it is its user's best (w desc, type asc) AND its type's
        -- best (w desc, user asc); matched endpoints leave round 2
        WITH e AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS w
          FROM events GROUP BY 1, 2
        ),
        bu1 AS (SELECT user_id, event_type, w FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY w DESC, event_type) AS rn FROM e)
          WHERE rn = 1),
        bt1 AS (SELECT user_id, event_type, w FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                    ORDER BY w DESC, user_id) AS rn FROM e)
          WHERE rn = 1),
        m1 AS (SELECT u.user_id, u.event_type, u.w
               FROM bu1 u JOIN bt1 t USING (user_id, event_type)),
        e2 AS (SELECT * FROM e
               WHERE user_id NOT IN (SELECT user_id FROM m1)
                 AND event_type NOT IN (SELECT event_type FROM m1)),
        bu2 AS (SELECT user_id, event_type, w FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY w DESC, event_type) AS rn FROM e2)
          WHERE rn = 1),
        bt2 AS (SELECT user_id, event_type, w FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                    ORDER BY w DESC, user_id) AS rn FROM e2)
          WHERE rn = 1),
        m2 AS (SELECT u.user_id, u.event_type, u.w
               FROM bu2 u JOIN bt2 t USING (user_id, event_type))
        SELECT user_id, event_type, w, CAST(1 AS BIGINT) AS round FROM m1
        UNION ALL
        SELECT user_id, event_type, w, CAST(2 AS BIGINT) FROM m2
    """,
    "q283_global_kth_value": """
        -- lower median of price cents as a pure order statistic
        WITH c AS (
          SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
          FROM lineitem
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST((count(*) + 1) // 2 AS BIGINT) AS k FROM c),
        s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c)
        SELECT nn.n, nn.k, s.v AS kth_value FROM s, nn WHERE s.rn = nn.k
    """,
    "q284_ks_statistic": """
        -- KS D numerator between the two lexicographically-first
        -- event types: max over thresholds of |cum1*n2 - cum2*n1|
        WITH ab AS (
          SELECT min(event_type) AS a, max(event_type) AS b FROM (
            SELECT event_type FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY 1 LIMIT 2)
        ),
        e AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
          FROM events, ab WHERE event_type IN (ab.a, ab.b)
        ),
        g AS (
          SELECT v,
                 sum(CASE WHEN event_type = (SELECT a FROM ab)
                     THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN event_type = (SELECT b FROM ab)
                     THEN 1 ELSE 0 END) AS c2
          FROM e GROUP BY 1
        ),
        n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
        cum AS (
          SELECT sum(c1) OVER (ORDER BY v) AS cum1,
                 sum(c2) OVER (ORDER BY v) AS cum2
          FROM g
        )
        SELECT (SELECT a FROM ab) AS type_a, (SELECT b FROM ab) AS type_b,
               CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
               CAST(max(abs(cum1 * n.n2 - cum2 * n.n1)) AS BIGINT) AS d_num
        FROM cum, n GROUP BY n.n1, n.n2
    """,
    "q285_decile_grid": """
        -- joint (value-decile, user-activity-decile) contingency grid;
        -- thresholds are exact order stats at ceil(j*n/10), band =
        -- 1 + #{strictly smaller thresholds}
        WITH c AS (
          SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v
          FROM events
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        js AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS j),
        sv AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM c),
        tv AS (SELECT j.j, s.v AS t
               FROM js j CROSS JOIN n
               JOIN sv s ON s.rn = (j.j * n.n + 9) // 10),
        uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
               FROM c GROUP BY 1),
        nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uc),
        su AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn FROM uc),
        tu AS (SELECT j.j, s.cnt AS t
               FROM js j CROSS JOIN nu
               JOIN su s ON s.rn = (j.j * nu.n + 9) // 10),
        vb AS (SELECT user_id,
                      1 + (SELECT count(*) FROM tv WHERE tv.t < c.v)
                        AS vband
               FROM c),
        ub AS (SELECT user_id,
                      1 + (SELECT count(*) FROM tu WHERE tu.t < uc.cnt)
                        AS uband
               FROM uc)
        SELECT CAST(vb.vband AS BIGINT) AS vband,
               CAST(ub.uband AS BIGINT) AS uband,
               CAST(count(*) AS BIGINT) AS n_events
        FROM vb JOIN ub USING (user_id) GROUP BY 1, 2
    """,
    "q286_apportionment": """
        -- Hamilton / largest-remainder: base = floor(S*cnt/total),
        -- leftover slots to largest S*cnt mod total (ties lang asc)
        WITH c AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS cnt
          FROM documents WHERE lang IS NOT NULL GROUP BY 1
        ),
        t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        b AS (SELECT lang, cnt,
                     (1000 * cnt) // t.total AS base,
                     (1000 * cnt) % t.total AS rem
              FROM c, t),
        l AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM b),
        r AS (SELECT lang, cnt, base,
                     row_number() OVER (ORDER BY rem DESC, lang) AS rk
              FROM b)
        SELECT lang, cnt AS n_docs,
               CAST(base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS slots
        FROM r, l
    """,
    "q287_survival_at_risk": """
        -- per observed lifetime d (whole days first->last event):
        -- users ending at d, users at risk (lifetime >= d)
        WITH s AS (
          SELECT user_id,
                 (epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000
                   AS d
          FROM events GROUP BY 1
        ),
        h AS (SELECT d, CAST(count(*) AS BIGINT) AS n_ending
              FROM s GROUP BY 1)
        SELECT CAST(d AS BIGINT) AS d, n_ending,
               CAST(sum(n_ending) OVER (ORDER BY d DESC)
                    AS BIGINT) AS n_at_risk
        FROM h
    """,
    "q288_gram_matrix": """
        -- G = E^T E over int-quantized embeddings, upper triangle
        -- (1-based dims)
        WITH u AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000)
                      AS BIGINT) AS q
          FROM embeddings
        )
        SELECT a.i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS gram
        FROM u a JOIN u b ON b.vec_id = a.vec_id AND b.i >= a.i
        GROUP BY 1, 2
    """,
    "q289_snake_draft_shards": """
        -- boustrophedon deal of demand-ranked hosts into 8 shards
        WITH d AS (
          SELECT doc_id % 64 AS host, CAST(count(*) AS BIGINT) AS demand
          FROM documents GROUP BY 1
        ),
        r AS (SELECT host, demand,
                     row_number() OVER (ORDER BY demand DESC, host) - 1
                       AS r
              FROM d),
        a AS (SELECT demand,
                     CASE WHEN (r // 8) % 2 = 0 THEN r % 8
                          ELSE 7 - (r % 8) END AS shard
              FROM r)
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(count(*) AS BIGINT) AS n_hosts,
               CAST(sum(demand) AS BIGINT) AS total_demand
        FROM a GROUP BY 1
    """,
    "q290_minplus_apsp": """
        -- (min,+) matrix squaring x3 = all <=8-hop shortest paths;
        -- edges weight 1+(u+v)%5, self-loops 0
        WITH hosts AS (SELECT DISTINCT doc_id % 64 AS h FROM documents),
        e0 AS (
          SELECT h AS u, (3 * h + 1) % 64 AS v FROM hosts
          UNION ALL SELECT h, (5 * h + 2) % 64 FROM hosts
          UNION ALL SELECT h, (7 * h + 4) % 64 FROM hosts
        ),
        d1 AS (
          SELECT u, v, CAST(min(w) AS BIGINT) AS w FROM (
            SELECT u, v, 1 + (u + v) % 5 AS w FROM e0
            UNION ALL SELECT h, h, 0 FROM hosts
          ) GROUP BY 1, 2
        ),
        d2 AS (SELECT a.u, b.v, min(a.w + b.w) AS w
               FROM d1 a JOIN d1 b ON b.u = a.v GROUP BY 1, 2),
        d4 AS (SELECT a.u, b.v, min(a.w + b.w) AS w
               FROM d2 a JOIN d2 b ON b.u = a.v GROUP BY 1, 2),
        d8 AS (SELECT a.u, b.v, min(a.w + b.w) AS w
               FROM d4 a JOIN d4 b ON b.u = a.v GROUP BY 1, 2)
        SELECT u, v, CAST(w AS BIGINT) AS dist FROM d8
    """,
    "q291_rendezvous_placement": """
        -- HRW: doc -> argmax over nodes of md5(doc:node); churn of
        -- the 8->9 grow vs mod-placement churn
        WITH nodes9 AS (SELECT CAST(unnest(range(9)) AS BIGINT) AS node),
        h AS (
          SELECT d.doc_id, n.node,
                 md5_number_lower(CAST(d.doc_id AS VARCHAR) || ':' ||
                                  CAST(n.node AS VARCHAR)) AS hv
          FROM documents d CROSS JOIN nodes9 n
        ),
        a8 AS (SELECT doc_id, arg_max(node, hv) AS n8 FROM h
               WHERE node < 8 GROUP BY 1),
        a9 AS (SELECT doc_id, arg_max(node, hv) AS n9 FROM h GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN a8.n8 <> a9.n9 THEN 1 ELSE 0 END)
                    AS BIGINT) AS moved_hrw,
               CAST(sum(CASE WHEN a8.doc_id % 8 <> a8.doc_id % 9
                        THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod
        FROM a8 JOIN a9 USING (doc_id)
    """,
    "q292_mannwhitney_u": """
        -- 2U for sample a: 2*#{va > vb} + #{va = vb}, exact ints
        WITH ab AS (
          SELECT min(event_type) AS a, max(event_type) AS b FROM (
            SELECT event_type FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY 1 LIMIT 2)
        ),
        e AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
          FROM events, ab WHERE event_type IN (ab.a, ab.b)
        ),
        g AS (
          SELECT v,
                 sum(CASE WHEN event_type = (SELECT a FROM ab)
                     THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN event_type = (SELECT b FROM ab)
                     THEN 1 ELSE 0 END) AS c2
          FROM e GROUP BY 1
        ),
        n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
        cum AS (
          SELECT c1, c2,
                 COALESCE(sum(c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum2_lt
          FROM g
        )
        SELECT (SELECT a FROM ab) AS type_a, (SELECT b FROM ab) AS type_b,
               CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
               CAST(2 * sum(c1 * cum2_lt) + sum(c1 * c2) AS BIGINT) AS u2
        FROM cum, n GROUP BY n.n1, n.n2
    """,
    "q293_ntile_assign": """
        -- exact ntile(10) by (cents, event_id); per-tile audit
        WITH c AS (
          SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS c
          FROM events
        ),
        t AS (SELECT c, ntile(10) OVER (ORDER BY c, event_id) AS tile
              FROM c)
        SELECT CAST(tile AS BIGINT) AS tile,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(c) AS min_c, max(c) AS max_c
        FROM t GROUP BY 1
    """,
    "q294_spearman_evidence": """
        -- doubled tie-averaged ranks r2 = 2*cum_lt + cnt + 1; exact
        -- (n, sum d^2, tie terms) under Spearman rho
        WITH e AS (
          SELECT CAST(floor(value * 100) AS BIGINT) AS x,
                 epoch_us(ts) AS y
          FROM events
        ),
        gx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
               FROM e GROUP BY 1),
        rx AS (SELECT v,
                      2 * COALESCE(sum(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + cnt + 1 AS r2
               FROM gx),
        gy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
               FROM e GROUP BY 1),
        ry AS (SELECT v,
                      2 * COALESCE(sum(cnt) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + cnt + 1 AS r2
               FROM gy),
        d AS (SELECT rx.r2 AS r2x, ry.r2 AS r2y
              FROM e JOIN rx ON rx.v = e.x JOIN ry ON ry.v = e.y)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum((r2x - r2y) * (r2x - r2y)) AS BIGINT) AS sum_d2,
               (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT)
                FROM gx) AS tie_x,
               (SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT)
                FROM gy) AS tie_y
        FROM d
    """,
    "q295_chi2_contingency": """
        -- per (lang, source) cell: o, margins, (n*o - r*c)^2
        WITH cells AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS o
          FROM documents
          WHERE lang IS NOT NULL AND source IS NOT NULL
          GROUP BY 1, 2
        ),
        n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        m AS (
          SELECT lang, source, o,
                 CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
                 CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS c
          FROM cells
        )
        SELECT lang, source, o, r, c,
               CAST((n.n * o - r * c) * (n.n * o - r * c) AS BIGINT)
                 AS dev2
        FROM m, n
    """,
    "q296_id_gap_audit": """
        -- per 1000-wide orderkey bucket: present ids and gaps inside
        -- the observed span
        SELECT CAST(o_orderkey // 1000 AS BIGINT) AS bkt,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_present,
               CAST(max(o_orderkey) - min(o_orderkey) + 1
                    - count(DISTINCT o_orderkey) AS BIGINT) AS n_missing
        FROM orders GROUP BY 1
    """,
    "q297_dict_encode": """
        -- global dense dictionary codes (sorted langs -> 0..G-1)
        -- stamped onto every row
        SELECT doc_id,
               CAST(dense_rank() OVER (ORDER BY lang) - 1 AS BIGINT)
                 AS lang_code
        FROM documents WHERE lang IS NOT NULL
    """,
    "q298_merge_upsert": """
        -- MERGE outcome counts: delta = update %7 (unless %13),
        -- delete %13, insert 5 fresh ids; delete beats update
        WITH base AS (SELECT doc_id FROM documents),
        delta AS (
          SELECT doc_id, 1 AS op FROM base
          WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0
          UNION ALL SELECT doc_id, 2 FROM base WHERE doc_id % 13 = 0
          UNION ALL
          SELECT CAST(10000000 + unnest(range(5)) AS BIGINT), 3
        ),
        m AS (
          SELECT COALESCE(b.present, 0) AS inb, COALESCE(d.op, 0) AS op
          FROM (SELECT doc_id, 1 AS present FROM base) b
          FULL OUTER JOIN delta d USING (doc_id)
        ),
        c AS (
          SELECT CASE WHEN inb = 1 AND op = 2 THEN 'deleted'
                      WHEN inb = 1 AND op = 1 THEN 'updated'
                      WHEN inb = 1 THEN 'unchanged'
                      WHEN op = 3 THEN 'inserted'
                      ELSE 'orphan_delta' END AS outcome,
                 CAST(count(*) AS BIGINT) AS n_rows
          FROM m GROUP BY 1
        )
        SELECT outcome, n_rows FROM c
        UNION ALL
        SELECT 'final',
               (SELECT CAST(count(*) AS BIGINT) FROM base)
               - COALESCE((SELECT n_rows FROM c
                           WHERE outcome = 'deleted'), 0)
               + COALESCE((SELECT n_rows FROM c
                           WHERE outcome = 'inserted'), 0)
    """,
    "q299_rolling_extrema": """
        -- min/max over (PARTITION BY user ORDER BY ts, id
        -- ROWS 2 PRECEDING)
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(value * 100) AS BIGINT) AS c
          FROM events
        )
        SELECT user_id, event_id,
               min(c) OVER w AS rmin,
               max(c) OVER w AS rmax
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "q300_cluster_sample": """
        -- stage 1: 8 smallest md5('h:'+host) hosts; stage 2: each
        -- host's 5 smallest md5('d:'+doc) docs with within-host rank
        WITH hosts AS (SELECT DISTINCT doc_id % 64 AS h FROM documents),
        kh AS (SELECT h FROM hosts
               ORDER BY md5_number_lower('h:' || CAST(h AS VARCHAR)), h
               LIMIT 8),
        d AS (
          SELECT doc_id % 64 AS host, doc_id,
                 row_number() OVER (PARTITION BY doc_id % 64
                   ORDER BY md5_number_lower('d:' ||
                            CAST(doc_id AS VARCHAR)), doc_id)
                   AS rank_in_host
          FROM documents WHERE doc_id % 64 IN (SELECT h FROM kh)
        )
        SELECT CAST(host AS BIGINT) AS host, doc_id,
               CAST(rank_in_host AS BIGINT) AS rank_in_host
        FROM d WHERE rank_in_host <= 5
    """,
    "q301_type_bitmask": """
        -- per-user set-of-types as a bit per dense type code; corpus
        -- histogram of the masks
        WITH codes AS (
          SELECT event_type,
                 dense_rank() OVER (ORDER BY event_type) - 1 AS code
          FROM (SELECT DISTINCT event_type FROM events
                WHERE event_type IS NOT NULL)
        ),
        um AS (
          SELECT user_id,
                 CAST(sum(DISTINCT (1::BIGINT << code)) AS BIGINT)
                   AS mask
          FROM events e JOIN codes c USING (event_type)
          GROUP BY 1
        )
        SELECT mask, CAST(count(*) AS BIGINT) AS n_users
        FROM um GROUP BY 1
    """,
    "q302_degree_assortativity": """
        -- over distinct (user, type) edges: |E| and the degree
        -- moments under Pearson-on-degrees
        WITH e AS (
          SELECT DISTINCT user_id, event_type FROM events
          WHERE event_type IS NOT NULL
        ),
        du AS (SELECT user_id, CAST(count(*) AS BIGINT) AS du
               FROM e GROUP BY 1),
        dt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dt
               FROM e GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(du.du) AS BIGINT) AS sum_du,
               CAST(sum(dt.dt) AS BIGINT) AS sum_dt,
               CAST(sum(du.du * dt.dt) AS BIGINT) AS sum_dudt,
               CAST(sum(du.du * du.du) AS BIGINT) AS sum_du2,
               CAST(sum(dt.dt * dt.dt) AS BIGINT) AS sum_dt2
        FROM e JOIN du USING (user_id) JOIN dt USING (event_type)
    """,
    "q303_number_mining": """
        -- digit runs per doc (runs > 12 digits skipped): count + sum
        WITH m AS (
          SELECT doc_id,
                 list_filter(regexp_extract_all(text, '[0-9]+'),
                             x -> length(x) <= 12) AS nums
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, CAST(len(nums) AS BIGINT) AS n_numbers,
               CAST(COALESCE(list_sum(
                 list_transform(nums, x -> CAST(x AS BIGINT))), 0)
                 AS BIGINT) AS sum_numbers
        FROM m
    """,
    "q304_histogram_intersection": """
        -- shared mass: sum over values of min(c1, c2)
        WITH ab AS (
          SELECT min(event_type) AS a, max(event_type) AS b FROM (
            SELECT event_type FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY 1 LIMIT 2)
        ),
        e AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
          FROM events, ab WHERE event_type IN (ab.a, ab.b)
        ),
        g AS (
          SELECT v,
                 sum(CASE WHEN event_type = (SELECT a FROM ab)
                     THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN event_type = (SELECT b FROM ab)
                     THEN 1 ELSE 0 END) AS c2
          FROM e GROUP BY 1
        )
        SELECT (SELECT a FROM ab) AS type_a, (SELECT b FROM ab) AS type_b,
               CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(sum(least(c1, c2)) AS BIGINT) AS inter
        FROM g
    """,
    "q305_wasserstein_evidence": """
        -- EMD numerator: sum |cum1*n2 - cum2*n1| * gap-to-next-value
        WITH ab AS (
          SELECT min(event_type) AS a, max(event_type) AS b FROM (
            SELECT event_type FROM events WHERE event_type IS NOT NULL
            GROUP BY 1 ORDER BY 1 LIMIT 2)
        ),
        e AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
          FROM events, ab WHERE event_type IN (ab.a, ab.b)
        ),
        g AS (
          SELECT v,
                 sum(CASE WHEN event_type = (SELECT a FROM ab)
                     THEN 1 ELSE 0 END) AS c1,
                 sum(CASE WHEN event_type = (SELECT b FROM ab)
                     THEN 1 ELSE 0 END) AS c2
          FROM e GROUP BY 1
        ),
        n AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
        cum AS (
          SELECT sum(c1) OVER (ORDER BY v) AS cum1,
                 sum(c2) OVER (ORDER BY v) AS cum2,
                 lead(v) OVER (ORDER BY v) - v AS gap
          FROM g
        )
        SELECT (SELECT a FROM ab) AS type_a, (SELECT b FROM ab) AS type_b,
               CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
               CAST(sum(abs(cum1 * n.n2 - cum2 * n.n1) * gap)
                    AS BIGINT) AS emd_num
        FROM cum, n WHERE gap IS NOT NULL GROUP BY n.n1, n.n2
    """,
    "q306_peak_detection": """
        -- strict local maxima with prominence >= 2 on the dense daily
        -- grid (missing days = 0)
        WITH d AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 CAST(count(*) AS BIGINT) AS c
          FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
        ),
        span AS (SELECT event_type, min(day) AS lo, max(day) AS hi
                 FROM d GROUP BY 1),
        grid AS (SELECT event_type,
                        lo + unnest(range(hi - lo + 1)) AS day
                 FROM span),
        dense AS (
          SELECT g.event_type, g.day, COALESCE(d.c, 0) AS c
          FROM grid g LEFT JOIN d USING (event_type, day)
        ),
        w AS (
          SELECT event_type, c,
                 lag(c) OVER (PARTITION BY event_type ORDER BY day)
                   AS pc,
                 lead(c) OVER (PARTITION BY event_type ORDER BY day)
                   AS nc
          FROM dense
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL
                             AND c > pc AND c > nc
                             AND c - greatest(pc, nc) >= 2
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks
        FROM w GROUP BY 1
    """,
    "q307_dow_profile": """
        -- dow = (epoch_day + 4) mod 7 (0=Sunday), pure integers
        SELECT event_type,
               CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                 AS dow,
               CAST(count(*) AS BIGINT) AS n
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
    """,
    "q308_lorenz_points": """
        -- users in spend-asc ntile(10) deciles; cum_cents through
        -- each decile IS the Lorenz curve
        WITH u AS (
          SELECT user_id,
                 CAST(sum(CAST(floor(value * 100) AS BIGINT))
                      AS BIGINT) AS c
          FROM events GROUP BY 1
        ),
        t AS (SELECT c, ntile(10) OVER (ORDER BY c, user_id) AS decile
              FROM u),
        g AS (SELECT CAST(decile AS BIGINT) AS decile,
                     CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(c) AS BIGINT) AS cents
              FROM t GROUP BY 1)
        SELECT decile, n_users, cents,
               CAST(sum(cents) OVER (ORDER BY decile) AS BIGINT)
                 AS cum_cents
        FROM g
    """,
    "q309_casefold_collisions": """
        -- lowercase classes with >= 2 raw surface forms; winner by
        -- (count desc, form asc)
        WITH p AS (
          SELECT lower(tok) AS "lower", tok AS raw,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM (
            SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL
          ) WHERE tok <> '' GROUP BY 1, 2
        ),
        cl AS (
          SELECT "lower", CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_forms
          FROM p GROUP BY 1 HAVING count(*) >= 2
        ),
        top AS (
          SELECT "lower", raw AS top_form FROM (
            SELECT "lower", raw,
                   row_number() OVER (PARTITION BY "lower"
                     ORDER BY cnt DESC, raw) AS rn
            FROM p) WHERE rn = 1
        )
        SELECT cl."lower", cl.total, cl.n_forms, top.top_form
        FROM cl JOIN top USING ("lower")
    """,
    "q310_control_char_audit": """
        -- C0 controls (minus tab/lf/cr), zero-width/invisible points,
        -- U+FFFD; sparse output (flagged docs only)
        WITH m AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                   '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS BIGINT)
                   AS n_ctrl,
                 CAST(len(regexp_extract_all(text,
                   '[​‌‍⁠﻿­]')) AS BIGINT)
                   AS n_zero_width,
                 CAST(len(regexp_extract_all(text, '�')) AS BIGINT)
                   AS n_replacement
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, n_ctrl, n_zero_width, n_replacement FROM m
        WHERE n_ctrl + n_zero_width + n_replacement > 0
    """,
    "q311_token_period": """
        -- smallest p with tok[i] = tok[i+p] for all i (first 50
        -- tokens); candidate scan twin of the KMP kernel
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '')[1:50] AS tl
          FROM documents WHERE text IS NOT NULL
        ),
        t AS (
          SELECT doc_id, unnest(tl) AS tok,
                 unnest(range(1, len(tl) + 1)) AS pos
          FROM toks
        ),
        lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                 FROM t GROUP BY 1 HAVING count(*) >= 2),
        cand AS (SELECT doc_id, CAST(unnest(range(1, n + 1)) AS BIGINT)
                        AS p
                 FROM lens),
        viol AS (
          SELECT DISTINCT c.doc_id, c.p
          FROM cand c
          JOIN t a ON a.doc_id = c.doc_id
          JOIN t b ON b.doc_id = c.doc_id AND b.pos = a.pos + c.p
                  AND b.tok <> a.tok
        ),
        best AS (
          SELECT c.doc_id, min(c.p) AS period
          FROM cand c LEFT JOIN viol v
            ON v.doc_id = c.doc_id AND v.p = c.p
          WHERE v.p IS NULL GROUP BY 1
        )
        SELECT l.doc_id, l.n AS n_tokens,
               CAST(b.period AS BIGINT) AS period,
               CAST(l.n // b.period AS BIGINT) AS repeats
        FROM lens l JOIN best b USING (doc_id)
    """,
    "q312_html_table_extract": """
        -- the Ray side must roundtrip every order through render+parse
        SELECT o_orderkey AS orderkey, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders
    """,
    "q313_jsonld_extract": """
        -- roundtrip: the Article ld+json block carries exactly these
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL
    """,
    "q314_index_coincidence": """
        -- per-letter counts via the replace-length trick (length() is
        -- code points, so removing an ascii letter drops exactly its
        -- occurrence count); IC numerator stays in exact integers
        WITH letters AS (
          SELECT unnest(['a','b','c','d','e','f','g','h','i','j','k','l',
                         'm','n','o','p','q','r','s','t','u','v','w','x',
                         'y','z']) AS ch
        ),
        cnt AS (
          SELECT doc_id,
                 length(text) - length(replace(text, ch, '')) AS c
          FROM documents, letters
          WHERE text IS NOT NULL
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_letters,
               CAST(sum(c * (c - 1)) AS BIGINT) AS ic_num
        FROM cnt GROUP BY doc_id
    """,
    "q237_max_drawdown": """
        -- dd_i = running_max(c) - c_i; earliest realization wins
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 CAST(floor(value * 100) AS BIGINT) AS c
          FROM events
        ),
        r AS (
          SELECT *, max(c) OVER w AS pk FROM o
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        d AS (SELECT user_id, event_id, t, pk - c AS dd, pk FROM r),
        sel AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY dd DESC, t, event_id
                 ) AS rn
          FROM d
        ),
        pkm AS (
          SELECT user_id, CAST(max(pk) AS BIGINT) AS peak_cents
          FROM d GROUP BY 1
        )
        SELECT s.user_id, CAST(s.dd AS BIGINT) AS max_dd,
               s.event_id AS at_event, pkm.peak_cents
        FROM (SELECT * FROM sel WHERE rn = 1) s JOIN pkm USING (user_id)
    """,
    "q238_series_corr_evidence": """
        -- Pearson moment sums over hourly counts on a COMMON grid
        WITH h AS (
          SELECT event_type,
                 epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        u AS (SELECT DISTINCT hour FROM h),
        tt AS (SELECT DISTINCT event_type FROM h),
        grid AS (
          SELECT t.event_type, u.hour, coalesce(h.n, 0) AS n
          FROM tt t CROSS JOIN u
          LEFT JOIN h ON h.event_type = t.event_type AND h.hour = u.hour
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_cells,
               CAST(sum(a.n) AS BIGINT) AS sa,
               CAST(sum(b.n) AS BIGINT) AS sb,
               CAST(sum(a.n * b.n) AS BIGINT) AS sab,
               CAST(sum(a.n * a.n) AS BIGINT) AS saa,
               CAST(sum(b.n * b.n) AS BIGINT) AS sbb
        FROM grid a JOIN grid b
          ON a.hour = b.hour AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "q239_keyness_terms": f"""
        -- keyness order by the exact cross-product n_in·T_out −
        -- n_out·T_in (the log-odds ordering without the log)
        WITH toks AS (
          SELECT lang,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        tc AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
        lt AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS t_in
               FROM tc GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_all FROM tc),
        tk AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS tok_tot
               FROM tc GROUP BY 1),
        s AS (
          SELECT tc.lang, tc.token, CAST(tc.cnt AS BIGINT) AS n_in,
                 CAST(tk.tok_tot - tc.cnt AS BIGINT) AS n_out,
                 lt.t_in,
                 CAST((SELECT t_all FROM tot) - lt.t_in AS BIGINT)
                   AS t_out
          FROM tc JOIN tk USING (token) JOIN lt USING (lang)
        ),
        r AS (
          SELECT *, CAST(n_in * t_out - n_out * t_in AS BIGINT)
                   AS score,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY n_in * t_out - n_out * t_in DESC, token
                 ) AS rn
          FROM s
        )
        SELECT lang, token, n_in, n_out, t_in, t_out, score
        FROM r WHERE rn <= 5
    """,
    "q234_type_distance_matrix": """
        -- pairwise L1 over aligned width-50 histograms (missing cells
        -- are zero via the bucket grid)
        WITH h AS (
          SELECT event_type, CAST(floor(value / 50.0) AS BIGINT)
                   AS bucket, count(*) AS n
          FROM events GROUP BY 1, 2
        ),
        u AS (SELECT DISTINCT bucket FROM h),
        tt AS (SELECT DISTINCT event_type FROM h),
        grid AS (
          SELECT t.event_type, u.bucket, coalesce(h.n, 0) AS n
          FROM tt t CROSS JOIN u
          LEFT JOIN h ON h.event_type = t.event_type
                     AND h.bucket = u.bucket
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(sum(abs(a.n - b.n)) AS BIGINT) AS l1,
               CAST(sum(a.n) AS BIGINT) AS n_a,
               CAST(sum(b.n) AS BIGINT) AS n_b
        FROM grid a JOIN grid b
          ON a.bucket = b.bucket AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "q235_seasonality_peak": """
        -- (dow, hour) cells by exact epoch arithmetic (epoch day 0 is
        -- a Thursday → dow = (days + 4) mod 7); earliest-cell peak
        WITH c AS (
          SELECT event_type,
                 (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                 (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
                 count(*) AS n
          FROM events GROUP BY 1, 2, 3
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY n DESC, dow, hour) AS rn,
                 sum(n) OVER (PARTITION BY event_type) AS total
          FROM c
        )
        SELECT event_type, CAST(dow AS BIGINT) AS peak_dow,
               CAST(hour AS BIGINT) AS peak_hour,
               CAST(n AS BIGINT) AS peak_n,
               CAST(total AS BIGINT) AS total
        FROM r WHERE rn = 1
    """,
    "q236_char_profile": """
        -- char classes from the Python-re ∩ RE2 common subset over
        -- lowercased text; other = chars − letters − digits − spaces
        WITH t AS (
          SELECT coalesce(lang, '') AS lang,
                 lower(coalesce(text, '')) AS v
          FROM documents
        ),
        s AS (
          SELECT lang,
                 CAST(sum(length(v)) AS BIGINT) AS n_chars,
                 CAST(sum(length(v) - length(
                   regexp_replace(v, '[a-z]', '', 'g'))) AS BIGINT)
                   AS n_letters,
                 CAST(sum(length(v) - length(
                   regexp_replace(v, '[0-9]', '', 'g'))) AS BIGINT)
                   AS n_digits,
                 CAST(sum(length(v) - length(replace(v, ' ', '')))
                      AS BIGINT) AS n_spaces
          FROM t GROUP BY 1
        )
        SELECT lang, n_chars, n_letters, n_digits, n_spaces,
               CAST(n_chars - n_letters - n_digits - n_spaces
                    AS BIGINT) AS n_other
        FROM s
    """,
    "q231_two_hop_paths": """
        -- paths(v) = Σ over v→m of outdeg(m); edges deduplicated
        WITH n AS (SELECT count(*) AS nn FROM documents),
        e AS (
          SELECT DISTINCT doc_id AS src,
                 (doc_id + 1) % (SELECT nn FROM n) AS dst
          FROM documents
          UNION
          SELECT doc_id, (doc_id + 2) % (SELECT nn FROM n)
          FROM documents
          UNION
          SELECT doc_id, (3 * doc_id + 1) % (SELECT nn FROM n)
          FROM documents
        ),
        deg AS (SELECT src AS mid, count(*) AS outdeg FROM e GROUP BY 1)
        SELECT e.src, CAST(sum(deg.outdeg) AS BIGINT) AS n_2paths
        FROM e JOIN deg ON deg.mid = e.dst
        GROUP BY 1
    """,
    "q232_norm_histogram": """
        -- ‖floor(1e3·x)‖² is an exact integer; 1e5-wide buckets
        WITH q AS (
          SELECT CAST(label AS BIGINT) AS label,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                   AS qv
          FROM embeddings
        ),
        n2 AS (
          SELECT label,
                 CAST(list_sum(list_transform(qv, v -> v * v))
                      AS BIGINT) AS n2
          FROM q
        )
        SELECT label, CAST(n2 // 100000 AS BIGINT) AS bucket,
               count(*) AS n
        FROM n2 GROUP BY 1, 2
    """,
    "q233_session_paths": """
        -- top length-3 event-type paths WITHIN 30-min-gap sessions
        WITH o AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t
          FROM events
        ),
        s AS (
          SELECT *, CASE WHEN lag(t) OVER w IS NULL
                              OR t - lag(t) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS ns
          FROM o
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        ),
        sid AS (
          SELECT *, sum(ns) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS sess
          FROM s
        ),
        p AS (
          SELECT event_type || '>' || lead(event_type, 1) OVER w2
                 || '>' || lead(event_type, 2) OVER w2 AS path
          FROM sid
          WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY t, event_id)
        ),
        c AS (
          SELECT path, count(*) AS n FROM p
          WHERE path IS NOT NULL GROUP BY 1
        )
        SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10
    """,
    "q228_familiarity_score": f"""
        -- per-doc bigram mass against the corpus count table
        WITH base AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
          FROM base
        ),
        cc AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1)
        SELECT bg.doc_id, count(*) AS n_bigrams,
               CAST(sum(cc.cnt) AS BIGINT) AS mass
        FROM bg JOIN cc USING (bigram) GROUP BY 1
    """,
    "q229_rle_estimate": """
        -- runs = changes + 1 over lang in doc_id order
        WITH o AS (
          SELECT coalesce(lang, '') AS v,
                 lag(coalesce(lang, '')) OVER (ORDER BY doc_id) AS pv
          FROM documents
        )
        SELECT count(*) AS n_rows,
               CAST(CASE WHEN count(*) = 0 THEN 0
                    ELSE 1 + coalesce(sum(CASE WHEN pv IS NOT NULL
                                               AND v <> pv
                                          THEN 1 ELSE 0 END), 0)
                    END AS BIGINT) AS n_runs
        FROM o
    """,
    "q230_tukey_outliers": """
        -- boxplot fences on 2·n_chars (doubled so 3/2·IQR stays
        -- integer); exact discrete quartiles
        WITH q AS (
          SELECT source,
                 quantile_disc(2 * n_chars, 0.25) AS q1_2x,
                 quantile_disc(2 * n_chars, 0.75) AS q3_2x
          FROM documents GROUP BY 1
        ),
        f AS (
          SELECT source, q1_2x, q3_2x,
                 q1_2x - 3 * (q3_2x - q1_2x) // 2 AS lo,
                 q3_2x + 3 * (q3_2x - q1_2x) // 2 AS hi
          FROM q
        )
        SELECT d.source, count(*) AS n,
               CAST(sum(CASE WHEN 2 * d.n_chars < f.lo
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
               CAST(sum(CASE WHEN 2 * d.n_chars > f.hi
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(max(f.q1_2x) AS BIGINT) AS q1_2x,
               CAST(max(f.q3_2x) AS BIGINT) AS q3_2x
        FROM documents d JOIN f USING (source)
        GROUP BY 1
    """,
    "q225_assoc_rules": """
        -- directed rules with support >= 20; confidence evidence =
        -- (n_ab, n_ant)
        WITH dt AS (
          SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\s+'))
                     AS tok
            FROM documents WHERE text IS NOT NULL
          ) WHERE tok <> ''
        ),
        pc_ AS (
          SELECT a.tok AS a, b.tok AS b, count(*) AS n
          FROM dt a JOIN dt b
            ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY 1, 2 HAVING count(*) >= 20
        ),
        dfq AS (SELECT tok, count(*) AS n_ant FROM dt GROUP BY 1),
        rules AS (
          SELECT a AS ant, b AS cons, n AS n_ab FROM pc_
          UNION ALL SELECT b, a, n FROM pc_
        )
        SELECT r.ant, r.cons, CAST(r.n_ab AS BIGINT) AS n_ab,
               CAST(d.n_ant AS BIGINT) AS n_ant
        FROM rules r JOIN dfq d ON d.tok = r.ant
    """,
    "q226_fairness_evidence": """
        -- Jain = (Σx)²/(n·Σx²); evidence only, all integers
        WITH h AS (
          SELECT user_id % 32 AS host, count(*) AS x
          FROM events GROUP BY 1
        )
        SELECT count(*) AS n_hosts, CAST(sum(x) AS BIGINT) AS sum_x,
               CAST(sum(x * x) AS BIGINT) AS sum_x2
        FROM h
    """,
    "q227_erasure_plan": """
        -- cascade manifest: row counts + XOR digests of exactly the
        -- doomed rows, per table
        SELECT 'documents' AS tbl, count(*) AS n_rows,
               CAST(coalesce(bit_xor(CAST(
                 md5_number_lower(CAST(doc_id AS VARCHAR) || ':'
                                  || coalesce(text, ''))
                 & 9223372036854775807 AS BIGINT)), 0) AS BIGINT) AS chk
        FROM documents WHERE doc_id % 101 = 0
        UNION ALL
        SELECT 'embeddings', count(*),
               CAST(coalesce(bit_xor(CAST(
                 md5_number_lower(CAST(vec_id AS VARCHAR))
                 & 9223372036854775807 AS BIGINT)), 0) AS BIGINT)
        FROM embeddings WHERE vec_id % 101 = 0
    """,
    "q222_fd_discovery": """
        -- FD A→B holds iff |distinct A| = |distinct (A,B)|
        WITH d AS (
          SELECT coalesce(lang, '') AS lang,
                 coalesce(source, '') AS source,
                 CAST(n_chars // 100 AS VARCHAR) AS band
          FROM documents
        ),
        c AS (
          SELECT 'lang' AS k, CAST(count(DISTINCT lang) AS BIGINT) AS n
          FROM d
          UNION ALL SELECT 'source', count(DISTINCT source) FROM d
          UNION ALL SELECT 'band', count(DISTINCT band) FROM d
          UNION ALL SELECT 'lang>source',
            count(DISTINCT lang || chr(31) || source) FROM d
          UNION ALL SELECT 'lang>band',
            count(DISTINCT lang || chr(31) || band) FROM d
          UNION ALL SELECT 'source>lang',
            count(DISTINCT source || chr(31) || lang) FROM d
          UNION ALL SELECT 'source>band',
            count(DISTINCT source || chr(31) || band) FROM d
          UNION ALL SELECT 'band>lang',
            count(DISTINCT band || chr(31) || lang) FROM d
          UNION ALL SELECT 'band>source',
            count(DISTINCT band || chr(31) || source) FROM d
        ),
        pairs AS (
          SELECT * FROM (VALUES
            ('lang', 'source'), ('lang', 'band'), ('source', 'lang'),
            ('source', 'band'), ('band', 'lang'), ('band', 'source')
          ) p(lhs, rhs)
        )
        SELECT p.lhs, p.rhs, a.n AS n_lhs, ab.n AS n_pair,
               CAST(CASE WHEN a.n = ab.n THEN 1 ELSE 0 END AS BIGINT)
                 AS fd_holds,
               CAST(ab.n - a.n AS BIGINT) AS violations
        FROM pairs p
        JOIN c a ON a.k = p.lhs
        JOIN c ab ON ab.k = p.lhs || '>' || p.rhs
    """,
    "q223_join_stats_moments": """
        -- AMS moment suite per side + the exact cross-join size
        WITH co AS (
          SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1
        ),
        cl AS (
          SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1
        ),
        j AS (SELECT co.n AS n_o, cl.n AS n_l FROM co JOIN cl USING (k))
        SELECT 'orders' AS side, CAST(count(*) AS BIGINT) AS f0,
               CAST(sum(n) AS BIGINT) AS f1,
               CAST(sum(n * n) AS BIGINT) AS f2
        FROM co
        UNION ALL
        SELECT 'lineitem', count(*), CAST(sum(n) AS BIGINT),
               CAST(sum(n * n) AS BIGINT)
        FROM cl
        UNION ALL
        SELECT 'cross', count(*), CAST(0 AS BIGINT),
               CAST(sum(n_o * n_l) AS BIGINT)
        FROM j
    """,
    "q224_json_profile": """
        -- per-key presence / integer-parse / exact integer sum over
        -- the props JSON column (keys are identifier-simple here)
        WITH kx AS (
          SELECT props, unnest(json_keys(props)) AS key
          FROM events WHERE props IS NOT NULL
        ),
        t AS (
          SELECT key,
                 CASE WHEN json_type(props, '$.' || key)
                           IN ('UBIGINT', 'BIGINT', 'INTEGER')
                      THEN CAST(json_extract(props, '$.' || key)
                                AS BIGINT) END AS iv
          FROM kx
        )
        SELECT key, count(*) AS n_present,
               CAST(sum(CASE WHEN iv IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_int,
               CAST(coalesce(sum(iv), 0) AS BIGINT) AS sum_int
        FROM t GROUP BY 1
    """,
    "q219_encoding_advisor": """
        -- per-column dictionary-vs-plain decision: dict cost =
        -- distinct-value chars + 4 bytes/row of codes
        WITH c1 AS (SELECT coalesce(text, '') AS v FROM documents),
        c2 AS (SELECT coalesce(lang, '') AS v FROM documents),
        c3 AS (SELECT coalesce(source, '') AS v FROM documents),
        s AS (
          SELECT 'text' AS col, count(*) AS n,
                 CAST(sum(length(v)) AS BIGINT) AS plain_chars,
                 CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
                 CAST((SELECT sum(length(v))
                       FROM (SELECT DISTINCT v FROM c1)) AS BIGINT)
                   AS dist_chars
          FROM c1
          UNION ALL
          SELECT 'lang', count(*), CAST(sum(length(v)) AS BIGINT),
                 CAST(count(DISTINCT v) AS BIGINT),
                 CAST((SELECT sum(length(v))
                       FROM (SELECT DISTINCT v FROM c2)) AS BIGINT)
          FROM c2
          UNION ALL
          SELECT 'source', count(*), CAST(sum(length(v)) AS BIGINT),
                 CAST(count(DISTINCT v) AS BIGINT),
                 CAST((SELECT sum(length(v))
                       FROM (SELECT DISTINCT v FROM c3)) AS BIGINT)
          FROM c3
        )
        SELECT col, n, plain_chars, n_distinct, dist_chars,
               CAST(dist_chars + 4 * n AS BIGINT) AS dict_cost,
               CAST(CASE WHEN dist_chars + 4 * n < plain_chars
                    THEN 1 ELSE 0 END AS BIGINT) AS use_dict
        FROM s
    """,
    "q220_next_event_baseline": """
        -- modal-next-type accuracy floor; the modal COUNT is tie-free
        WITH r AS (
          SELECT event_type AS cur,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events
        ),
        c AS (
          SELECT cur, nxt, count(*) AS n FROM r
          WHERE nxt IS NOT NULL GROUP BY 1, 2
        )
        SELECT cur, CAST(sum(n) AS BIGINT) AS n_total,
               CAST(max(n) AS BIGINT) AS n_correct
        FROM c GROUP BY 1
    """,
    "q221_dedup_savings": """
        -- computed on the text-group relation: same text → same token
        -- count, so survivors never re-tokenize
        WITH d AS (SELECT coalesce(text, '') AS t FROM documents),
        tok AS (
          SELECT t, len(list_filter(
                   regexp_split_to_array(t, '\\s+'), x -> x <> ''))
                 AS tc
          FROM d
        ),
        g AS (
          SELECT t, count(*) AS n_dups, CAST(min(tc) AS BIGINT) AS tc
          FROM tok GROUP BY t
        )
        SELECT CAST(sum(n_dups) AS BIGINT) AS n_docs,
               count(*) AS n_unique,
               CAST(sum(n_dups * tc) AS BIGINT) AS tokens_all,
               CAST(sum(tc) AS BIGINT) AS tokens_unique
        FROM g
    """,
    "q216_weighted_jaccard": f"""
        -- weighted Jaccard evidence: only the MIN mass is enumerated;
        -- Σmax = T_a + T_b − Σmin is a derived epilogue
        WITH toks AS (
          SELECT source,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        ),
        tc AS (
          SELECT source, token, count(*) AS cnt FROM toks GROUP BY 1, 2
        ),
        tt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS t
               FROM tc GROUP BY 1),
        pm AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS sum_min
          FROM tc a JOIN tc b
            ON a.token = b.token AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT pm.source_a, pm.source_b, pm.sum_min,
               ta.t AS t_a, tb.t AS t_b
        FROM pm JOIN tt ta ON ta.source = pm.source_a
                JOIN tt tb ON tb.source = pm.source_b
    """,
    "q217_graph_reciprocity": """
        -- analytic edge contract (the q147 arithmetic): distinct
        -- ordered edges, reverse-existence count, Σ outdeg·indeg
        WITH e AS (
          SELECT DISTINCT
                 'site' || CAST(doc_id % 7 AS VARCHAR) AS src,
                 'site' || CAST((3 * doc_id + 1) % 7 AS VARCHAR) AS dst
          FROM documents
          UNION
          SELECT DISTINCT
                 'site' || CAST(doc_id % 7 AS VARCHAR),
                 'site' || CAST((5 * doc_id + 2) % 7 AS VARCHAR)
          FROM documents
        ),
        od AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
        idg AS (SELECT dst, count(*) AS ind FROM e GROUP BY 1)
        SELECT (SELECT count(*) FROM e) AS n_edges,
               (SELECT count(*) FROM e x
                WHERE EXISTS (SELECT 1 FROM e y
                              WHERE y.src = x.dst AND y.dst = x.src))
                 AS n_recip,
               CAST((SELECT sum(od.outd * idg.ind)
                     FROM e JOIN od ON e.src = od.src
                            JOIN idg ON e.dst = idg.dst) AS BIGINT)
                 AS sum_degprod
    """,
    "q218_histogram_drift": """
        -- first/second half split at the (min+max)/2 timestamp;
        -- width-50 value buckets; |Δ| is the L1 drift term
        WITH m AS (
          SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
          FROM events
        ),
        b AS (
          SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
                 CASE WHEN epoch_us(ts) < (SELECT mid FROM m)
                      THEN 1 ELSE 0 END AS f
          FROM events
        )
        SELECT bucket, CAST(sum(f) AS BIGINT) AS n_first,
               CAST(sum(1 - f) AS BIGINT) AS n_second,
               CAST(abs(sum(f) - sum(1 - f)) AS BIGINT) AS abs_diff
        FROM b GROUP BY 1
    """,
    "q213_cusum_drift": """
        -- clamped CUSUM unrolled: S_i = P_i - least(0, min(P_1..P_i))
        WITH o AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 CAST(floor(value * 100) AS BIGINT) - 28000 AS d
          FROM events
        ),
        r AS (
          SELECT *, sum(d) OVER w AS p FROM o
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        s AS (
          SELECT user_id, event_id, t,
                 p - least(0, min(p) OVER w) AS cusum
          FROM r
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        sel AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY cusum DESC, t, event_id) AS rn,
                 row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY t DESC, event_id DESC) AS rl
          FROM s
        )
        SELECT a.user_id, CAST(a.cusum AS BIGINT) AS peak,
               a.event_id AS at_event,
               CAST(b.cusum AS BIGINT) AS final
        FROM (SELECT * FROM sel WHERE rn = 1) a
        JOIN (SELECT * FROM sel WHERE rl = 1) b USING (user_id)
    """,
    "q214_sequence_disorder": """
        -- Kendall-tau distance between arrival order and value order;
        -- ties uncounted
        WITH r AS (
          SELECT user_id,
                 CAST(floor(value * 100) AS BIGINT) AS c,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ),
        inv AS (
          SELECT a.user_id, count(*) AS inversions
          FROM r a JOIN r b
            ON a.user_id = b.user_id AND a.rn < b.rn AND a.c > b.c
          GROUP BY 1
        ),
        base AS (
          SELECT user_id, count(*) AS n_events FROM r GROUP BY 1
        )
        SELECT base.user_id, base.n_events,
               CAST(coalesce(inv.inversions, 0) AS BIGINT) AS inversions,
               CAST(base.n_events * (base.n_events - 1) // 2 AS BIGINT)
                 AS n_pairs
        FROM base LEFT JOIN inv USING (user_id)
    """,
    "q215_autocorr_evidence": """
        -- integer moment sums + adjacent-product sum in (ts, event_id)
        -- order per type
        WITH r AS (
          SELECT event_type,
                 CAST(floor(value * 100) AS BIGINT) AS c,
                 lead(CAST(floor(value * 100) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        )
        SELECT event_type, count(*) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2,
               CAST(sum(coalesce(c * nxt, 0)) AS BIGINT) AS lag_sum
        FROM r GROUP BY 1
    """,
    "q210_ordered_funnel": """
        -- strict-order funnel with (ts, event_id) lexicographic
        -- precedence on ties, 1-day windows per hop
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS t
          FROM events
        ),
        v AS (
          SELECT v.user_id, v.event_id, v.t FROM e v
          WHERE v.event_type = 'view'
            AND EXISTS (
              SELECT 1 FROM e c
              WHERE c.user_id = v.user_id AND c.event_type = 'click'
                AND (c.t < v.t OR (c.t = v.t AND c.event_id < v.event_id))
                AND v.t - c.t <= 86400000000
            )
        ),
        p AS (
          SELECT p.user_id, p.event_id FROM e p
          WHERE p.event_type = 'purchase'
            AND EXISTS (
              SELECT 1 FROM v
              WHERE v.user_id = p.user_id
                AND (v.t < p.t OR (v.t = p.t AND v.event_id < p.event_id))
                AND p.t - v.t <= 86400000000
            )
        )
        SELECT u.user_id, u.n_purchases,
               CAST(coalesce(q.nq, 0) AS BIGINT) AS n_qualified
        FROM (
          SELECT user_id, count(*) AS n_purchases FROM e
          WHERE event_type = 'purchase' GROUP BY 1
        ) u
        LEFT JOIN (
          SELECT user_id, count(*) AS nq FROM p GROUP BY 1
        ) q USING (user_id)
    """,
    "q211_datasheet": """
        -- per-source nutrition label; distinct texts via the same
        -- masked md5 fingerprint the Ray side exchanges
        SELECT coalesce(source, '') AS source, count(*) AS n_docs,
               CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                 AS sum_chars,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_en,
               CAST(count(DISTINCT
                 md5_number_lower(coalesce(text, ''))
                 & 9223372036854775807) AS BIGINT) AS n_uniq
        FROM documents GROUP BY 1
    """,
    "q212_incremental_rollup": """
        -- from-scratch twin over both waves (wave 2 = +100000 ids,
        -- +36 h); the Ray side folds wave 2 onto the STORED rollup
        WITH both_waves AS (
          SELECT event_type, epoch_us(ts) AS t_us, value FROM events
          UNION ALL
          SELECT event_type, epoch_us(ts) + 129600000000, value
          FROM events
        )
        SELECT event_type,
               CAST(t_us - t_us % 3600000000 AS BIGINT) AS hour_us,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM both_waves GROUP BY 1, 2
    """,
    "q207_pruning_audit": """
        -- scan-planner ledger: a 256-row group prunes when max < 500
        WITH g AS (
          SELECT event_id // 256 AS grp, min(value) AS vmin,
                 max(value) AS vmax, count(*) AS n,
                 sum(CASE WHEN value >= 500.0 THEN 1 ELSE 0 END) AS nm
          FROM events GROUP BY 1
        )
        SELECT count(*) AS n_groups,
               CAST(sum(CASE WHEN vmax < 500.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pruned,
               CAST(sum(CASE WHEN vmax < 500.0 THEN 0 ELSE n END)
                    AS BIGINT) AS rows_scanned,
               CAST(sum(nm) AS BIGINT) AS rows_matched
        FROM g
    """,
    "q208_term_lattice": """
        -- containment mask over the top-3 tokens; all 8 AND-combos
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
          FROM documents WHERE text IS NOT NULL
        ),
        top3 AS (
          SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS i
          FROM (
            SELECT tok, count(*) AS cnt FROM toks WHERE tok <> ''
            GROUP BY tok ORDER BY cnt DESC, tok LIMIT 3
          )
        ),
        dt AS (SELECT DISTINCT doc_id, tok FROM toks WHERE tok <> ''),
        m AS (
          SELECT d.doc_id,
                 CAST(coalesce(sum(CASE WHEN t.i IS NOT NULL
                                        THEN 1 << t.i END), 0)
                      AS BIGINT) AS mask
          FROM documents d
          LEFT JOIN dt ON dt.doc_id = d.doc_id
          LEFT JOIN top3 t ON t.tok = dt.tok
          GROUP BY d.doc_id
        )
        SELECT mask, count(*) AS n_docs FROM m GROUP BY 1
    """,
    "q209_user_growth": """
        -- first-seen day per user → per-day new users → running total
        WITH fs AS (
          SELECT user_id,
                 min(epoch_us(ts) // 86400000000) AS day
          FROM events GROUP BY 1
        ),
        nd AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
        SELECT CAST(day AS BIGINT) AS day, new_users,
               CAST(sum(new_users) OVER (
                 ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM nd
    """,
    "q204_roaring_plan": """
        -- Roaring decision at 256-value containers: n >= 48 → bitmap
        -- (32 bytes) else sorted array (2n bytes)
        WITH c AS (
          SELECT event_type, event_id // 256 AS container,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, CAST(container AS BIGINT) AS container, n,
               CAST(CASE WHEN n >= 48 THEN 1 ELSE 0 END AS BIGINT)
                 AS ctype,
               CAST(CASE WHEN n >= 48 THEN 32 ELSE 2 * n END AS BIGINT)
                 AS bytes
        FROM c
    """,
    "q205_peak_concurrency": """
        -- c(t) = starts≤t − ends≤t at distinct timestamps (half-open
        -- intervals); the max occurs at a start; earliest wins
        WITH iv AS (
          SELECT epoch_us(ts) AS s,
                 epoch_us(ts) + ((event_id % 3600) + 60) * 1000000 AS e
          FROM events
        ),
        pts AS (
          SELECT t, sum(d) AS d, max(is_start) AS is_start FROM (
            SELECT s AS t, 1 AS d, 1 AS is_start FROM iv
            UNION ALL SELECT e, -1, 0 FROM iv
          ) GROUP BY t
        ),
        run AS (
          SELECT t, is_start,
                 sum(d) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c
          FROM pts
        ),
        st AS (SELECT t, c FROM run WHERE is_start = 1),
        mx AS (SELECT max(c) AS mc FROM st)
        SELECT CAST(mx.mc AS BIGINT) AS max_concurrency,
               CAST(min(st.t) AS BIGINT) AS at_us
        FROM st, mx WHERE st.c = mx.mc GROUP BY mx.mc
    """,
    "q206_coverage_k90": f"""
        -- k90 via the count-of-counts relation: boundary group gets
        -- j = ceil((9T - 10m) / (10c)) tokens, all integers
        WITH toks AS (
          SELECT lang,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        tc AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
        cc AS (SELECT lang, cnt, count(*) AS ntok FROM tc GROUP BY 1, 2),
        w AS (
          SELECT lang, cnt, ntok,
                 coalesce(sum(cnt * ntok) OVER (
                   PARTITION BY lang ORDER BY cnt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS m_before,
                 coalesce(sum(ntok) OVER (
                   PARTITION BY lang ORDER BY cnt DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS k_before,
                 sum(cnt * ntok) OVER (PARTITION BY lang) AS t_mass,
                 sum(ntok) OVER (PARTITION BY lang) AS vocab
          FROM cc
        ),
        sel AS (
          SELECT lang, vocab, t_mass,
                 k_before + (9 * t_mass - 10 * m_before + 10 * cnt - 1)
                   // (10 * cnt) AS k90
          FROM w
          WHERE 10 * m_before < 9 * t_mass
            AND 10 * (m_before + cnt * ntok) >= 9 * t_mass
        )
        SELECT lang, CAST(vocab AS BIGINT) AS vocab,
               CAST(t_mass AS BIGINT) AS total_tokens,
               CAST(k90 AS BIGINT) AS k90
        FROM sel
    """,
    "q201_ohlc_candles": """
        -- per (type, 4 h bucket): open/close by (ts, event_id) order,
        -- high/low; values carried, never recomputed
        WITH e AS (
          SELECT event_type, event_id, value, epoch_us(ts) AS ts_us,
                 epoch_us(ts) - epoch_us(ts) % 14400000000 AS bucket
          FROM events
        ),
        r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts_us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, bucket
                   ORDER BY ts_us DESC, event_id DESC) AS rn_d
          FROM e
        )
        SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
               max(CASE WHEN rn_a = 1 THEN value END) AS open,
               max(value) AS high, min(value) AS low,
               max(CASE WHEN rn_d = 1 THEN value END) AS close,
               count(*) AS n
        FROM r GROUP BY 1, 2
    """,
    "q202_politeness_schedule": """
        -- t_i = max(arrival_i, t_{i-1} + gap) unrolled to the window
        -- identity t_i = gap*i + running_max(arrival_j - gap*j)
        WITH e AS (
          SELECT event_id, user_id % 32 AS host, epoch_us(ts) AS arr
          FROM events
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY host ORDER BY arr, event_id) - 1 AS i0
          FROM e
        ),
        f AS (
          SELECT event_id, host, arr,
                 2000000 * i0 + max(arr - 2000000 * i0) OVER (
                   PARTITION BY host ORDER BY arr, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS fetch_us
          FROM r
        )
        SELECT event_id, CAST(host AS BIGINT) AS host,
               CAST(fetch_us AS BIGINT) AS fetch_us,
               CAST((fetch_us - arr) // 1000000 AS BIGINT) AS delay_s
        FROM f
    """,
    "q203_smoothed_series": """
        -- [1,2,1] kernel with exact float semantics: 2·x is exact and
        -- both engines evaluate (prev + 2x) + next in the same order
        WITH r AS (
          SELECT event_id, user_id, value,
                 lag(value) OVER w AS prev,
                 lead(value) OVER w AS nxt
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id,
               (coalesce(prev, value) + 2 * value)
                 + coalesce(nxt, value) AS smooth4
        FROM r
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
    "q197_gini_evidence": """
        -- sorted-order identity: sum over i of (2i - n - 1) * x_(i)
        -- equals the sum of all pairwise absolute differences
        WITH r AS (
          SELECT lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id) AS i,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT lang, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_x,
               CAST(sum((2 * i - n - 1) * n_chars) AS BIGINT) AS gini_num
        FROM r GROUP BY lang
    """,
    "q198_attribution": """
        -- last-touch: latest click at-or-before each purchase within
        -- 7 days (ties: highest event_id); -1 when unattributed
        WITH c AS (
          SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click'
        ),
        p AS (
          SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase'
        ),
        j AS (
          SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                 (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_s,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM p JOIN c
            ON c.user_id = p.user_id AND c.ts <= p.ts
           AND epoch_us(p.ts) - epoch_us(c.ts) <= 604800000000
        )
        SELECT p.event_id AS purchase_id,
               CAST(coalesce(j.click_id, -1) AS BIGINT) AS click_id,
               CAST(coalesce(j.gap_s, -1) AS BIGINT) AS gap_s
        FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
          ON p.event_id = j.purchase_id
    """,
    "q199_kwic_contexts": f"""
        -- concordance of the corpus top-1 token with 2-token contexts
        WITH base AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        tok AS (
          SELECT tok FROM (
            SELECT unnest(toks) AS tok FROM base
          ) WHERE tok <> ''
          GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 1
        ),
        pos AS (
          SELECT doc_id, toks,
                 unnest(list_transform(range(1, len(toks) + 1), i -> i))
                   AS i
          FROM base
        ),
        hits AS (
          SELECT doc_id, toks, i FROM pos, tok WHERE toks[i] = tok.tok
        )
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               coalesce(array_to_string(
                 list_slice(toks, greatest(1, i - 2), i - 1), ' '), '')
                 AS left_ctx,
               coalesce(array_to_string(
                 list_slice(toks, i + 1, least(len(toks), i + 2)), ' '), '')
                 AS right_ctx
        FROM hits
    """,
    "q194_benford_audit": """
        -- first digit by repeated integer division over floor(100·v)
        -- (no log10 — its last-bit rounding differs across libms)
        WITH iv AS (
          SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x
          FROM events
          WHERE CAST(floor(value * 100) AS BIGINT) > 0
        ),
        d AS (
          SELECT event_type,
            CASE WHEN x >= 100000000 THEN x // 100000000
                 WHEN x >= 10000000 THEN x // 10000000
                 WHEN x >= 1000000 THEN x // 1000000
                 WHEN x >= 100000 THEN x // 100000
                 WHEN x >= 10000 THEN x // 10000
                 WHEN x >= 1000 THEN x // 1000
                 WHEN x >= 100 THEN x // 100
                 WHEN x >= 10 THEN x // 10
                 ELSE x END AS digit
          FROM iv
        )
        SELECT event_type, CAST(digit AS BIGINT) AS digit,
               count(*) AS n
        FROM d GROUP BY 1, 2
    """,
    "q195_k_anonymity": """
        -- equivalence-class size histogram over the quasi-identifier
        -- (lang, source, n_chars length band)
        WITH c AS (
          SELECT lang, source, n_chars // 100 AS band, count(*) AS n
          FROM documents GROUP BY 1, 2, 3
        )
        SELECT n AS k, count(*) AS n_classes FROM c GROUP BY 1
    """,
    "q196_join_size_exact": """
        -- |orders ⋈ lineitem| = Σ cnt_o(k)·cnt_l(k), no join rows built
        WITH co AS (
          SELECT o_orderkey AS k, count(*) AS n_o FROM orders GROUP BY 1
        ),
        cl AS (
          SELECT l_orderkey AS k, count(*) AS n_l FROM lineitem GROUP BY 1
        ),
        j AS (SELECT co.k, n_o, n_l FROM co JOIN cl USING (k))
        SELECT count(*) AS n_keys,
               CAST(sum(n_o * n_l) AS BIGINT) AS join_rows,
               CAST(max(n_o * n_l) AS BIGINT) AS max_key_fanout
        FROM j
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
    "q192_twap_evidence": """
        -- quantized TWAP integral: floor(1000·value) × whole-second
        -- gap to the next event; last event contributes 0
        WITH o AS (
          SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events
        ),
        g AS (
          SELECT user_id,
                 coalesce((nxt - ts_us) // 1000000, 0) AS dt_s,
                 CAST(floor(value * 1000) AS BIGINT) AS qv
          FROM o
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(dt_s) AS BIGINT) AS span_s,
               CAST(sum(qv * dt_s) AS BIGINT) AS qv_dt
        FROM g GROUP BY 1
    """,
    "q193_burst_rate": """
        -- RANGE frame: every event's trailing 60 s window, peers
        -- (equal ts) included; max per user
        WITH c AS (
          SELECT user_id,
                 count(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 60 SECONDS PRECEDING
                         AND CURRENT ROW
                 ) AS burst
          FROM events
        )
        SELECT user_id, count(*) AS n_events,
               CAST(max(burst) AS BIGINT) AS max_burst
        FROM c GROUP BY 1
    """,
    "q188_longest_streak": """
        -- gaps-and-islands: island = day - rank is constant within a
        -- consecutive-day run
        WITH d AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 86400000000 AS day
          FROM events
        ),
        r AS (
          SELECT user_id, day,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY day) - 1 AS rk
          FROM d
        ),
        runs AS (
          SELECT user_id, day - rk AS island, count(*) AS run
          FROM r GROUP BY 1, 2
        )
        SELECT user_id, CAST(sum(run) AS BIGINT) AS n_active_days,
               CAST(max(run) AS BIGINT) AS longest_streak
        FROM runs GROUP BY 1
    """,
    "q189_lang_overlap_matrix": f"""
        -- exact pairwise overlap of unigram ∪ bigram feature sets;
        -- the diagonal (a = b) carries each side's |F|
        WITH base AS (
          SELECT lang, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        f AS (
          SELECT DISTINCT lang, tok FROM (
            SELECT lang, unnest(toks) AS tok FROM base
            UNION ALL
            SELECT lang, unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) FROM base
          ) WHERE tok <> ''
        )
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               count(*) AS n_common
        FROM f a JOIN f b ON a.tok = b.tok AND a.lang <= b.lang
        GROUP BY 1, 2
    """,
    "q190_reshard_churn": """
        -- 16→17 shards: naive mod moves ~15/16 of keys, the vnode ring
        -- moves ~1/17; ring16 is ring17 minus node 16's points
        WITH ring17 AS (
          SELECT t.i AS node,
                 CAST(md5_number_lower(
                   'node:' || CAST(t.i AS VARCHAR) || ':'
                           || CAST(u.v AS VARCHAR))
                   & 9223372036854775807 AS BIGINT) AS p
          FROM range(17) t(i), range(8) u(v)
        ),
        ring16 AS (SELECT node, p FROM ring17 WHERE node < 16),
        k AS (
          SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                      & 9223372036854775807 AS BIGINT) AS h
          FROM documents
        ),
        o AS (
          SELECT h,
            coalesce((SELECT r.node FROM ring16 r WHERE r.p >= k.h
                      ORDER BY r.p, r.node LIMIT 1),
                     (SELECT r.node FROM ring16 r
                      ORDER BY r.p, r.node LIMIT 1)) AS o16,
            coalesce((SELECT r.node FROM ring17 r WHERE r.p >= k.h
                      ORDER BY r.p, r.node LIMIT 1),
                     (SELECT r.node FROM ring17 r
                      ORDER BY r.p, r.node LIMIT 1)) AS o17
          FROM k
        )
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_mod,
               CAST(sum(CASE WHEN o16 <> o17 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_moved_ring
        FROM o
    """,
    "q185_range_splits": """
        -- balanced weighted range partitioner: part = exclusive prefix
        -- weight // ceil(W/8) in id order — contiguous by construction
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
        parts AS (
          SELECT doc_id, wt,
                 pre // (SELECT (tot + 7) // 8 FROM t) AS part
          FROM p
        )
        SELECT CAST(part AS BIGINT) AS part, count(*) AS n_docs,
               CAST(sum(wt) AS BIGINT) AS tot_weight,
               min(doc_id) AS id_lo, max(doc_id) AS id_hi
        FROM parts GROUP BY 1
    """,
    "q186_classifier_agreement": f"""
        -- per-lang confusion matrix of two hashed-linear keep verdicts
        -- (weight seeds 'w:' and 'v:')
        WITH wa AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'w:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        wb AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'v:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        sa AS (
          SELECT t.doc_id, CAST(sum(wa.w) AS BIGINT) AS score
          FROM toks t JOIN wa
            ON wa.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        sb AS (
          SELECT t.doc_id, CAST(sum(wb.w) AS BIGINT) AS score
          FROM toks t JOIN wb
            ON wb.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        d AS (
          SELECT coalesce(d.lang, '') AS lang,
                 CASE WHEN coalesce(sa.score, 0) > 0 THEN 1 ELSE 0 END
                   AS ka,
                 CASE WHEN coalesce(sb.score, 0) > 0 THEN 1 ELSE 0 END
                   AS kb
          FROM documents d
          LEFT JOIN sa USING (doc_id) LEFT JOIN sb USING (doc_id)
        )
        SELECT lang,
          CAST(sum(CASE WHEN ka = 0 AND kb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n00,
          CAST(sum(CASE WHEN ka = 0 AND kb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n01,
          CAST(sum(CASE WHEN ka = 1 AND kb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
          CAST(sum(CASE WHEN ka = 1 AND kb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n11
        FROM d GROUP BY 1
    """,
    "q187_auc_evidence": f"""
        -- Mann-Whitney: 2U = sum over score values of
        -- 2·n_pos(s)·cum_neg(<s) + n_pos(s)·n_neg(s); all integers
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
        d AS (
          SELECT coalesce(s.score, 0) AS score,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents d LEFT JOIN s USING (doc_id)
        ),
        g AS (
          SELECT score, CAST(sum(pos) AS BIGINT) AS np_,
                 CAST(sum(1 - pos) AS BIGINT) AS nn_
          FROM d GROUP BY 1
        ),
        o AS (
          SELECT score, np_, nn_,
                 coalesce(sum(nn_) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cneg
          FROM g
        )
        SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
               CAST(sum(nn_) AS BIGINT) AS n_neg,
               CAST(sum(2 * np_ * cneg + np_ * nn_) AS BIGINT) AS u2
        FROM o
    """,
    "q182_quant_recall": """
        -- exact-cosine top-10 vs int-quantized-dot top-10 per query;
        -- the quantized dot is integer-valued (floor(1e3·x) per dim)
        -- so even a double-valued SQL dot is exact
        WITH dsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a, embeddings b
          WHERE a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        e10 AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, cand_id) AS rn
            FROM dsim
          ) WHERE rn <= 10
        ),
        qv AS (
          SELECT vec_id, list_transform(
                   embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
          FROM embeddings
        ),
        qsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
          FROM qv a JOIN qv b
            ON a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        q10 AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot DESC, cand_id) AS rn
            FROM qsim
          ) WHERE rn <= 10
        ),
        queries AS (
          SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 10 = 0
        ),
        hits AS (
          SELECT e10.query_id, count(*) AS c
          FROM e10 JOIN q10 USING (query_id, cand_id) GROUP BY 1
        )
        SELECT q.query_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits
        FROM queries q LEFT JOIN hits h USING (query_id)
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
    "q184_calibration_bins": f"""
        -- reliability-diagram evidence over the q129 integer scores;
        -- clamp+shift keeps the width-16 binning division nonnegative
        -- (DuckDB // truncates, Python floors — they agree on >= 0)
        WITH w AS (
          SELECT b.b AS b,
                 CAST(md5_number_lower(
                   'w:' || CAST(b.b AS VARCHAR)
                 ) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t
          JOIN w ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        d AS (
          SELECT d.doc_id, coalesce(s.score, 0) AS score,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents d LEFT JOIN s USING (doc_id)
        )
        SELECT (least(greatest(score, -1024), 1023) + 1024) // 16 AS bin,
               count(*) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(score) AS BIGINT) AS sum_score
        FROM d GROUP BY 1
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
    "q180_compaction_plan": """
        -- streaming next-fit packing: bin = exclusive-prefix-bytes //
        -- 65536 within each language's id-ordered parts manifest
        WITH parts AS (
          SELECT lang, doc_id // 16 AS part,
                 CAST(sum(n_chars) AS BIGINT) AS bytes
          FROM documents GROUP BY 1, 2
        ),
        binned AS (
          SELECT lang, part, bytes,
                 coalesce(sum(bytes) OVER (
                   PARTITION BY lang ORDER BY part
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) // 65536 AS bin
          FROM parts
        )
        SELECT lang, CAST(bin AS BIGINT) AS bin, count(*) AS n_parts,
               CAST(sum(bytes) AS BIGINT) AS tot_bytes,
               min(part) AS part_lo, max(part) AS part_hi
        FROM binned GROUP BY 1, 2
    """,
    "q181_skipgram_pairs": f"""
        -- unordered within-window (d <= 3) token pairs under binary
        -- collation; top-100 by (count desc, pair asc)
        WITH base AS (
          SELECT {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
        ),
        p AS (
          SELECT unnest(list_transform(range(1, len(toks)),
            i -> CASE WHEN toks[i] <= toks[i+1]
                      THEN toks[i] || ' ' || toks[i+1]
                      ELSE toks[i+1] || ' ' || toks[i] END)) AS pair
          FROM base
          UNION ALL
          SELECT unnest(list_transform(range(1, len(toks) - 1),
            i -> CASE WHEN toks[i] <= toks[i+2]
                      THEN toks[i] || ' ' || toks[i+2]
                      ELSE toks[i+2] || ' ' || toks[i] END))
          FROM base
          UNION ALL
          SELECT unnest(list_transform(range(1, len(toks) - 2),
            i -> CASE WHEN toks[i] <= toks[i+3]
                      THEN toks[i] || ' ' || toks[i+3]
                      ELSE toks[i+3] || ' ' || toks[i] END))
          FROM base
        )
        SELECT pair, count(*) AS cnt FROM p
        GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 100
    """,
    "q176_phrase_positions": f"""
        -- positional postings: every (doc, 0-based token position) of
        -- the corpus top-1 trigram (ties: trigram asc)
        WITH base AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        tri AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - 1),
            i -> {{'pos': i,
                   'tg': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]}}
          ), recursive := true)
          FROM base
        ),
        top AS (
          SELECT tg FROM tri GROUP BY tg
          ORDER BY count(*) DESC, tg LIMIT 1
        )
        SELECT t.doc_id, CAST(t.pos - 1 AS BIGINT) AS pos, t.tg AS phrase
        FROM tri t JOIN top ON t.tg = top.tg
    """,
    "q177_locf_gapfill": """
        -- hourly grid per user (first..last observed hour), missing
        -- hours carry the last observation forward; values are CARRIED
        -- floats, never recomputed
        WITH b AS (
          SELECT user_id, value,
                 epoch_us(ts) - epoch_us(ts) % 3600000000 AS h_us,
                 row_number() OVER (
                   PARTITION BY user_id,
                                epoch_us(ts) - epoch_us(ts) % 3600000000
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ),
        obs AS (SELECT user_id, h_us, value FROM b WHERE rn = 1),
        span AS (
          SELECT user_id, min(h_us) AS h0, max(h_us) AS h1
          FROM obs GROUP BY 1
        ),
        grid AS (
          SELECT user_id, unnest(range(h0, h1 + 1, 3600000000)) AS h_us
          FROM span
        ),
        j AS (
          SELECT g.user_id, g.h_us, o.value,
                 CASE WHEN o.h_us IS NULL THEN 1 ELSE 0 END AS filled
          FROM grid g LEFT JOIN obs o
            ON g.user_id = o.user_id AND g.h_us = o.h_us
        )
        SELECT user_id, make_timestamp(h_us) AS h,
               last_value(value IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value,
               CAST(filled AS BIGINT) AS filled
        FROM j
    """,
    "q178_anchor_text_index": """
        -- analytic anchor contract: anchor text = the doc's first two
        -- tokens, targets from the q147 doc_id arithmetic; top-3 anchor
        -- tokens per destination host (count desc, token asc)
        WITH d AS (
          SELECT doc_id, list_slice(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> ''), 1, 2) AS ts2
          FROM documents WHERE text IS NOT NULL
        ),
        a AS (SELECT doc_id, ts2 FROM d WHERE len(ts2) >= 1),
        anchors AS (
          SELECT 'site' || CAST((3 * doc_id + 1) % 7 AS VARCHAR)
                   AS dst_host, ts2 FROM a
          UNION ALL
          SELECT 'site' || CAST((5 * doc_id + 2) % 7 AS VARCHAR), ts2
          FROM a
        ),
        tok AS (SELECT dst_host, unnest(ts2) AS token FROM anchors),
        cnt AS (
          SELECT dst_host, token, count(*) AS cnt
          FROM tok GROUP BY 1, 2
        ),
        rk AS (
          SELECT *, row_number() OVER (
                   PARTITION BY dst_host ORDER BY cnt DESC, token) AS rn
          FROM cnt
        )
        SELECT dst_host, token, CAST(cnt AS BIGINT) AS cnt
        FROM rk WHERE rn <= 3
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
    "q174_grouped_covariance": """
        -- integer-quantized moment sums: x_i = floor(1e6 * dim_i) is an
        -- exact BIGINT in both engines, so every sum is order-invariant
        WITH q AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x0,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x1,
                 CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x2,
                 CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x3
          FROM embeddings
        )
        SELECT label, count(*) AS n,
               CAST(sum(x0) AS BIGINT) AS s0,
               CAST(sum(x1) AS BIGINT) AS s1,
               CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x3) AS BIGINT) AS s3,
               CAST(sum(x0*x0) AS BIGINT) AS c00,
               CAST(sum(x0*x1) AS BIGINT) AS c01,
               CAST(sum(x0*x2) AS BIGINT) AS c02,
               CAST(sum(x0*x3) AS BIGINT) AS c03,
               CAST(sum(x1*x1) AS BIGINT) AS c11,
               CAST(sum(x1*x2) AS BIGINT) AS c12,
               CAST(sum(x1*x3) AS BIGINT) AS c13,
               CAST(sum(x2*x2) AS BIGINT) AS c22,
               CAST(sum(x2*x3) AS BIGINT) AS c23,
               CAST(sum(x3*x3) AS BIGINT) AS c33
        FROM q GROUP BY 1
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
    "q170_interval_coverage": """
        -- sweep-line interval union: running max of interval ends per
        -- user marks island starts; covered time is exact integer us
        WITH iv AS (
          SELECT user_id, event_id, epoch_us(ts) AS s,
                 epoch_us(ts) + ((event_id % 3600) + 60) * 1000000 AS e
          FROM events
        ),
        ord AS (
          SELECT *, max(e) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS prev_max
          FROM iv
        ),
        isl AS (
          SELECT *, sum(CASE WHEN prev_max IS NULL OR s > prev_max
                             THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                 ) AS island
          FROM ord
        ),
        m AS (
          SELECT user_id, island, min(s) AS s0, max(e) AS e1
          FROM isl GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_islands,
               CAST(sum(e1 - s0) AS BIGINT) AS covered_us
        FROM m GROUP BY 1
    """,
    "q171_edit2_fuzzy_pairs": """
        -- brute-force Levenshtein over the length-bounded vocab; the
        -- 4..16 length bound is the Ray side's variant-explode contract
        WITH vocab AS (
          SELECT DISTINCT tok FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
            FROM documents WHERE text IS NOT NULL
          ) WHERE length(tok) BETWEEN 4 AND 16
        )
        SELECT a.tok AS tok_a, b.tok AS tok_b,
               CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
        FROM vocab a JOIN vocab b ON a.tok < b.tok
        WHERE levenshtein(a.tok, b.tok) <= 2
    """,
    "q172_decay_leaderboard": """
        -- dyadic decay: weight = 2^(48 - min(age_hours, 48)) is an exact
        -- BIGINT, so the per-user score is order-invariant in any engine
        WITH m AS (SELECT max(epoch_us(ts)) AS mt FROM events),
        w AS (
          SELECT user_id,
                 (CAST(1 AS BIGINT) << CAST(
                    48 - least((mt - epoch_us(ts)) // 3600000000, 48)
                  AS INT)) AS wgt
          FROM events, m
        )
        SELECT user_id, count(*) AS n_events,
               CAST(sum(wgt) AS BIGINT) AS score
        FROM w GROUP BY 1
        ORDER BY score DESC, user_id
        LIMIT 20
    """,
    "q165_migration_checksum": """
        -- order-insensitive per-lang content digest: XOR of per-row
        -- md5-low-63 over the canonical id:text serialization
        SELECT coalesce(lang, '') AS lang,
               count(*) AS n,
               bit_xor(CAST(
                 md5_number_lower(CAST(doc_id AS VARCHAR) || ':'
                                  || coalesce(text, ''))
                 & 9223372036854775807 AS BIGINT)) AS chk
        FROM documents GROUP BY 1
    """,
    "q166_rrf_fusion": r"""
        -- hybrid retrieval: dense cosine top-5 + sparse rare-bigram
        -- top-5 fused by RRF (k=60; at most two fixed-order additions,
        -- so the float comparison is engine-identical); integer output
        WITH dsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a, embeddings b
          WHERE a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        d5 AS (
          SELECT query_id, cand_id, r FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, cand_id
                   ) AS r
            FROM dsim) WHERE r <= 5
        ),
        toks AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(text), '\s+') AS t
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(t)), i -> t[i] || ' ' || t[i+1]
          )) AS term
          FROM toks
        ),
        tf AS (
          SELECT term, doc_id, count(*) AS tf
          FROM bg GROUP BY 1, 2
        ),
        rare AS (
          SELECT term FROM tf GROUP BY term
          HAVING count(*) BETWEEN 2 AND 20
        ),
        sp AS (
          SELECT x.doc_id AS query_id, y.doc_id AS cand_id,
                 CAST(sum(x.tf * y.tf) AS BIGINT) AS score
          FROM tf x
          JOIN tf y ON x.term = y.term AND y.doc_id <> x.doc_id
          JOIN rare r ON x.term = r.term
          WHERE x.doc_id % 10 = 0
          GROUP BY 1, 2
        ),
        s5 AS (
          SELECT query_id, cand_id, r FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, cand_id
                   ) AS r
            FROM sp) WHERE r <= 5
        ),
        u AS (
          SELECT coalesce(d.query_id, s.query_id) AS query_id,
                 coalesce(d.cand_id, s.cand_id) AS cand_id,
                 coalesce(d.r, 0) AS r_dense,
                 coalesce(s.r, 0) AS r_sparse
          FROM d5 d FULL OUTER JOIN s5 s
            ON d.query_id = s.query_id AND d.cand_id = s.cand_id
        ),
        f AS (
          SELECT query_id, cand_id, r_dense, r_sparse,
                 (CASE WHEN r_dense > 0
                       THEN 1.0 / (60 + r_dense) ELSE 0.0 END)
                 + (CASE WHEN r_sparse > 0
                         THEN 1.0 / (60 + r_sparse) ELSE 0.0 END) AS rrf
          FROM u
        )
        SELECT query_id, cand_id,
               CAST(fr AS BIGINT) AS fused_rank,
               CAST(r_dense AS BIGINT) AS r_dense,
               CAST(r_sparse AS BIGINT) AS r_sparse
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, cand_id
          ) AS fr FROM f
        ) WHERE fr <= 3
    """,
    "q167_margin_mining": """
        -- CCMatrix-style ratio margin: source side = label 0; per
        -- (source, top-4 candidate) margin = cos / mean of top-4
        -- cosines of each endpoint against the other side
        WITH a AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE label = 0
        ),
        b AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE label <> 0
        ),
        sims AS (
          SELECT a.vec_id AS sa, b.vec_id AS sb,
                 list_cosine_similarity(a.e, b.e) AS s
          FROM a, b
        ),
        atop AS (
          SELECT sa, sb, s,
                 row_number() OVER (
                   PARTITION BY sa ORDER BY s DESC, sb
                 ) AS rn
          FROM sims
        ),
        aavg AS (
          SELECT sa, avg(s) AS aa FROM atop WHERE rn <= 4 GROUP BY sa
        ),
        btop AS (
          SELECT sb, s,
                 row_number() OVER (
                   PARTITION BY sb ORDER BY s DESC, sa
                 ) AS rn
          FROM sims
        ),
        bavg AS (
          SELECT sb, avg(s) AS ab FROM btop WHERE rn <= 4 GROUP BY sb
        )
        SELECT t.sa AS src_id, t.sb AS cand_id,
               round(t.s / ((aavg.aa + bavg.ab) / 2), 6) AS margin
        FROM atop t
        JOIN aavg USING (sa)
        JOIN bavg ON t.sb = bavg.sb
        WHERE t.rn <= 4
    """,
    "q168_zorder_cells": f"""
        -- 16-bit Morton code over (user_id % 256, epoch-hour % 256),
        -- zone-map rollup per 64-code z-cell
        WITH xy AS (
          SELECT CAST(user_id % 256 AS BIGINT) AS x,
                 CAST((epoch_us(ts) // 3600000000) % 256 AS BIGINT) AS y
          FROM events
        ),
        z AS (SELECT ({_MORTON16}) AS zv FROM xy)
        SELECT CAST(zv // 64 AS BIGINT) AS zcell,
               count(*) AS n_rows,
               CAST(min(zv) AS BIGINT) AS z_min,
               CAST(max(zv) AS BIGINT) AS z_max
        FROM z GROUP BY 1
    """,
    "q169_shingle_containment": f"""
        -- ordered-pair shingle containment over distinct word 5-gram
        -- md5 sets; keep pairs with |S(a) ∩ S(b)| / |S(a)| >= 0.5
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 )) AS fp
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (SELECT DISTINCT doc_id, fp FROM g0),
        nsh AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        pairs AS (
          SELECT ga.doc_id AS src_id, gb.doc_id AS sup_id,
                 count(*) AS n_inter
          FROM g ga JOIN g gb USING (fp)
          WHERE ga.doc_id <> gb.doc_id
          GROUP BY 1, 2
        )
        SELECT p.src_id, p.sup_id,
               CAST(p.n_inter AS BIGINT) AS n_inter,
               CAST(nsh.n AS BIGINT) AS n_src,
               round(p.n_inter::DOUBLE / nsh.n, 6) AS containment
        FROM pairs p JOIN nsh ON p.src_id = nsh.doc_id
        WHERE p.n_inter::DOUBLE / nsh.n >= 0.5
    """,
    "q163_incremental_exact": """
        -- wave-2 survivors: first within-wave occurrence of each fp
        -- that history (wave 1 = the corpus) has never seen
        WITH oldd AS (
          SELECT DISTINCT md5(coalesce(text, '')) AS fp FROM documents
        ),
        neww AS (
          SELECT doc_id + 10000 AS doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN coalesce(text, '') || ' v2'
                      ELSE coalesce(text, '') END AS t
          FROM documents
          UNION ALL
          SELECT doc_id + 20000,
                 CASE WHEN doc_id % 3 = 0
                      THEN coalesce(text, '') || ' v2'
                      ELSE coalesce(text, '') END
          FROM documents WHERE doc_id % 5 = 0
        ),
        nf AS (SELECT doc_id, md5(t) AS fp FROM neww)
        SELECT n.doc_id, n.fp FROM nf n
        WHERE NOT EXISTS (SELECT 1 FROM oldd o WHERE o.fp = n.fp)
          AND n.doc_id = (SELECT min(m.doc_id) FROM nf m
                          WHERE m.fp = n.fp)
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
    "q57_anti_join_customers": """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 280000
        )
    """,
    "q58_rollup_docs": """
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP(lang, source)
    """,
    "q59_knn_join_label": """
        WITH pairs AS (
          SELECT a.label, a.vec_id, b.vec_id AS nbr_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id <> b.vec_id
        ), ranked AS (
          SELECT label, vec_id, nbr_id, sim,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY sim DESC, nbr_id
                 ) AS nbr_rank
          FROM pairs
        )
        SELECT CAST(label AS BIGINT) AS label, vec_id,
               CAST(nbr_rank AS BIGINT) AS nbr_rank, nbr_id,
               round(sim, 6) AS sim
        FROM ranked WHERE nbr_rank <= 3
    """,
    "q60_group_quantile": """
        SELECT event_type, quantile_disc(value, 0.9) AS q_value
        FROM events GROUP BY event_type
    """,
    "q61_chained_join_returns": """
        SELECT c.c_custkey, c.c_name,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue
        FROM customer c, orders o, lineitem l
        WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    "q62_skew_join_nation_revenue": """
        SELECT n.n_name, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o, customer c, nation n
        WHERE o.o_custkey = c.c_custkey AND c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "q63_lag_delta": """
        SELECT event_id, user_id, delta FROM (
            SELECT event_id, user_id,
                   round(value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 3)
                     AS delta
            FROM events
        ) WHERE delta IS NOT NULL
    """,
    "q44_range_join": """
        WITH base AS (SELECT min(epoch_us(ts)) AS m FROM events),
        wins AS (
          SELECT n_nationkey AS window_id,
                 m + n_nationkey::BIGINT * 97 * 60000000::BIGINT AS w_start,
                 m + n_nationkey::BIGINT * 97 * 60000000::BIGINT
                   + (53 + 13 * n_nationkey::BIGINT) * 60000000::BIGINT
                   AS w_end
          FROM nation, base
        )
        SELECT e.event_id, CAST(w.window_id AS BIGINT) AS window_id
        FROM events e JOIN wins w
          ON epoch_us(e.ts) >= w.w_start AND epoch_us(e.ts) < w.w_end
    """,
    "q42_neardup_components": """
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (len(list_intersect(a.g, b.g))::DOUBLE
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
                >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, peer) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
        )
        SELECT node AS id,
               CAST(least(node, min(peer)) AS BIGINT) AS rep
        FROM reach GROUP BY node
    """,
    "q43_video_frames": """
        -- mirrors make_video_payload(n_frames = 4 + id%5) + the sampler's
        -- every-2nd-frame contract over 16x12 PNG frames at 24 fps
        SELECT vec_id AS item_id,
               CAST(24 AS BIGINT) AS fps,
               CAST(4 + vec_id % 5 AS BIGINT) AS n_frames,
               CAST(unnest(range(0, 4 + vec_id % 5, 2)) AS BIGINT)
                 AS frame_index,
               CAST(16 AS BIGINT) AS width,
               CAST(12 AS BIGINT) AS height
        FROM embeddings
    """,
    "q41_audio_frames": """
        -- mirrors make_audio_payload's derivation + AudioFrameSampler's
        -- fixture frame arithmetic: rate = 8000 + (id%8)*1000,
        -- n_samples = int(rate * (1 + (id%5)*0.5)) (exact: halves),
        -- n_frames = max(1, int((n_samples/rate) / 0.5)), 8 feats/frame
        SELECT vec_id AS item_id,
               CAST(8000 + (vec_id % 8) * 1000 AS BIGINT) AS sample_rate,
               GREATEST(1, CAST(FLOOR(
                 (CAST(CAST((8000 + (vec_id % 8) * 1000)
                        * (1.0 + (vec_id % 5) * 0.5) AS BIGINT) AS DOUBLE)
                  / (8000 + (vec_id % 8) * 1000)) / 0.5
               ) AS BIGINT)) AS n_frames,
               GREATEST(1, CAST(FLOOR(
                 (CAST(CAST((8000 + (vec_id % 8) * 1000)
                        * (1.0 + (vec_id % 5) * 0.5) AS BIGINT) AS DOUBLE)
                  / (8000 + (vec_id % 8) * 1000)) / 0.5
               ) AS BIGINT)) * 8 AS n_features
        FROM embeddings
    """,
    "q34_bucketed_join_revenue": """
        SELECT l_orderkey AS okey, o_custkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, okey
        LIMIT 100
    """,
    "q35_running_totals": """
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               round(sum(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 2) AS cum_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q36_distinct_pairs": """
        SELECT DISTINCT lang, source FROM documents
    """,
    "q39_staged_extract": """
        SELECT doc_id, text AS main_text,
               CAST(1 AS BIGINT) AS n_blocks,
               CAST(1 AS BIGINT) AS n_blocks_kept
        FROM documents
    """,
    "q38_event_median": """
        SELECT event_type, median(value) AS median_value
        FROM events GROUP BY event_type
    """,
    "q37_event_stats": """
        SELECT event_type, count(*) AS n,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "q33_image_features": """
        SELECT vec_id AS item_id,
               CAST(32 + (vec_id % 16) AS INTEGER) AS width,
               CAST(24 + (vec_id % 8) AS INTEGER) AS height,
               TRUE AS ok
        FROM embeddings
    """,
    "q28_events_scalar": """
        SELECT event_id, upper(event_type) AS event_type_u,
               value + 10.0 AS adj_value
        FROM events WHERE value >= 100.0
    """,
    "q29_orders_by_segment": """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q30_union_distinct": """
        SELECT count(DISTINCT k) AS n FROM (
          SELECT l_orderkey AS k FROM lineitem
          UNION ALL SELECT o_orderkey AS k FROM orders
        )
    """,
    "q91_neardup_survivors": """
        WITH RECURSIVE sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(lower(text)) - 4),
                   i -> substr(lower(text), CAST(i AS BIGINT) + 1, 5))) AS g
          FROM documents
        ),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE (len(list_intersect(a.g, b.g))::DOUBLE
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))))
                >= 0.8
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, peer) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
        ),
        removed AS (
          SELECT node FROM reach GROUP BY node
          HAVING least(node, min(peer)) <> node
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM documents
        WHERE doc_id NOT IN (SELECT node FROM removed)
        GROUP BY lang
    """,
    "q92_kmeans_assign": """
        WITH cen AS (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 4
        ),
        d AS (
          SELECT e.vec_id, c.cid,
                 list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec) AS dist
          FROM embeddings e CROSS JOIN cen c
        ),
        a AS (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d
        )
        SELECT CAST(cid AS BIGINT) AS cluster, count(*) AS n_vecs,
               CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
        FROM a WHERE rn = 1 GROUP BY cid
    """,
    "q93_cohort_retention": """
        WITH uw AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
          FROM events
        ),
        cohort AS (
          SELECT user_id, min(active_week) AS cohort_week
          FROM uw GROUP BY user_id
        )
        SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
               CAST(u.active_week AS TIMESTAMP) AS active_week,
               count(*) AS n_users
        FROM uw u JOIN cohort c ON u.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "q94_lang_mix_weights": """
        WITH c AS (
          SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
        w AS (
          SELECT lang, n_docs,
                 sqrt(CAST(n_docs AS DOUBLE) / total) AS wt
          FROM c, t
        )
        SELECT lang, n_docs,
               round(wt / (SELECT sum(wt) FROM w), 6) AS sample_share
        FROM w
    """,
    "q95_pmi_collocations": f"""
        WITH toks AS (SELECT {_TOKS} AS toks FROM documents),
        uni AS (
          SELECT token, count(*) AS cnt FROM (
            SELECT unnest(toks) AS token FROM toks
          ) WHERE token <> '' GROUP BY token
        ),
        n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
        bi AS (
          SELECT bigram, count(*) AS cnt_xy FROM (
            SELECT unnest(list_transform(
              range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]
            )) AS bigram FROM toks
          ) GROUP BY bigram HAVING count(*) >= 5
        )
        SELECT bigram, cnt_xy,
               round(CAST(cnt_xy * total AS DOUBLE)
                     / CAST(u1.cnt * u2.cnt AS DOUBLE), 6) AS lift
        FROM bi, n
        JOIN uni u1 ON split_part(bigram, ' ', 1) = u1.token
        JOIN uni u2 ON split_part(bigram, ' ', 2) = u2.token
        ORDER BY CAST(cnt_xy * total AS DOUBLE)
                 / CAST(u1.cnt * u2.cnt AS DOUBLE) DESC, bigram
        LIMIT 20
    """,
    "q97_ngram_langid": """
        -- Cavnar–Trenkle out-of-place distance, integers end to end
        WITH grams AS (
          SELECT doc_id, lang,
                 unnest(list_transform(
                   range(1, len(text) - 1), i -> substr(text, i, 3)
                 )) AS g
          FROM documents
        ),
        langcnt AS (
          SELECT lang, g, count(*) AS c FROM grams GROUP BY 1, 2
        ),
        prof AS (
          SELECT lang, g,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY c DESC, g
                 ) AS r
          FROM langcnt QUALIFY r <= 50
        ),
        doccnt AS (
          SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
        ),
        docprof AS (
          SELECT doc_id, g,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY c DESC, g
                 ) AS r
          FROM doccnt QUALIFY r <= 50
        ),
        dist AS (
          SELECT d.doc_id, l.lang,
                 sum(CASE WHEN p.r IS NULL THEN 50
                          ELSE abs(d.r - p.r) END) AS dist
          FROM docprof d
          CROSS JOIN (SELECT DISTINCT lang FROM documents) l
          LEFT JOIN prof p ON p.lang = l.lang AND p.g = d.g
          GROUP BY 1, 2
        ),
        pred AS (
          SELECT doc_id, lang AS pred_lang,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY dist, lang
                 ) AS rn
          FROM dist QUALIFY rn = 1
        )
        SELECT dd.lang, p.pred_lang, count(*) AS n_docs
        FROM pred p JOIN documents dd USING (doc_id)
        GROUP BY 1, 2
    """,
    "q98_importance_ratio": f"""
        -- DSIR-style hashed importance ratio: exact integer evidence,
        -- one IEEE division (Ray side is bit-identical by construction)
        WITH tok2 AS (
          SELECT doc_id, lang,
                 CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)
                   % 1024 AS b
          FROM (SELECT doc_id, lang, unnest({_TOKS}) AS token
                FROM documents)
          WHERE token <> ''
        ),
        tcnt AS (
          SELECT b, count(*) AS tc FROM tok2 WHERE lang = 'en' GROUP BY b
        ),
        rcnt AS (SELECT b, count(*) AS rc FROM tok2 GROUP BY b),
        sc AS (
          SELECT doc_id,
                 CAST(sum(coalesce(tc, 0) + 1) AS BIGINT) AS num,
                 CAST(sum(rc + 1) AS BIGINT) AS den
          FROM tok2
          LEFT JOIN tcnt USING (b) JOIN rcnt USING (b)
          GROUP BY doc_id
        )
        SELECT doc_id, num, den,
               round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ratio
        FROM sc
        ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC, doc_id
        LIMIT 20
    """,
    "q99_quantile_floor": """
        WITH t AS (
          SELECT quantile_disc(n_chars, 0.9) AS thr FROM documents
        )
        SELECT lang, CAST(thr AS BIGINT) AS p90_chars,
               count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents, t WHERE n_chars >= thr
        GROUP BY lang, thr
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
    "q101_crawl_diff": """
        WITH a AS (
          SELECT doc_id, md5(text) AS fp_a
          FROM documents WHERE doc_id % 10 <> 0
        ),
        b AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                          ELSE text END) AS fp_b
          FROM documents WHERE doc_id % 7 <> 0
        )
        SELECT CASE WHEN fp_a IS NULL THEN 'added'
                    WHEN fp_b IS NULL THEN 'removed'
                    WHEN fp_a = fp_b THEN 'same'
                    ELSE 'changed' END AS status,
               count(*) AS n_docs
        FROM a FULL OUTER JOIN b USING (doc_id)
        GROUP BY 1
    """,
    "q102_warc_roundtrip": """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(len(text)) AS BIGINT) AS sum_chars
        FROM documents GROUP BY lang
    """,
    "q104_bpe_merges": _bpe_oracle_sql(5),
    "q143_bpe_apply": _bpe_apply_oracle_sql(5),
    "q146_crawl_plan": """
        -- canonicalize -> robots gate -> frontier dedup -> Hamilton
        -- budget of 500, replayed analytically from the doc_id spread
        WITH u AS (
          SELECT doc_id, doc_id % 7 AS k,
                 '/p/' || CAST(doc_id % 400 AS VARCHAR) AS path
          FROM documents
        ),
        allowed AS (
          SELECT k, path FROM u
          WHERE NOT ((k % 3 = 0 AND path LIKE '/p/1%')
                  OR (k % 3 = 1 AND path LIKE '/p/2%'))
        ),
        frontier AS (SELECT DISTINCT k, path FROM allowed),
        c AS (
          SELECT 'www.site' || CAST(k AS VARCHAR) || '.example.com'
                   AS host,
                 CAST(count(*) AS BIGINT) AS n_urls
          FROM frontier GROUP BY 1
        ),
        t AS (SELECT CAST(sum(n_urls) AS BIGINT) AS total FROM c),
        base AS (
          SELECT host, n_urls,
                 (500 * n_urls) // total AS q0,
                 (500 * n_urls) % total AS rem
          FROM c, t
        ),
        extra AS (SELECT CAST(500 - sum(q0) AS BIGINT) AS e FROM base),
        ranked AS (
          SELECT host, n_urls, q0,
                 row_number() OVER (ORDER BY rem DESC, host) AS rk
          FROM base
        )
        SELECT host, n_urls,
               CAST(q0 + CASE WHEN rk <= (SELECT e FROM extra)
                         THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM ranked
    """,
    "q147_link_graph": """
        -- analytic link contract: each doc emits exactly its two
        -- injected absolute outlinks (boilerplate links are relative
        -- and excluded by the absolute-URL filter)
        WITH e AS (
          SELECT 'site' || (doc_id % 7) AS src_host,
                 'site' || ((3 * doc_id + 1) % 7) AS dst_host
          FROM documents
          UNION ALL
          SELECT 'site' || (doc_id % 7),
                 'site' || ((5 * doc_id + 2) % 7)
          FROM documents
        )
        SELECT src_host, dst_host, count(*) AS n_links
        FROM e GROUP BY 1, 2
    """,
    "q148_pii_scrub_net": r"""
        -- coalesce keeps NULL text in lockstep with the Ray side's
        -- `t or ""` (the q119 NULL-lockstep convention)
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 1
                      THEN coalesce(text, '') || ' call +1555'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      WHEN doc_id % 3 = 2
                      THEN coalesce(text, '') || ' from '
                           || CAST(doc_id % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 11) % 256 AS VARCHAR)
                      ELSE coalesce(text, '') END AS t
          FROM documents
        ),
        s AS (
          SELECT doc_id, t,
                 regexp_replace(t, '\+1555[0-9]{4}', '<PHONE>', 'g') AS s1
          FROM planted
        ),
        s2 AS (
          SELECT doc_id, t, s1,
                 regexp_replace(
                   s1,
                   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                   '<IP>', 'g'
                 ) AS scrubbed
          FROM s
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                 t, '\+1555[0-9]{4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(
                 s1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'
               )) AS BIGINT) AS n_ips,
               CAST(length(t) - length(scrubbed) AS BIGINT) AS n_removed,
               md5(scrubbed) AS scrubbed_md5
        FROM s2
    """,
    "q144_ref_integrity": """
        SELECT 'orders.o_custkey->customer' AS relation,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', count(*),
               CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'events.user_id->customer', count(*),
               CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    "q145_conversion_latency": """
        WITH s AS (
          SELECT user_id, min(ts) AS ts0 FROM events
          WHERE event_type = 'signup' GROUP BY 1
        ),
        p AS (
          SELECT e.user_id, min(e.ts) AS tp
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.ts0
          GROUP BY 1
        ),
        d AS (
          SELECT date_trunc('day', s.ts0) AS cohort,
                 epoch_us(p.tp) - epoch_us(s.ts0) AS delay_us
          FROM s JOIN p USING (user_id)
        )
        SELECT cohort, count(*) AS n_conversions,
               CAST(quantile_disc(delay_us, 0.5) AS BIGINT)
                 AS median_delay_us
        FROM d GROUP BY 1
    """,
    "q105_source_lang_entropy": """
        WITH c AS (
          SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
        ),
        t AS (
          SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        )
        SELECT c.source, t.tot AS n_docs,
               round(sum(-(CAST(n AS DOUBLE) / tot)
                         * log2(CAST(n AS DOUBLE) / tot)), 6)
                 AS lang_entropy,
               CAST(max(n) AS BIGINT) AS max_lang_docs
        FROM c JOIN t USING (source)
        GROUP BY c.source, t.tot
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
    "q108_vocab_growth": f"""
        WITH pos AS (
          SELECT text,
                 row_number() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) - 1 AS pos
          FROM documents
        ),
        toks AS (
          SELECT pos, unnest(list_transform(
            range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]
          )) AS token
          FROM (SELECT pos, {_TOKS} AS ws FROM pos)
        ),
        firsts AS (
          SELECT token, min(pos) AS fp FROM toks GROUP BY token
        ),
        n AS (SELECT count(*) AS total FROM documents)
        SELECT CAST(fp * 10 // total AS BIGINT) AS decile,
               count(*) AS n_new_tokens
        FROM firsts, n GROUP BY 1
    """,
    "q114_blocklist_filter": f"""
        WITH vocab AS (
          SELECT DISTINCT token FROM (
            SELECT unnest({_TOKS}) AS token FROM documents
          ) WHERE token <> ''
        ),
        bad AS (
          SELECT token FROM vocab
          WHERE CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 13 = 0
        ),
        flagged AS (
          SELECT lang, n_chars,
                 EXISTS (
                   SELECT 1 FROM bad
                   WHERE list_contains({_TOKS}, bad.token)
                 ) AS blocked
          FROM documents
        )
        SELECT lang,
               CAST(sum(CASE WHEN blocked THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_kept,
               CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               CAST(sum(CASE WHEN blocked THEN 0 ELSE n_chars END)
                 AS BIGINT) AS kept_chars,
               CAST(sum(CASE WHEN blocked THEN n_chars ELSE 0 END)
                 AS BIGINT) AS dropped_chars
        FROM flagged GROUP BY lang
    """,
    "q115_ivf_ann_int": """
        -- integer-exact IVF: quantize → assign argmin cell over 8 fixed
        -- centroids (vec_id < 8) → score only the query's 3 nearest cells
        WITH ev AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                 ) AS v
          FROM embeddings
        ),
        q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
        cent AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < 8),
        d2 AS (
          SELECT e.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM ev e CROSS JOIN cent c
        ),
        assigned AS (
          SELECT vec_id, cid, d,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY d, cid
                 ) AS rn
          FROM d2
        ),
        cells AS (SELECT vec_id, cid AS cell FROM assigned WHERE rn = 1),
        probe AS (
          SELECT cid AS cell FROM assigned WHERE vec_id = 0 AND rn <= 3
        ),
        scored AS (
          SELECT e.vec_id, cl.cell,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> e.v[i] * q.qv[i]
                 )) AS BIGINT) AS dot
          FROM ev e
          JOIN cells cl ON cl.vec_id = e.vec_id
          JOIN probe p ON p.cell = cl.cell
          CROSS JOIN q
          WHERE e.vec_id <> 0
        )
        SELECT vec_id, cell, dot FROM scored
        ORDER BY dot DESC, vec_id LIMIT 10
    """,
    "q116_gopher_rules": f"""
        WITH t AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(
                   list_transform(toks, x -> length(x))), 0
                 ) AS BIGINT) AS sum_len,
                 CAST(len(list_filter(toks,
                   x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
                 CAST(len(list_filter(toks,
                   x -> NOT regexp_matches(x, '[a-z0-9]')
                 )) AS BIGINT) AS n_nonal,
                 CAST(len(list_filter(toks,
                   x -> x IN ('the', 'a', 'data', 'key', 'value')
                 )) AS BIGINT) AS n_stop
          FROM t
        )
        SELECT doc_id, n_words, sum_len, n_alpha, n_nonal, n_stop,
               CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                          AND 3 * n_words <= sum_len
                          AND sum_len <= 10 * n_words
                          AND 10 * n_nonal <= n_words
                          AND 5 * n_alpha >= 4 * n_words
                          AND n_stop >= 2
                    THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM m
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
    "q118_inverted_index": f"""
        WITH t AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents
        ),
        p AS (
          SELECT doc_id, unnest(toks) AS token,
                 unnest(range(1, len(toks) + 1)) AS pos
          FROM t
        ),
        g AS (
          SELECT token,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(count(*) AS BIGINT) AS n_postings,
                 string_agg(
                   CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR),
                   ',' ORDER BY doc_id, pos
                 ) AS postings
          FROM p GROUP BY token
        )
        SELECT token, df, n_postings, postings
        FROM g WHERE df >= 2
    """,
    "q119_latest_by_url": """
        WITH v AS (
          SELECT doc_id,
                 CAST(u.v AS BIGINT) AS ver,
                 CAST(doc_id * 10 + u.v AS BIGINT) AS ts,
                 md5(text || ' v' || CAST(u.v AS VARCHAR)) AS fp
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 3)) AS v) u
          WHERE (doc_id + u.v) % 3 <> 0
        ),
        r AS (
          SELECT doc_id, ver, ts, fp,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY ts DESC
                 ) AS rn
          FROM v
        )
        SELECT doc_id, ver, ts, fp FROM r WHERE rn = 1
    """,
    "q120_epoch_upsample": """
        SELECT doc_id, lang,
               CAST(unnest(range(1, 2 + ascii(lang) % 3)) AS BIGINT)
                 AS copy_idx
        FROM documents
    """,
    "q121_image_phash_dup": """
        -- analytic contract: every (i, i+10000) brightness-shifted
        -- re-encoded clone pair, and ONLY those pairs (recall and
        -- precision 1.0 for the 8x8 average hash by construction)
        SELECT vec_id AS id1, CAST(vec_id + 10000 AS BIGINT) AS id2
        FROM embeddings
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
    "q123_simhash_hamming": f"""
        -- 32-bit md5 SimHash, 4x8-bit pigeonhole bands, exact
        -- popcount(xor) verify at radius 3 (Manku et al. 2007)
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 10000, text || ' zzz' FROM documents
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM corpus
        ),
        th AS (
          SELECT doc_id,
                 md5_number_lower(token) % 4294967296 AS h32
          FROM toks
        ),
        bits AS (
          SELECT doc_id, i.i,
                 sum(CASE WHEN (h32 >> i.i) & 1 = 1
                     THEN 1 ELSE -1 END) AS s
          FROM th CROSS JOIN range(32) i(i)
          GROUP BY 1, 2
        ),
        sig AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i)
                          ELSE 0 END) AS BIGINT) AS sig
          FROM bits GROUP BY doc_id
        ),
        bands AS (
          SELECT doc_id, sig, b.b AS band,
                 (sig >> CAST(b.b * 8 AS INTEGER)) & 255 AS bv
          FROM sig CROSS JOIN range(4) b(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
                          a.sig AS sa, c.sig AS sb
          FROM bands a
          JOIN bands c
            ON a.band = c.band AND a.bv = c.bv
           AND a.doc_id < c.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
    """,
    "q128_bloom_semi_audit": """
        -- m=1024 k=2 Bloom filter over BUILDING customer keys,
        -- reconstructed cell by cell from md5_number_lower; exact
        -- verdict via plain membership — n_false_pos is the audited
        -- FP tax of the pre-filter
        WITH bk AS (
          SELECT DISTINCT c_custkey AS k FROM customer
          WHERE c_mktsegment = 'BUILDING'
        ),
        cells AS (
          SELECT DISTINCT r.r,
                 CAST(md5_number_lower(
                   CAST(r.r AS VARCHAR) || ':' || CAST(k AS VARCHAR)
                 ) % 1024 AS BIGINT) AS cell
          FROM bk CROSS JOIN range(2) r(r)
        ),
        p AS (
          SELECT o_orderstatus, o_custkey,
                 CAST(md5_number_lower(
                   '0:' || CAST(o_custkey AS VARCHAR)
                 ) % 1024 AS BIGINT) AS c0,
                 CAST(md5_number_lower(
                   '1:' || CAST(o_custkey AS VARCHAR)
                 ) % 1024 AS BIGINT) AS c1
          FROM orders
        ),
        f AS (
          SELECT o_orderstatus,
                 CASE WHEN c0 IN (SELECT cell FROM cells WHERE r = 0)
                       AND c1 IN (SELECT cell FROM cells WHERE r = 1)
                      THEN 1 ELSE 0 END AS bp,
                 CASE WHEN o_custkey IN (SELECT k FROM bk)
                      THEN 1 ELSE 0 END AS ex
          FROM p
        )
        SELECT o_orderstatus, count(*) AS n_orders,
               CAST(sum(bp) AS BIGINT) AS n_bloom_pass,
               CAST(sum(ex) AS BIGINT) AS n_exact,
               CAST(sum(bp) - sum(ex) AS BIGINT) AS n_false_pos
        FROM f GROUP BY 1
    """,
    "q129_quality_classifier": f"""
        -- B=64 hashed buckets, integer weights in [-10, 10] from
        -- md5_number_lower('w:b'); scores are exact int64
        WITH w AS (
          SELECT b.b AS b,
                 CAST(md5_number_lower(
                   'w:' || CAST(b.b AS VARCHAR)
                 ) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t
          JOIN w ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(s.score, 0) AS BIGINT) AS score,
               CAST(CASE WHEN coalesce(s.score, 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM documents d LEFT JOIN s USING (doc_id)
    """,
    "q130_embedding_outliers": """
        -- integer outlier score n^2*dist^2 = sum_i (n*x_i - s_i)^2 over
        -- scale-1000 quantized vectors; argmax per label, ties to the
        -- lowest vec_id
        WITH ev AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                 ) AS v
          FROM embeddings
        ),
        el AS (
          SELECT vec_id, label, i.i AS i, v[i.i] AS x
          FROM ev CROSS JOIN range(1, 65) i(i)
        ),
        cs AS (
          SELECT label, i, CAST(sum(x) AS BIGINT) AS s
          FROM el GROUP BY 1, 2
        ),
        cn AS (SELECT label, count(*) AS n FROM ev GROUP BY 1),
        sc AS (
          SELECT e.vec_id, e.label,
                 CAST(sum(
                   (cn.n * e.x - cs.s) * (cn.n * e.x - cs.s)
                 ) AS BIGINT) AS score
          FROM el e
          JOIN cs ON cs.label = e.label AND cs.i = e.i
          JOIN cn ON cn.label = e.label
          GROUP BY 1, 2
        ),
        best AS (
          SELECT label, vec_id, score,
                 row_number() OVER (
                   PARTITION BY label ORDER BY score DESC, vec_id
                 ) AS rn
          FROM sc
        )
        SELECT label, vec_id, score FROM best WHERE rn = 1
    """,
    "q131_validity_intervals": """
        -- SCD-2 intervals over the q119 versioned corpus: LEAD per doc,
        -- current row open-ended at the 2^62 sentinel
        WITH v AS (
          SELECT doc_id,
                 CAST(u.v AS BIGINT) AS ver,
                 CAST(doc_id * 10 + u.v AS BIGINT) AS ts
          FROM documents
          CROSS JOIN (SELECT unnest(range(0, 3)) AS v) u
          WHERE (doc_id + u.v) % 3 <> 0
        )
        SELECT doc_id, ver, ts AS valid_from,
               CAST(coalesce(
                 lead(ts) OVER (PARTITION BY doc_id ORDER BY ts),
                 4611686018427387904
               ) AS BIGINT) AS valid_to,
               CAST(CASE WHEN lead(ts) OVER (
                      PARTITION BY doc_id ORDER BY ts
                    ) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM v
    """,
    "q132_png_metadata": """
        -- analytic tEXt contract: Software = cam(id % 5) on every image,
        -- Comment only on even ids
        SELECT 'cam' || CAST(vec_id % 5 AS VARCHAR) AS software,
               count(*) AS n_images,
               CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_comment
        FROM embeddings GROUP BY 1
    """,
    "q133_audio_silence": """
        -- analytic VAD contract: n = 1 + id % 4 bursts, hop-aligned
        SELECT vec_id AS item_id,
               CAST(2 + 4 * (1 + vec_id % 4) AS BIGINT) AS n_frames,
               CAST(2 * (1 + vec_id % 4) AS BIGINT) AS n_active_frames,
               CAST(1 + vec_id % 4 AS BIGINT) AS n_segments
        FROM embeddings
    """,
    "q134_duplicate_spans": f"""
        -- stride-1 word 5-grams; grams in >= 2 distinct docs merge into
        -- maximal spans (gaps-and-islands, break when gap > 5)
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(tk) - 3, 1)),
                   i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                            || ' ' || tk[i+3] || ' ' || tk[i+4])
                 ) AS fps
          FROM toks WHERE len(tk) >= 5
        ),
        g AS (
          SELECT doc_id, unnest(fps) AS fp,
                 unnest(range(1, len(fps) + 1)) - 1 AS pos
          FROM g0
        ),
        dup AS (
          SELECT fp FROM g GROUP BY fp
          HAVING count(DISTINCT doc_id) >= 2
        ),
        d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (fp)),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos
                      ) <= 5 THEN 0 ELSE 1 END AS brk
          FROM d
        ),
        sp AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                 ) AS sid
          FROM isl
        ),
        spans AS (
          SELECT doc_id, sid, min(pos) AS a, max(pos) + 5 AS b
          FROM sp GROUP BY 1, 2
        )
        SELECT doc_id, count(*) AS n_dup_spans,
               CAST(sum(b - a) AS BIGINT) AS n_dup_words
        FROM spans GROUP BY 1
    """,
    "q135_priority_dedup": """
        -- keep-best-source dedup: highest md5-derived source priority
        -- per distinct text, tie to lowest doc_id, multiplicity kept
        WITH d AS (
          SELECT doc_id, md5(coalesce(text, '')) AS fp,
                 CAST(md5_number_lower(coalesce(source, '')) % 100
                      AS BIGINT) AS prio
          FROM documents
        ),
        w AS (
          SELECT doc_id, prio,
                 row_number() OVER (
                   PARTITION BY fp ORDER BY prio DESC, doc_id
                 ) AS rn,
                 count(*) OVER (PARTITION BY fp) AS n_dups
          FROM d
        )
        SELECT doc_id, prio, CAST(n_dups AS BIGINT) AS n_dups
        FROM w WHERE rn = 1
    """,
    "q136_winnow_fingerprints": """
        -- winnowing (k=8, w=4): md5 per char 8-gram, window-of-4 MIN,
        -- distinct selected hashes per doc
        WITH s AS (
          SELECT doc_id, lower(text) AS t FROM documents
          WHERE text IS NOT NULL AND length(text) >= 8
        ),
        g0 AS (
          SELECT doc_id,
                 list_transform(
                   range(1, length(t) - 6),
                   i -> md5(substr(t, i, 8))
                 ) AS hs
          FROM s
        ),
        g AS (
          SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
                 unnest(hs) AS h,
                 unnest(range(1, len(hs) + 1)) AS i
          FROM g0
        ),
        w AS (
          SELECT doc_id, n_grams, i,
                 min(h) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
                 ) AS mh
          FROM g
        ),
        sel AS (
          SELECT DISTINCT doc_id, n_grams, mh FROM w WHERE i >= 4
        )
        SELECT doc_id, n_grams, count(*) AS n_fps
        FROM sel GROUP BY 1, 2
    """,
    "q137_trailing_distinct": """
        -- distinct users over each hour's trailing 3-hour window,
        -- reported only for hours that exist in the data
        WITH hu AS (
          SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
          FROM events
        ),
        hours AS (SELECT DISTINCT h FROM hu),
        f AS (
          SELECT DISTINCT hours.h AS hour, hu.user_id
          FROM hu JOIN hours
            ON hours.h >= hu.h
           AND hours.h <= hu.h + INTERVAL 2 HOUR
        )
        SELECT hour, count(*) AS n_users_3h FROM f GROUP BY 1
    """,
    "q138_group_mad": """
        -- exact discrete medians (quantile_disc) for med and MAD;
        -- outliers = |x - med| > 3*MAD, all int64
        WITH med AS (
          SELECT lang, quantile_disc(n_chars, 0.5) AS med
          FROM documents GROUP BY 1
        ),
        d AS (
          SELECT documents.lang, n_chars, med,
                 abs(n_chars - med) AS dev
          FROM documents JOIN med USING (lang)
        ),
        mad AS (
          SELECT lang, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY 1
        )
        SELECT d.lang,
               CAST(max(d.med) AS BIGINT) AS med,
               CAST(max(mad.mad) AS BIGINT) AS mad,
               CAST(sum(CASE WHEN d.dev > 3 * mad.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               count(*) AS n_docs
        FROM d JOIN mad USING (lang) GROUP BY 1
    """,
    "q139_cdc_chunks": """
        -- content-defined chunk boundaries: cut after char i+7 whenever
        -- md5_number_lower(substr(t, i, 8)) % 64 == 0 (cut < len only)
        WITH s AS (
          SELECT doc_id, text AS t, length(text) AS L
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, L,
                 list_transform(
                   list_filter(
                     range(1, greatest(L - 7, 0) + 1),
                     i -> md5_number_lower(substr(t, i, 8)) % 64 = 0
                          AND i + 7 < L
                   ),
                   i -> i + 7
                 ) AS cuts
          FROM s
        ),
        z AS (
          SELECT doc_id,
                 list_concat(cuts, [L]) AS ends,
                 list_concat([0], cuts) AS starts
          FROM c
        )
        SELECT doc_id,
               CAST(len(ends) AS BIGINT) AS n_chunks,
               CAST(list_aggregate(
                 list_transform(range(1, len(ends) + 1),
                                j -> ends[j] - starts[j]),
                 'max'
               ) AS BIGINT) AS max_len
        FROM z
    """,
    "q140_sorted_neighborhood": f"""
        -- SNM: rank by (n_chars, doc_id), window 2, exact word-set
        -- Jaccard >= 1/2 as 2*inter >= uni
        WITH r AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS rn
          FROM documents
        ),
        cand AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM r a JOIN r b ON b.rn - a.rn IN (1, 2)
        ),
        toks AS (
          SELECT doc_id,
                 list_distinct(list_filter({_TOKS}, x -> x <> '')) AS s
          FROM documents
        ),
        j AS (
          SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(x.s, y.s)) AS BIGINT) AS inter,
                 CAST(len(x.s) + len(y.s)
                      - len(list_intersect(x.s, y.s)) AS BIGINT) AS uni
          FROM cand c
          JOIN toks x ON x.doc_id = c.id_a
          JOIN toks y ON y.doc_id = c.id_b
        )
        SELECT id_a, id_b, inter, uni FROM j
        WHERE uni > 0 AND 2 * inter >= uni
    """,
    "q141_snapshot_chunk_reuse": """
        -- two crawl waves CDC-chunked; a wave-1 chunk is REUSED iff its
        -- md5 fp exists anywhere in wave 0
        WITH base AS (
          SELECT doc_id, text AS t FROM documents WHERE text IS NOT NULL
        ),
        waves AS (
          SELECT doc_id, 0 AS wave, t FROM base
          UNION ALL
          SELECT doc_id, 1 AS wave,
                 CASE WHEN doc_id % 3 = 0 THEN 'X' || t ELSE t END
          FROM base
        ),
        c AS (
          SELECT doc_id, wave, t, length(t) AS L,
                 list_transform(
                   list_filter(
                     range(1, greatest(length(t) - 7, 0) + 1),
                     i -> md5_number_lower(substr(t, i, 8)) % 64 = 0
                          AND i + 7 < length(t)
                   ),
                   i -> i + 7
                 ) AS cuts
          FROM waves
        ),
        z AS (
          SELECT doc_id, wave, t,
                 list_concat([0], cuts) AS starts,
                 list_concat(cuts, [L]) AS ends
          FROM c
        ),
        ch AS (
          SELECT doc_id, wave,
                 unnest(list_transform(range(1, len(ends) + 1),
                        j -> ends[j] - starts[j])) AS ln,
                 unnest(list_transform(range(1, len(ends) + 1),
                        j -> md5(substr(t, starts[j] + 1,
                                        ends[j] - starts[j])))) AS fp
          FROM z
        ),
        afps AS (SELECT DISTINCT fp FROM ch WHERE wave = 0),
        b AS (
          SELECT doc_id, ln,
                 CASE WHEN fp IN (SELECT fp FROM afps)
                      THEN 1 ELSE 0 END AS reused,
                 CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS edited
          FROM ch WHERE wave = 1
        )
        SELECT CAST(edited AS BIGINT) AS edited,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(sum(ln) AS BIGINT) AS total_chars,
               CAST(sum(ln * reused) AS BIGINT) AS reused_chars
        FROM b GROUP BY 1
    """,
    "q142_profile_columns": """
        SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
               CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_null,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
               min(o_orderstatus) AS min_v, max(o_orderstatus) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               CAST(count(*) - count(o_orderpriority) AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    "q124_rare_feature_pairs": f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        tri AS (
          SELECT DISTINCT doc_id, lang,
                 unnest(list_transform(
                   range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
                 )) AS g
          FROM toks
        ),
        g2 AS (
          SELECT g, min(doc_id) AS ia, max(doc_id) AS ib
          FROM tri GROUP BY g HAVING count(*) = 2
        ),
        langs AS (SELECT doc_id, lang FROM documents),
        p AS (
          SELECT g2.ia, g2.ib, x.lang AS la, y.lang AS lb
          FROM g2
          JOIN langs x ON x.doc_id = g2.ia
          JOIN langs y ON y.doc_id = g2.ib
          WHERE x.lang <> y.lang
        )
        SELECT ia AS id_a, ib AS id_b, la AS lang_a, lb AS lang_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM p GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2
    """,
    "q125_crawl_budget": """
        WITH c AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1
        ),
        t AS (SELECT sum(n_docs) AS total FROM c),
        b AS (
          SELECT source, n_docs,
                 CAST((1000 * n_docs) // total AS BIGINT) AS base,
                 CAST((1000 * n_docs) % total AS BIGINT) AS rem
          FROM c CROSS JOIN t
        ),
        k AS (SELECT CAST(1000 - sum(base) AS BIGINT) AS extra FROM b),
        r AS (
          SELECT source, n_docs, base,
                 row_number() OVER (ORDER BY rem DESC, source) AS rn
          FROM b
        )
        SELECT source, n_docs,
               CAST(base + CASE WHEN rn <= k.extra THEN 1 ELSE 0 END
                    AS BIGINT) AS quota
        FROM r CROSS JOIN k
    """,
    "q126_padding_waste": f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter({_TOKS}, x -> x <> ''))
                      AS BIGINT) AS n_tok
          FROM documents
        ),
        o AS (
          SELECT n_tok,
                 (row_number() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) - 1) // 64 AS batch_id
          FROM t
        )
        SELECT CAST(batch_id AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(n_tok) AS BIGINT) AS max_len,
               CAST(sum(n_tok) AS BIGINT) AS sum_len,
               CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS waste
        FROM o GROUP BY 1
    """,
    "q127_video_scene_cuts": """
        -- analytic shot structure: 12 frames in 2 + (id % 3) shots,
        -- within-shot frames share only the perceptual hash
        SELECT vec_id AS item_id,
               CAST(12 AS BIGINT) AS n_frames,
               CAST(1 + vec_id % 3 AS BIGINT) AS n_cuts
        FROM embeddings
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
    "q112_late_events": """
        WITH e AS (
          SELECT date_trunc('hour', ts) AS hour,
                 epoch_us(ts) + (event_id % 7200) * 1000000 AS arrival_us,
                 epoch_us(date_trunc('hour', ts))
                   + 3600000000 AS wend_us
          FROM events
        )
        SELECT hour, count(*) AS n_events,
               CAST(sum(CASE WHEN arrival_us > wend_us + 1800000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM e GROUP BY hour
    """,
    "q110_robots_filter": """
        WITH u AS (
          SELECT 'site' || (doc_id % 7) AS host,
                 '/p/' || doc_id AS path, doc_id % 7 AS k
          FROM documents
        ),
        c AS (
          SELECT host,
                 CASE WHEN (k % 3 = 0 AND path LIKE '/p/1%')
                       OR (k % 3 = 1 AND path LIKE '/p/2%')
                      THEN 1 ELSE 0 END AS blocked
          FROM u
        )
        SELECT host,
               CAST(sum(1 - blocked) AS BIGINT) AS n_allowed,
               CAST(sum(blocked) AS BIGINT) AS n_blocked
        FROM c GROUP BY host
    """,
    "q111_event_transitions": """
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS prev_type
          FROM events
        ),
        c AS (
          SELECT prev_type, event_type, count(*) AS n FROM seq
          WHERE prev_type IS NOT NULL GROUP BY 1, 2
        ),
        t AS (
          SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        )
        SELECT c.prev_type, c.event_type, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE) / tot, 6) AS p
        FROM c JOIN t USING (prev_type)
    """,
    "q109_lsh_calibration": f"""
        -- md5-MinHash (16 perms, 8 bands x 2 rows) candidate pairs with
        -- per-pair matched-band counts vs EXACT Jaccard evidence
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        sets AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS s
          FROM toks
        ),
        nonempty AS (SELECT doc_id, s FROM sets WHERE len(s) > 0),
        sh AS (SELECT doc_id, unnest(s) AS shingle FROM nonempty),
        mh AS (
          SELECT doc_id, p,
                 min(md5(CAST(p AS VARCHAR) || ':' || shingle)) AS mh
          FROM sh CROSS JOIN range(16) t(p) GROUP BY 1, 2
        ),
        bands AS (
          SELECT doc_id, p // 2 AS band,
                 string_agg(mh, '|' ORDER BY p) AS key
          FROM mh GROUP BY 1, 2
        ),
        pb AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2,
                 count(*) AS bands_matched
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key
           AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        sized AS (SELECT doc_id, s, len(s) AS n FROM nonempty),
        j AS (
          SELECT pb.bands_matched,
                 len(list_intersect(x.s, y.s)) AS inter,
                 x.n + y.n - len(list_intersect(x.s, y.s)) AS uni
          FROM pb JOIN sized x ON pb.id1 = x.doc_id
                  JOIN sized y ON pb.id2 = y.doc_id
        )
        SELECT CAST(bands_matched AS BIGINT) AS bands_matched,
               count(*) AS n_pairs,
               CAST(sum(inter) AS BIGINT) AS sum_inter,
               CAST(sum(uni) AS BIGINT) AS sum_union
        FROM j GROUP BY 1
    """,
    "q106_url_canonicalize": """
        -- expected canonical form constructed analytically from the
        -- same doc_id arithmetic the Ray side uses to build RAW urls
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 1 THEN 'https' ELSE 'http' END)
               || '://www.site' || (doc_id % 7) || '.example.com'
               || (CASE
                     WHEN doc_id % 3 = 0 AND doc_id % 2 = 0 THEN ':443'
                     WHEN doc_id % 3 = 1 AND doc_id % 2 = 1 THEN ':80'
                     ELSE '' END)
               || '/p/' || doc_id
               || (CASE WHEN doc_id % 4 = 0 THEN '?A=1&b=2'
                        WHEN doc_id % 4 = 1 THEN '?x=1'
                        ELSE '' END) AS url
        FROM documents
    """,
    "q103_pagerank_hosts": """
        -- 3 unrolled rounds of the exact-integer PageRank recurrence
        -- x_{k+1}(v) = 9·60^k·mass(v) + 17·Σ_{u→v} x_k(u)  (d = 17/20,
        -- out-degree 3, teleport ∝ mass); pr = x_3 / (N·60^3)
        WITH hosts AS (
          SELECT doc_id % 64 AS h, count(*) AS mass
          FROM documents GROUP BY 1
        ),
        n AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM hosts),
        edges AS (
          SELECT h AS src,
                 unnest([(3*h+1) % 64, (5*h+2) % 64, (7*h+4) % 64]) AS dst
          FROM hosts
        ),
        x0 AS (SELECT h, mass AS x FROM hosts),
        s1 AS (SELECT dst AS h, sum(x0.x) AS inc
               FROM edges JOIN x0 ON edges.src = x0.h GROUP BY 1),
        x1 AS (SELECT hosts.h, 9 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s1 USING (h)),
        s2 AS (SELECT dst AS h, sum(x1.x) AS inc
               FROM edges JOIN x1 ON edges.src = x1.h GROUP BY 1),
        x2 AS (SELECT hosts.h, 540 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s2 USING (h)),
        s3 AS (SELECT dst AS h, sum(x2.x) AS inc
               FROM edges JOIN x2 ON edges.src = x2.h GROUP BY 1),
        x3 AS (SELECT hosts.h, 32400 * mass + 17 * coalesce(inc, 0) AS x
               FROM hosts LEFT JOIN s3 USING (h))
        SELECT hosts.h, mass, CAST(x AS BIGINT) AS x,
               round(CAST(x AS DOUBLE) / (total * 216000.0), 8) AS pr
        FROM hosts JOIN x3 USING (h), n
    """,
    "q96_top_supplier_per_part": """
        -- exact integer 1e-4-currency units mirror the Ray side: cents ×
        -- discount-percent sums can't drift with accumulation order
        WITH rev AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS r
          FROM lineitem GROUP BY 1, 2
        ),
        best AS (
          SELECT l_partkey, l_suppkey, r,
                 row_number() OVER (PARTITION BY l_partkey
                                    ORDER BY r DESC, l_suppkey) AS rn
          FROM rev
        )
        SELECT l_partkey AS partkey, l_suppkey AS suppkey, s_name,
               round(CAST(r AS DOUBLE) / 10000.0, 2) AS revenue
        FROM best JOIN supplier ON l_suppkey = s_suppkey
        WHERE rn = 1
    """,
}
