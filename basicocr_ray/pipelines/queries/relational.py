"""TPC-H-ish relational queries: joins, aggregates, windows (SURVEY §2.4/2.5; G1/G2/G5, J-patterns).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

from datetime import datetime
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import top_k

from ._shared import (
    _p,
    _read,
    _round_col,
    _round_half_up,
)


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


def q36_distinct_pairs(sf_dir: str):
    """Multi-column DISTINCT via groupby-first (set op beyond
    single-column `unique`)."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def first(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    return ds.groupby(["lang", "source"]).map_groups(first, batch_format="pandas")


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


def q315_universe_sample(sf_dir: str):
    """UNIVERSE (JOIN-PRESERVING) SAMPLING — the correlated-sampling
    discipline for sampling ACROSS a join: both orders and lineitem are
    independently filtered to the 1/16 key-universe whose
    md5(orderkey) starts with nibble '0'; because the predicate is a
    pure function of the JOIN KEY, the join of the samples IS the
    sample of the join (a Bernoulli row sample on each side would keep
    ~1/256 of matching pairs and bias every join statistic). Each side
    prunes before the single-shuffle bucketed join; the per-status
    revenue rollup is fused into the join buckets (`bucket_post_fn`),
    so nothing unsampled ever moves."""
    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def in_universe(keys: np.ndarray) -> pa.Array:
        return pa.array([md5_hex(str(int(k)))[0] == "0" for k in keys])

    def keep_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(in_universe(k))
        return pa.table(
            {"okey": b["o_orderkey"], "o_orderstatus": b["o_orderstatus"]}
        )

    def keep_li(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        b = b.filter(in_universe(k))
        ep = b["l_extendedprice"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        disc = b["l_discount"].combine_chunks().to_numpy(zero_copy_only=False)
        r = np.rint(ep * 100).astype(np.int64) * np.rint(
            (1 - disc) * 100
        ).astype(np.int64)
        return pa.table(
            {"okey": b["l_orderkey"].cast(pa.int64()), "r": pa.array(r)}
        )

    def post(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("o_orderstatus", as_index=False).agg(
            n=("r", "size"), rv=("r", "sum")
        )
        return pa.table(
            {
                "o_orderstatus": pa.array(g["o_orderstatus"], pa.string()),
                "n": pa.array(g["n"].astype(np.int64)),
                "rv": pa.array(g["rv"].astype(np.int64)),
            }
        )

    joined = bucketed_hash_join(
        orders.map_batches(keep_orders, batch_format="pyarrow"),
        li.map_batches(keep_li, batch_format="pyarrow"),
        key="okey",
        left_columns=["o_orderstatus"],
        right_columns=["r"],
        bucket_post_fn=post,
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderstatus", as_index=False).agg(
            n_lineitems=("n", "sum"), rv=("rv", "sum")
        )
        g["revenue"] = [
            _round_half_up(float(v) / 10000.0, 2) for v in g["rv"]
        ]
        g = g.rename(columns={"o_orderstatus": "status"})
        return g[["status", "n_lineitems", "revenue"]].astype(
            {"n_lineitems": "int64"}
        )

    out = coarse_group_reduce(joined, "o_orderstatus", fold).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "status": pd.array([], dtype="object"),
                "n_lineitems": pd.array([], dtype="int64"),
                "revenue": pd.array([], dtype="float64"),
            }
        )
    return out


def q320_schema_evolution_union(sf_dir: str):
    """SCHEMA-EVOLUTION UNION — the snapshot-merge verb of a long-lived
    table: an 'old' snapshot (even orderkeys, no priority column) and a
    'new' snapshot (odd orderkeys, priority added) combine via
    `stages.wide.union_by_name` — typed-null padding to the unified
    schema, streaming union, no shuffle — then one bounded rollup per
    coalesced priority. The column the old snapshot lacks surfaces as
    'unknown', proving the null path survives aggregation."""
    from basicocr_ray.stages.wide import coarse_group_reduce, union_by_name

    def _parity(rem: int):
        def f(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].combine_chunks()
            return b.filter(
                pc.equal(pc.bit_wise_and(k, pa.scalar(1, k.type)), rem)
            )

        return f

    old = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    old = old.map_batches(_parity(0), batch_format="pyarrow")
    new = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )
    new = new.map_batches(_parity(1), batch_format="pyarrow")

    u = union_by_name([old, new])

    def part(b: pa.Table) -> pa.Table:
        pr = b["o_orderpriority"].combine_chunks()
        pr = pc.fill_null(pr, "unknown")
        cents = np.rint(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100
        ).astype(np.int64)
        df = pd.DataFrame({"priority": pr.to_pylist(), "c": cents})
        g = df.groupby("priority", as_index=False).agg(
            n=("c", "size"), cents=("c", "sum")
        )
        return pa.table(
            {
                "priority": pa.array(g["priority"], pa.string()),
                "n": pa.array(g["n"].astype(np.int64)),
                "cents": pa.array(g["cents"].astype(np.int64)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("priority", as_index=False)[["n", "cents"]].sum()
        return g.astype({"n": "int64", "cents": "int64"})

    out = coarse_group_reduce(
        u.map_batches(part, batch_format="pyarrow"), "priority", fold
    ).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "priority": pd.array([], dtype="object"),
                "n": pd.array([], dtype="int64"),
                "cents": pd.array([], dtype="int64"),
            }
        )
    return out


def q335_band_join(sf_dir: str):
    """BAND (PROXIMITY) JOIN — the non-equi join Ray Data has no verb
    for: view×purchase event pairs whose values differ by ≤ 5 cents.
    Overlapping-bucket partitioning makes it a single shuffle: every
    row lands in bucket ⌊cents/W⌋ and its ε-neighbor bucket, each pair
    is COUNTED ONLY by the bucket that owns ⌊min(ca,cb)/W⌋ (no
    double count, no all-pairs), and within-bucket matching is a
    vectorized sorted sweep. Output: pair count and Σ|Δ| evidence per
    event-type pair."""
    EPS = 5
    W = 64
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def scatter(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["event_type"].isin(["view", "purchase"])]
        cents = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        side = (df["event_type"] == "purchase").to_numpy()
        bkt = cents // W
        nb = (cents - EPS) // W
        rows_b = np.concatenate([bkt, nb])
        rows_c = np.concatenate([cents, cents])
        rows_s = np.concatenate([side, side])
        keep = np.concatenate(
            [np.ones(len(bkt), dtype=bool), nb != bkt]
        )
        return pa.table(
            {
                "bkt": pa.array(rows_b[keep].astype(np.int64)),
                "cents": pa.array(rows_c[keep].astype(np.int64)),
                "purch": pa.array(rows_s[keep]),
            }
        )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        out_n = 0
        out_sum = 0
        for bkt, grp in df.groupby("bkt"):
            v = np.sort(
                grp.loc[~grp["purch"], "cents"].to_numpy()
            )
            p = np.sort(grp.loc[grp["purch"], "cents"].to_numpy())
            if len(v) == 0 or len(p) == 0:
                continue
            # pair (a, b) owned here iff floor(min/W) == bkt
            lo = np.searchsorted(p, v - EPS, side="left")
            hi = np.searchsorted(p, v + EPS, side="right")
            for i, cv in enumerate(v):
                for cp in p[lo[i] : hi[i]]:
                    if min(cv, cp) // W == bkt:
                        out_n += 1
                        out_sum += abs(int(cv) - int(cp))
        return pd.DataFrame(
            {
                "n_pairs": pd.array([out_n], dtype="int64"),
                "sum_absdiff": pd.array([out_sum], dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(scatter, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(match, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_pairs": pd.array(
                [int(parts["n_pairs"].sum())], dtype="int64"
            ),
            "sum_absdiff": pd.array(
                [int(parts["sum_absdiff"].sum())], dtype="int64"
            ),
        }
    )


__all__ = [
    "q01_pricing_summary",
    "q02_orders_topk",
    "q03_revenue_by_status",
    "q04_region_rollup",
    "q18_topk_per_group",
    "q29_orders_by_segment",
    "q34_bucketed_join_revenue",
    "q36_distinct_pairs",
    "q44_range_join",
    "q57_anti_join_customers",
    "q61_chained_join_returns",
    "q62_skew_join_nation_revenue",
    "q67_left_join_order_counts",
    "q84_full_outer_counts",
    "q96_top_supplier_per_part",
    "q128_bloom_semi_audit",
    "q142_profile_columns",
    "q144_ref_integrity",
    "q158_large_orders",
    "q196_join_size_exact",
    "q298_merge_upsert",
    "q315_universe_sample",
    "q320_schema_evolution_union",
    "q335_band_join",
]


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_orders_topk": q02_orders_topk,
    "q03_revenue_by_status": q03_revenue_by_status,
    "q04_region_rollup": q04_region_rollup,
    "q18_topk_per_group": q18_topk_per_group,
    "q29_orders_by_segment": q29_orders_by_segment,
    "q34_bucketed_join_revenue": q34_bucketed_join_revenue,
    "q36_distinct_pairs": q36_distinct_pairs,
    "q44_range_join": q44_range_join,
    "q57_anti_join_customers": q57_anti_join_customers,
    "q61_chained_join_returns": q61_chained_join_returns,
    "q62_skew_join_nation_revenue": q62_skew_join_nation_revenue,
    "q67_left_join_order_counts": q67_left_join_order_counts,
    "q84_full_outer_counts": q84_full_outer_counts,
    "q96_top_supplier_per_part": q96_top_supplier_per_part,
    "q128_bloom_semi_audit": q128_bloom_semi_audit,
    "q142_profile_columns": q142_profile_columns,
    "q144_ref_integrity": q144_ref_integrity,
    "q158_large_orders": q158_large_orders,
    "q196_join_size_exact": q196_join_size_exact,
    "q298_merge_upsert": q298_merge_upsert,
    "q315_universe_sample": q315_universe_sample,
    "q320_schema_evolution_union": q320_schema_evolution_union,
    "q335_band_join": q335_band_join,
}


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
    "q18_topk_per_group": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM (
          SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 2
    """,
    "q29_orders_by_segment": """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q34_bucketed_join_revenue": """
        SELECT l_orderkey AS okey, o_custkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, okey
        LIMIT 100
    """,
    "q36_distinct_pairs": """
        SELECT DISTINCT lang, source FROM documents
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
    "q57_anti_join_customers": """
        SELECT c_custkey, c_acctbal FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 280000
        )
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
    "q67_left_join_order_counts": """
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
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
    "q315_universe_sample": """
        -- both sides filter on a pure function of the JOIN KEY, so the
        -- join of the samples is the sample of the join
        WITH o AS (
          SELECT o_orderkey, o_orderstatus FROM orders
          WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        ),
        l AS (
          SELECT l_orderkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1 - l_discount) * 100) AS BIGINT) AS r
          FROM lineitem
          WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) = '0'
        )
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_lineitems,
               round(CAST(sum(r) AS DOUBLE) / 10000.0, 2) AS revenue
        FROM o JOIN l ON o_orderkey = l_orderkey
        GROUP BY 1
    """,
    "q320_schema_evolution_union": """
        -- UNION ALL BY NAME of two snapshots; the missing column
        -- null-fills and coalesces to 'unknown'
        WITH old AS (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_orderkey % 2 = 0
        ),
        new AS (
          SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
          WHERE o_orderkey % 2 = 1
        ),
        u AS (
          SELECT o_orderkey, o_totalprice,
                 CAST(NULL AS VARCHAR) AS o_orderpriority FROM old
          UNION ALL SELECT * FROM new
        )
        SELECT coalesce(o_orderpriority, 'unknown') AS priority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM u GROUP BY 1
    """,
    "q335_band_join": """
        -- brute-force band self-join twin of the overlapping-bucket
        -- single-shuffle plan
        WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS c
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT CAST(round(value * 100) AS BIGINT) AS c
              FROM events WHERE event_type = 'purchase')
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(coalesce(sum(abs(v.c - p.c)), 0) AS BIGINT)
                 AS sum_absdiff
        FROM v JOIN p ON abs(v.c - p.c) <= 5
    """,
}
