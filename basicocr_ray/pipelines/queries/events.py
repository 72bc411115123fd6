"""Event-stream queries: windows, sessions, funnels, as-of joins (SURVEY §2.9 streaming-shaped ops).

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
from basicocr_ray.stages.wide import top_k

from ._shared import (
    _read,
    _round_col,
    _round_half_up,
)


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


_MORTON16 = " + ".join(
    f"((x >> {i}) & 1) * {1 << (2 * i)} + "
    f"((y >> {i}) & 1) * {1 << (2 * i + 1)}"
    for i in range(8)
)


__all__ = [
    "q05_events_hourly",
    "q06_events_asof",
    "q17_sessionize",
    "q28_events_scalar",
    "q31_events_sliding",
    "q35_running_totals",
    "q37_event_stats",
    "q38_event_median",
    "q60_group_quantile",
    "q63_lag_delta",
    "q65_distinct_users",
    "q66_group_quantile_cont",
    "q69_window_rank",
    "q70_mode_user",
    "q71_value_histogram",
    "q73_props_json_sum",
    "q74_except_users",
    "q77_hopping_window",
    "q78_funnel_stages",
    "q79_cube_events",
    "q80_pivot_user_counts",
    "q82_intersect_users",
    "q83_share_of_total",
    "q89_group_variance",
    "q90_value_k_corr",
    "q93_cohort_retention",
    "q111_event_transitions",
    "q112_late_events",
    "q131_validity_intervals",
    "q137_trailing_distinct",
    "q145_conversion_latency",
    "q157_event_pairs_window",
    "q168_zorder_cells",
    "q170_interval_coverage",
    "q172_decay_leaderboard",
    "q177_locf_gapfill",
    "q188_longest_streak",
    "q192_twap_evidence",
    "q193_burst_rate",
    "q198_attribution",
]


QUERIES = {
    "q05_events_hourly": q05_events_hourly,
    "q06_events_asof": q06_events_asof,
    "q17_sessionize": q17_sessionize,
    "q28_events_scalar": q28_events_scalar,
    "q31_events_sliding": q31_events_sliding,
    "q35_running_totals": q35_running_totals,
    "q37_event_stats": q37_event_stats,
    "q38_event_median": q38_event_median,
    "q60_group_quantile": q60_group_quantile,
    "q63_lag_delta": q63_lag_delta,
    "q65_distinct_users": q65_distinct_users,
    "q66_group_quantile_cont": q66_group_quantile_cont,
    "q69_window_rank": q69_window_rank,
    "q70_mode_user": q70_mode_user,
    "q71_value_histogram": q71_value_histogram,
    "q73_props_json_sum": q73_props_json_sum,
    "q74_except_users": q74_except_users,
    "q77_hopping_window": q77_hopping_window,
    "q78_funnel_stages": q78_funnel_stages,
    "q79_cube_events": q79_cube_events,
    "q80_pivot_user_counts": q80_pivot_user_counts,
    "q82_intersect_users": q82_intersect_users,
    "q83_share_of_total": q83_share_of_total,
    "q89_group_variance": q89_group_variance,
    "q90_value_k_corr": q90_value_k_corr,
    "q93_cohort_retention": q93_cohort_retention,
    "q111_event_transitions": q111_event_transitions,
    "q112_late_events": q112_late_events,
    "q131_validity_intervals": q131_validity_intervals,
    "q137_trailing_distinct": q137_trailing_distinct,
    "q145_conversion_latency": q145_conversion_latency,
    "q157_event_pairs_window": q157_event_pairs_window,
    "q168_zorder_cells": q168_zorder_cells,
    "q170_interval_coverage": q170_interval_coverage,
    "q172_decay_leaderboard": q172_decay_leaderboard,
    "q177_locf_gapfill": q177_locf_gapfill,
    "q188_longest_streak": q188_longest_streak,
    "q192_twap_evidence": q192_twap_evidence,
    "q193_burst_rate": q193_burst_rate,
    "q198_attribution": q198_attribution,
}


ORACLE_SQL = {
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
    "q28_events_scalar": """
        SELECT event_id, upper(event_type) AS event_type_u,
               value + 10.0 AS adj_value
        FROM events WHERE value >= 100.0
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
    "q35_running_totals": """
        SELECT event_id, user_id,
               row_number() OVER w AS rn,
               round(sum(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 2) AS cum_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "q37_event_stats": """
        SELECT event_type, count(*) AS n,
               min(value) AS min_value, max(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "q38_event_median": """
        SELECT event_type, median(value) AS median_value
        FROM events GROUP BY event_type
    """,
    "q60_group_quantile": """
        SELECT event_type, quantile_disc(value, 0.9) AS q_value
        FROM events GROUP BY event_type
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
    "q65_distinct_users": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "q66_group_quantile_cont": """
        SELECT event_type, quantile_cont(value, 0.75) AS q_value
        FROM events GROUP BY event_type
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
}
