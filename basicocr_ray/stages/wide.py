"""Wide (shuffling) operator helpers — built to SHRINK data before any
all-to-all exchange.

SURVEY §2.5 G3/G4: the reference's own docs prescribe sharded
count-then-merge for n-gram statistics (`split -l 10000` → per-shard
`ngram-count` → `merge-batch-counts`, language-model.md:168-197). The Ray
Data translation: partial aggregation INSIDE `map_batches` (one row per key
per batch), then a small `groupby().sum()` over the partials — the shuffle
moves keys, never documents.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Iterable

import pandas as pd
import pyarrow as pa

from basicocr_ray.core.collect import collect_rows


def partial_count_batch(
    batch: pa.Table,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    key_name: str = "token",
) -> pa.Table:
    """pages/documents batch → (key, cnt) partial counts (the per-shard
    `ngram-count` step). Output rows ≤ distinct keys in batch — typically
    orders of magnitude smaller than the token stream."""
    c: Counter[str] = Counter()
    for t in batch[text_column].to_pylist():
        if t:
            c.update(item_fn(t))
    keys = list(c.keys())
    return pa.table(
        {
            key_name: pa.array(keys, pa.string()),
            "cnt": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def token_items(text: str) -> list[str]:
    """Whitespace tokens, lowercased — MUST stay in lockstep with the
    DuckDB oracle expression `regexp_split_to_array(lower(text), '\\s+')`."""
    return text.lower().split()


def make_ngram_items(n: int) -> Callable[[str], list[str]]:
    def items(text: str) -> list[str]:
        toks = text.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    return items


def coarse_group_reduce(ds, key_columns, final_fn, num_salt: int | None = None):
    """THE house exact-reduce shape in one place: shuffle partial rows
    into cluster-sized coarse groups of a stable hash of
    ``key_columns`` (str or list of str; same key → same group on every
    worker), then apply ``final_fn`` (pandas in → pandas out, ``cg``
    already dropped) once per group. A Ray Aggregate keyed on every
    distinct key is a high-cardinality sort stall on open-vocabulary
    relations — this is its bounded-group replacement."""
    import numpy as np

    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(num_salt)
    cols = [key_columns] if isinstance(key_columns, str) else list(key_columns)

    def add_cg(b: pa.Table) -> pa.Table:
        h = None
        for c in cols:
            hc = pd.util.hash_array(
                b[c].combine_chunks().to_numpy(zero_copy_only=False)
            )
            h = hc if h is None else (
                h * np.uint64(0x9E3779B97F4A7C15)
            ) ^ hc
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    return (
        ds.map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(
            lambda df: final_fn(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def count_terms(
    ds,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    key_name: str = "token",
):
    """Dataset → (key, cnt) aggregated counts. Shuffle input: partials only
    (G3/G4 partial+final shape); the FINAL sum runs inside cluster-sized
    coarse groups of the key hash (same key → same group, pandas sum is
    exact) — a Ray Aggregate keyed on every distinct token is the
    high-cardinality sort stall on an open-vocabulary corpus."""
    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_name, as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    partials = ds.map_batches(
        lambda b: partial_count_batch(b, text_column, item_fn, key_name),
        batch_format="pyarrow",
    )
    # vectorized stable hash grouping (the per-row md5 loop here was the
    # round-2 q07/q08 regression) — single-sourced in coarse_group_reduce
    return coarse_group_reduce(partials, key_name, final_sum)


def approx_distinct(
    ds,
    text_column: str,
    item_fn: Callable[[str], Iterable[str]],
    p: int = 12,
) -> float:
    """Approximate distinct item count via mergeable HyperLogLog sketches:
    one sketch per batch (the only thing each task emits is 2^p bytes),
    max-merged driver-side. The exact alternative (`flat_map → unique`)
    shuffles every key; this never shuffles — the sketch pattern the
    reference's sharded count/merge docs gesture at, taken to its limit."""
    from basicocr_ray.core.sketches import HyperLogLog

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        toks: list[str] = []
        for t in batch[text_column].to_pylist():
            if t:
                toks.extend(item_fn(t))
        h.add_many(toks)  # one vectorized hash pass per batch
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    for row in collect_rows(ds.map_batches(sketch, batch_format="pyarrow")):
        merged.merge(HyperLogLog.deserialize(row["sketch"], p))
    return merged.count()


def rollup_counts(
    ds,
    group_cols: list[str],
    value_column: str,
    n_name: str = "n",
    sum_name: str = "total",
):
    """GROUP BY ROLLUP(g1, …, gk): (count, sum) at every prefix level of
    the grouping columns, rolled-up levels marked with NULL (SQL ROLLUP
    semantics — assumes the grouping columns themselves are non-null, the
    usual ROLLUP caveat).

    Scale shape: ONE scan of the data computes per-batch partials at the
    FINEST level; the final finest aggregate (bounded by key-combination
    cardinality, not data size) goes through the house coarse-salted
    groupby; every coarser level then derives from the finest AGGREGATE —
    aggregate-of-aggregates, never a re-scan (the OLAP-cube partial-reuse
    discipline; sums/counts are algebraic so the reuse is exact)."""
    sets = [group_cols[:lv] for lv in range(len(group_cols), -1, -1)]
    return grouping_sets_counts(
        ds, group_cols, sets, value_column, n_name, sum_name
    )


def cube_counts(
    ds,
    group_cols: list[str],
    value_column: str,
    n_name: str = "n",
    sum_name: str = "total",
):
    """GROUP BY CUBE(g1, …, gk): every SUBSET of the grouping columns
    from one scan + one tiny finest aggregate (same partial-reuse
    discipline as :func:`rollup_counts`; 2^k sets, so k stays small by
    contract)."""
    cols = list(group_cols)
    sets = []
    for mask in range((1 << len(cols)) - 1, -1, -1):
        sets.append([c for i, c in enumerate(cols) if mask & (1 << i)])
    return grouping_sets_counts(
        ds, cols, sets, value_column, n_name, sum_name
    )


def grouping_sets_counts(
    ds,
    group_cols: list[str],
    sets: list[list[str]],
    value_column: str,
    n_name: str = "n",
    sum_name: str = "total",
):
    """GROUP BY GROUPING SETS over integer sums: the first set must be
    the finest (all ``group_cols``); every other set derives from its
    aggregate."""
    import numpy as np

    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_cols, as_index=False).agg(
            **{n_name: (value_column, "size"),
               sum_name: (value_column, "sum")}
        )
        return g.astype({n_name: "int64", sum_name: "int64"})

    def add_cg(b: pa.Table) -> pa.Table:
        import numpy as np

        # stable combined row hash over the grouping columns (NaN/None
        # hash consistently; rollup levels carry nulls by design)
        h = pd.util.hash_pandas_object(
            b.select(group_cols).to_pandas(), index=False
        ).to_numpy()
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def final_sum(cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if cols:
                out = df.groupby(cols, as_index=False)[[n_name, sum_name]].sum()
            else:
                out = pd.DataFrame(
                    {n_name: [df[n_name].sum()], sum_name: [df[sum_name].sum()]}
                )
            return out.astype({n_name: "int64", sum_name: "int64"})

        return fn

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(final_sum(group_cols), batch_format="pandas")
        .materialize()  # ≤ |key combinations| rows — reused by every level
    )

    def widen(present: list[str]):
        # emit all group columns, NULL for the rolled-up suffix
        def fn(b: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in group_cols:
                names.append(c)
                arrays.append(
                    b[c] if c in present else pa.nulls(b.num_rows, pa.string())
                )
            names += [n_name, sum_name]
            arrays += [b[n_name], b[sum_name]]
            return pa.Table.from_arrays(arrays, names)

        return fn

    if sets[0] != group_cols:
        raise ValueError("the first grouping set must be the finest")
    levels = [finest.map_batches(widen(group_cols), batch_format="pyarrow")]
    for cols in sets[1:]:
        # aggregate the (tiny) finest table, not the data
        if cols:
            agg = finest.groupby(cols).map_groups(
                final_sum(cols), batch_format="pandas"
            )
        else:
            # grand total: per-batch partial, then one single-group final
            agg = (
                finest.map_batches(
                    lambda df: final_sum([])(df).assign(
                        _one=np.int32(0)
                    ),
                    batch_format="pandas",
                )
                .groupby("_one")
                .map_groups(final_sum([]), batch_format="pandas")
            )
        levels.append(agg.map_batches(widen(cols), batch_format="pyarrow"))

    out = levels[0]
    for lv_ds in levels[1:]:
        out = out.union(lv_ds)
    return out


def grouped_quantile_disc(
    ds,
    group_column: str,
    value_column: str,
    q_num: int,
    q_den: int,
    num_hist_buckets: int = 1024,
    out_name: str = "q_value",
):
    """EXACT per-group discrete quantile (SQL ``quantile_disc`` /
    percentile_disc: the element at 1-indexed position ceil(q·n) of the
    group's sorted values — q passed as the exact rational q_num/q_den so
    the target index never suffers float fuzz).

    A naive exact grouped quantile is a per-group SORT — an all-to-all of
    every row. This is the two-pass histogram-refinement shape instead:

    1. scan → per-group (count, min, max) partials; driver reduce is
       ≤ |groups| rows (metadata).
    2. scan → per-(group, bucket) histogram counts over ``num_hist_buckets``
       equi-width buckets; driver prefix-sums ≤ |groups|·B rows to locate,
       per group, the bucket holding the target order statistic and the
       within-bucket offset.
    3. pruned scan → only rows falling in their group's candidate bucket
       (expected n/B per group; a single dominant value concentrates its
       bucket but then the selection inside is trivial) → per-group sort
       of the tiny candidate set picks the exact element.

    Three narrow scans, zero row shuffle except the candidate trickle —
    the shape survives any group cardinality and any data size."""
    import numpy as np

    if not (0 < q_num <= q_den):
        raise ValueError("quantile must be in (0, 1]")

    B = num_hist_buckets

    # ---- pass 1: per-group count/min/max --------------------------------
    def p1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        return df.groupby(group_column, as_index=False).agg(
            n=(value_column, "count"),
            lo=(value_column, "min"),
            hi=(value_column, "max"),
        )

    stats: dict = {}
    for row in collect_rows(ds.map_batches(p1, batch_format="pandas")):
        g = row[group_column]
        if g in stats:
            s = stats[g]
            s["n"] += int(row["n"])
            s["lo"] = min(s["lo"], float(row["lo"]))
            s["hi"] = max(s["hi"], float(row["hi"]))
        else:
            stats[g] = {
                "n": int(row["n"]), "lo": float(row["lo"]),
                "hi": float(row["hi"]),
            }

    widths = {
        g: ((s["hi"] - s["lo"]) / B) or 1.0 for g, s in stats.items()
    }
    los = {g: s["lo"] for g, s in stats.items()}
    # ceil(q*n) with exact integer arithmetic, 0-indexed
    targets = {
        g: -((-q_num * s["n"]) // q_den) - 1 for g, s in stats.items()
    }

    def bucket_of(groups: pd.Series, vals: np.ndarray) -> np.ndarray:
        # dict lookups via the cython Series.map, not a per-row loop
        lo = groups.map(los).to_numpy()
        w = groups.map(widths).to_numpy()
        return np.clip(((vals - lo) / w).astype(np.int64), 0, B - 1)

    # ---- pass 2: per-(group, bucket) histogram --------------------------
    def p2(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        df["_b"] = bucket_of(
            df[group_column], df[value_column].to_numpy()
        )
        return df.groupby([group_column, "_b"], as_index=False).agg(
            n=(value_column, "size")
        )

    hist: dict = {}
    for row in collect_rows(ds.map_batches(p2, batch_format="pandas")):
        key = (row[group_column], int(row["_b"]))
        hist[key] = hist.get(key, 0) + int(row["n"])

    cand_bucket: dict = {}
    offsets: dict = {}
    for g in stats:
        acc = 0
        for b in range(B):
            c = hist.get((g, b), 0)
            if acc + c > targets[g]:
                cand_bucket[g] = b
                offsets[g] = targets[g] - acc
                break
            acc += c

    # ---- pass 3: pruned scan → exact in-bucket selection ----------------
    def p3_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        b = bucket_of(df[group_column], df[value_column].to_numpy())
        want = df[group_column].map(cand_bucket).to_numpy()
        return df[b == want]

    def select(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_column].iloc[0]
        v = np.sort(df[value_column].to_numpy())[offsets[g]]
        return pd.DataFrame({group_column: [g], out_name: [float(v)]})

    return (
        ds.map_batches(p3_filter, batch_format="pandas")
        .groupby(group_column)
        .map_groups(select, batch_format="pandas")
    )


def grouped_weighted_median(
    ds,
    group_column: str,
    value_column: str,
    weight_column: str,
    num_hist_buckets: int = 1024,
    out_name: str = "wmedian",
):
    """EXACT per-group LOWER WEIGHTED MEDIAN — the smallest value v such
    that 2·W(≤v) ≥ W_total (integer weights; ties in value pool their
    weight) — in `grouped_quantile_disc`'s two-pass histogram-refinement
    shape, generalized from row counts to weight mass:

    1. scan → per-group (ΣW, min, max) partials; driver reduce is
       ≤ |groups| metadata rows.
    2. scan → per-(group, equi-width bucket) WEIGHT histogram; the driver
       prefix-sums ≤ |groups|·B tiny rows to find, per group, the bucket
       where cumulative weight first reaches T = (W_total+1)//2 and the
       residual mass still needed inside it.
    3. pruned scan → only the candidate bucket's rows trickle to a
       per-group task that sorts them and walks the weight cumsum to the
       exact element.

    Zero full-row shuffle; the shape survives any group cardinality and
    any weight skew (a single dominant value concentrates its bucket, but
    then the in-bucket selection is trivial). Values and weights must be
    integer-valued; the result is returned as int64."""
    import numpy as np

    B = num_hist_buckets

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column, weight_column]].dropna()
        return df.groupby(group_column, as_index=False).agg(
            w=(weight_column, "sum"),
            lo=(value_column, "min"),
            hi=(value_column, "max"),
        )

    stats: dict = {}
    for row in collect_rows(ds.map_batches(p1, batch_format="pandas")):
        g = row[group_column]
        if g in stats:
            s = stats[g]
            s["w"] += int(row["w"])
            s["lo"] = min(s["lo"], float(row["lo"]))
            s["hi"] = max(s["hi"], float(row["hi"]))
        else:
            stats[g] = {
                "w": int(row["w"]), "lo": float(row["lo"]),
                "hi": float(row["hi"]),
            }

    widths = {g: ((s["hi"] - s["lo"]) / B) or 1.0 for g, s in stats.items()}
    los = {g: s["lo"] for g, s in stats.items()}
    # smallest v with cum ≥ T  ⇔  2·cum ≥ W_total (exact for odd and even)
    targets = {g: (s["w"] + 1) // 2 for g, s in stats.items()}

    def bucket_of(groups: pd.Series, vals: np.ndarray) -> np.ndarray:
        lo = groups.map(los).to_numpy()
        w = groups.map(widths).to_numpy()
        return np.clip(((vals - lo) / w).astype(np.int64), 0, B - 1)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column, weight_column]].dropna()
        df["_b"] = bucket_of(df[group_column], df[value_column].to_numpy())
        return df.groupby([group_column, "_b"], as_index=False).agg(
            w=(weight_column, "sum")
        )

    hist: dict = {}
    for row in collect_rows(ds.map_batches(p2, batch_format="pandas")):
        key = (row[group_column], int(row["_b"]))
        hist[key] = hist.get(key, 0) + int(row["w"])

    cand_bucket: dict = {}
    residual: dict = {}
    for g in stats:
        acc = 0
        for b in range(B):
            c = hist.get((g, b), 0)
            if acc + c >= targets[g]:
                cand_bucket[g] = b
                residual[g] = targets[g] - acc
                break
            acc += c

    def p3_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column, weight_column]].dropna()
        b = bucket_of(df[group_column], df[value_column].to_numpy())
        want = df[group_column].map(cand_bucket).to_numpy()
        return df[b == want]

    def select(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_column].iloc[0]
        d = df.sort_values(value_column, kind="mergesort")
        cum = d[weight_column].to_numpy().cumsum()
        v = d[value_column].to_numpy()[
            int(np.searchsorted(cum, residual[g], side="left"))
        ]
        return pd.DataFrame(
            {
                group_column: [g],
                out_name: pd.array([int(v)], dtype="int64"),
                "w_total": pd.array([stats[g]["w"]], dtype="int64"),
            }
        )

    return (
        ds.map_batches(p3_filter, batch_format="pandas")
        .groupby(group_column)
        .map_groups(select, batch_format="pandas")
    )


def grouped_window_rank(
    ds,
    group_column: str,
    order_column: str,
    id_column: str,
    num_tiles: int,
    num_hist_buckets: int = 1024,
):
    """EXACT per-group window ranking — ``ROW_NUMBER() / NTILE(k) /
    PERCENT_RANK() OVER (PARTITION BY group ORDER BY order_col, id)`` —
    without sorting any group globally in one task.

    The range-partition discipline every distributed window engine uses:
    rows co-locate by (group, order-range) instead of (group), so a huge
    group's ranking work spreads over its value range:

    1. per-group (count, min, max) — metadata reduce (quantile pass 1).
    2. per-(group, equi-width bucket) histogram → driver prefix-sums an
       EXCLUSIVE offset per (group, bucket); ≤ |groups|·B tiny rows.
    3. rows shuffle ONCE by the composite (group, bucket) key; each
       bucket sorts locally by (order, id) and numbers from its offset —
       globally consistent because buckets are order-prefixes within the
       group. NTILE/PERCENT_RANK derive from (rn, n) arithmetically.

    Ties in ``order_column`` land in one bucket by construction (equal
    values share a bucket), so the unique (order, id) sort never needs
    cross-bucket context. NTILE follows the SQL distribution (first
    ``n % k`` tiles one row bigger); PERCENT_RANK is (rn-1)/(n-1) in
    doubles (0.0 for single-row groups), and with a unique order key
    RANK ≡ ROW_NUMBER so the SQL twin matches bit-for-bit. NULL order
    values are the caller's contract to filter (the SQL twin must do the
    same)."""
    import numpy as np

    B = num_hist_buckets
    if num_tiles < 1:
        raise ValueError("num_tiles must be >= 1")

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, order_column]].dropna()
        return df.groupby(group_column, as_index=False).agg(
            n=(order_column, "count"),
            lo=(order_column, "min"),
            hi=(order_column, "max"),
        )

    stats: dict = {}
    for row in collect_rows(ds.map_batches(p1, batch_format="pandas")):
        g = row[group_column]
        if g in stats:
            s = stats[g]
            s["n"] += int(row["n"])
            s["lo"] = min(s["lo"], float(row["lo"]))
            s["hi"] = max(s["hi"], float(row["hi"]))
        else:
            stats[g] = {
                "n": int(row["n"]), "lo": float(row["lo"]),
                "hi": float(row["hi"]),
            }

    widths = {g: ((s["hi"] - s["lo"]) / B) or 1.0 for g, s in stats.items()}
    los = {g: s["lo"] for g, s in stats.items()}

    def bucket_of(groups: pd.Series, vals: np.ndarray) -> np.ndarray:
        lo = groups.map(los).to_numpy()
        w = groups.map(widths).to_numpy()
        return np.clip(((vals - lo) / w).astype(np.int64), 0, B - 1)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, order_column]].dropna()
        df["_b"] = bucket_of(df[group_column], df[order_column].to_numpy())
        return df.groupby([group_column, "_b"], as_index=False).agg(
            n=(order_column, "size")
        )

    hist: dict = {}
    for row in collect_rows(ds.map_batches(p2, batch_format="pandas")):
        key = (row[group_column], int(row["_b"]))
        hist[key] = hist.get(key, 0) + int(row["n"])

    offsets: dict = {}  # (group, bucket) -> exclusive prefix within group
    for g in stats:
        acc = 0
        for b in range(B):
            c = hist.get((g, b), 0)
            if c:
                offsets[(str(g), b)] = acc
                acc += c

    group_n = {g: s["n"] for g, s in stats.items()}

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, order_column, id_column]].dropna(
            subset=[group_column, order_column]
        )
        b = bucket_of(df[group_column], df[order_column].to_numpy())
        df["_gb"] = (
            df[group_column].astype(str) + "\x1f" + pd.Series(
                b.astype(str), index=df.index
            )
        )
        return df

    def number(df: pd.DataFrame) -> pd.DataFrame:
        g_str, b_str = df["_gb"].iloc[0].split("\x1f")
        df = df.sort_values(
            [order_column, id_column], kind="mergesort"
        ).reset_index(drop=True)
        base = offsets[(g_str, int(b_str))]
        rn = base + np.arange(1, len(df) + 1, dtype=np.int64)
        n = group_n[df[group_column].iloc[0]]
        k = num_tiles
        small = n // k
        big = n % k
        if small == 0:
            tile = rn
        else:
            cutoff = big * (small + 1)
            tile = np.where(
                rn <= cutoff,
                (rn - 1) // (small + 1) + 1,
                big + (rn - cutoff - 1) // small + 1,
            )
        pr = (rn - 1) / (n - 1) if n > 1 else np.zeros(len(df))
        out = df.drop(columns=["_gb"])
        out["rn"] = rn
        out["tile"] = tile.astype("int64")
        out["pr"] = pr
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_gb")
        .map_groups(number, batch_format="pandas")
    )


def top_k(ds, k: int, key: str, tie_key: str):
    """Global top-k by (key desc, tie_key asc): per-batch local prune to k
    (partial top-k) before the tiny global sort — no full-data sort at
    scale."""

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            [key, tie_key], ascending=[False, True], kind="mergesort"
        ).head(k)

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return pruned.sort([key, tie_key], descending=[True, False]).limit(k)


def grouped_quantile_cont(
    ds,
    group_column: str,
    value_column: str,
    q_num: int,
    q_den: int,
    num_hist_buckets: int = 1024,
    out_name: str = "q_value",
):
    """EXACT per-group continuous quantile (SQL ``quantile_cont`` /
    percentile_cont): with h = (n-1)·q, linear interpolation
    v[floor(h)] + (h - floor(h))·(v[ceil(h)] - v[floor(h)]) over the
    sorted group values. Same three-scan histogram-refinement shape as
    `grouped_quantile_disc`, fetching the TWO order statistics around h
    (their buckets may differ). q must be an exact binary rational
    (q_den a power of two) so the interpolation fraction — and therefore
    every float op — is bit-identical to a SQL twin evaluating
    (n-1)·q in doubles."""
    import numpy as np

    if not (0 <= q_num <= q_den):
        raise ValueError("quantile must be in [0, 1]")
    if q_den & (q_den - 1):
        raise ValueError("q_den must be a power of two for bit-exactness")

    B = num_hist_buckets

    def p1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        return df.groupby(group_column, as_index=False).agg(
            n=(value_column, "count"),
            lo=(value_column, "min"),
            hi=(value_column, "max"),
        )

    stats: dict = {}
    for row in collect_rows(ds.map_batches(p1, batch_format="pandas")):
        g = row[group_column]
        if g in stats:
            s = stats[g]
            s["n"] += int(row["n"])
            s["lo"] = min(s["lo"], float(row["lo"]))
            s["hi"] = max(s["hi"], float(row["hi"]))
        else:
            stats[g] = {
                "n": int(row["n"]), "lo": float(row["lo"]),
                "hi": float(row["hi"]),
            }

    widths = {g: ((s["hi"] - s["lo"]) / B) or 1.0 for g, s in stats.items()}
    los = {g: s["lo"] for g, s in stats.items()}
    # 0-based rank pair around h = (n-1)*q, exact integer arithmetic
    ranks: dict = {}
    fracs: dict = {}
    for g, s in stats.items():
        num = (s["n"] - 1) * q_num
        r_lo = num // q_den
        frac_num = num % q_den
        r_hi = r_lo + (1 if frac_num else 0)
        ranks[g] = (int(r_lo), int(r_hi))
        fracs[g] = frac_num / q_den  # exact: q_den is a power of two

    def bucket_of(groups: pd.Series, vals: np.ndarray) -> np.ndarray:
        # dict lookups via the cython Series.map, not a per-row loop
        lo = groups.map(los).to_numpy()
        w = groups.map(widths).to_numpy()
        return np.clip(((vals - lo) / w).astype(np.int64), 0, B - 1)

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        df["_b"] = bucket_of(
            df[group_column], df[value_column].to_numpy()
        )
        return df.groupby([group_column, "_b"], as_index=False).agg(
            n=(value_column, "size")
        )

    hist: dict = {}
    for row in collect_rows(ds.map_batches(p2, batch_format="pandas")):
        key = (row[group_column], int(row["_b"]))
        hist[key] = hist.get(key, 0) + int(row["n"])

    # locate, per group, the (bucket, in-bucket offset) of BOTH ranks
    want: dict = {}  # group -> {rank: (bucket, offset)}
    for g in stats:
        acc = 0
        need = sorted(set(ranks[g]))
        found: dict = {}
        for b in range(B):
            c = hist.get((g, b), 0)
            while need and acc + c > need[0]:
                found[need[0]] = (b, need[0] - acc)
                need.pop(0)
            if not need:
                break
            acc += c
        want[g] = found

    cand: dict = {g: {b for b, _ in w.values()} for g, w in want.items()}
    # a group needs at most two candidate buckets (one per rank); pad to
    # two dicts so the membership test is two vectorized comparisons
    cand_a = {g: min(bs) for g, bs in cand.items()}
    cand_b = {g: max(bs) for g, bs in cand.items()}

    def p3_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[group_column, value_column]].dropna()
        df["_b"] = bucket_of(
            df[group_column], df[value_column].to_numpy()
        )
        b = df["_b"].to_numpy()
        keep = (b == df[group_column].map(cand_a).to_numpy()) | (
            b == df[group_column].map(cand_b).to_numpy()
        )
        return df[keep]

    def select(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_column].iloc[0]
        by_bucket = {
            b: np.sort(sub[value_column].to_numpy())
            for b, sub in df.groupby("_b")
        }
        r_lo, r_hi = ranks[g]
        b_lo, off_lo = want[g][r_lo]
        v_lo = float(by_bucket[b_lo][off_lo])
        b_hi, off_hi = want[g][r_hi]
        v_hi = float(by_bucket[b_hi][off_hi])
        v = v_lo + fracs[g] * (v_hi - v_lo)
        return pd.DataFrame({group_column: [g], out_name: [float(v)]})

    return (
        ds.map_batches(p3_filter, batch_format="pandas")
        .groupby(group_column)
        .map_groups(select, batch_format="pandas")
    )


def local_distinct_cg(
    batch: pa.Table, cols: list[str], hash_col: str, salts: int
) -> pa.Table:
    """Per-batch exact-distinct partial, string-key flavor (the q65
    discipline shared by q142/q146): Arrow group-distinct on ``cols``,
    then a cluster-sized coarse group of the pandas hash of
    ``hash_col`` (same value → same group on every worker, so the
    downstream in-group dedup is globally exact). q65's integer-user
    path keys cg with a zero-copy bit_and instead — the int fast path
    of the same shape."""
    import numpy as np
    import pandas as _pd

    g = pa.TableGroupBy(batch, cols, use_threads=False).aggregate([])
    h = _pd.util.hash_array(
        g[hash_col].combine_chunks().to_numpy(zero_copy_only=False)
    )
    return g.append_column(
        "cg", pa.array((h & (salts - 1)).astype(np.int32))
    )


def global_order_stats(
    cds,
    ks: list[int],
    column: str = "c",
    num_buckets: int = 4096,
    num_salt: int | None = None,
) -> dict[int, int]:
    """Exact k-th smallest (1-indexed, for EVERY k in ``ks``) of an
    int64 column — without sorting a row: SIMULTANEOUS histogram
    descent. Each round is ONE full-column scan that histograms every
    still-wide (k, lo, hi) interval at once (per-batch vectorized
    bincount; the shuffle payload is ≤ |intervals|·B (bucket, count)
    rows), the driver walks the ≤ B-row histograms to narrow each k's
    interval, and a final exact-value pass resolves all ks together —
    O(log_B(range)) scans TOTAL, independent of len(ks). This is how a
    10¹²-row engine computes exact global percentile LADDERS when
    `sort` (an all-to-all of every row) is off the table; the grouped
    quantile family (grouped_quantile_disc et al.) co-locates per
    group — this is the single-giant-group escape, multi-k.

    Returns {k: value}. ks must satisfy 1 <= k <= n.
    """
    import numpy as np

    from ray.data.aggregate import Count, Max, Min

    agg = cds.aggregate(
        Count(alias_name="n"),
        Min(column, alias_name="lo"),
        Max(column, alias_name="hi"),
    )
    n, glo, ghi = int(agg["n"]), int(agg["lo"]), int(agg["hi"]) + 1
    bad = [k for k in ks if not 1 <= k <= n]
    if bad:
        raise ValueError(f"ks out of range 1..{n}: {bad}")

    # per-k state: remaining rank within [lo, hi)
    state = {k: (k, glo, ghi) for k in ks}

    def hist_scan(intervals):
        """intervals: list of (iid, lo, hi, w). One scan → DataFrame of
        (iid, bkt, cnt)."""
        ivs = list(intervals)

        def part(b: pa.Table) -> pa.Table:
            c = b[column].combine_chunks().to_numpy(zero_copy_only=False)
            iids, bkts, cnts = [], [], []
            for iid, lo_, hi_, w_ in ivs:
                m = c[(c >= lo_) & (c < hi_)]
                if len(m) == 0:
                    continue
                cnt = np.bincount((m - lo_) // w_)
                nz = np.nonzero(cnt)[0]
                iids.append(np.full(len(nz), iid, dtype=np.int64))
                bkts.append(nz.astype(np.int64))
                cnts.append(cnt[nz].astype(np.int64))
            if not iids:
                return pa.table(
                    {
                        "iid": pa.array([], pa.int64()),
                        "bkt": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "iid": pa.array(np.concatenate(iids)),
                    "bkt": pa.array(np.concatenate(bkts)),
                    "cnt": pa.array(np.concatenate(cnts)),
                }
            )

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["iid", "bkt"], as_index=False)["cnt"].sum()
            return g.astype({"iid": "int64", "bkt": "int64", "cnt": "int64"})

        return pd.DataFrame(
            collect_rows(
                coarse_group_reduce(
                    cds.map_batches(part, batch_format="pyarrow"),
                    ["iid", "bkt"],
                    merge,
                    num_salt=num_salt,
                )
            ),
            columns=["iid", "bkt", "cnt"],
        ).sort_values(["iid", "bkt"])

    # descent rounds: histogram every wide interval at once
    while True:
        # dedup identical (lo, hi) windows across ks
        wide = {}
        for k, (_krem, lo_, hi_) in state.items():
            if hi_ - lo_ > num_buckets:
                wide.setdefault((lo_, hi_), []).append(k)
        if not wide:
            break
        intervals = []
        for iid, ((lo_, hi_), _grp) in enumerate(sorted(wide.items())):
            w_ = -(-(hi_ - lo_) // num_buckets)
            intervals.append((iid, lo_, hi_, w_))
        hist = hist_scan(intervals)
        for iid, lo_, hi_, w_ in intervals:
            h = hist[hist["iid"] == iid]
            pairs = list(zip(h["bkt"], h["cnt"]))
            for k in wide[(lo_, hi_)]:
                krem = state[k][0]
                run = 0
                for bkt, cnt in pairs:
                    if run + int(cnt) >= krem:
                        b0 = lo_ + int(bkt) * w_
                        state[k] = (
                            krem - run, b0, min(hi_, b0 + w_)
                        )
                        break
                    run += int(cnt)

    # final exact-value pass over every (narrow) interval at once
    narrow = {}
    for k, (_krem, lo_, hi_) in state.items():
        narrow.setdefault((lo_, hi_), []).append(k)
    intervals = [
        (iid, lo_, hi_, 1)
        for iid, (lo_, hi_) in enumerate(sorted(narrow))
    ]
    hist = hist_scan(intervals)
    out: dict[int, int] = {}
    for iid, lo_, hi_, _w in intervals:
        h = hist[hist["iid"] == iid]
        pairs = list(zip(h["bkt"], h["cnt"]))
        for k in narrow[(lo_, hi_)]:
            krem = state[k][0]
            run = 0
            for bkt, cnt in pairs:
                run += int(cnt)
                if run >= krem:
                    out[k] = lo_ + int(bkt)
                    break
    return out


def union_by_name(datasets, null_fill=True):
    """Schema-evolution UNION: combine Datasets whose schemas differ by
    added/removed columns (the snapshot-over-time reality of any
    long-lived table). Each input is padded with typed nulls for the
    columns it lacks and reordered to the unified layout, then the
    union streams — no shuffle, no materialization. Type conflicts for
    a shared column raise (an engine should refuse to guess lossy
    coercions). The columnar analogue of DuckDB's UNION ALL BY NAME."""
    datasets = list(datasets)
    if not datasets:
        raise ValueError("union_by_name requires at least one dataset")
    schemas = [ds.schema() for ds in datasets]
    unified: dict[str, pa.DataType] = {}
    for s in schemas:
        for name, typ in zip(s.names, s.types):
            if name in unified:
                if unified[name] != typ:
                    raise TypeError(
                        f"column {name!r}: {unified[name]} vs {typ}"
                    )
            else:
                unified[name] = typ
    if not null_fill:
        missing = [
            name for name in unified
            if any(name not in s.names for s in schemas)
        ]
        if missing:
            raise ValueError(f"columns absent from some inputs: {missing}")
    names = list(unified)

    def pad(b: pa.Table) -> pa.Table:
        cols = []
        for name in names:
            if name in b.column_names:
                cols.append(b[name])
            else:
                cols.append(pa.nulls(b.num_rows, unified[name]))
        return pa.table(dict(zip(names, cols)))

    out = datasets[0].map_batches(pad, batch_format="pyarrow")
    for ds in datasets[1:]:
        out = out.union(ds.map_batches(pad, batch_format="pyarrow"))
    return out
