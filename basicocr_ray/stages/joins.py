"""Partitioned hash join — both sides large (SURVEY §2.4, guide pattern).

Every other lookup in this engine broadcasts the small side (J1-J3); when
BOTH sides are fact-scale the portable Ray Data pattern is the explicit
bucketed hash join: add ``bucket = key % B`` to each side, tag rows with
their side, union, group by bucket, and join matching buckets pairwise
inside `map_groups` with a pandas merge. Rows shuffle exactly once each
(by bucket); skewed keys are handled by raising B (and, for pathological
hot keys, salting them into sub-buckets — documented, not needed for the
uniform TPC-H keys here).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from basicocr_ray.core.collect import collect_rows


def _bucket_ids(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Stable int32 bucket per key value. Integer keys bucket zero-copy via
    numpy modulo; string (or other) keys via pandas' SipHash
    (``pd.util.hash_array`` — fixed default hash key, so the same value
    lands in the same bucket on every worker/process)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        keys = arr.to_numpy(zero_copy_only=False)
        b = keys.astype(np.int64, copy=False) % num_buckets
    else:
        b = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
    return pa.array(b.astype(np.int32, copy=False))


def _probed(ds):
    """(ds, schema) with NO throwaway execution: schema(fetch_if_missing=
    True) EXECUTES a lazy plan and discards the result — a side that is
    itself a join/groupby chain would then run twice (probe + consume).
    Probe without executing; only when the schema is genuinely unknown,
    materialize that side once and hand back the materialized handle so
    the probe work is the consumption work."""
    s = ds.schema(fetch_if_missing=False)
    if s is None:
        ds = ds.materialize()
        s = ds.schema()
    return ds, s


def bucketed_hash_join(
    left_ds,
    right_ds,
    key: str,
    left_columns: list[str],
    right_columns: list[str],
    num_buckets: int = 32,
    bucket_post_fn=None,
    join_type: str = "inner",
):
    """Equi-join of two large Datasets on a key column (integer or
    string — string keys bucket via a cross-process-stable hash).

    ``join_type``: ``"inner"`` (default), ``"left outer"``, ``"full
    outer"`` (unmatched rows of either side survive with null-padded
    other-side columns; Acero coalesces the key), ``"left semi"`` or
    ``"left anti"`` — the semi/anti flavors emit LEFT columns only
    (right_columns must be empty) and express EXISTS / NOT EXISTS against
    a fact-scale right side with the same single-shuffle discipline: a key
    never spans buckets, so per-bucket Acero anti/semi joins compose to
    the exact global result. (The reference's only anti-semantics is the
    broadcast AC stopword strip, J3/D2 — this is its both-sides-large
    generalization.)

    → Dataset with key + left_columns + right_columns. Both sides are
    widened to a COMMON typed schema (types probed via ``ds.schema()``)
    so the union is well-formed — except when a side contributes no
    non-key columns, in which case the other side skips the null padding
    entirely. Rows are tagged with an int8 side marker and the per-bucket
    join is Arrow-native (Acero ``Table.join``): fully vectorized C++, no
    pandas conversion, and int64 ids never pass through float64.

    ``bucket_post_fn`` (pa.Table → pa.Table), when given, runs on each
    bucket's joined table INSIDE the join task. Because a join key never
    spans buckets, any per-key reduction (aggregate, top-k per key) is
    exact here — fusing it saves the follow-up exchange the caller would
    otherwise need (one shuffle instead of two)."""
    if join_type not in (
        "inner", "left outer", "full outer", "left semi", "left anti"
    ):
        raise ValueError(f"unsupported join_type: {join_type!r}")
    if join_type in ("left semi", "left anti") and right_columns:
        raise ValueError("semi/anti joins emit left columns only")
    lcols = [key] + [c for c in left_columns if c != key]
    rcols = [key] + [c for c in right_columns if c != key]
    overlap = (set(lcols) & set(rcols)) - {key}
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}; "
            "rename before joining"
        )
    all_cols = lcols + [c for c in rcols if c not in lcols]
    out_cols = lcols if join_type in ("left semi", "left anti") else all_cols

    def _as_arrow_type(t):
        # pandas-block datasets surface numpy dtypes / python classes
        # (str for object columns) instead of Arrow types
        if isinstance(t, pa.DataType):
            return t
        if t in (str, object) or str(t) == "object":
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    left_ds, ls = _probed(left_ds)
    right_ds, rs = _probed(right_ds)
    # an EMPTY side (e.g. a fully-deduped resume wave) has schema None;
    # its columns' types then come from the other side (the key) and the
    # per-bucket empty-side branches below give the right semantics
    ltypes = dict(zip(ls.names, ls.types)) if ls is not None else {}
    rtypes = dict(zip(rs.names, rs.types)) if rs is not None else {}
    missing = [c for c in all_cols if c not in ltypes and c not in rtypes]
    if missing:
        raise ValueError(
            f"columns {missing} present on neither side (both empty?)"
        )
    types = {
        c: _as_arrow_type(ltypes.get(c, rtypes.get(c))) for c in all_cols
    }

    def prep(cols_present: list[str], side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in cols_present:
                    arrays.append(batch[c])
                else:
                    arrays.append(pa.nulls(n, type=types[c]))
            names.append("_bucket")
            arrays.append(_bucket_ids(batch[key], num_buckets))
            names.append("_side")
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.Table.from_arrays(arrays, names)

        return fn

    left_t = left_ds.map_batches(prep(lcols, 0), batch_format="pyarrow")
    right_t = right_ds.map_batches(prep(rcols, 1), batch_format="pyarrow")

    empty = pa.Table.from_arrays(
        [pa.array([], type=types[c]) for c in out_cols], out_cols
    )

    def join_bucket(tbl: pa.Table) -> pa.Table:
        mask = pc.equal(tbl["_side"], 0)
        l_tbl = tbl.filter(mask).select(lcols)
        r_tbl = tbl.filter(pc.invert(mask)).select(rcols)
        if l_tbl.num_rows == 0:
            # full outer: keep right rows, null-pad the left columns
            if join_type == "full outer":
                n = r_tbl.num_rows
                out = pa.Table.from_arrays(
                    [
                        r_tbl[c] if c in rcols else pa.nulls(n, types[c])
                        for c in out_cols
                    ],
                    out_cols,
                )
                return bucket_post_fn(out) if bucket_post_fn else out
            return bucket_post_fn(empty) if bucket_post_fn else empty
        if r_tbl.num_rows == 0:
            # anti-join: an empty right bucket keeps every left row
            if join_type == "left anti":
                out = l_tbl
                return bucket_post_fn(out) if bucket_post_fn else out
            # left/full outer: keep left rows, null-pad the right columns
            if join_type in ("left outer", "full outer"):
                n = l_tbl.num_rows
                out = pa.Table.from_arrays(
                    [
                        l_tbl[c] if c in lcols else pa.nulls(n, types[c])
                        for c in out_cols
                    ],
                    out_cols,
                )
                return bucket_post_fn(out) if bucket_post_fn else out
            return bucket_post_fn(empty) if bucket_post_fn else empty
        # use_threads=False: each bucket join runs inside a 1-CPU Ray
        # task; Acero's default pool (sized to the whole machine) in 32
        # concurrent tasks oversubscribes the node ~32x and thrashes
        out = l_tbl.join(
            r_tbl, keys=key, join_type=join_type, use_threads=False
        ).select(out_cols)
        return bucket_post_fn(out) if bucket_post_fn else out

    return (
        left_t.union(right_t)
        .groupby("_bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def adaptive_semi_anti_join(
    left_ds,
    keys_ds,
    key: str,
    left_columns: list[str],
    join_type: str,
    broadcast_bytes: int = 64 << 20,
):
    """EXISTS / NOT EXISTS against a key set whose size is KNOWN at
    runtime: broadcast when it fits, shuffle when it doesn't.

    ``keys_ds`` should be materialized (curation decision sets are), so
    ``size_bytes()`` is block metadata, not an execution. When the key
    relation is at most ``broadcast_bytes``, the keys ride ONE
    ``ray.put`` and the left side streams through a vectorized
    membership filter — the left side (the corpus) never shuffles at
    all, which is the entire cost of a semi/anti join at 100 TB. When
    the key set is corpus-sized (exact-dedup winners are one row per
    unique kept doc), the same call degrades to the single-shuffle
    `bucketed_hash_join` — the decision is made on measured bytes per
    run, never on an assumption that a decision set "should" be small
    (the round-4 `assign_components` single-task-fast-path discipline
    applied to semi/anti joins).

    ``join_type``: ``"left semi"`` or ``"left anti"``. Output columns:
    ``key`` + ``left_columns`` (matching the bucketed join's contract)."""
    if join_type not in ("left semi", "left anti"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    from ray.data.dataset import MaterializedDataset

    sz = None
    if isinstance(keys_ds, MaterializedDataset):
        # metadata read — size_bytes() on a LAZY dataset would execute
        # the plan just to measure it
        try:
            sz = keys_ds.size_bytes()
        except Exception:
            sz = None
    if sz is None or sz > broadcast_bytes:
        return bucketed_hash_join(
            left_ds, keys_ds, key, left_columns, [], join_type=join_type
        )
    import ray

    keys_df = keys_ds.to_pandas()
    anti = join_type == "left anti"
    cols = [key] + list(left_columns)
    if len(keys_df) == 0:
        # empty key set: anti keeps everything, semi keeps nothing (an
        # all-empty filter pass, so the output schema stays the left's)
        if anti:
            return left_ds.map_batches(
                lambda b: b.select(cols), batch_format="pyarrow"
            )
        return left_ds.map_batches(
            lambda b: b.select(cols).slice(0, 0), batch_format="pyarrow"
        )
    key_vals = keys_df[key].to_numpy()
    if np.issubdtype(key_vals.dtype, np.integer):
        ref = ray.put(np.unique(key_vals.astype(np.int64, copy=False)))

        def filt(b: pa.Table) -> pa.Table:
            ks = ray.get(ref)  # np.unique output: already sorted
            col = b[key].combine_chunks()
            # null keys match NOTHING (EXISTS semantics) on BOTH
            # branches: to_numpy on a null-bearing int column yields
            # float NaN, and NaN→int64 is undefined — fill with a
            # sentinel, then force those rows to miss
            nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
            if nulls.any():
                col = pc.fill_null(col, 0)
            vals = (
                col.to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            idx = np.searchsorted(ks, vals)
            idx[idx >= len(ks)] = len(ks) - 1
            hit = ks[idx] == vals
            if nulls.any():
                hit &= ~nulls
            mask = ~hit if anti else hit
            return b.filter(pa.array(mask)).select(cols)

    else:
        ref = ray.put(frozenset(key_vals.tolist()))

        def filt(b: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            vals = b[key].to_pylist()
            hit = np.fromiter(
                (v in ks for v in vals), dtype=bool, count=len(vals)
            )
            mask = ~hit if anti else hit
            return b.filter(pa.array(mask)).select(cols)

    return left_ds.map_batches(filt, batch_format="pyarrow")


def interval_join(
    points_ds,
    intervals_ds,
    point_column: str,
    start_column: str,
    end_column: str,
    point_columns: list[str],
    interval_columns: list[str],
    bucket_width: int,
    num_buckets: int = 64,
):
    """Distributed RANGE JOIN: point ⋈ interval on start ≤ point < end
    (task-brief custom operator; Ray Data has no non-equi join).

    The canonical partition-and-replicate shape: the integer domain is cut
    into ``bucket_width`` ranges; each point row lands in exactly ONE
    bucket, each interval is REPLICATED into every bucket its span
    overlaps (intervals are usually far fewer than points, so the
    replication side is the cheap one — pick ``bucket_width`` near the
    typical interval length to keep the factor ~2). Buckets are
    hash-folded onto ``num_buckets`` coarse groups; inside a group a
    per-bucket pandas/numpy pass tests containment vectorized per
    interval. Output: point_columns + interval_columns per match.

    Partitioning assumption (documented per the brief): a single interval
    spanning the whole domain replicates everywhere (capped at one replica
    per group) — degenerate whole-range intervals belong on the broadcast
    fast path instead. Include a UNIQUE interval id in
    ``interval_columns``: replica dedup inside folded groups keys on
    (bounds + interval_columns), so fully identical interval rows without
    an id would collapse to one."""
    import pandas as _pd

    def prep_points(b: pa.Table) -> pa.Table:
        v = np.asarray(b[point_column].to_pylist(), dtype=np.int64)
        arrays = [b[c] for c in point_columns]
        names = list(point_columns)
        names += ["_p", "_lo", "_hi", "_bkt", "_side"]
        arrays += [
            pa.array(v, pa.int64()),
            pa.nulls(len(v), pa.int64()),
            pa.nulls(len(v), pa.int64()),
            pa.array((v // bucket_width) % num_buckets, pa.int32()),
            pa.array(["p"] * len(v), pa.string()),
        ]
        return pa.Table.from_arrays(arrays, names)

    def prep_intervals(b: pa.Table) -> pa.Table:
        lo = np.asarray(b[start_column].to_pylist(), dtype=np.int64)
        hi = np.asarray(b[end_column].to_pylist(), dtype=np.int64)
        rows = {c: [] for c in interval_columns}
        lo_out, hi_out, bkt_out = [], [], []
        cols_in = {c: b[c].to_pylist() for c in interval_columns}
        for i in range(len(lo)):
            if hi[i] <= lo[i]:
                continue
            first = lo[i] // bucket_width
            last = (hi[i] - 1) // bucket_width
            if last - first + 1 >= num_buckets:
                # span covers every folded group once — cap the replicas
                first, last = 0, num_buckets - 1
            for bk in range(first, last + 1):
                for c in interval_columns:
                    rows[c].append(cols_in[c][i])
                lo_out.append(lo[i])
                hi_out.append(hi[i])
                bkt_out.append(bk % num_buckets)
        n = len(lo_out)
        arrays = [pa.array(rows[c]) for c in interval_columns]
        names = list(interval_columns)
        names += ["_p", "_lo", "_hi", "_bkt", "_side"]
        arrays += [
            pa.nulls(n, pa.int64()),
            pa.array(lo_out, pa.int64()),
            pa.array(hi_out, pa.int64()),
            pa.array(bkt_out, pa.int32()),
            pa.array(["i"] * n, pa.string()),
        ]
        return pa.Table.from_arrays(arrays, names)

    # widen both sides to a common schema for the union
    pts, p_schema = _probed(
        points_ds.map_batches(prep_points, batch_format="pyarrow")
    )
    ivs, i_schema = _probed(
        intervals_ds.map_batches(prep_intervals, batch_format="pyarrow")
    )
    all_names = list(p_schema.names) + [
        c for c in i_schema.names if c not in p_schema.names
    ]
    types = {
        **dict(zip(i_schema.names, i_schema.types)),
        **dict(zip(p_schema.names, p_schema.types)),
    }

    def widen(fn_names):
        def w(b: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in all_names:
                names.append(c)
                if c in b.column_names:
                    arrays.append(b[c])
                else:
                    arrays.append(pa.nulls(b.num_rows, types[c]))
            return pa.Table.from_arrays(arrays, names)

        return w

    both = pts.map_batches(widen(p_schema.names), batch_format="pyarrow").union(
        ivs.map_batches(widen(i_schema.names), batch_format="pyarrow")
    )

    out_cols = point_columns + interval_columns

    def join_group(df: _pd.DataFrame) -> _pd.DataFrame:
        outs = []
        p = df[df["_side"] == "p"]
        iv = df[df["_side"] == "i"]
        if p.empty or iv.empty:
            return _pd.DataFrame({c: [] for c in out_cols})
        # a coarse group folds many domain buckets: points joined against
        # only the intervals replicated into their own bucket, so each
        # containment test runs within the right slice
        pb = (p["_p"].astype("int64") // bucket_width) % num_buckets
        for bkt, psub in p.groupby(pb):
            isub = iv[iv["_bkt"] == bkt]
            if isub.empty:
                continue
            # multiple domain buckets fold onto one group: an interval can
            # have several replicas here — dedup so each (point, interval)
            # match is emitted exactly once (containment is re-verified)
            isub = isub.drop_duplicates(subset=["_lo", "_hi"] + interval_columns)
            pv = psub["_p"].to_numpy(dtype=np.int64)
            for _, irow in isub.iterrows():
                mask = (pv >= irow["_lo"]) & (pv < irow["_hi"])
                if mask.any():
                    m = psub.loc[mask, point_columns].copy()
                    for c in interval_columns:
                        m[c] = irow[c]
                    outs.append(m)
        if not outs:
            return _pd.DataFrame({c: [] for c in out_cols})
        return _pd.concat(outs, ignore_index=True)[out_cols]

    return both.groupby("_bkt").map_groups(join_group, batch_format="pandas")


def hot_keys(ds, key: str, min_count: int, local_theta: float = 0.002):
    """Best-effort hot-key discovery for `skew_aware_join`: the list of
    key values whose (approximate-from-below) global frequency is
    ≥ ``min_count``.

    Shape: each batch emits partial counts ONLY for its locally frequent
    keys (in-batch count ≥ max(2, local_theta·batch_rows)) — the
    SpaceSaving-style local filter bounds what the shuffle carries to
    ≤ 1/theta candidates per batch — then the house coarse-group final
    sum and a driver `take_all` of the tiny (key, count ≥ min_count)
    relation. A key spread perfectly thin (≤1 row per batch) can evade
    the local filter; callers must therefore treat the result as a
    PERFORMANCE hint, never a correctness input — `skew_aware_join` gives
    identical output for any hot set, including the empty one."""
    import pandas as pd

    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def local_candidates(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: pa.array([], b.schema.field(key).type),
                             "cnt": pa.array([], pa.int64())})
        vc = pa.TableGroupBy(b.select([key]), [key],
                             use_threads=False).aggregate([([], "count_all")])
        thr = max(2, int(local_theta * b.num_rows))
        vc = vc.filter(pc.greater_equal(vc["count_all"], thr))
        return pa.table({key: vc[key],
                         "cnt": pc.cast(vc["count_all"], pa.int64())})

    def add_cg(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            b[key].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return b.append_column(
            "cg", pa.array((h & (salts - 1)).astype(np.int32))
        )

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False)["cnt"].sum()
        return out[out["cnt"] >= min_count]

    rows = (
        ds.map_batches(local_candidates, batch_format="pyarrow")
        .map_batches(add_cg, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(final_sum, batch_format="pandas")
    )
    rows = collect_rows(rows)
    return [r[key] for r in rows]


def skew_aware_join(
    left_ds,
    right_ds,
    key: str,
    left_columns: list[str],
    right_columns: list[str],
    num_buckets: int = 32,
    hot_min_count: int | None = None,
    hot: list | None = None,
):
    """Inner equi-join that routes HOT keys around the shuffle: hot-key
    right rows are collected and broadcast (`ray.put` once, read per
    task), hot left rows join against them inside `map_batches` with no
    exchange; cold rows take the ordinary single-shuffle
    `bucketed_hash_join`. The union of the two paths is the exact join
    for ANY hot/cold split, so the hot set (from ``hot`` or discovered
    via `hot_keys(left_ds, key, hot_min_count)`) is purely a load-balance
    decision — the skewed key that would have melted one bucket never
    enters the exchange.

    Partitioning assumption (documented per the brief): the right side
    must be bounded per hot key (dimension-shaped) so the broadcast table
    stays small; a many-to-many hot key explodes the OUTPUT itself and
    needs pair-level salting instead. No ``bucket_post_fn`` here: a hot
    key spans left batches on the broadcast path, so per-key in-task
    reductions would silently turn partial — aggregate the union."""
    import ray

    if hot is None:
        if hot_min_count is None:
            raise ValueError("pass hot= or hot_min_count=")
        hot = hot_keys(left_ds, key, hot_min_count)
    if not hot:
        return bucketed_hash_join(
            left_ds, right_ds, key, left_columns, right_columns,
            num_buckets=num_buckets,
        )

    right_ds, r_schema = _probed(right_ds)
    r_types = dict(zip(r_schema.names, r_schema.types))
    hot_arr = pa.array(hot, type=r_types[key])
    rcols = [key] + [c for c in right_columns if c != key]
    lcols = [key] + [c for c in left_columns if c != key]
    out_cols = lcols + [c for c in rcols if c not in lcols]

    hot_right = pa.Table.from_pylist(
        collect_rows(right_ds.map_batches(
            lambda b: b.filter(pc.is_in(b[key], value_set=hot_arr))
            .select(rcols),
            batch_format="pyarrow",
        )),
        schema=pa.schema([(c, r_types[c]) for c in rcols]),
    )
    hot_ref = ray.put(hot_right)

    def join_hot(b: pa.Table) -> pa.Table:
        hr = ray.get(hot_ref)
        l_tbl = b.filter(pc.is_in(b[key], value_set=hot_arr)).select(lcols)
        if l_tbl.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=t) for t in
                 [l_tbl.schema.field(c).type if c in lcols
                  else hr.schema.field(c).type for c in out_cols]],
                out_cols,
            )
        return l_tbl.join(
            hr, keys=key, join_type="inner", use_threads=False
        ).select(out_cols)

    hot_out = left_ds.map_batches(join_hot, batch_format="pyarrow")

    cold_left = left_ds.map_batches(
        lambda b: b.filter(pc.invert(pc.is_in(b[key], value_set=hot_arr))),
        batch_format="pyarrow",
    )
    cold_right = right_ds.map_batches(
        lambda b: b.filter(pc.invert(pc.is_in(b[key], value_set=hot_arr))),
        batch_format="pyarrow",
    )
    cold_out = bucketed_hash_join(
        cold_left, cold_right, key, left_columns, right_columns,
        num_buckets=num_buckets,
    )
    return hot_out.union(cold_out)


def _bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """Vectorized Kirsch–Mitzenmacher double hashing: position_i =
    (h1 + i·h2) mod m for i < k. h1 is the house pandas hash (fixed
    key, identical on every worker); h2 is a splitmix64 remix of h1 —
    NOT a second hash_array call, whose ``hash_key`` is silently
    ignored for numeric dtypes (h2 == h1 would collapse k hashes into
    one). Returns shape (k, len(keys)) int64 positions."""
    h1 = pd.util.hash_array(keys)
    with np.errstate(over="ignore"):
        z = h1 + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = z ^ (z >> np.uint64(31))
        i = np.arange(k, dtype=np.uint64)[:, None]
        pos = (h1[None, :] + i * h2[None, :]) % np.uint64(m)
    return pos.astype(np.int64)


def bloom_bits(build_ds, key: str, m: int = 1 << 20, k: int = 2) -> np.ndarray:
    """Distributed Bloom-filter BUILD over ``build_ds[key]``: each batch
    packs its local bits into an m/8-byte uint8 array, ONE row per batch
    rides the exchange (keys never do), and the driver OR-folds the
    partials — m/8 bytes of metadata per batch, the same
    bounded-key-space discipline as the CMS/HLL partials. Returns the
    packed bit array (length m//8)."""
    if m % 8:
        raise ValueError("m must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key].combine_chunks()
        pos = _bloom_positions(
            col.to_numpy(zero_copy_only=False), m, k
        ).ravel()
        bits = np.zeros(m // 8, dtype=np.uint8)
        np.bitwise_or.at(
            bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
        )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    out = np.zeros(m // 8, dtype=np.uint8)
    for tbl in build_ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in tbl["bits"].to_pylist():
            out |= np.frombuffer(buf, dtype=np.uint8)
    return out


def bloom_prefilter(
    probe_ds, build_ds, key: str, m: int = 1 << 20, k: int = 2
):
    """Bloom-filtered SEMI-JOIN pre-pass: drop probe rows whose key
    CANNOT be on the build side before any exchange runs. No false
    negatives (every true match survives); false-positive survivors
    must still flow through an exact join — this is a volume reducer,
    not a join. At 100 TB this is the standard way to keep a selective
    fact⋈dim semi-join from shuffling the whole fact table: the filter
    is m/8 bytes broadcast ONCE via ray.put, membership is two
    vectorized hash passes per batch. Size m ≥ ~10× the build-side
    cardinality for a ~1% false-positive tax (k=2)."""
    import ray

    bits_ref = ray.put(bloom_bits(build_ds, key, m, k))

    def keep(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        col = batch[key].combine_chunks()
        pos = _bloom_positions(col.to_numpy(zero_copy_only=False), m, k)
        hit = (bits[pos >> 3] >> (pos & 7)) & 1
        return batch.filter(pa.array(hit.all(axis=0)))

    return probe_ds.map_batches(keep, batch_format="pyarrow")
