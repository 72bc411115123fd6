"""Sampling / shuffling ops (SURVEY §2 T1/T2).

The reference's `randomSequentialSampler` picks random block starts and
reads sequentially within each block (`contrib/crnn/dataset.py:83-106`) —
Ray Data's block-local scheduling gives the "sequential within block"
locality for free; the random part maps to seeded `random_shuffle` /
`random_sample`. Seeds make both reproducible across runs."""

from __future__ import annotations

import pyarrow as pa

from basicocr_ray.core.collect import collect_rows


def shuffled(ds, seed: int = 42):
    """Full deterministic shuffle (`shuffle=True` loader, crnn_main.py:75-77)."""
    return ds.random_shuffle(seed=seed)


def two_stage_shuffle(ds, id_column: str, seed: int = 42,
                      num_salt: int | None = None):
    """Deterministic whole-dataset shuffle as scatter + in-group permute —
    the multi-node-honest alternative to `random_shuffle` (T2 at scale).

    Every row's rank is ``md5(f"{seed}:{id}")`` — a uniform random
    permutation in the random-oracle model. Stage 1 scatters rows to
    cluster-sized coarse buckets keyed by the rank's top bits (ONE
    all-to-all, each bucket ~1/S of the data); stage 2 permutes within
    each bucket by the full rank in one vectorized pandas sort. Because
    bucket boundaries are rank prefixes, concatenating buckets in key
    order realizes exactly ``ORDER BY md5(seed||':'||id)`` — so the
    result is invariant to input partitioning, retries, and cluster
    size (unlike seeded RNG shuffles, whose layout-dependence makes
    resume non-reproducible), and is SQL-twinnable. Changing the seed
    yields an independent permutation."""
    import pandas as pd

    def permute(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rank", id_column], kind="mergesort")
        return df.drop(columns=["_rank", "cg"])

    return (
        _ranked(ds, id_column, seed, num_salt)
        .groupby("cg")
        .map_groups(permute, batch_format="pandas")
    )


def _ranked(ds, id_column: str, seed: int, num_salt: int | None):
    """Append the deterministic shuffle rank ``_rank = md5(seed:id)`` and
    its rank-PREFIX coarse bucket ``cg`` (the top log2(S) bits of the
    rank, so ascending bucket order == ascending rank order)."""
    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(num_salt)
    shift = 32 - (salts.bit_length() - 1)

    def rank(batch: pa.Table) -> pa.Table:
        ranks = [
            md5_hex(f"{seed}:{i}") for i in batch[id_column].to_pylist()
        ]
        cgs = [int(r[:8], 16) >> shift for r in ranks]
        return batch.append_column(
            "_rank", pa.array(ranks, pa.string())
        ).append_column("cg", pa.array(cgs, pa.int32()))

    return ds.map_batches(rank, batch_format="pyarrow")


def global_rank(ds, id_column: str, seed: int = 42,
                num_salt: int | None = None, out_column: str = "pos"):
    """Distributed global row numbering under the deterministic shuffle
    order — ``ROW_NUMBER() OVER (ORDER BY md5(seed:id), id) - 1`` without
    a global sort reaching the driver.

    Bucket offsets come from a metadata-sized reduce: per-batch partial
    counts per coarse bucket (≤ blocks × S tiny rows), summed on the
    driver into an exclusive prefix over the ≤ S buckets — O(S) driver
    state at any data size, the Spark zipWithIndex discipline. Each
    bucket then sorts locally by the full rank and adds its offset to a
    vectorized arange. Because buckets are rank prefixes the numbering
    is globally consistent, partition/retry-invariant, and exactly
    SQL-twinnable (q55)."""
    import numpy as np
    import pandas as pd

    ranked = _ranked(ds, id_column, seed, num_salt).materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch["cg"])
        return pa.table(
            {"cg": vc.field("values"), "n": vc.field("counts")}
        )

    counts: dict[int, int] = {}
    for row in collect_rows(ranked.map_batches(
        partial_counts, batch_format="pyarrow"
    )):  # ≤ blocks × S rows of (cg, n) — metadata, not data
        counts[int(row["cg"])] = counts.get(int(row["cg"]), 0) + int(row["n"])
    offsets: dict[int, int] = {}
    acc = 0
    for cg in sorted(counts):
        offsets[cg] = acc
        acc += counts[cg]

    def number(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rank", id_column], kind="mergesort")
        base = offsets[int(df["cg"].iloc[0])]
        df[out_column] = base + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["_rank", "cg"])

    return ranked.groupby("cg").map_groups(number, batch_format="pandas")


def global_prefix_sum(ds, id_column: str, value_column: str,
                      seed: int = 42, num_salt: int | None = None,
                      out_column: str = "prefix"):
    """Distributed EXCLUSIVE running sum of ``value_column`` under the
    deterministic shuffle order — ``SUM(v) OVER (ORDER BY md5(seed:id),
    id ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` with no global sort.

    Same discipline as `global_rank`: per-bucket VALUE TOTALS (not row
    counts) reduce on the driver into an exclusive prefix over the ≤ S
    rank-prefix buckets — O(S) driver state at any data size — then each
    bucket sorts locally by the full rank and takes a vectorized cumsum
    plus its bucket offset. The primitive behind sequence packing,
    token-budget cuts and size-based file splitting."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    ranked = _ranked(ds, id_column, seed, num_salt).materialize()

    def partial_totals(batch: pa.Table) -> pa.Table:
        t = batch.group_by("cg").aggregate([(value_column, "sum")])
        return t.rename_columns(["cg", "v"])

    totals: dict[int, int] = {}
    for row in collect_rows(ranked.map_batches(
        partial_totals, batch_format="pyarrow"
    )):  # ≤ blocks × S rows — metadata
        totals[int(row["cg"])] = totals.get(int(row["cg"]), 0) + int(row["v"])
    offsets: dict[int, int] = {}
    acc = 0
    for cg in sorted(totals):
        offsets[cg] = acc
        acc += totals[cg]

    def prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rank", id_column], kind="mergesort")
        base = offsets[int(df["cg"].iloc[0])]
        v = df[value_column].to_numpy(dtype=np.int64)
        df[out_column] = base + np.cumsum(v) - v  # exclusive
        return df.drop(columns=["_rank", "cg"])

    return ranked.groupby("cg").map_groups(prefix, batch_format="pandas")


def grouped_prefix_sum(ds, group_column: str, id_column: str,
                       value_column: str, seed: int = 42,
                       num_salt: int | None = None,
                       out_column: str = "prefix"):
    """Per-GROUP exclusive running sum of ``value_column`` under the
    deterministic shuffle order — ``SUM(v) OVER (PARTITION BY g ORDER BY
    md5(seed:id), id ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` with no
    per-group global sort.

    The keyed generalization of `global_prefix_sum`: per-(group, bucket)
    VALUE TOTALS reduce on the driver into an exclusive prefix over the
    ≤ S rank-prefix buckets WITHIN each group — O(G·S) driver state, so
    the group column must be metadata-scale (sources, langs, shards; for
    high-cardinality groups use `coarse_group_reduce` with an in-group
    cumsum instead). Each (group, bucket) task then sorts locally by the
    full rank and takes a vectorized cumsum plus its offset — a single
    group larger than one task stays spread over S buckets. The
    primitive behind per-source token-budget mixture construction and
    per-group balanced shard assignment."""
    import numpy as np
    import pandas as pd

    ranked = _ranked(ds, id_column, seed, num_salt).materialize()

    def partial_totals(batch: pa.Table) -> pa.Table:
        t = batch.group_by([group_column, "cg"]).aggregate(
            [(value_column, "sum")]
        )
        return t.rename_columns([group_column, "cg", "v"])

    totals: dict[tuple, int] = {}
    for row in collect_rows(ranked.map_batches(
        partial_totals, batch_format="pyarrow"
    )):  # ≤ blocks × G × S rows — metadata
        k = (row[group_column], int(row["cg"]))
        totals[k] = totals.get(k, 0) + int(row["v"])
    offsets: dict[tuple, int] = {}
    acc, cur = 0, object()
    for (g, cg) in sorted(totals):  # one O(G·S log) pass, not G rescans
        if g != cur:
            cur, acc = g, 0
        offsets[(g, cg)] = acc
        acc += totals[(g, cg)]

    def prefix(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_rank", id_column], kind="mergesort")
        base = offsets[
            (df[group_column].iloc[0], int(df["cg"].iloc[0]))
        ]
        v = df[value_column].to_numpy(dtype=np.int64)
        df[out_column] = base + np.cumsum(v) - v  # exclusive
        return df.drop(columns=["_rank", "cg"])

    return ranked.groupby([group_column, "cg"]).map_groups(
        prefix, batch_format="pandas"
    )


def repeat_with_copy_idx(batch: pa.Table, n) -> pa.Table:
    """Repeat row i of ``batch`` n[i] times (int64 array, one entry per
    row) and append a 1-based ``copy_idx`` column (1..n[i] per source
    row) — the upsampling fan-out kernel shared by the q120 query and
    the `epoch_upsample` spec op. Pure vectorized numpy; zero shuffle
    (copies are born partitioned like their sources)."""
    import numpy as np

    n = np.asarray(n, dtype=np.int64)
    total = int(n.sum()) if len(n) else 0
    if total == 0:
        empty = batch.slice(0, 0)
        return empty.append_column(
            "copy_idx", pa.array([], type=pa.int64())
        )
    idx_rows = np.repeat(np.arange(len(n), dtype=np.int64), n)
    out = batch.take(pa.array(idx_rows))
    copy_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n)[:-1])), n
    ) + 1
    return out.append_column("copy_idx", pa.array(copy_idx))


def sampled(ds, fraction: float, seed: int = 42):
    """Bernoulli sample of ~fraction rows (val-subset analogue, T5)."""
    return ds.random_sample(fraction, seed=seed)


def block_sample(ds, every_k: int):
    """Deterministic systematic sample: every k-th row per batch (a
    seed-free sampler for conformance checks — unlike Bernoulli sampling
    its output is invariant to retry timing)."""

    def take(batch: pa.Table) -> pa.Table:
        return batch.take(list(range(0, batch.num_rows, every_k)))

    return ds.map_batches(take, batch_format="pyarrow")


def bottomk_sample(ds, id_column: str, k: int):
    """Deterministic uniform sample WITHOUT replacement via bottom-k
    hashing (the streaming/distributed sampler): every row gets the
    md5 of its id as a rank, each batch keeps only its local bottom-k,
    and a tiny global sort of ≤ k·num_batches survivors yields the exact
    global bottom-k — identical on any partitioning, any retry, any
    cluster size, and SQL-reproducible (ORDER BY md5(id) LIMIT k), unlike
    seeded RNG samplers whose output depends on execution layout."""
    import pyarrow.compute as pc

    from basicocr_ray.core.textstats import md5_hex

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        ranks = [md5_hex(str(i)) for i in ids]
        t = pa.table(
            {
                id_column: pc.cast(batch[id_column], pa.int64()),
                "_rank": pa.array(ranks, pa.string()),
            }
        )
        order = pc.sort_indices(
            t, sort_keys=[("_rank", "ascending"), (id_column, "ascending")]
        )
        return t.take(order[:k])

    return (
        ds.map_batches(rank, batch_format="pyarrow")
        .sort(["_rank", id_column])
        .limit(k)
    )


def weighted_bottomk(ds, id_column: str, weight_column: str, k: int):
    """Deterministic WEIGHTED sample without replacement (Efraimidis–
    Spirakis A-ES, arXiv:cs/0509026): each row races an exponential clock
    ``key = -ln(u) / w`` with ``u`` a deterministic uniform from
    ``md5(id)`` — the k smallest keys are a weighted-without-replacement
    sample (P(first) = w_i / Σw). Same distributed shape as
    `bottomk_sample`: per-batch local bottom-k, then a tiny global sort of
    ≤ k·num_batches survivors — partition/retry/cluster-size-invariant and
    SQL-twinnable (the u and key expressions are reproduced verbatim in
    the oracle; ties broken by id).

    ``u = (int(md5(id)[:8], 16) + 1) / 2^32`` ∈ (0, 1] — the +1 dodges
    ln(0); u = 1 gives key 0 (the strongest possible draw), which is fine.
    Non-positive weights are rejected (their exponential race is
    undefined)."""
    import numpy as np
    import pyarrow.compute as pc

    from basicocr_ray.core.textstats import md5_hex

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        w = np.asarray(batch[weight_column].to_pylist(), dtype=np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_bottomk requires positive weights")
        u = np.array(
            [(int(md5_hex(str(i))[:8], 16) + 1) for i in ids],
            dtype=np.float64,
        ) / 4294967296.0
        key = -np.log(u) / w
        t = pa.table(
            {
                id_column: pc.cast(batch[id_column], pa.int64()),
                weight_column: batch[weight_column],
                "_key": pa.array(key, pa.float64()),
            }
        )
        order = pc.sort_indices(
            t, sort_keys=[("_key", "ascending"), (id_column, "ascending")]
        )
        return t.take(order[:k])

    return (
        ds.map_batches(rank, batch_format="pyarrow")
        .sort(["_key", id_column])
        .limit(k)
    )


def stratified_bottomk(ds, group_column: str, id_column: str, k: int):
    """Deterministic stratified sample: exact bottom-k by md5(id) WITHIN
    each group (per-language / per-source quota sampling). Groups are
    coarse-hashed cluster-wide; the per-group rank-and-head is one
    vectorized pandas pass — same invariance guarantees as
    `bottomk_sample`, same SQL twin (row_number over partition by group
    order by md5(id))."""
    import pandas as pd
    import pyarrow.compute as pc

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        ranks = [md5_hex(str(i)) for i in ids]
        cgs = [
            int(md5_hex(str(g))[:8], 16) & (salts - 1)
            for g in batch[group_column].to_pylist()
        ]
        return pa.table(
            {
                group_column: batch[group_column],
                id_column: pc.cast(batch[id_column], pa.int64()),
                "_rank": pa.array(ranks, pa.string()),
                "cg": pa.array(cgs, pa.int32()),
            }
        )

    def head_per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_column, "_rank", id_column], kind="mergesort")
        return df.groupby(group_column).head(k)[[group_column, id_column]]

    return (
        ds.map_batches(rank, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(head_per_group, batch_format="pandas")
    )


def hash_split(
    ds,
    id_column: str,
    fractions: dict[str, int] | None = None,
):
    """Deterministic train/val/test assignment (the ML-data split every
    training pipeline needs ahead of export): each row's bucket is
    ``int(md5(id)[:8], 16) % 100`` mapped through ``fractions`` (split
    name → percentage, summing to 100, assigned in dict order). A pure
    per-batch map — partition/retry/cluster-size-invariant, re-runnable
    on a grown corpus without reshuffling old rows between splits, and
    SQL-reproducible (the q46/q56 md5 discipline)."""
    fractions = fractions or {"train": 80, "val": 10, "test": 10}
    if sum(fractions.values()) != 100:
        raise ValueError("fractions must sum to 100")
    names = list(fractions)
    cuts = []
    acc = 0
    for name in names:
        acc += fractions[name]
        cuts.append(acc)

    from basicocr_ray.core.textstats import md5_hex

    def assign(batch: pa.Table) -> pa.Table:
        splits = []
        for i in batch[id_column].to_pylist():
            p = int(md5_hex(str(i))[:8], 16) % 100
            for name, cut in zip(names, cuts):
                if p < cut:
                    splits.append(name)
                    break
        return batch.append_column(
            "split", pa.array(splits, pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_bottomk_alloc(ds, group_column: str, id_column: str,
                             alloc: dict):
    """`stratified_bottomk` with a PER-GROUP quota: ``alloc`` maps group
    value → k (e.g. a Neyman allocation computed from per-stratum
    moments). The quota table is strata-sized (bounded by definition —
    strata are languages/sources, not rows), so it broadcasts inside the
    closure; groups absent from ``alloc`` contribute nothing. Same
    md5-rank determinism and SQL twin as the fixed-k variant (row_number
    ... <= k_h via a join against the allocation relation)."""
    import pandas as pd
    import pyarrow.compute as pc

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_pylist()
        ranks = [md5_hex(str(i)) for i in ids]
        cgs = [
            int(md5_hex(str(g))[:8], 16) & (salts - 1)
            for g in batch[group_column].to_pylist()
        ]
        return pa.table(
            {
                group_column: batch[group_column],
                id_column: pc.cast(batch[id_column], pa.int64()),
                "_rank": pa.array(ranks, pa.string()),
                "cg": pa.array(cgs, pa.int32()),
            }
        )

    def head_per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_column, "_rank", id_column], kind="mergesort"
        )
        parts = []
        for g, sub in df.groupby(group_column):
            k = int(alloc.get(g, 0))
            if k > 0:
                parts.append(sub.head(k)[[group_column, id_column]])
        if not parts:
            return pd.DataFrame(
                {group_column: pd.array([], dtype="object"),
                 id_column: pd.array([], dtype="int64")}
            )
        return pd.concat(parts, ignore_index=True)

    return (
        ds.map_batches(rank, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(head_per_group, batch_format="pandas")
    )


def value_rank(ds, value_column: str, id_column: str,
               num_buckets: int = 256, out_column: str = "pos"):
    """0-based global row number under ``ORDER BY (value, id)`` — the
    value-ordered sibling of `global_rank` (which orders by the
    deterministic md5 shuffle key): rows range-bucket by the int64
    value (bucket boundaries from one scalar min/max aggregate, so a
    bucket is a contiguous value slice), per-bucket counts reduce to a
    metadata-sized exclusive prefix on the driver (O(B) state), and
    each bucket sorts locally by (value, id) and numbers a vectorized
    arange from its offset. Exactly
    ``ROW_NUMBER() OVER (ORDER BY value, id) - 1`` with no global
    sort. Heavy value skew concentrates a bucket (the shared caveat of
    every range-partitioned order op here); raise num_buckets or
    pre-salt duplicates if one value dominates."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(
        Min(value_column, alias_name="lo"), Max(value_column, alias_name="hi")
    )
    lo, hi = int(agg["lo"]), int(agg["hi"]) + 1
    w = -(-(hi - lo) // num_buckets)

    def add_rb(b: pa.Table) -> pa.Table:
        v = b[value_column].combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column(
            "rb", pa.array(((v - lo) // w).astype(np.int32))
        )

    bucketed = ds.map_batches(add_rb, batch_format="pyarrow").materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["rb"])
        return pa.table({"rb": vc.field("values"), "n": vc.field("counts")})

    counts: dict[int, int] = {}
    for row in collect_rows(
        bucketed.map_batches(partial_counts, batch_format="pyarrow")
    ):  # ≤ blocks × B metadata rows
        counts[int(row["rb"])] = counts.get(int(row["rb"]), 0) + int(row["n"])
    offsets: dict[int, int] = {}
    acc = 0
    for rb in sorted(counts):
        offsets[rb] = acc
        acc += counts[rb]

    def number(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([value_column, id_column], kind="mergesort")
        base = offsets[int(df["rb"].iloc[0])]
        df[out_column] = base + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["rb"])

    return bucketed.groupby("rb").map_groups(number, batch_format="pandas")
