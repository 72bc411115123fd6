"""Engine/data-ops: rollups, profiling, compaction, resharding, partitioned IO (S2/G7).

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

from ._shared import (
    _read,
    _round_half_up,
)


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


def q333_hive_partition_roundtrip(sf_dir: str):
    """HIVE-PARTITIONED WRITE→READ ROUNDTRIP — the partitioned-layout
    engine path (resumable output is one directory per key): documents
    stream out as lang=<v>/ *.parquet (gzip codec) via Ray's
    partition-cols writer, read back WITH the partition column
    reconstructed from the directory names (it is not stored in the
    files), and the per-lang rollup must match the source table.
    Scratch dir is content-addressed by sf_dir so concurrent scales
    don't collide."""
    import hashlib as _hashlib
    import shutil

    import ray.data

    from basicocr_ray.stages.wide import coarse_group_reduce

    out_dir = "/tmp/q333_%s" % _hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    ds.write_parquet(
        out_dir,
        partition_cols=["lang"],
        arrow_parquet_args_fn=lambda: {"compression": "gzip"},
    )

    back = ray.data.read_parquet(
        out_dir, columns=["doc_id", "n_chars", "lang"]
    )  # lang inferred from partition dirs

    def part(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("lang", as_index=False).agg(
            n=("doc_id", "size"), chars=("n_chars", "sum")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"].astype(str), pa.string()),
                "n": pa.array(g["n"].astype(np.int64)),
                "chars": pa.array(g["chars"].astype(np.int64)),
            }
        )

    out = coarse_group_reduce(
        back.map_batches(part, batch_format="pyarrow"),
        "lang",
        lambda df: df.groupby("lang", as_index=False)[["n", "chars"]]
        .sum()
        .astype({"n": "int64", "chars": "int64"}),
    ).to_pandas()
    shutil.rmtree(out_dir, ignore_errors=True)
    if len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "lang": pd.array([], dtype="object"),
                "n": pd.array([], dtype="int64"),
                "chars": pd.array([], dtype="int64"),
            }
        )
    return out


__all__ = [
    "q09_lang_rollup",
    "q58_rollup_docs",
    "q99_quantile_floor",
    "q138_group_mad",
    "q154_group_regression",
    "q165_migration_checksum",
    "q180_compaction_plan",
    "q185_range_splits",
    "q190_reshard_churn",
    "q194_benford_audit",
    "q333_hive_partition_roundtrip",
]


QUERIES = {
    "q09_lang_rollup": q09_lang_rollup,
    "q58_rollup_docs": q58_rollup_docs,
    "q99_quantile_floor": q99_quantile_floor,
    "q138_group_mad": q138_group_mad,
    "q154_group_regression": q154_group_regression,
    "q165_migration_checksum": q165_migration_checksum,
    "q180_compaction_plan": q180_compaction_plan,
    "q185_range_splits": q185_range_splits,
    "q190_reshard_churn": q190_reshard_churn,
    "q194_benford_audit": q194_benford_audit,
    "q333_hive_partition_roundtrip": q333_hive_partition_roundtrip,
}


ORACLE_SQL = {
    "q09_lang_rollup": """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_chars
        FROM documents GROUP BY lang
    """,
    "q58_rollup_docs": """
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP(lang, source)
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
    "q333_hive_partition_roundtrip": """
        -- the partitioned write->read must preserve every row and the
        -- lang value reconstructed from directory names
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY lang
    """,
}
