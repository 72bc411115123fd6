"""Bucketed hash join + distributed k-means."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_matches_pandas():
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {"k": rng.integers(0, 50, 300), "lv": rng.integers(0, 1000, 300)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 50, 120), "rv": rng.integers(0, 1000, 120)}
    )
    got = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], ["rv"], num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)[["k", "lv", "rv"]]
    )
    assert got[["k", "lv", "rv"]].astype("int64").equals(want.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_no_matches():
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    left = pd.DataFrame({"k": [1, 2], "lv": [10, 20]})
    right = pd.DataFrame({"k": [3, 4], "rv": [30, 40]})
    got = bucketed_hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        "k", ["lv"], ["rv"], num_buckets=4,
    ).to_pandas()
    assert len(got) == 0


@pytest.mark.usefixtures("ray_session")
def test_kmeans_recovers_clusters():
    import ray.data

    from basicocr_ray.stages.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 64)) * 10
    m = np.vstack([centers[i % 4] + 0.2 * rng.standard_normal(64)
                   for i in range(400)])
    rows = [{"vec_id": i, "embedding": m[i].tolist()} for i in range(400)]
    ds = ray.data.from_items(rows)
    centroids = kmeans_fit(ds, k=4, n_iters=10)
    assigned = kmeans_assign(ds, centroids).to_pandas()
    # every true cluster maps to exactly one learned cluster
    assigned["truth"] = assigned["vec_id"] % 4
    purity = (
        assigned.groupby("truth")["cluster"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity == 1.0
    # determinism across runs
    c2 = kmeans_fit(ray.data.from_items(rows), k=4, n_iters=10)
    assert np.array_equal(centroids, c2)


@pytest.mark.usefixtures("ray_session")
def test_interval_join_boundaries_and_spans():
    """Range-join semantics: inclusive start, exclusive end, overlapping
    windows produce one row per containing window, a whole-domain interval
    matches everything exactly once (replica dedup), empty intervals drop."""
    import pyarrow as pa
    import ray.data

    from basicocr_ray.stages.joins import interval_join

    points = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(list(range(8)), pa.int64()),
                "v": pa.array([0, 5, 10, 15, 99, 100, 150, 250], pa.int64()),
            }
        )
    )
    intervals = ray.data.from_arrow(
        pa.table(
            {
                "iid": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "lo": pa.array([0, 10, 10, 500, 0], pa.int64()),
                "hi": pa.array([10, 100, 20, 400, 1000], pa.int64()),
            }
        )
    )  # iid=3 is empty-range-free but unmatched; iid=4 spans everything

    out = interval_join(
        points, intervals,
        point_column="v", start_column="lo", end_column="hi",
        point_columns=["pid", "v"], interval_columns=["iid"],
        bucket_width=16, num_buckets=4,
    ).to_pandas()
    got = sorted(zip(out["pid"], out["iid"]))
    expect = sorted(
        [(0, 0), (1, 0), (2, 1), (2, 2), (3, 1), (3, 2), (4, 1)]
        + [(p, 4) for p in range(8)]  # whole-domain window: each point once
    )
    assert got == expect


@pytest.mark.usefixtures("ray_session")
def test_interval_join_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from basicocr_ray.stages.joins import interval_join

    rng = np.random.default_rng(13)
    pv = rng.integers(0, 10_000, size=2000).astype(np.int64)
    lo = rng.integers(0, 9_500, size=60).astype(np.int64)
    ln = rng.integers(1, 800, size=60).astype(np.int64)
    hi = lo + ln
    points = ray.data.from_arrow(
        pa.table({"pid": pa.array(range(2000), pa.int64()),
                  "v": pa.array(pv, pa.int64())})
    )
    intervals = ray.data.from_arrow(
        pa.table({"iid": pa.array(range(60), pa.int64()),
                  "lo": pa.array(lo, pa.int64()),
                  "hi": pa.array(hi, pa.int64())})
    )
    out = interval_join(
        points, intervals,
        point_column="v", start_column="lo", end_column="hi",
        point_columns=["pid"], interval_columns=["iid"],
        bucket_width=512, num_buckets=8,
    ).to_pandas()
    got = sorted(zip(out["pid"], out["iid"]))
    expect = sorted(
        (int(p), int(i))
        for p in range(2000)
        for i in range(60)
        if lo[i] <= pv[p] < hi[i]
    )
    assert got == expect


def test_pagerank_scaled_int_matches_reference():
    """Exact-integer PageRank equals a driver-side reference computation
    regardless of input partitioning / bucket count / salt count, and
    contributions to ids absent from the node table are dropped."""
    import numpy as np
    import pandas as pd
    import ray.data

    from basicocr_ray.stages.graph import pagerank_scaled_int

    H = 12
    rng = [(h, (h * 3 + 1) % H, (h * 5 + 2) % H, (h * 7 + 4) % H)
           for h in range(H)]
    nodes = pd.DataFrame({"h": range(H), "mass": [(h % 4) + 1 for h in range(H)]})
    edges = pd.DataFrame(
        {"src": [r[0] for r in rng for _ in range(3)],
         "dst": [d for r in rng for d in r[1:]]}
    )
    # drop node 11 from the node table: edges into it must vanish,
    # edges out of it too (its rank rows never exist)
    nodes = nodes[nodes["h"] != 11].reset_index(drop=True)
    edges_kept = edges[edges["src"] != 11].reset_index(drop=True)
    # NB out-degree contract still holds for remaining nodes

    def reference(iters=3):
        x = {int(r.h): int(r.mass) for r in nodes.itertuples()}
        scale = 1
        for _ in range(iters):
            inc = {h: 0 for h in x}
            for r in edges_kept.itertuples():
                if int(r.dst) in inc and int(r.src) in x:
                    inc[int(r.dst)] += x[int(r.src)]
            x = {
                h: 9 * scale * int(nodes.loc[nodes.h == h, "mass"].iloc[0])
                + 17 * inc[h]
                for h in x
            }
            scale *= 60
        return x, scale

    want, want_scale = reference()
    for nblocks, buckets, salts in [(1, 2, 4), (5, 4, 8)]:
        nds = ray.data.from_pandas(nodes).repartition(nblocks)
        eds = ray.data.from_pandas(edges_kept).repartition(nblocks)
        out, scale = pagerank_scaled_int(
            nds, eds, iters=3, num_buckets=buckets, num_salt=salts
        )
        got = out.to_pandas().sort_values("h").reset_index(drop=True)
        assert scale == want_scale
        assert {int(r.h): int(r.x) for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_adaptive_semi_anti_join_branches_agree():
    """Broadcast and shuffle branches of the adaptive semi/anti join must
    return identical rows — the branch is picked on MEASURED bytes, so
    both must be live and equal (the components fast-path discipline)."""
    import ray.data

    from basicocr_ray.stages.joins import adaptive_semi_anti_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 80, 400),
            "a": rng.integers(0, 1000, 400),
            "b": [f"t{i}" for i in range(400)],
        }
    )
    keys = pd.DataFrame({"k": rng.choice(80, 30, replace=False)})

    def run(join_type, broadcast_bytes):
        ds = adaptive_semi_anti_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(keys).materialize(),
            "k", ["a", "b"], join_type=join_type,
            broadcast_bytes=broadcast_bytes,
        )
        return (
            ds.to_pandas()
            .astype({"k": "int64", "a": "int64"})
            .sort_values(["k", "a", "b"])
            .reset_index(drop=True)
        )

    keyset = set(keys["k"].tolist())
    for join_type, member in (("left semi", True), ("left anti", False)):
        broadcast = run(join_type, 64 << 20)  # small side: broadcast path
        shuffled = run(join_type, 0)  # forced shuffle path
        want = (
            left[left["k"].isin(keyset) == member][["k", "a", "b"]]
            .astype({"k": "int64", "a": "int64"})
            .sort_values(["k", "a", "b"])
            .reset_index(drop=True)
        )
        assert broadcast.equals(want), join_type
        assert shuffled.equals(want), join_type

    # string keys take the frozenset branch; empty key set is the
    # degenerate fast path (anti keeps all, semi keeps none)
    sleft = left.assign(k=left["k"].astype(str))
    skeys = pd.DataFrame({"k": [str(k) for k in sorted(keyset)][:10]})
    got = adaptive_semi_anti_join(
        ray.data.from_pandas(sleft),
        ray.data.from_pandas(skeys).materialize(),
        "k", ["a", "b"], join_type="left semi",
    ).to_pandas()
    assert set(got["k"]) == set(skeys["k"]) & set(sleft["k"])
    empty = pd.DataFrame({"k": pd.array([], dtype="int64")})
    anti_all = adaptive_semi_anti_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(empty).materialize(),
        "k", ["a", "b"], join_type="left anti",
    )
    assert anti_all.count() == len(left)
    semi_none = adaptive_semi_anti_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(empty).materialize(),
        "k", ["a", "b"], join_type="left semi",
    )
    assert semi_none.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_adaptive_semi_anti_join_null_keys():
    """Null left keys match NOTHING (EXISTS semantics) on both branches —
    the int broadcast path must not let the NaN→int64 fill value
    accidentally collide with a real key."""
    import ray.data

    from basicocr_ray.stages.joins import adaptive_semi_anti_join

    left = pd.DataFrame(
        {
            "k": pd.array([1, None, 2, 0, None], dtype="Int64"),
            "a": [10, 20, 30, 40, 50],
        }
    )
    # 0 is a real key AND the fill_null sentinel — a null row must not
    # match it
    keys = pd.DataFrame({"k": pd.array([0, 2], dtype="Int64")})
    for broadcast_bytes in (64 << 20, 0):
        semi = adaptive_semi_anti_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(keys).materialize(),
            "k", ["a"], join_type="left semi",
            broadcast_bytes=broadcast_bytes,
        ).to_pandas()
        assert sorted(semi["a"].tolist()) == [30, 40], broadcast_bytes
        anti = adaptive_semi_anti_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(keys).materialize(),
            "k", ["a"], join_type="left anti",
            broadcast_bytes=broadcast_bytes,
        ).to_pandas()
        assert sorted(anti["a"].tolist()) == [10, 20, 50], broadcast_bytes
