"""Graph propagation operators (link-analysis family).

The web-scale companions to the dedup family's connected components
(`stages/dedup.py:neardup_components` — join-based min-label propagation):
here the propagated quantity is a WEIGHTED mass, not a label. Same
execution discipline — each round is one bucketed hash join (SpMV:
ranks ⋈ edges on src, with per-dst pre-sums fused into the join bucket)
plus ONE fused keyed aggregation that combines the contribution sums with
the node table's teleport mass (a union-groupby, not a second join) —
rows shuffle twice per round total, nothing materializes on the driver.

Exactness: PageRank over doubles is not hash-checkable across engines
(per-node accumulation order drifts ulps), so `pagerank_scaled_int`
carries EXACT INTEGER numerators of the rational rank values — possible
whenever every node has the same out-degree M (true by construction for
synthetic host graphs; a general graph can be regularized by padding
self-loops). With damping d = damp_num/damp_den and teleport vector
t(v) = mass(v)/N:

    pr_{k+1}(v) = (1 - d)·t(v) + d · Σ_{u→v} pr_k(u)/M

scale x_k = pr_k · N · (damp_den·M)^k, and the recurrence becomes pure
int64:

    x_0(v)     = mass(v)
    x_{k+1}(v) = (damp_den−damp_num)·M·(damp_den·M)^k · mass(v)
                 + damp_num · Σ_{u→v} x_k(u)

Magnitudes stay ≤ N·(damp_den·M)^k (total mass is conserved), so int64
holds for k ≤ 9 at N = 10¹² with the default 17/20 damping and M = 3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from basicocr_ray.stages.joins import bucketed_hash_join


def pagerank_scaled_int(
    nodes_ds,
    edges_ds,
    iters: int = 3,
    damp_num: int = 17,
    damp_den: int = 20,
    out_degree: int = 3,
    node_column: str = "h",
    mass_column: str = "mass",
    num_buckets: int = 32,
    num_salt: int | None = None,
):
    """nodes(node, mass) × edges(src, dst) → Dataset(node, mass, x) after
    ``iters`` rounds of the exact-integer recurrence above, plus the final
    scale (x / (N·scale) is the rank; N = Σ mass).

    Contract: every node has exactly ``out_degree`` out-edges counting
    multiplicity — that invariant keeps the arithmetic integer. Nodes
    with no IN-edges keep their teleport term; contributions to ids not
    in the node table are dropped (the graph is the node table).

    Each round's rank relation is materialized — rounds are sequential
    by nature, and re-deriving round k lazily would re-run all k joins.
    The combine groupby runs inside cluster-sized coarse hash groups
    (the count_terms discipline), so node-table cardinality never feeds
    a raw high-cardinality Ray aggregate."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (x_0 is the mass baseline)")

    from basicocr_ray.stages.wide import coarse_group_reduce

    nodes_typed = nodes_ds.map_batches(
        lambda b: pa.table(
            {
                node_column: pc.cast(b[node_column], pa.int64()),
                mass_column: pc.cast(b[mass_column], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    edges_m = edges_ds.map_batches(
        lambda b: pa.table(
            {
                "src": pc.cast(b["src"], pa.int64()),
                "dst": pc.cast(b["dst"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def tag_nodes(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b[node_column],
                "mass": b[mass_column],
                "inc": pa.array(np.zeros(n, dtype=np.int64)),
                "tag": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged_nodes = nodes_typed.map_batches(
        tag_nodes, batch_format="pyarrow"
    ).materialize()

    ranks = nodes_typed.map_batches(
        lambda b: pa.table(
            {"src": b[node_column], "x": b[mass_column]}
        ),
        batch_format="pyarrow",
    ).materialize()

    def presum_by_dst(t: pa.Table) -> pa.Table:
        out = (
            pa.table({"dst": t["dst"], "x": t["x"]})
            .group_by("dst")
            .aggregate([("x", "sum")])
        )
        n = out.num_rows
        return pa.table(
            {
                "k": out["dst"],
                "mass": pa.array(np.zeros(n, dtype=np.int64)),
                "inc": out["x_sum"],
                "tag": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    scale = 1  # (damp_den·M)^k
    tele_base = (damp_den - damp_num) * out_degree
    for _ in range(iters):
        contrib = bucketed_hash_join(
            ranks, edges_m, key="src",
            left_columns=["x"], right_columns=["dst"],
            bucket_post_fn=presum_by_dst, num_buckets=num_buckets,
        )

        tele_coef = tele_base * scale

        def combine(df: pd.DataFrame, _coef=tele_coef) -> pd.DataFrame:
            g = df.groupby("k", as_index=False).agg(
                mass=("mass", "sum"), inc=("inc", "sum"),
                node=("tag", "max"),
            )
            g = g[g["node"] == 1]
            out = pd.DataFrame(
                {
                    node_column: g["k"].astype("int64"),
                    mass_column: g["mass"].astype("int64"),
                    "x": (_coef * g["mass"] + damp_num * g["inc"]).astype(
                        "int64"
                    ),
                }
            )
            return out

        ranked = coarse_group_reduce(
            contrib.union(tagged_nodes), "k", combine, num_salt=num_salt
        ).materialize()
        ranks = ranked.map_batches(
            lambda b: pa.table({"src": b[node_column], "x": b["x"]}),
            batch_format="pyarrow",
        ).materialize()
        scale *= damp_den * out_degree

    return ranked, scale


def propagate_sum_int(
    vec_ds,
    edges_ds,
    nodes_ds,
    node_column: str = "h",
    value_column: str = "x",
    num_buckets: int = 32,
    num_salt: int | None = None,
):
    """ONE round of integer SpMV: vec(node, x) × edges(src, dst) →
    Dataset(node, x) with out.x(v) = Σ_{u→v} vec.x(u), and 0 for nodes
    of ``nodes_ds`` with no in-edges. The building block HITS-style
    alternating propagation shares with `pagerank_scaled_int`: the
    contribution pass is one bucketed hash join (per-dst pre-sums fused
    into the join bucket, so only (dst, partial) rows leave it) and the
    zero-fill is a union-groupby with the node table — rows shuffle
    twice, nothing node/edge-scale touches the driver. Contributions to
    ids absent from ``nodes_ds`` are dropped (the graph is the node
    table)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    def tag_nodes(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": pc.cast(b[node_column], pa.int64()),
                "inc": pa.array(np.zeros(n, dtype=np.int64)),
                "tag": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged_nodes = nodes_ds.map_batches(tag_nodes, batch_format="pyarrow")

    vec_keyed = vec_ds.map_batches(
        lambda b: pa.table(
            {
                "src": pc.cast(b[node_column], pa.int64()),
                "x": pc.cast(b[value_column], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def presum_by_dst(t: pa.Table) -> pa.Table:
        out = (
            pa.table({"dst": t["dst"], "x": t["x"]})
            .group_by("dst")
            .aggregate([("x", "sum")])
        )
        n = out.num_rows
        return pa.table(
            {
                "k": pc.cast(out["dst"], pa.int64()),
                "inc": pc.cast(out["x_sum"], pa.int64()),
                "tag": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    contrib = bucketed_hash_join(
        vec_keyed, edges_ds, key="src",
        left_columns=["x"], right_columns=["dst"],
        bucket_post_fn=presum_by_dst, num_buckets=num_buckets,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).agg(
            inc=("inc", "sum"), node=("tag", "max")
        )
        g = g[g["node"] == 1]
        return pd.DataFrame(
            {
                node_column: g["k"].astype("int64"),
                value_column: g["inc"].astype("int64"),
            }
        )

    return coarse_group_reduce(
        contrib.union(tagged_nodes), "k", combine, num_salt=num_salt
    )
