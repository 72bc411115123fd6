"""Wave-66 operator pins: front-coding savings, multi-source BFS
distance, grouped weighted median."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, df):
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / f"{name}.parquet"),
    )


@pytest.mark.usefixtures("ray_session")
def test_frontcode_lcp_sum_and_cap(tmp_path):
    """Saved chars = sum of adjacent-LCP in GLOBAL sorted order (the
    cross-bucket boundary pair must be stitched), capped at 64."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        "alpha",       # lcp(alpha, alphabet) = 5
        "alphabet",    # lcp(alphabet, beta) = 0
        "beta",        # lcp(beta, betamax) = 4
        "betamax",
        "a" * 100,     # sorts FIRST; lcp(a*100, alpha) = 2... see below
    ]
    # sorted: a*100, alpha, alphabet, beta, betamax
    # lcps:   lcp(a*100, alpha)=2 via "al"? no — "a"*100 vs "alpha":
    #         common prefix is "a" (second char 'a' vs 'l') -> 1
    # total saved = 1 + 5 + 0 + 4 = 10
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
    )
    got = QUERIES["q270_frontcode_savings"](str(tmp_path))
    assert int(got["n_strings"].iloc[0]) == 5
    assert int(got["n_pairs"].iloc[0]) == 4
    assert int(got["sum_chars"].iloc[0]) == sum(len(t) for t in texts)
    assert int(got["saved_chars"].iloc[0]) == 10

    # cap: two 100-char identical strings save only 64
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["z" * 100, "z" * 100],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [100, 100],
            }
        ),
    )
    got = QUERIES["q270_frontcode_savings"](str(tmp_path))
    assert int(got["saved_chars"].iloc[0]) == 64


@pytest.mark.usefixtures("ray_session")
def test_bfs_dist_matches_reference_bfs(tmp_path):
    """Engine distances equal a single-process BFS on the same
    generated graph; nodes beyond 3 hops are absent."""
    from collections import deque

    from basicocr_ray.pipelines.queries import QUERIES

    n = 300  # seeds: 0, 97, 194, 291
    _write(tmp_path, "documents", pd.DataFrame({"doc_id": range(n)}))

    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for i in range(n):
        for j in ((i + 1) % n, (i + 2) % n, (3 * i + 1) % n):
            if i != j:
                adj[i].add(j)
                adj[j].add(i)
    dist = {s: 0 for s in range(0, n, 97)}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] == 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)

    got = (
        QUERIES["q271_bfs_dist"](str(tmp_path)).to_pandas()
        .set_index("doc_id")["dist"].to_dict()
    )
    assert got == dist
    assert 0 < len(got) < n  # some reached, some not


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_pools_ties_and_weights(tmp_path):
    """Lower weighted median: smallest v with 2*W(<=v) >= W_total;
    tied values pool their weight; a heavy single row dominates."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    # group A: cents 100 (qty 1), 200 (qty 2+2 tied), 300 (qty 1):
    # W=6, T=3 -> cum at 100 is 1, at 200 is 5 >= 3 -> median 200
    for i, (p, q_) in enumerate([(1.0, 1), (2.0, 2), (2.0, 2), (3.0, 1)]):
        rows.append(
            {"l_orderkey": i, "l_returnflag": "A",
             "l_extendedprice": p, "l_quantity": float(q_),
             "l_linestatus": "O",
             "l_shipdate": pd.Timestamp("2024-01-01")}
        )
    # group B: one heavy cheap row outweighs many expensive ones:
    # 50c qty 10 vs 900c qty 1 x 5 -> W=15, T=8 -> median 50
    rows.append(
        {"l_orderkey": 10, "l_returnflag": "B",
         "l_extendedprice": 0.5, "l_quantity": 10.0,
         "l_linestatus": "O", "l_shipdate": pd.Timestamp("2024-01-01")}
    )
    for i in range(5):
        rows.append(
            {"l_orderkey": 11 + i, "l_returnflag": "B",
             "l_extendedprice": 9.0, "l_quantity": 1.0,
             "l_linestatus": "O",
             "l_shipdate": pd.Timestamp("2024-01-01")}
        )
    _write(tmp_path, "lineitem", pd.DataFrame(rows))
    got = (
        QUERIES["q272_weighted_median"](str(tmp_path)).to_pandas()
        .set_index("l_returnflag")
    )
    assert int(got.loc["A", "wmedian_cents"]) == 200
    assert int(got.loc["A", "w_total"]) == 6
    assert int(got.loc["B", "wmedian_cents"]) == 50
    assert int(got.loc["B", "w_total"]) == 15
