"""Wave-111 operator pins: A*, bracket audit, lexicographic toposort."""

from __future__ import annotations

import heapq

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, texts):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["s"] * len(texts),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_astar_equals_dijkstra_on_grid():
    """A* with Manhattan heuristic (weights >= 1) must equal plain
    Dijkstra on a handmade 8x4 grid graph."""
    edges = []
    for n in range(32):
        x, y = n % 8, n // 8
        if x < 7:
            edges.append((n, n + 1))
        if y < 3:
            edges.append((n, n + 8))
    adj = {}
    for a, b in edges:
        w = 1 + (a * b) % 7
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    T = 31

    def dijkstra():
        dist = {0: 0}
        pq_ = [(0, 0)]
        while pq_:
            g, v = heapq.heappop(pq_)
            if g > dist.get(v, 1 << 60):
                continue
            for w, c in adj.get(v, ()):
                if g + c < dist.get(w, 1 << 60):
                    dist[w] = g + c
                    heapq.heappush(pq_, (g + c, w))
        return dist.get(T, -1)

    def astar():
        def h(n):
            return abs(n % 8 - 7) + abs(n // 8 - 3)

        dist = {0: 0}
        pq_ = [(h(0), 0, 0)]
        while pq_:
            f, g, v = heapq.heappop(pq_)
            if v == T:
                return g
            if g > dist.get(v, 1 << 60):
                continue
            for w, c in adj.get(v, ()):
                if g + c < dist.get(w, 1 << 60):
                    dist[w] = g + c
                    heapq.heappush(pq_, (g + c + h(w), g + c, w))
        return -1

    assert astar() == dijkstra()


@pytest.mark.usefixtures("ray_session")
def test_bracket_audit_cases(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(
        tmp_path,
        [
            "(a[b]{c})",     # balanced depth 3... ([{ nested? no:
            "([)]",          # wrong-type close: 2 mismatches? trace
            "((("            # unclosed
        ],
    )
    got = (
        QUERIES["q400_bracket_audit"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: ( [ ] { } ) -> max depth 2 interleaved? stack: ( [ -> 2,
    # pop ], { -> 2, pop }, pop ) -> balanced, depth 2
    assert got.loc[0].tolist() == [0, True, 2, 0]
    # doc 1: ( [ then ) pops [ with mismatch, ] pops ( with mismatch
    assert got.loc[1].tolist() == [1, False, 2, 2]
    assert got.loc[2].tolist() == [2, False, 3, 0]
    assert not got.loc[2, "balanced"]  # unclosed


def test_toposort_priority_dag_nontrivial():
    """Edges directed along pri(n)=17n%32: node order != pri order, so
    Kahn's node-lexicographic output differs from plain sorted when a
    small node depends on a bigger one."""
    pri = {n: (17 * n) % 32 for n in range(32)}
    # pri[2]=2, pri[4]=4... pick a, b with pri inversion: pri[15]=31,
    # pri[16]=16 -> edge (15,16) directs 16 -> 15
    a, b = 15, 16
    assert pri[b] < pri[a]
    edges = [(b, a)]  # 16 before 15
    nodes = [15, 16]
    indeg = {15: 1, 16: 0}
    heap = [n for n in nodes if indeg[n] == 0]
    heapq.heapify(heap)
    order = []
    adj = {16: [15], 15: []}
    while heap:
        v = heapq.heappop(heap)
        order.append(v)
        for w in adj[v]:
            indeg[w] -= 1
            if indeg[w] == 0:
                heapq.heappush(heap, w)
    assert order == [16, 15]  # NOT sorted by node id
