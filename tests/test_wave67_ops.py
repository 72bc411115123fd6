"""Wave-67 operator pins: Kendall inversion evidence, greedy set
cover, deterministic min-hash walk."""

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
def test_kendall_counts_match_brute_force(tmp_path):
    """Fenwick inversion count equals the O(n^2) definition, ties
    pooled, concordant = C(n,2) - inv - ties."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-01-01")
    vals = [3.0, 1.0, 2.0, 2.0, 5.0, 1.0]
    rows = [
        {"event_id": i, "ts": base + pd.Timedelta(minutes=i),
         "user_id": 7, "event_type": "x", "value": v}
        for i, v in enumerate(vals)
    ]
    # single-event user: all-zero pair counts
    rows.append(
        {"event_id": 99, "ts": base, "user_id": 8,
         "event_type": "x", "value": 1.0}
    )
    _write(tmp_path, "events", pd.DataFrame(rows))

    c = [int(v * 100) for v in vals]
    n = len(c)
    inv = sum(
        1 for i in range(n) for j in range(i + 1, n) if c[i] > c[j]
    )
    ties = sum(
        1 for i in range(n) for j in range(i + 1, n) if c[i] == c[j]
    )
    got = (
        QUERIES["q273_kendall_evidence"](str(tmp_path)).to_pandas()
        .set_index("user_id")
    )
    assert int(got.loc[7, "inversions"]) == inv
    assert int(got.loc[7, "tie_pairs"]) == ties
    assert int(got.loc[7, "concordant"]) == n * (n - 1) // 2 - inv - ties
    assert int(got.loc[8, "n_events"]) == 1
    assert int(got.loc[8, "inversions"]) == 0
    assert int(got.loc[8, "concordant"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_set_cover_greedy_rounds_and_early_stop(tmp_path):
    """Greedy picks the doc-coverage argmax each round (tie: smallest
    token), counts only NEWLY covered docs, and stops when the
    universe is exhausted."""
    from basicocr_ray.pipelines.queries import QUERIES

    docs = [
        "a b",    # 0
        "a b",    # 1
        "a c",    # 2
        "c d",    # 3
        "d",      # 4
    ]
    # 'a' covers {0,1,2} (argmax). then 'd' covers {3,4} -> done in 2.
    _write(
        tmp_path,
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": docs,
                "lang": ["en"] * len(docs),
                "source": ["s"] * len(docs),
                "n_chars": [len(t) for t in docs],
            }
        ),
    )
    got = QUERIES["q274_greedy_set_cover"](str(tmp_path))
    assert got["token"].tolist() == ["a", "d"]
    assert got["newly_covered"].tolist() == [3, 2]
    assert got["covered_total"].tolist() == [3, 5]


@pytest.mark.usefixtures("ray_session")
def test_minhash_walk_matches_reference_walk(tmp_path):
    """Engine walk equals a single-process argmin-md5 walk on the same
    generated graph, including the step-keyed hash."""
    from basicocr_ray.core.textstats import md5_low64
    from basicocr_ray.pipelines.queries import QUERIES

    n = 250  # seeds: 0, 101, 202
    _write(tmp_path, "documents", pd.DataFrame({"doc_id": range(n)}))

    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for i in range(n):
        for j in ((i + 1) % n, (i + 2) % n, (3 * i + 1) % n):
            if i != j:
                adj[i].add(j)
                adj[j].add(i)

    expect = {}
    for s in range(0, n, 101):
        node = s
        expect[(s, 0)] = s
        for step in (1, 2, 3):
            node = min(
                adj[node],
                key=lambda v, u=node, st=step: (
                    md5_low64(f"{st}:{u}:{v}"), v
                ),
            )
            expect[(s, step)] = node

    got = QUERIES["q275_minhash_walk"](str(tmp_path)).to_pandas()
    got_map = {
        (int(r.seed), int(r.step)): int(r.node)
        for r in got.itertuples()
    }
    assert got_map == expect
