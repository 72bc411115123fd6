"""Wave-32 operator pins: depth-2 deletion-neighborhood fuzzy join,
banded Levenshtein verify, interval-union coverage."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_dist_le_matches_full_dp():
    from basicocr_ray.stages.simjoin import _lev_dist_le

    rng = np.random.default_rng(11)
    alpha = "abcde"
    words = [
        "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
        for _ in range(60)
    ]
    for a, b in itertools.combinations(words, 2):
        d = _lev(a, b)
        got = _lev_dist_le(a, b, 2)
        assert got == (d if d <= 2 else None), (a, b, d, got)
    assert _lev_dist_le("same", "same", 2) == 0


def test_deletes_upto_membership():
    from basicocr_ray.stages.simjoin import _deletes_upto

    d2 = _deletes_upto("abcd", 2)
    # 1 + C(4,1) + C(4,2) distinct strings (all deletions distinct here)
    assert len(d2) == 1 + 4 + 6
    assert {"abcd", "bcd", "abc", "cd", "ab", "bd"} <= d2
    assert "a" not in d2  # depth 3


@pytest.mark.usefixtures("ray_session")
def test_editk_vocab_join_exact_vs_brute():
    """Depth-2 FastSS join is EXACT vs brute-force Levenshtein — includes
    the transposition pair ("ab"/"ba", distance 2, the classic edit-1
    false candidate), substitutions at both ends, duplicates across
    blocks, and the dist column carrying the exact distance."""
    import ray.data

    from basicocr_ray.stages.simjoin import editk_vocab_join

    vocab = [
        "spark", "spork", "stork", "park", "parks", "sharp",
        "ab", "ba", "abcd", "badc", "abc",
        "naïve", "naive", "naïves",
        "token", "tokens", "tokenize", "tokenizer",
        "spark",  # duplicate in-block
    ]
    items = [{"token": t} for t in vocab] + [{"token": t} for t in vocab[:6]]
    got = editk_vocab_join(
        ray.data.from_items(items).repartition(4), max_d=2
    ).to_pandas()
    got_set = {
        (a, b, int(d))
        for a, b, d in zip(got["tok_a"], got["tok_b"], got["dist"])
    }
    distinct = sorted({t for t in vocab if t})
    exp = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(distinct, 2)
        if _lev(a, b) <= 2
    }
    assert got_set == exp
    assert ("ab", "ba", 2) in got_set  # transposition pair found at d=2
    assert len(got) == len(got_set)  # no duplicate rows

    # salt invariance
    alt = editk_vocab_join(
        ray.data.from_items(items), max_d=2, num_salt=2
    ).to_pandas()
    assert {
        (a, b, int(d))
        for a, b, d in zip(alt["tok_a"], alt["tok_b"], alt["dist"])
    } == exp


@pytest.mark.usefixtures("ray_session")
def test_interval_coverage_vs_brute(tmp_path):
    """q170 against a hand-built events table: touching intervals merge
    (the [s, e) convention — s == prev_max is NOT a new island), nested
    intervals collapse, per-user isolation, equal-timestamp rows."""
    from basicocr_ray.pipelines.queries import QUERIES

    # dur_s = (event_id % 3600) + 60 → pick event_ids that make round durs
    base = pd.Timestamp("2024-01-01 00:00:00")

    def ev(eid, user, start_s):
        return {
            "event_id": eid,
            "ts": base + pd.Timedelta(seconds=start_s),
            "user_id": user,
            "event_type": "x",
            "value": 1.0,
            "props": "{}",
        }

    rows = [
        # user 1: [0, 60+0=60) via eid 0; touching [60, 120) via eid 0+3600
        ev(0, 1, 0), ev(3600, 1, 60),
        # user 1: disjoint [1000, 1070) (eid 10 → dur 70)
        ev(10, 1, 1000),
        # user 2: nested — [0, 3660) (eid 3599 → dur 3659s? no: 3599%3600+60
        # = 3659) containing [5, 125) (eid 60 → dur 120)
        ev(3599, 2, 0), ev(60, 2, 5),
        # user 3: two rows at the SAME ts, different ids
        ev(7, 3, 0), ev(8, 3, 0),
    ]
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (
        QUERIES["q170_interval_coverage"](str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )

    def brute(intervals):
        ivs = sorted(intervals)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        return len(islands), sum(e - s for s, e in islands)

    exp = {}
    for _, r in df.iterrows():
        s = int((r["ts"] - base).total_seconds() * 1_000_000)
        e = s + ((int(r["event_id"]) % 3600) + 60) * 1_000_000
        exp.setdefault(int(r["user_id"]), []).append((s, e))
    for u, ivs in sorted(exp.items()):
        n, cov = brute(ivs)
        row = got[got["user_id"] == u].iloc[0]
        assert int(row["n_islands"]) == n, u
        assert int(row["covered_us"]) == cov, u
    # user 1: the touching pair merged into one island
    assert int(got[got["user_id"] == 1].iloc[0]["n_islands"]) == 2
    # user 2: nested pair is one island
    assert int(got[got["user_id"] == 2].iloc[0]["n_islands"]) == 1
