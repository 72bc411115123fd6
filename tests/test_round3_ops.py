"""Round-3 operators: anti/semi join, weighted sampling, ROLLUP,
grouped exact quantile, grouped knn self-join."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_anti_and_semi_join_match_pandas():
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 200), "lv": rng.integers(0, 1000, 200)}
    )
    right = pd.DataFrame({"k": rng.integers(0, 80, 60)})

    anti = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], [], num_buckets=8, join_type="left anti",
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want_anti = (
        left[~left["k"].isin(right["k"])]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert anti[["k", "lv"]].astype("int64").equals(
        want_anti[["k", "lv"]].astype("int64")
    )

    semi = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], [], num_buckets=8, join_type="left semi",
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want_semi = (
        left[left["k"].isin(right["k"])]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    # semi join must NOT duplicate left rows on duplicate right keys
    assert semi[["k", "lv"]].astype("int64").equals(
        want_semi[["k", "lv"]].astype("int64")
    )


def test_join_type_validation():
    from basicocr_ray.stages.joins import bucketed_hash_join

    with pytest.raises(ValueError, match="join_type"):
        bucketed_hash_join(None, None, "k", [], [], join_type="right anti")
    with pytest.raises(ValueError, match="left columns only"):
        bucketed_hash_join(None, None, "k", [], ["rv"], join_type="left anti")


@pytest.mark.usefixtures("ray_session")
def test_left_outer_join_matches_pandas():
    """Left outer keeps unmatched left rows with null right columns and
    fans out on duplicate right keys, exactly like a pandas left merge —
    including buckets whose right side is entirely empty."""
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 200), "lv": rng.integers(0, 1000, 200)}
    )
    # right keys only in [20, 60): half the left keys have no match, and
    # with 8 buckets some buckets see no right rows at all
    right = pd.DataFrame(
        {"k": rng.integers(20, 60, 60), "rv": rng.integers(0, 9, 60)}
    )

    got = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], ["rv"], num_buckets=8, join_type="left outer",
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="left")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["k"].astype("int64").equals(want["k"].astype("int64"))
    assert got["lv"].astype("int64").equals(want["lv"].astype("int64"))
    # rv is nullable: compare with nulls aligned
    assert got["rv"].astype("Int64").equals(want["rv"].astype("Int64"))
    assert got["rv"].isna().any()  # unmatched rows actually occurred


@pytest.mark.usefixtures("ray_session")
def test_weighted_bottomk_partition_invariant_and_weighted():
    import ray.data

    from basicocr_ray.stages.sample import weighted_bottomk

    n = 2000
    # ids < 1000 get weight 100, the rest weight 1
    df = pd.DataFrame(
        {"id": np.arange(n), "w": np.where(np.arange(n) < 1000, 100.0, 1.0)}
    )

    def run(num_blocks: int) -> list[int]:
        ds = ray.data.from_pandas(df).repartition(num_blocks)
        out = weighted_bottomk(ds, "id", "w", k=100).to_pandas()
        return out["id"].tolist()

    a, b = run(1), run(7)
    assert a == b  # partition-invariant
    heavy = sum(1 for i in a if i < 1000)
    # E[heavy] ≈ 100 * (100*1000)/(100*1000+1000) ≈ 99
    assert heavy > 90

    # exact A-ES semantics vs a local reference implementation
    from basicocr_ray.core.textstats import md5_hex

    u = np.array(
        [int(md5_hex(str(i))[:8], 16) + 1 for i in df["id"]], np.float64
    ) / 4294967296.0
    key = -np.log(u) / df["w"].to_numpy()
    want = df["id"].to_numpy()[np.lexsort((df["id"], key))][:100]
    assert a == sorted(a, key=lambda i: (key[i], i))
    assert set(a) == set(want.tolist())


@pytest.mark.usefixtures("ray_session")
def test_weighted_bottomk_rejects_nonpositive():
    import ray.data

    from basicocr_ray.stages.sample import weighted_bottomk

    ds = ray.data.from_pandas(pd.DataFrame({"id": [1, 2], "w": [1.0, 0.0]}))
    with pytest.raises(Exception, match="positive weights"):
        weighted_bottomk(ds, "id", "w", k=1).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_rollup_counts_matches_pandas():
    import ray.data

    from basicocr_ray.stages.wide import rollup_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 500),
            "b": rng.choice(["p", "q"], 500),
            "v": rng.integers(0, 100, 500),
        }
    )
    got = (
        rollup_counts(
            ray.data.from_pandas(df).repartition(5),
            ["a", "b"], "v", n_name="n", sum_name="s",
        )
        .to_pandas()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    finest = df.groupby(["a", "b"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum")
    )
    lvl1 = df.groupby(["a"], as_index=False).agg(n=("v", "size"), s=("v", "sum"))
    lvl1["b"] = None
    total = pd.DataFrame(
        {"a": [None], "b": [None], "n": [len(df)], "s": [df["v"].sum()]}
    )
    want = (
        pd.concat([finest, lvl1, total], ignore_index=True)[
            ["a", "b", "n", "s"]
        ]
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("a", "b"):
        assert [x if pd.notna(x) else None for x in got[c]] == [
            x if pd.notna(x) else None for x in want[c]
        ]
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()
    assert got["s"].astype("int64").tolist() == want["s"].astype("int64").tolist()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("q_num,q_den", [(9, 10), (1, 2), (1, 4), (1, 1)])
def test_grouped_quantile_disc_exact(q_num, q_den):
    import ray.data

    from basicocr_ray.stages.wide import grouped_quantile_disc

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 3000),
            "v": np.round(rng.normal(50, 20, 3000), 3),
        }
    )
    # duplicate-heavy group: one value dominating its histogram bucket
    dup = pd.DataFrame({"g": ["d"] * 500, "v": [7.0] * 400 + [9.0] * 100})
    # constant group (hi == lo → zero-width histogram)
    const = pd.DataFrame({"g": ["e"] * 50, "v": [3.25] * 50})
    df = pd.concat([df, dup, const], ignore_index=True)

    got = (
        grouped_quantile_disc(
            ray.data.from_pandas(df).repartition(6), "g", "v", q_num, q_den
        )
        .to_pandas()
        .set_index("g")["q_value"]
        .to_dict()
    )
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        idx = math.ceil(q_num * len(vals) / q_den) - 1  # quantile_disc
        assert got[g] == vals[idx], (g, q_num, q_den)


def test_grouped_quantile_validates_q():
    from basicocr_ray.stages.wide import grouped_quantile_disc

    with pytest.raises(ValueError):
        grouped_quantile_disc(None, "g", "v", 0, 10)
    with pytest.raises(ValueError):
        grouped_quantile_disc(None, "g", "v", 11, 10)


@pytest.mark.usefixtures("ray_session")
def test_knn_self_join_grouped_golden():
    import ray.data

    from basicocr_ray.stages.embed import knn_self_join_grouped

    # group 1: four unit vectors at known angles; group 2: a singleton
    df = pd.DataFrame(
        {
            "vec_id": [10, 11, 12, 13, 99],
            "label": [1, 1, 1, 1, 2],
            "embedding": [
                [1.0, 0.0], [0.0, 1.0],
                [math.sqrt(0.5), math.sqrt(0.5)], [-1.0, 0.0],
                [1.0, 1.0],
            ],
        }
    )
    out = (
        knn_self_join_grouped(ray.data.from_pandas(df), k=2)
        .to_pandas()
        .sort_values(["vec_id", "nbr_rank"])
        .reset_index(drop=True)
    )
    # singleton group emits nothing
    assert 99 not in set(out["vec_id"])
    by = {
        (r.vec_id, r.nbr_rank): r.nbr_id for r in out.itertuples()
    }
    assert by[(10, 1)] == 12  # cos 45° beats orthogonal
    assert by[(11, 1)] == 12
    assert by[(12, 1)] in (10, 11)  # tie at cos 45° → smaller id
    assert by[(12, 1)] == 10 and by[(12, 2)] == 11
    assert by[(13, 1)] == 11  # -x: best is orthogonal y (cos 0)


@pytest.mark.usefixtures("ray_session")
def test_spec_ops_round3():
    """The new operators are reachable through the config-driven spec
    surface (S5): join (anti), sample (weighted), rollup, group_quantile."""
    from basicocr_ray.pipelines.spec import run_spec

    sf = "/root/testdata/sf0.001"

    import duckdb

    anti = run_spec(
        {
            "input": {"table": "customer", "columns": ["c_custkey", "c_acctbal"]},
            "steps": [
                {
                    "op": "join", "right": "orders",
                    "right_columns": ["o_custkey"], "key": "c_custkey",
                    "left_columns": ["c_acctbal"],
                    "right_rename": {"o_custkey": "c_custkey"},
                    "join_type": "left anti",
                },
            ],
        },
        sf,
    ).to_pandas()
    n_no_orders = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{sf}/customer.parquet') c "
        f"WHERE NOT EXISTS (SELECT 1 FROM "
        f"parquet_scan('{sf}/orders.parquet') o "
        f"WHERE o.o_custkey = c.c_custkey)"
    ).fetchone()[0]
    assert len(anti) == n_no_orders

    wq = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "n_chars"]},
            "steps": [
                {"op": "sample", "id_column": "doc_id",
                 "weight_column": "n_chars", "k": 10},
            ],
        },
        sf,
    ).to_pandas()
    assert len(wq) == 10

    rq = run_spec(
        {
            "input": {"table": "documents",
                      "columns": ["lang", "source", "n_chars"]},
            "steps": [
                {"op": "rollup", "group_cols": ["lang", "source"],
                 "value_column": "n_chars", "n_name": "n_docs",
                 "sum_name": "sum_chars"},
            ],
        },
        sf,
    ).to_pandas()
    total = rq[rq["lang"].isna() & rq["source"].isna()]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert int(total["n_docs"].iloc[0]) == n_docs

    gq = run_spec(
        {
            "input": {"table": "events", "columns": ["event_type", "value"]},
            "steps": [
                {"op": "group_quantile", "group_column": "event_type",
                 "value_column": "value", "q_num": 1, "q_den": 2},
            ],
        },
        sf,
    ).to_pandas()
    med = duckdb.sql(
        f"SELECT event_type, quantile_disc(value, 0.5) q FROM "
        f"parquet_scan('{sf}/events.parquet') GROUP BY 1"
    ).df().set_index("event_type")["q"].to_dict()
    assert gq.set_index("event_type")["q_value"].to_dict() == med


@pytest.mark.usefixtures("ray_session")
def test_knn_tie_break_partition_invariant():
    import ray.data

    from basicocr_ray.stages.embed import knn_self_join_grouped

    # all identical vectors → every sim ties → neighbors = ascending ids
    df = pd.DataFrame(
        {
            "vec_id": [5, 3, 9, 1],
            "label": [0, 0, 0, 0],
            "embedding": [[1.0, 2.0]] * 4,
        }
    )
    for blocks in (1, 4):
        out = (
            knn_self_join_grouped(
                ray.data.from_pandas(df).repartition(blocks), k=3
            )
            .to_pandas()
            .sort_values(["vec_id", "nbr_rank"])
        )
        got = out.groupby("vec_id")["nbr_id"].apply(list).to_dict()
        assert got == {1: [3, 5, 9], 3: [1, 5, 9], 5: [1, 3, 9], 9: [1, 3, 5]}


@pytest.mark.usefixtures("ray_session")
def test_skew_aware_join_split_invariant():
    """skew_aware_join returns the exact inner join for ANY hot/cold
    split: discovered hot set, forced hot set, and empty hot set all
    match the single-process pandas join."""
    import duckdb
    import ray.data

    from basicocr_ray.stages.joins import hot_keys, skew_aware_join

    sf = "/root/testdata/sf0.001"
    orders = ray.data.read_parquet(
        f"{sf}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.rename_columns(["custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda b: b.rename_columns(["custkey", "c_acctbal"]),
        batch_format="pyarrow",
    )

    exp = duckdb.sql(
        f"SELECT o.o_custkey AS custkey, o.o_totalprice, c.c_acctbal "
        f"FROM parquet_scan('{sf}/orders.parquet') o "
        f"JOIN parquet_scan('{sf}/customer.parquet') c "
        f"ON o.o_custkey = c.c_custkey"
    ).df().sort_values(["custkey", "o_totalprice"]).reset_index(drop=True)

    discovered = hot_keys(orders, "custkey", min_count=12)
    # hot discovery finds the heavy customers at this sf (~10 orders avg)
    assert discovered, "expected a nonempty hot set at min_count=12"

    all_keys = sorted(exp["custkey"].unique())
    for hot in (None, [], discovered, all_keys[:5], all_keys):
        got = skew_aware_join(
            orders, cust, "custkey", ["o_totalprice"], ["c_acctbal"],
            hot=hot, hot_min_count=12,
        ).to_pandas().sort_values(
            ["custkey", "o_totalprice"]
        ).reset_index(drop=True)[["custkey", "o_totalprice", "c_acctbal"]]
        assert len(got) == len(exp)
        assert (got["custkey"].to_numpy() == exp["custkey"].to_numpy()).all()
        assert (got["o_totalprice"].to_numpy()
                == exp["o_totalprice"].to_numpy()).all()
        assert (got["c_acctbal"].to_numpy() == exp["c_acctbal"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("q_num,q_den", [(3, 4), (1, 2), (1, 4), (1, 1), (0, 1)])
def test_grouped_quantile_cont_exact(q_num, q_den):
    import ray.data

    from basicocr_ray.stages.wide import grouped_quantile_cont

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 3000),
            "v": np.round(rng.normal(50, 20, 3000), 3),
        }
    )
    dup = pd.DataFrame({"g": ["d"] * 500, "v": [7.0] * 400 + [9.0] * 100})
    const = pd.DataFrame({"g": ["e"] * 50, "v": [3.25] * 50})
    single = pd.DataFrame({"g": ["f"], "v": [42.0]})
    df = pd.concat([df, dup, const, single], ignore_index=True)

    got = (
        grouped_quantile_cont(
            ray.data.from_pandas(df).repartition(6), "g", "v", q_num, q_den
        )
        .to_pandas()
        .set_index("g")["q_value"]
        .to_dict()
    )
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        num = (len(vals) - 1) * q_num
        r_lo, frac = num // q_den, (num % q_den) / q_den
        r_hi = r_lo + (1 if num % q_den else 0)
        want = vals[r_lo] + frac * (vals[r_hi] - vals[r_lo])
        assert got[g] == want, (g, q_num, q_den)


def test_grouped_quantile_cont_validates():
    from basicocr_ray.stages.wide import grouped_quantile_cont

    with pytest.raises(ValueError):
        grouped_quantile_cont(None, "g", "v", 5, 4)
    with pytest.raises(ValueError, match="power of two"):
        grouped_quantile_cont(None, "g", "v", 1, 10)


@pytest.mark.usefixtures("ray_session")
def test_grouped_window_rank_matches_pandas():
    """Range-partitioned window ranking equals the single-machine window
    (row_number / ntile / percent_rank over PARTITION BY g ORDER BY v, id)
    — including heavy ties (one bucket holds many equal values), a
    single-row group, and n < k tiles."""
    import ray.data

    from basicocr_ray.stages.wide import grouped_window_rank

    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c", "solo"], [300, 200, 99, 1]),
            "v": np.concatenate(
                [
                    rng.normal(0, 10, 300).round(0),  # heavy ties
                    rng.uniform(0, 1, 200),
                    np.full(99, 7.0),  # one group entirely tied
                    [42.0],
                ]
            ),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    k = 4
    got = (
        grouped_window_rank(
            ray.data.from_pandas(df).repartition(8), "g", "v", "id", k
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )

    want = df.sort_values(["g", "v", "id"]).copy()
    want["rn"] = want.groupby("g").cumcount() + 1
    nn = want.groupby("g")["rn"].transform("max")
    small, big = nn // k, nn % k
    cutoff = big * (small + 1)
    want["tile"] = np.where(
        small == 0,
        want["rn"],
        np.where(
            want["rn"] <= cutoff,
            (want["rn"] - 1) // (small + 1) + 1,
            big + (want["rn"] - cutoff - 1) // small.where(small > 0, 1) + 1,
        ),
    ).astype("int64")
    want["pr"] = np.where(nn > 1, (want["rn"] - 1) / (nn - 1), 0.0)
    want = want.sort_values("id").reset_index(drop=True)

    assert got["rn"].tolist() == want["rn"].tolist()
    assert got["tile"].tolist() == want["tile"].tolist()
    assert got["pr"].tolist() == want["pr"].tolist()  # bit-identical

    # partition invariance
    alt = (
        grouped_window_rank(
            ray.data.from_pandas(df).repartition(2), "g", "v", "id", k
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert alt["rn"].tolist() == got["rn"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_planted_overlap():
    """A training doc sharing a 5-gram with the benchmark set is flagged
    with the exact distinct-hit count; clean docs come back n_hit=0."""
    import ray
    import ray.data

    from basicocr_ray.stages.decontam import (
        build_benchmark_grams,
        flag_contaminated,
    )

    bench = pd.DataFrame(
        {
            "doc_id": [100, 101],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs",
            ],
        }
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                # contains "the quick brown fox jumps" AND
                # "quick brown fox jumps over" -> 2 distinct hits
                "so the quick brown fox jumps over rooftops",
                "completely unrelated words about databases and rays",
                # exact copy -> every 5-gram hits (9 tokens -> 5 grams)
                "the quick brown fox jumps over the lazy dog",
                "four tokens only here",  # < n tokens -> no grams
            ],
        }
    )
    grams = build_benchmark_grams(ray.data.from_pandas(bench), "text", n=5)
    got = (
        flag_contaminated(
            ray.data.from_pandas(train).repartition(3), ray.put(grams), n=5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_hit"].tolist() == [2, 0, 5, 0]
    assert got["contaminated"].tolist() == [True, False, True, False]


@pytest.mark.usefixtures("ray_session")
def test_chunk_dedup_reassemble_matches_referee_and_salt_invariant():
    """Corpus-wide first-occurrence chunk dedup equals a single-machine
    referee (pandas row_number-per-chunk), docs reassemble in idx order,
    fully-duplicated docs vanish, and the output is salt-invariant."""
    import ray.data

    from basicocr_ray.stages.decontam import chunk_dedup_reassemble

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 35))) for _ in range(40)
    ]
    texts[10] = texts[3]          # whole-doc duplicate -> vanishes
    texts[11] = texts[3] + " unique tail words here"
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})

    def referee(cw: int = 10) -> pd.DataFrame:
        rows = []
        for did, t in zip(df["doc_id"], df["text"]):
            toks = t.lower().split()
            for i in range(0, len(toks), cw):
                rows.append((did, i // cw + 1, " ".join(toks[i:i + cw])))
        ch = pd.DataFrame(rows, columns=["doc_id", "idx", "chunk"])
        ch = ch.sort_values(["doc_id", "idx"]).drop_duplicates(
            "chunk", keep="first"
        )
        out = ch.groupby("doc_id", as_index=False).agg(
            clean_text=("chunk", " ".join), n_chunks=("chunk", "size")
        )
        return out.astype({"doc_id": "int64", "n_chunks": "int64"})

    want = referee().sort_values("doc_id").reset_index(drop=True)
    outs = []
    for salt in (1, 4, 32):
        got = (
            chunk_dedup_reassemble(
                ray.data.from_pandas(df).repartition(6), num_salt=salt
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(got)
    for got in outs:
        pd.testing.assert_frame_equal(
            got[["doc_id", "clean_text", "n_chunks"]], want
        )
    assert 10 not in outs[0]["doc_id"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_cube_counts_matches_referee():
    """CUBE(g1, g2) from one scan equals the four explicit grouping-set
    aggregates computed single-machine."""
    import ray.data

    from basicocr_ray.stages.wide import cube_counts

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 300),
            "b": rng.choice(["p", "q"], 300),
            "v": rng.integers(0, 100, 300),
        }
    )
    got = (
        cube_counts(
            ray.data.from_pandas(df).repartition(5), ["a", "b"], "v"
        )
        .to_pandas()
        .fillna("∅")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    parts = []
    for cols in ([ "a", "b"], ["a"], ["b"], []):
        if cols:
            p = df.groupby(cols, as_index=False).agg(
                n=("v", "size"), total=("v", "sum")
            )
        else:
            p = pd.DataFrame({"n": [len(df)], "total": [df["v"].sum()]})
        for c in ("a", "b"):
            if c not in p.columns:
                p[c] = "∅"
        parts.append(p[["a", "b", "n", "total"]])
    want = (
        pd.concat(parts, ignore_index=True)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"n": "int64", "total": "int64"})
    )
    pd.testing.assert_frame_equal(
        got[["a", "b", "n", "total"]].astype({"n": "int64", "total": "int64"}),
        want,
    )


@pytest.mark.usefixtures("ray_session")
def test_full_outer_join_matches_pandas():
    import ray.data

    from basicocr_ray.stages.joins import bucketed_hash_join

    left = pd.DataFrame({"k": [1, 2, 2, 5], "lv": [10, 20, 21, 50]})
    right = pd.DataFrame({"k": [2, 3], "rv": [200, 300]})
    got = (
        bucketed_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", ["lv"], ["rv"], num_buckets=4, join_type="full outer",
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="outer")
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("float64"), want.astype("float64")
    )


def test_grouped_prefix_sum_matches_window_sql():
    """grouped_prefix_sum == SUM OVER (PARTITION BY g ORDER BY
    md5(seed:id), id) exclusive, invariant to partitioning and salts."""
    import duckdb
    import pandas as pd
    import ray.data

    from basicocr_ray.stages.sample import grouped_prefix_sum

    df = pd.DataFrame(
        {
            "id": list(range(300)),
            "g": [f"s{i % 5}" for i in range(300)],
            "v": [(i * 13) % 29 for i in range(300)],
        }
    )
    want = duckdb.sql(
        """
        SELECT id, coalesce(sum(v) OVER (
          PARTITION BY g
          ORDER BY md5('9:' || CAST(id AS VARCHAR)), id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        FROM df ORDER BY id
        """
    ).df()
    for nblocks, salts in [(1, 4), (7, 4), (7, 16)]:
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = (
            grouped_prefix_sum(ds, "g", "id", "v", seed=9, num_salt=salts)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert got["prefix"].astype("int64").tolist() == want[
            "prefix"
        ].astype("int64").tolist()


def test_dup_span_intervals_matches_duplicate_spans():
    """dup_span_intervals' (a, b) intervals reduce to exactly
    duplicate_spans' per-doc (n_dup_spans, n_dup_words); intervals are
    disjoint and sorted-mergeable."""
    import pandas as pd
    import ray.data

    from basicocr_ray.stages.dedup import dup_span_intervals, duplicate_spans

    common = "alpha beta gamma delta epsilon zeta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"one {common} two",
                f"three {common} four {common}",
                "nothing shared here at all whatsoever today",
                f"{common}",
            ],
        }
    )
    ds = ray.data.from_pandas(docs)
    iv = (
        dup_span_intervals(ds, "doc_id", "text", width=5)
        .to_pandas()
        .sort_values(["doc_id", "a"])
        .reset_index(drop=True)
    )
    # disjoint within doc
    for _, g in iv.groupby("doc_id"):
        prev_b = -1
        for a, b in zip(g["a"], g["b"]):
            assert a > prev_b and b > a
            prev_b = b
    agg = (
        iv.assign(w=iv["b"] - iv["a"])
        .groupby("doc_id")
        .agg(n_dup_spans=("a", "size"), n_dup_words=("w", "sum"))
        .reset_index()
    )
    want = (
        duplicate_spans(ds, "doc_id", "text", width=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        agg.astype("int64"),
        want.astype("int64"),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_q157_boundary_replication_edges(tmp_path):
    """The Δ-bucket boundary-replication self-join at its edge cases:
    gap exactly Δ, events pinned on bucket boundaries, equal-timestamp
    orientation, and pairs whose members straddle a bucket edge — all
    must match the brute-force SQL twin exactly and emit each pair
    once."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    D = 3_600_000_000  # Δ in µs
    base = 1_600_000_000_000_000  # multiple of nothing special
    # craft: same-user events at bucket boundary, ±1, exactly Δ apart,
    # equal timestamps, and a second user interleaved
    ts_us = [
        base, base + 1, base + D, base + D + 1,   # boundary cluster
        base + 2 * D, base + 2 * D,               # equal-ts pair
        base + 5 * D,                             # isolated
    ]
    rows = {
        "event_id": list(range(1, 8)),
        "user_id": [1, 1, 1, 1, 1, 1, 1],
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "event_type": ["x"] * 7,
        "value": [0.0] * 7,
        "props": ["{}"] * 7,
    }
    # user 2: a pair straddling a bucket edge with gap exactly Δ
    rows2 = {
        "event_id": [101, 102, 103],
        "user_id": [2, 2, 2],
        "ts": pa.array(
            [base + D - 1, base + 2 * D - 1, base + 2 * D], pa.timestamp("us")
        ),
        "event_type": ["x"] * 3,
        "value": [0.0] * 3,
        "props": ["{}"] * 3,
    }
    t = pa.concat_tables(
        [pa.table(rows), pa.table(rows2)]
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = (
        QUERIES["q157_event_pairs_window"](str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "id1", "id2"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"parquet_scan('{tmp_path}/events.parquet')"
    )
    want = (
        con.sql(ORACLE_SQL["q157_event_pairs_window"])
        .df()
        .sort_values(["user_id", "id1", "id2"])
        .reset_index(drop=True)
    )
    # each qualifying pair exactly once, values identical
    assert got[["user_id", "id1", "id2", "gap_us"]].astype("int64").values.tolist() == \
        want[["user_id", "id1", "id2", "gap_us"]].astype("int64").values.tolist()
    assert not got.duplicated(["user_id", "id1", "id2"]).any()


@pytest.mark.usefixtures("ray_session")
def test_spec_span_cut_and_token_budget():
    """Spec surface: `span_cut` rewrites text with duplicated spans
    removed (consistent with the duplicate_spans measurement) and
    `token_budget` realizes the q160 greedy-fill semantics."""
    import duckdb

    from basicocr_ray.pipelines.spec import run_spec

    sf = "/root/testdata/sf0.001"

    cutr = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "span_cut", "width": 5}],
        },
        sf,
    ).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert len(cutr) == n_docs
    # every affected doc lost exactly its measured duplicated words
    meas = run_spec(
        {
            "input": {"table": "documents", "columns": ["doc_id", "text"]},
            "steps": [{"op": "duplicate_spans", "width": 5}],
        },
        sf,
    ).to_pandas().set_index("doc_id")["n_dup_words"].to_dict()
    got = cutr.set_index("doc_id")["n_cut"].to_dict()
    for did, n in meas.items():
        assert got[did] == n
    assert all(v == 0 for k, v in got.items() if k not in meas)

    tb = run_spec(
        {
            "input": {"table": "documents",
                      "columns": ["doc_id", "source", "n_chars"]},
            "steps": [
                {"op": "token_budget", "group_column": "source",
                 "value_column": "n_chars", "budget": 3000},
            ],
        },
        sf,
    ).to_pandas()
    want = duckdb.sql(
        f"""
        WITH w AS (
          SELECT doc_id, coalesce(sum(n_chars) OVER (
            PARTITION BY source
            ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
          FROM parquet_scan('{sf}/documents.parquet')
        ) SELECT doc_id FROM w WHERE p < 3000
        """
    ).df()["doc_id"].sort_values().tolist()
    assert tb["doc_id"].sort_values().tolist() == want


def test_audio_fingerprinter_landmarks_and_alignment():
    """AudioFingerprinter's vectorized strided-FFT path matches a naive
    per-frame reference, and a true sub-clip (cut on the hop grid)
    aligns at ONE offset with every landmark matching."""
    import numpy as np
    import pyarrow as pa

    from basicocr_ray.core.wav import decode_wav, encode_wav
    from basicocr_ray.stages.multimodal import (
        AudioFingerprinter,
        make_tone_wav,
    )

    fpr = AudioFingerprinter()
    data = make_tone_wav(7)
    got = fpr._landmarks(data)

    _, x = decode_wav(data)
    nfr = (len(x) - fpr.frame) // fpr.hop + 1
    peaks = []
    for i in range(nfr):
        fr = x[i * fpr.hop: i * fpr.hop + fpr.frame]
        mag = np.abs(np.fft.rfft(fr))
        peaks.append(int(np.argmax(mag[fpr.min_bin:]) + fpr.min_bin))
    want = [
        (i, (peaks[i] << 16) | peaks[i + fpr.fan])
        for i in range(nfr - fpr.fan)
    ]
    assert got == want

    # clip cut at a hop multiple: every clip landmark matches the source
    # at offset start//hop exactly
    start, n = 4096, 8000
    clip = fpr._landmarks(encode_wav(8000, x[start:start + n]))
    src = dict(got)
    off = start // fpr.hop
    assert len(clip) > 0
    assert all(src.get(t + off) == h for t, h in clip)

    # batch path emits one row per landmark with the caller's id
    out = fpr(pa.table({
        "item_id": pa.array([7], pa.int64()),
        "payload": pa.array([data], pa.large_binary()),
    }))
    assert out.num_rows == len(want)
    assert out["fhash"].to_pylist() == [h for _, h in want]
