"""Wave-33 operator pins: KMV/theta sketch set ops, integer-quantized
grouped covariance, Neyman-allocated stratified sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    # little-endian low-64 (DuckDB md5_number_lower), masked to 63 bits
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little") & (
        (1 << 63) - 1
    )


@pytest.mark.usefixtures("ray_session")
def test_kmv_sketch_ops_vs_brute(tmp_path):
    """Controlled overlap: A = users 0..199 (click), B = 100..249 (view);
    sketches, thetas and n_common match a single-process KMV rebuild,
    and the exact audits are exact."""
    from basicocr_ray.pipelines.queries import QUERIES

    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for u in range(200):
        rows.append((eid, base, u, "click", 1.0, "{}")); eid += 1
    for u in range(100, 250):
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
        # duplicates must not perturb distinctness
        rows.append((eid, base, u, "view", 1.0, "{}")); eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = QUERIES["q173_kmv_sketch_ops"](str(tmp_path)).to_pandas()
    vals = dict(zip(got["metric"], got["value"]))

    K = 64
    ha = sorted(_md5_low63(str(u)) for u in range(200))
    hb = sorted(_md5_low63(str(u)) for u in range(100, 250))
    ka, kb = ha[:K], hb[:K]
    ku = sorted(set(ka) | set(kb))[:K]
    n_common = sum(1 for h in ku if h in set(ka) and h in set(kb))
    assert vals["theta_a"] == ka[-1]
    assert vals["theta_b"] == kb[-1]
    assert vals["theta_union"] == ku[-1]
    assert vals["n_common"] == n_common
    assert vals["exact_a"] == 200
    assert vals["exact_b"] == 150
    assert vals["exact_inter"] == 100  # users 100..199 are in both
    # the KMV estimate this evidence supports is in the right ballpark
    est_union = (K - 1) * ((1 << 63) / ku[-1])
    assert 250 * 0.5 < est_union < 250 * 2.0


@pytest.mark.usefixtures("ray_session")
def test_grouped_covariance_vs_numpy(tmp_path):
    """Moment sums equal a single numpy pass over the float32-stored
    table — including negative values (floor toward -inf) and the
    float32→float64 exactness assumption."""
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(5)
    n, d = 300, 8
    V32 = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [r.tolist() for r in V32], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))
    got = (
        QUERIES["q174_grouped_covariance"](str(tmp_path))
        .to_pandas().sort_values("label").reset_index(drop=True)
    )

    Q = np.floor(V32[:, :4].astype(np.float64) * 1e6).astype(np.int64)
    for lb in range(3):
        m = labels == lb
        row = got[got["label"] == lb].iloc[0]
        assert int(row["n"]) == int(m.sum())
        s = Q[m].sum(axis=0)
        for i in range(4):
            assert int(row[f"s{i}"]) == int(s[i])
        C = Q[m].T @ Q[m]
        for i in range(4):
            for j in range(i, 4):
                assert int(row[f"c{i}{j}"]) == int(C[i, j]), (lb, i, j)


@pytest.mark.usefixtures("ray_session")
def test_neyman_allocation_properties(tmp_path):
    """Seats sum to 100, the high-variance stratum outdraws the
    equal-size low-variance one, a zero-variance stratum still gets a
    nonzero weight (the +1 regularizer), and the drawn rows are the
    md5 bottom-k of each stratum."""
    from basicocr_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(9)
    rows = []
    did = 0
    for _ in range(120):  # constant stratum: zero variance
        rows.append((did, "t", "aa", "s", 500)); did += 1
    for _ in range(120):  # low variance
        rows.append((did, "t", "bb", "s", 500 + int(rng.integers(0, 5))))
        did += 1
    for _ in range(120):  # high variance
        rows.append((did, "t", "cc", "s", int(rng.integers(10, 5000))))
        did += 1
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q175_neyman_sample"](str(tmp_path)).to_pandas()
    assert len(got) == 100

    # independent brute allocation: wh = floor(sqrt(N·Σx² − Sx²)) + 1,
    # largest remainder (rem desc, lang asc)
    st = df.groupby("lang")["n_chars"].agg(["count", "sum"])
    sxx = df.assign(xx=df["n_chars"].astype("int64") ** 2).groupby(
        "lang"
    )["xx"].sum()
    wh = {
        lang: int(np.floor(np.sqrt(float(
            st.loc[lang, "count"] * sxx[lang] - st.loc[lang, "sum"] ** 2
        )))) + 1
        for lang in st.index
    }
    W = sum(wh.values())
    k0 = {g: (100 * w) // W for g, w in wh.items()}
    rem = {g: (100 * w) % W for g, w in wh.items()}
    leftover = 100 - sum(k0.values())
    for g in sorted(rem, key=lambda g: (-rem[g], g))[:leftover]:
        k0[g] += 1
    assert sum(k0.values()) == 100
    assert k0["cc"] > k0["bb"] >= k0["aa"]  # variance drives seats

    drawn = got.groupby("lang")["doc_id"].count()
    for lang in st.index:
        assert int(drawn.get(lang, 0)) == k0[lang], lang
    kh = got.groupby("lang")["kh"].first()
    assert (kh == drawn[kh.index]).all()  # every stratum filled its quota

    # drawn rows are exactly the md5 bottom-k per stratum
    import hashlib as hl

    for lang, g in df.groupby("lang"):
        k = k0[lang]
        exp = sorted(
            g["doc_id"], key=lambda i: (hl.md5(str(i).encode()).hexdigest(), i)
        )[:k]
        assert sorted(got[got["lang"] == lang]["doc_id"]) == sorted(exp)
