"""Embedding ops: ANN top-k, IVF, k-means, semdedup, retrieval fusion (LLM-data brief: similarity search).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from basicocr_ray.stages.wide import make_ngram_items

from ._shared import (
    _p,
    _read,
    _round_col,
    _round_half_up,
)


def q15_ann_cosine(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id 0 (float64, rounded 6
    — matches DuckDB list_cosine_similarity over DOUBLE[])."""
    from basicocr_ray.stages.embed import ann_topk

    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 0))
    qvec = np.asarray(qrow["embedding"].to_pylist()[0], dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    res = ann_topk(ds, qvec, k=10, exclude_ids=frozenset({0})).to_pandas()
    res = _round_col(res, "sim", 6)
    return res


def q24_embed_dup_pairs(sf_dir: str):
    """Embedding near-dup via cosine LSH: corpus ∪ exact copies
    (vec_id + 10000) → every (v, v+10000) pair must be found (recall 1.0
    for exact dups: identical signature ⇒ same bucket)."""
    from basicocr_ray.stages.embed import cosine_lsh_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.add(batch["vec_id"], 10000),
                "embedding": batch["embedding"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))
    return cosine_lsh_pairs(both, threshold=0.95)


def q59_knn_join_label(sf_dir: str):
    """Per-label exact cosine k-NN SELF-JOIN (the similarity-search join:
    each vector's top-3 neighbors within its label, self excluded, ties by
    neighbor id): the label partitions the quadratic work — the IVF-cell
    shape — and each group scores in one numpy gram-matrix pass
    (`stages.embed.knn_self_join_grouped`). Sims rounded 6 like q15
    (numpy vs DuckDB double summation agree well past 1e-6)."""
    from basicocr_ray.stages.embed import knn_self_join_grouped

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    res = knn_self_join_grouped(ds, k=3).to_pandas()
    res["label"] = res["label"].astype("int64")
    return _round_col(res, "sim", 6)


def q92_kmeans_assign(sf_dir: str):
    """Embedding cluster assignment against k=4 broadcast centroids (the
    IVF coarse-quantizer step): centroids = the vec_id<4 embeddings,
    per-batch vectorized argmin of squared L2 in float64 (ties → lowest
    centroid id, `stages.kmeans._assign`), tiny per-cluster rollup.
    No shuffle — the k×dim centroid matrix broadcasts in the task closure;
    `sum_vec_id` is exact integer evidence of the full assignment."""
    from ray.data.aggregate import Count, Sum

    from basicocr_ray.stages.kmeans import kmeans_assign

    ctab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    crows = ctab.filter(pc.less(ctab["vec_id"], 4)).sort_by("vec_id")
    centroids = np.asarray(crows["embedding"].to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = kmeans_assign(ds, centroids)

    def widen(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster": pc.cast(b["cluster"], pa.int64()),
            }
        )

    out = (
        assigned.map_batches(widen, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Count(alias_name="n_vecs"),
            Sum("vec_id", alias_name="sum_vec_id"),
        )
        .to_pandas()
    )
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["sum_vec_id"] = out["sum_vec_id"].astype("int64")
    return out


def q115_ivf_ann_int(sf_dir: str):
    """IVF approximate-nearest-neighbor as a HASHABLE contract — the ANN
    scale path promoted from pytest-only (`ivf_topk`) to the oracle gate:
    embeddings quantize to int64 (floor(x·1e6+0.5), bit-identical in
    numpy and SQL), 8 fixed centroid vectors (vec_id < 8 — a stand-in
    for a sampled k-means fit; loaded with a vec_id<8 row-group
    predicate pushdown, never a full scan) assign every vector to its
    exact argmin cell, and only the query's 3 nearest cells are scored —
    the (1 − n_probe/C) dot-product pruning that makes brute-force
    cosine (q15's baseline) survive 100 TB. Output (vec_id, cell, dot)
    is integer end-to-end."""
    from basicocr_ray.stages.embed import ivf_topk_int, quantize_vec

    head = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 8)],
    ).sort_by("vec_id")
    cents = quantize_vec(
        np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    )
    qvec = cents[0]  # query = vec_id 0 (same convention as q15)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    df = ivf_topk_int(
        ds, qvec, cents, k=10, n_probe=3, exclude_ids=frozenset({0})
    ).to_pandas()
    return df.astype({"vec_id": "int64", "cell": "int64", "dot": "int64"})


def q130_embedding_outliers(sf_dir: str):
    """Embedding OUTLIER detection (the SemDeDup/SSL-curation shape —
    flag the member farthest from its cluster centroid): vectors
    quantize to int64 (q115 discipline, scale 10³ so the score bound
    stays far inside int64), pass 1 reduces BOUNDED per-label (n, Σv)
    partials (labels × 64 ints — no shuffle of vectors), pass 2
    broadcasts them and scores every row with the EXACT integer
    n²·‖x − s/n‖² = Σ_i (n·x_i − s_i)², keeping only each batch's
    per-label argmax (≤ |labels| rows per batch reach the driver).
    Ties break to the lowest vec_id so the result is
    partition-invariant. The oracle replays the same integer algebra
    with unnest-zip list SQL."""
    import ray

    from basicocr_ray.stages.embed import _stack, quantize_vec

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = quantize_vec(_stack(batch["embedding"]), scale=1000.0)
        labels = batch["label"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        out_l, out_n, out_s = [], [], []
        for lab in np.unique(labels):
            mask = labels == lab
            out_l.append(int(lab))
            out_n.append(int(mask.sum()))
            out_s.append(m[mask].sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "s": pa.array(out_s, pa.list_(pa.int64())),
            }
        )

    stats: dict[int, tuple[int, np.ndarray]] = {}
    for tbl in ds.map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for lab, n, s in zip(
            tbl["label"].to_pylist(), tbl["n"].to_pylist(), tbl["s"].to_pylist()
        ):
            pn, ps = stats.get(lab, (0, np.zeros(len(s), dtype=np.int64)))
            stats[lab] = (pn + n, ps + np.asarray(s, dtype=np.int64))
    stats_ref = ray.put(stats)

    def local_argmax(batch: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        m = quantize_vec(_stack(batch["embedding"]), scale=1000.0)
        labels = batch["label"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = batch["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_l, out_id, out_sc = [], [], []
        for lab in np.unique(labels):
            n, s = st[int(lab)]
            mask = labels == lab
            d = n * m[mask] - s[None, :]
            sc = (d * d).sum(axis=1)
            sub_ids = ids[mask]
            order = np.lexsort((sub_ids, -sc))  # score desc, id asc
            out_l.append(int(lab))
            out_id.append(int(sub_ids[order[0]]))
            out_sc.append(int(sc[order[0]]))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_sc, pa.int64()),
            }
        )

    cand = ds.map_batches(local_argmax, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["label", "score", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    out = cand.groupby("label", as_index=False).first()
    for c in ("label", "vec_id", "score"):
        out[c] = out[c].astype("int64")
    return out[["label", "vec_id", "score"]]


def q152_sparse_dot_topk(sf_dir: str):
    """All-pairs SPARSE similarity top-k via an INVERTED-INDEX join —
    the document-similarity candidate scorer behind clustering and
    near-dup mining, with an integer contract (no float cosine): score
    of a doc pair = Σ tf_a·tf_b over shared RARE word-bigram terms
    (2 ≤ df ≤ 20), global top-20 pairs by (score DESC, a, b).

    Scale shape: the postings exchange carries (term, doc_id, tf) —
    term text never rides with documents; each term's postings co-locate
    in ONE coarse group, so the global df test and the per-term pair
    emission are exact in-group (the q124 discipline, generalized from
    candidate generation to weighted scoring). The df ≤ 20 hot-list cap
    bounds the pair fan-out to O(Σ min(df,20)·tf²) — the standard
    inverted-index-similarity prune (stop terms contribute no
    discrimination and quadratic pairs; at 100 TB the cap is the
    difference between a linear and an all-pairs job). Pair partials
    sum through a second coarse reduce; the top-k is a per-block local
    prune + tiny global sort (T3/G5)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bigrams = make_ngram_items(2)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_t, out_d, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for term, tf in Counter(bigrams(t or "")).items():
                out_t.append(term)
                out_d.append(did)
                out_f.append(tf)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_w = [], [], []
        for _, g in df.groupby("term", sort=False):
            if not (2 <= len(g) <= 20):  # global df: the group holds
                continue  # ALL of this term's postings
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_w.append(int(tfs[i]) * int(tfs[j]))
        return pd.DataFrame(
            {
                "a": pd.array(out_a, dtype="int64"),
                "b": pd.array(out_b, dtype="int64"),
                "score": pd.array(out_w, dtype="int64"),
            }
        )

    pair_parts = coarse_group_reduce(
        ds.map_batches(postings, batch_format="pyarrow"),
        "term",
        pair_partials,
    )

    def score_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False)["score"].sum()
        # local top-k prune: ties broken by (a, b), both in the sort
        return out.sort_values(
            ["score", "a", "b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(20).astype({"score": "int64"})

    scored = coarse_group_reduce(pair_parts, ["a", "b"], score_final)
    out = (
        scored.sort(["score", "a", "b"], descending=[True, False, False])
        .limit(20)
        .to_pandas()
    )
    return out.astype({"a": "int64", "b": "int64", "score": "int64"})


def q156_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): EMBEDDING-level semantic dedup —
    k-means clusters bound the pairwise-cosine work to O(Σ|cluster|²),
    then within each cluster every vector with a LOWER-id neighbor at
    cosine ≥ 0.9 drops (one representative per duplicate group
    survives). Corpus = embeddings ∪ exact clones (vec_id+10000), so
    recall/precision are analytic: clone pairs sit at cosine 1.0,
    the corpus's max non-clone pair is 0.48 (measured) — the 0.9
    threshold lies in a >0.4-wide gap, which is what makes a
    float-cosine rule drivable against a SQL oracle (the q24/q150
    threshold-in-gap discipline; both engines' last-ulp noise cannot
    cross the gap).

    Scale shape: centroids broadcast in the task closure (k×dim —
    q92's no-shuffle assign); ONE shuffle co-locates each cluster
    (ids + vectors, never text); the in-cluster prune is a vectorized
    normalized-Gram argmax. k is the SemDeDup cost knob: clusters too
    hot → raise k (or salt-subdivide and verify across, the q22/q123
    pigeonhole discipline)."""
    from basicocr_ray.stages.kmeans import _assign

    ctab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    crows = ctab.filter(pc.less(ctab["vec_id"], 8)).sort_by("vec_id")
    centroids = np.asarray(crows["embedding"].to_pylist(), dtype=np.float64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def clone(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.add(batch["vec_id"], 10000),
                "embedding": batch["embedding"],
            }
        )

    both = ds.union(ds.map_batches(clone, batch_format="pyarrow"))

    def assign_keep_vec(batch: pa.Table) -> pa.Table:
        # kmeans_assign's tie-exact argmin, keeping the vector for the
        # in-cluster prune (the cluster shuffle carries ids + vectors)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        return batch.append_column(
            "cluster", pa.array(_assign(m, centroids), pa.int32())
        )

    assigned = both.map_batches(assign_keep_vec, batch_format="pyarrow")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id", kind="mergesort").reset_index(
            drop=True
        )
        V = np.asarray(df["embedding"].to_list(), dtype=np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        G = V @ V.T
        # drop i iff any j < i (id order) has cos >= 0.9
        close = np.tril(G >= 0.9, k=-1).any(axis=1)
        out = df.loc[~close, ["vec_id", "cluster"]].copy()
        out["cluster"] = out["cluster"].astype("int64")
        return out

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas"
    )


def q166_rrf_fusion(sf_dir: str):
    """HYBRID RETRIEVAL with Reciprocal-Rank Fusion — the modern
    dense+sparse retrieval stack end to end: for every query doc (id ≡ 0
    mod 10), (a) a DENSE ranking — cosine top-5 against the broadcast
    query matrix (`ray.put` once, numpy matmul per batch, per-batch
    local top-5 → tiny per-query final; the q15 float-order discipline),
    (b) a SPARSE ranking — rare-bigram inverted-index dot scores (the
    q152 postings shape restricted to query→candidate pairs, integer
    scores), and (c) RRF fusion: score = Σ 1/(60+r) over the lists the
    candidate appears in — at most TWO terms added in a fixed order, so
    the float comparison is engine-identical — with the final top-3 per
    query by (rrf DESC, cand). Output is all-integer (ranks; 0 = absent
    from that list), so the driver hash is float-free."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    TOPK, OUT_K, K_RRF = 5, 3, 60

    # query matrix: the query SET is an input (bounded by definition) —
    # read once on the driver, broadcast via ray.put
    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    # ---- dense top-5 per query ----
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def dense_partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, Qn_b = _ray.get(qref)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Qn_b.T  # (n_cand × n_query)
        out_q, out_c, out_s = [], [], []
        for j, qid in enumerate(ids_np):
            col = sims[:, j]
            ok = cids != qid
            order = np.lexsort((cids[ok], -col[ok]))[:TOPK]
            sel_c = cids[ok][order]
            sel_s = col[ok][order]
            out_q.extend([int(qid)] * len(sel_c))
            out_c.extend(sel_c.tolist())
            out_s.extend(sel_s.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def dense_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["sim", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(TOPK)
            for r, cid in enumerate(g["cand_id"], 1):
                out.append((qid, int(cid), r))
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "rd": pd.array([o[2] for o in out], dtype="int64"),
            }
        )

    d5 = coarse_group_reduce(
        ds.map_batches(dense_partial, batch_format="pyarrow"),
        "query_id",
        dense_final,
    )

    # ---- sparse top-5 per query (q152 postings, query→cand pairs) ----
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bigrams = make_ngram_items(2)

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_t, out_d, out_f = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for term, tfv in Counter(bigrams(t or "")).items():
                out_t.append(term)
                out_d.append(did)
                out_f.append(tfv)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def qc_partials(df: pd.DataFrame) -> pd.DataFrame:
        out_q, out_c, out_w = [], [], []
        for _, g in df.groupby("term", sort=False):
            if not (2 <= len(g) <= 20):  # global df in-group
                continue
            ids = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            qm = ids % 10 == 0
            for qi in np.flatnonzero(qm):
                for ci in range(len(ids)):
                    if ids[ci] == ids[qi]:
                        continue
                    out_q.append(int(ids[qi]))
                    out_c.append(int(ids[ci]))
                    out_w.append(int(tfs[qi]) * int(tfs[ci]))
        return pd.DataFrame(
            {
                "query_id": pd.array(out_q, dtype="int64"),
                "cand_id": pd.array(out_c, dtype="int64"),
                "score": pd.array(out_w, dtype="int64"),
            }
        )

    spairs = coarse_group_reduce(
        docs.map_batches(postings, batch_format="pyarrow"),
        "term",
        qc_partials,
    )

    def sum_scores(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["query_id", "cand_id"], as_index=False
        )["score"].sum()
        return out.astype("int64")

    s_scores = coarse_group_reduce(
        spairs, ["query_id", "cand_id"], sum_scores
    )

    def sparse_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["score", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(TOPK)
            for r, cid in enumerate(g["cand_id"], 1):
                out.append((qid, int(cid), r))
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "rs": pd.array([o[2] for o in out], dtype="int64"),
            }
        )

    s5 = coarse_group_reduce(s_scores, "query_id", sparse_final)

    # ---- fusion: full outer on (query, cand), RRF, top-3 per query ----
    def keyed(cols_keep):
        def fn(b: pa.Table) -> pa.Table:
            ks = [
                f"{q}:{c}" for q, c in zip(
                    b["query_id"].to_pylist(), b["cand_id"].to_pylist()
                )
            ]
            out = {"k": pa.array(ks, pa.string())}
            for name, src in cols_keep.items():
                out[name] = pc.cast(b[src], pa.int64())
            return pa.table(out)

        return fn

    d_k = d5.map_batches(
        keyed({"query_id": "query_id", "cand_id": "cand_id", "rd": "rd"}),
        batch_format="pyarrow",
    )
    s_k = s5.map_batches(
        keyed({"qid_s": "query_id", "cid_s": "cand_id", "rs": "rs"}),
        batch_format="pyarrow",
    )
    fused = bucketed_hash_join(
        d_k, s_k, key="k",
        left_columns=["query_id", "cand_id", "rd"],
        right_columns=["qid_s", "cid_s", "rs"],
        join_type="full outer",
    )

    def rrf(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        qid = df["query_id"].fillna(df["qid_s"]).astype("int64")
        cid = df["cand_id"].fillna(df["cid_s"]).astype("int64")
        rd = df["rd"].fillna(0).astype("int64")
        rs = df["rs"].fillna(0).astype("int64")
        score = np.where(
            rd.to_numpy() > 0, 1.0 / (K_RRF + rd.to_numpy()), 0.0
        ) + np.where(
            rs.to_numpy() > 0, 1.0 / (K_RRF + rs.to_numpy()), 0.0
        )
        return pa.table(
            {
                "query_id": pa.array(qid.to_numpy(), pa.int64()),
                "cand_id": pa.array(cid.to_numpy(), pa.int64()),
                "r_dense": pa.array(rd.to_numpy(), pa.int64()),
                "r_sparse": pa.array(rs.to_numpy(), pa.int64()),
                "rrf": pa.array(score, pa.float64()),
            }
        )

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(
                ["rrf", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(OUT_K)
            for r, row in enumerate(g.itertuples(index=False), 1):
                out.append(
                    (qid, row.cand_id, r, row.r_dense, row.r_sparse)
                )
        return pd.DataFrame(
            {
                "query_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "fused_rank": pd.array(
                    [o[2] for o in out], dtype="int64"
                ),
                "r_dense": pd.array([o[3] for o in out], dtype="int64"),
                "r_sparse": pd.array([o[4] for o in out], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        fused.map_batches(rrf, batch_format="pyarrow"), "query_id", top3
    )


def q167_margin_mining(sf_dir: str):
    """MARGIN-based neighbor mining — the CCMatrix/LASER bitext-mining
    criterion (Artetxe & Schwenk 2019) re-expressed for Ray Data: for
    every source vector (label = 0) and each of its cosine top-4
    candidates among the rest of the corpus, score
    margin = cos(a,b) / ((avgk(a) + avgk(b)) / 2) where avgk(·) is the
    mean of the vector's top-4 cosines against the OTHER side — the
    ratio-margin that suppresses hub vectors a raw-cosine cut cannot.
    Shapes: the source side is the bounded query set (read once,
    `ray.put` broadcast); ONE matmul pass over candidate batches yields
    both directions — per-candidate avgk(b) is EXACT locally (the whole
    source matrix is visible in every batch) while per-source top-4
    rows reduce through coarse groups; the tiny candidate relation then
    meets the per-candidate averages in a bucketed hash join (at corpus
    scale the b-avg relation is fact-sized — it never touches the
    driver). All sums over the 4 top values run in descending order on
    the Ray side; round-6 absorbs the unordered-avg ulp on the SQL side
    (q15/q166 float discipline)."""
    import ray

    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    K = 4

    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    qsel = qtab.filter(pc.equal(qtab["label"], 0))
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    ds = _read(
        sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]
    )

    def _cand_sims(b: pa.Table):
        """(cand_ids, sims cand×src, src_ids) for the label≠0 rows."""
        import ray as _ray

        ids_np, Qn_b = _ray.get(qref)
        keep = pc.not_equal(b["label"], 0)
        b = b.filter(keep)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        if len(cids) == 0:
            return cids, np.zeros((0, len(ids_np))), ids_np
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        return cids, Vn @ Qn_b.T, ids_np

    def _desc_mean(v: np.ndarray) -> float:
        """Sum in descending order (deterministic), then /len."""
        acc = 0.0
        for x in sorted(v.tolist(), reverse=True):
            acc += x
        return acc / len(v)

    # per-candidate avgk(b): exact within one batch (full source side
    # is present), one row per candidate — no reduce needed
    def b_avg(b: pa.Table) -> pa.Table:
        cids, sims, _ = _cand_sims(b)
        out_ab = [
            _desc_mean(np.sort(row)[-K:]) for row in sims
        ]
        return pa.table(
            {
                "cand_id": pa.array(cids, pa.int64()),
                "ab": pa.array(out_ab, pa.float64()),
            }
        )

    bavg = ds.map_batches(b_avg, batch_format="pyarrow")

    # per-source batch-local top-4 → coarse-group final top-4 + avgk(a)
    def a_partial(b: pa.Table) -> pa.Table:
        cids, sims, ids_np = _cand_sims(b)
        out_a, out_c, out_s = [], [], []
        for j, aid in enumerate(ids_np):
            col = sims[:, j] if len(cids) else np.zeros(0)
            order = np.lexsort((cids, -col))[:K]
            out_a.extend([int(aid)] * len(order))
            out_c.extend(cids[order].tolist())
            out_s.extend(col[order].tolist())
        return pa.table(
            {
                "src_id": pa.array(out_a, pa.int64()),
                "cand_id": pa.array(out_c, pa.int64()),
                "s": pa.array(out_s, pa.float64()),
            }
        )

    def a_final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for aid, g in df.groupby("src_id"):
            g = g.sort_values(
                ["s", "cand_id"], ascending=[False, True],
                kind="mergesort",
            ).head(K)
            aa = _desc_mean(g["s"].to_numpy())
            for row in g.itertuples(index=False):
                out.append((aid, row.cand_id, row.s, aa))
        return pd.DataFrame(
            {
                "src_id": pd.array([o[0] for o in out], dtype="int64"),
                "cand_id": pd.array([o[1] for o in out], dtype="int64"),
                "s": pd.array([o[2] for o in out], dtype="float64"),
                "aa": pd.array([o[3] for o in out], dtype="float64"),
            }
        )

    cands = coarse_group_reduce(
        ds.map_batches(a_partial, batch_format="pyarrow"),
        "src_id",
        a_final,
    )

    joined = bucketed_hash_join(
        cands, bavg, key="cand_id",
        left_columns=["src_id", "s", "aa"], right_columns=["ab"],
    )

    def margin(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        aa = b["aa"].to_numpy(zero_copy_only=False)
        ab = b["ab"].to_numpy(zero_copy_only=False)
        m = [
            _round_half_up(float(v), 6)
            for v in s / ((aa + ab) / 2.0)
        ]
        return pa.table(
            {
                "src_id": b["src_id"],
                "cand_id": b["cand_id"],
                "margin": pa.array(m, pa.float64()),
            }
        )

    return joined.map_batches(margin, batch_format="pyarrow")


def q174_grouped_covariance(sf_dir: str):
    """GROUPED FEATURE COVARIANCE over the embedding table (the PCA /
    whitening / Mahalanobis prep step every embedding pipeline runs) —
    made hash-exact by integer quantization: x_i := floor(1e6 · dim_i)
    is an exact BIGINT in both engines (float32 → float64 is exact, one
    double multiply + floor round identically), and the per-label
    moment sums n, Σx_i, Σx_i·x_j (i ≤ j ≤ 3) are exact int64 — the
    covariance matrix is a driver-side O(k·d²) epilogue the evidence
    fully determines. Shape: ONE numpy pass per batch builds per-label
    partial moment rows (Q^T Q per label — the k-means/covariance
    canonical partial), a coarse label-hash reduce sums them; embedding
    vectors never ride a shuffle."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    D = 4
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])
    pair_idx = [(i, j) for i in range(D) for j in range(i, D)]

    def partial(b: pa.Table) -> pa.Table:
        labels = np.asarray(b["label"].to_pylist(), dtype=np.int64)
        V = np.asarray(
            [e[:D] for e in b["embedding"].to_pylist()], dtype=np.float64
        )
        Q = np.floor(V * 1e6).astype(np.int64)
        rows: list[list[int]] = []
        for lb in np.unique(labels):
            m = labels == lb
            Qm = Q[m]
            C = Qm.T @ Qm
            row = [int(lb), int(m.sum())]
            row += [int(s) for s in Qm.sum(axis=0)]
            row += [int(C[i, j]) for i, j in pair_idx]
            rows.append(row)
        names = (
            ["label", "n"]
            + [f"s{i}" for i in range(D)]
            + [f"c{i}{j}" for i, j in pair_idx]
        )
        return pa.table(
            {
                nm: pa.array([r[k] for r in rows], pa.int64())
                for k, nm in enumerate(names)
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", as_index=False).sum()
        return out.astype({c: "int64" for c in out.columns})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "label", final
    )


def q182_quant_recall(sf_dir: str):
    """SCALAR-QUANTIZATION RECALL AUDIT — the evaluation every vector
    store runs before shipping int8 embeddings: per query (vec_id ≡ 0
    mod 10), the top-10 by exact float cosine (the q15/q166 float-order
    discipline) vs the top-10 by QUANTIZED integer dot (q = floor(1e3·x)
    per dim — exact int64 both engines; dots ≤ 64·(10³)² ≪ 2⁵³ so even
    a double-valued SQL dot is the exact integer), and n_hits = overlap
    of the two sets. Output (query_id, n_hits) is all-integer. ONE
    matmul pass per batch computes BOTH scores; per-batch local top-10s
    → tiny per-query finals; vectors never ride a shuffle."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    TOPK = 10
    qtab = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    qm = pc.equal(
        pc.subtract(
            qtab["vec_id"],
            pc.multiply(pc.divide(qtab["vec_id"], 10), 10),
        ),
        0,
    )
    qsel = qtab.filter(qm)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    Q = np.asarray(qsel["embedding"].to_pylist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Qq = np.floor(Q * 1e3).astype(np.int64)
    qref = ray.put((qids, Qn, Qq))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        ids_np, Qn_b, Qq_b = _ray.get(qref)
        cids = np.asarray(b["vec_id"].to_pylist(), dtype=np.int64)
        V = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Vq = np.floor(V * 1e3).astype(np.int64)
        sims = Vn @ Qn_b.T           # float cosine
        dots = Vq @ Qq_b.T           # exact integer quantized dot
        out_q, e_cand, e_sim, q_cand, q_dot = [], [], [], [], []
        for j, qid in enumerate(ids_np):
            ok = cids != qid
            eo = np.lexsort((cids[ok], -sims[ok, j]))[:TOPK]
            qo = np.lexsort((cids[ok], -dots[ok, j]))[:TOPK]
            k = max(len(eo), len(qo))
            for i in range(k):
                out_q.append(int(qid))
                e_cand.append(int(cids[ok][eo[i]]) if i < len(eo) else -1)
                e_sim.append(float(sims[ok, j][eo[i]]) if i < len(eo)
                             else 0.0)
                q_cand.append(int(cids[ok][qo[i]]) if i < len(qo) else -1)
                q_dot.append(int(dots[ok, j][qo[i]]) if i < len(qo) else 0)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "e_cand": pa.array(e_cand, pa.int64()),
                "e_sim": pa.array(e_sim, pa.float64()),
                "q_cand": pa.array(q_cand, pa.int64()),
                "q_dot": pa.array(q_dot, pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for qid, g in df.groupby("query_id"):
            ge = g[g["e_cand"] >= 0].sort_values(
                ["e_sim", "e_cand"], ascending=[False, True],
                kind="mergesort",
            ).drop_duplicates("e_cand").head(TOPK)
            gq = g[g["q_cand"] >= 0].sort_values(
                ["q_dot", "q_cand"], ascending=[False, True],
                kind="mergesort",
            ).drop_duplicates("q_cand").head(TOPK)
            hits = len(set(ge["e_cand"]) & set(gq["q_cand"]))
            rows.append((int(qid), hits))
        return pd.DataFrame(
            {
                "query_id": pd.array([r[0] for r in rows], dtype="int64"),
                "n_hits": pd.array([r[1] for r in rows], dtype="int64"),
            }
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "query_id", final
    )


def q322_mmr_diversified_topk(sf_dir: str):
    """MMR DIVERSIFIED TOP-K — maximal-marginal-relevance selection
    (the dedup-aware retrieval verb): greedily pick 5 vectors
    maximizing 2·rel(i) − max_{s∈selected} sim(i,s), where rel/sim are
    dot products over embeddings QUANTIZED to int64 (×10⁶) so every
    score is exact-integer on both sides (float-sum order can't flip
    an argmax). Each greedy round is one distributed argmax: per-batch
    local top-1 against the ≤k-row broadcast selected set, then a tiny
    driver reduce — k passes total, nothing row-scale materializes."""
    qtab = pq.read_table(
        _p(sf_dir, "embeddings"),
        filters=[("vec_id", "=", 0)],  # row-group-pruned point read
    )
    qv = np.rint(
        np.asarray(qtab["embedding"].to_pylist()[0], dtype=np.float64) * 1e6
    ).astype(np.int64)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    K = 5

    selected: list[tuple[int, np.ndarray]] = []
    ranks = []
    for rank in range(1, K + 1):
        sel_ids = frozenset(i for i, _ in selected)
        sel_mat = (
            np.stack([v for _, v in selected]) if selected else None
        )

        def local_top1(b: pa.Table, _ids=sel_ids, _mat=sel_mat) -> pa.Table:
            ids = b["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
            emb = np.rint(
                np.asarray(b["embedding"].to_pylist(), dtype=np.float64) * 1e6
            ).astype(np.int64)
            keep = np.array(
                [i != 0 and i not in _ids for i in ids], dtype=bool
            )
            if not keep.any():
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.int64()),
                     "emb": pa.array([], pa.list_(pa.int64()))}
                )
            ids, emb = ids[keep], emb[keep]
            rel = emb @ qv
            if _mat is not None:
                div = (emb @ _mat.T).max(axis=1)
            else:
                div = np.zeros(len(ids), dtype=np.int64)
            score = 2 * rel - div
            order = np.lexsort((ids, -score))
            j = order[0]
            # ship the winner's embedding so the driver never re-reads
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[j])], pa.int64()),
                    "score": pa.array([int(score[j])], pa.int64()),
                    "emb": pa.array([emb[j].tolist()], pa.list_(pa.int64())),
                }
            )

        cands = ds.map_batches(local_top1, batch_format="pyarrow").to_pandas()
        cands = cands.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        )
        win = int(cands["vec_id"].iloc[0])
        ranks.append((rank, win, int(cands["score"].iloc[0])))
        wv = np.asarray(cands["emb"].iloc[0], dtype=np.int64)
        selected.append((win, wv))

    return pd.DataFrame(ranks, columns=["rank", "vec_id", "score"]).astype(
        {"rank": "int64", "vec_id": "int64", "score": "int64"}
    )


def q221_ivf_recall(sf_dir: str):
    """IVF WITH TRAINED CENTROIDS + RECALL@K — `ivf_topk_trained`
    promoted to the driver hash (round-3 verdict item 5), kept
    integer-exact end to end: seeds = quantized vectors of the 16
    lowest vec_ids (row-group predicate pushdown, no full scan); 2
    distributed Lloyd rounds with elementwise floor-mean centroid
    updates (`stages/kmeans.kmeans_fit_int` — broadcast partial sums,
    no shuffle, bit-identical to the SQL twin's two unrolled CTE
    rounds); then for n_probe ∈ {1, 2, 4} the integer IVF top-10
    (`ivf_topk_int`) is compared against the EXACT integer top-10
    (probe-all), reporting n_hit, recall@10 and the found-id sum as
    evidence. The recall column is what a 100-TB operator tunes
    n_probe against — the (1 − n_probe/C) pruning is the entire point
    of IVF at scale."""
    from basicocr_ray.stages.embed import ivf_topk_int, quantize_vec
    from basicocr_ray.stages.kmeans import kmeans_fit_int

    head = pq.read_table(
        _p(sf_dir, "embeddings"), columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 16)],
    ).sort_by("vec_id")
    seeds = quantize_vec(
        np.asarray(head["embedding"].to_pylist(), dtype=np.float64)
    )
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents = kmeans_fit_int(ds, seeds, n_iters=2)
    qvec = seeds[0]  # query = vec 0 quantized (q15/q115 convention)

    def topk_ids(n_probe: int) -> list[int]:
        df = ivf_topk_int(
            ds, qvec, cents, k=10, n_probe=n_probe,
            exclude_ids=frozenset({0}),
        ).to_pandas()
        return [int(i) for i in df["vec_id"]]

    exact = set(topk_ids(len(cents)))  # probe-all == exact top-k
    rows = []
    for p in (1, 2, 4):
        ids = topk_ids(p)
        n_hit = sum(1 for i in ids if i in exact)
        rows.append(
            {
                "n_probe": p,
                "n_hit": n_hit,
                "recall_at_10": n_hit / 10.0,
                "sum_ids": sum(ids),
            }
        )
    return pd.DataFrame(rows).astype(
        {"n_probe": "int64", "n_hit": "int64",
         "recall_at_10": "float64", "sum_ids": "int64"}
    )


__all__ = [
    "q15_ann_cosine",
    "q24_embed_dup_pairs",
    "q59_knn_join_label",
    "q92_kmeans_assign",
    "q115_ivf_ann_int",
    "q130_embedding_outliers",
    "q152_sparse_dot_topk",
    "q156_semdedup",
    "q166_rrf_fusion",
    "q167_margin_mining",
    "q174_grouped_covariance",
    "q182_quant_recall",
    "q221_ivf_recall",
    "q322_mmr_diversified_topk",
]


QUERIES = {
    "q15_ann_cosine": q15_ann_cosine,
    "q24_embed_dup_pairs": q24_embed_dup_pairs,
    "q59_knn_join_label": q59_knn_join_label,
    "q92_kmeans_assign": q92_kmeans_assign,
    "q115_ivf_ann_int": q115_ivf_ann_int,
    "q130_embedding_outliers": q130_embedding_outliers,
    "q152_sparse_dot_topk": q152_sparse_dot_topk,
    "q156_semdedup": q156_semdedup,
    "q166_rrf_fusion": q166_rrf_fusion,
    "q167_margin_mining": q167_margin_mining,
    "q174_grouped_covariance": q174_grouped_covariance,
    "q182_quant_recall": q182_quant_recall,
    "q221_ivf_recall": q221_ivf_recall,
    "q322_mmr_diversified_topk": q322_mmr_diversified_topk,
}


ORACLE_SQL = {
    "q221_ivf_recall": """
        -- trained-IVF recall: 2 unrolled integer Lloyd rounds (seeds =
        -- vec_id < 16), then per-n_probe top-10 vs the probe-all exact
        -- top-10; floor-means and squared-L2 are exact BIGINT/DOUBLE
        WITH ev AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                 ) AS v
          FROM embeddings
        ),
        q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
        c0 AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < 16),
        d0 AS (
          SELECT e.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM ev e CROSS JOIN c0 c
        ),
        a0 AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) rn
            FROM d0) WHERE rn = 1
        ),
        m1 AS (
          SELECT a0.cid, i.i AS i,
                 CAST(floor(CAST(sum(e.v[i.i]) AS DOUBLE) / count(*))
                      AS BIGINT) AS x
          FROM ev e JOIN a0 ON a0.vec_id = e.vec_id
          CROSS JOIN range(1, 65) i(i)
          GROUP BY 1, 2
        ),
        c1 AS (
          SELECT c0.cid, coalesce(l.cv2, c0.cv) AS cv
          FROM c0 LEFT JOIN (
            SELECT cid, list(x ORDER BY i) AS cv2 FROM m1 GROUP BY 1) l
          USING (cid)
        ),
        d1 AS (
          SELECT e.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM ev e CROSS JOIN c1 c
        ),
        a1 AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) rn
            FROM d1) WHERE rn = 1
        ),
        m2 AS (
          SELECT a1.cid, i.i AS i,
                 CAST(floor(CAST(sum(e.v[i.i]) AS DOUBLE) / count(*))
                      AS BIGINT) AS x
          FROM ev e JOIN a1 ON a1.vec_id = e.vec_id
          CROSS JOIN range(1, 65) i(i)
          GROUP BY 1, 2
        ),
        c2 AS (
          SELECT c1.cid, coalesce(l.cv2, c1.cv) AS cv
          FROM c1 LEFT JOIN (
            SELECT cid, list(x ORDER BY i) AS cv2 FROM m2 GROUP BY 1) l
          USING (cid)
        ),
        dq AS (
          SELECT c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM c2 c CROSS JOIN q
        ),
        pr AS (SELECT cid, row_number() OVER (ORDER BY d, cid) AS pr FROM dq),
        df AS (
          SELECT e.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM ev e CROSS JOIN c2 c
        ),
        af AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) rn
            FROM df) WHERE rn = 1
        ),
        dots AS (
          SELECT e.vec_id, af.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> e.v[i] * q.qv[i]
                 )) AS BIGINT) AS dot
          FROM ev e JOIN af USING (vec_id) CROSS JOIN q
          WHERE e.vec_id <> 0
        ),
        cand AS (
          SELECT l.p, d.vec_id, d.dot
          FROM dots d
          JOIN pr ON pr.cid = d.cid
          CROSS JOIN (SELECT unnest([1, 2, 4, 16]) AS p) l
          WHERE pr.pr <= l.p
        ),
        topk AS (
          SELECT p, vec_id FROM (
            SELECT p, vec_id,
                   row_number() OVER (
                     PARTITION BY p ORDER BY dot DESC, vec_id) rn
            FROM cand) WHERE rn <= 10
        ),
        exact AS (SELECT vec_id FROM topk WHERE p = 16),
        agg AS (
          SELECT t.p,
                 CAST(count(x.vec_id) AS BIGINT) AS n_hit,
                 CAST(sum(t.vec_id) AS BIGINT) AS sum_ids
          FROM topk t LEFT JOIN exact x USING (vec_id)
          WHERE t.p IN (1, 2, 4)
          GROUP BY 1
        )
        SELECT CAST(l.p AS BIGINT) AS n_probe,
               coalesce(a.n_hit, 0) AS n_hit,
               CAST(coalesce(a.n_hit, 0) AS DOUBLE) / 10 AS recall_at_10,
               coalesce(a.sum_ids, 0) AS sum_ids
        FROM (SELECT unnest([1, 2, 4]) AS p) l
        LEFT JOIN agg a USING (p)
    """,
    "q15_ann_cosine": """
        SELECT e2.vec_id,
               round(list_cosine_similarity(
                 CAST(e1.embedding AS DOUBLE[]),
                 CAST(e2.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings e1, embeddings e2
        WHERE e1.vec_id = 0 AND e2.vec_id <> 0
        ORDER BY list_cosine_similarity(
                 CAST(e1.embedding AS DOUBLE[]),
                 CAST(e2.embedding AS DOUBLE[])) DESC, e2.vec_id
        LIMIT 10
    """,
    "q24_embed_dup_pairs": """
        SELECT vec_id AS id_a, vec_id + 10000 AS id_b FROM embeddings
    """,
    "q59_knn_join_label": """
        WITH pairs AS (
          SELECT a.label, a.vec_id, b.vec_id AS nbr_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id <> b.vec_id
        ), ranked AS (
          SELECT label, vec_id, nbr_id, sim,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY sim DESC, nbr_id
                 ) AS nbr_rank
          FROM pairs
        )
        SELECT CAST(label AS BIGINT) AS label, vec_id,
               CAST(nbr_rank AS BIGINT) AS nbr_rank, nbr_id,
               round(sim, 6) AS sim
        FROM ranked WHERE nbr_rank <= 3
    """,
    "q92_kmeans_assign": """
        WITH cen AS (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 4
        ),
        d AS (
          SELECT e.vec_id, c.cid,
                 list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec) AS dist
          FROM embeddings e CROSS JOIN cen c
        ),
        a AS (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d
        )
        SELECT CAST(cid AS BIGINT) AS cluster, count(*) AS n_vecs,
               CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
        FROM a WHERE rn = 1 GROUP BY cid
    """,
    "q115_ivf_ann_int": """
        -- integer-exact IVF: quantize → assign argmin cell over 8 fixed
        -- centroids (vec_id < 8) → score only the query's 3 nearest cells
        WITH ev AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                 ) AS v
          FROM embeddings
        ),
        q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
        cent AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < 8),
        d2 AS (
          SELECT e.vec_id, c.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                 )) AS BIGINT) AS d
          FROM ev e CROSS JOIN cent c
        ),
        assigned AS (
          SELECT vec_id, cid, d,
                 row_number() OVER (
                   PARTITION BY vec_id ORDER BY d, cid
                 ) AS rn
          FROM d2
        ),
        cells AS (SELECT vec_id, cid AS cell FROM assigned WHERE rn = 1),
        probe AS (
          SELECT cid AS cell FROM assigned WHERE vec_id = 0 AND rn <= 3
        ),
        scored AS (
          SELECT e.vec_id, cl.cell,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> e.v[i] * q.qv[i]
                 )) AS BIGINT) AS dot
          FROM ev e
          JOIN cells cl ON cl.vec_id = e.vec_id
          JOIN probe p ON p.cell = cl.cell
          CROSS JOIN q
          WHERE e.vec_id <> 0
        )
        SELECT vec_id, cell, dot FROM scored
        ORDER BY dot DESC, vec_id LIMIT 10
    """,
    "q130_embedding_outliers": """
        -- integer outlier score n^2*dist^2 = sum_i (n*x_i - s_i)^2 over
        -- scale-1000 quantized vectors; argmax per label, ties to the
        -- lowest vec_id
        WITH ev AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
                 ) AS v
          FROM embeddings
        ),
        el AS (
          SELECT vec_id, label, i.i AS i, v[i.i] AS x
          FROM ev CROSS JOIN range(1, 65) i(i)
        ),
        cs AS (
          SELECT label, i, CAST(sum(x) AS BIGINT) AS s
          FROM el GROUP BY 1, 2
        ),
        cn AS (SELECT label, count(*) AS n FROM ev GROUP BY 1),
        sc AS (
          SELECT e.vec_id, e.label,
                 CAST(sum(
                   (cn.n * e.x - cs.s) * (cn.n * e.x - cs.s)
                 ) AS BIGINT) AS score
          FROM el e
          JOIN cs ON cs.label = e.label AND cs.i = e.i
          JOIN cn ON cn.label = e.label
          GROUP BY 1, 2
        ),
        best AS (
          SELECT label, vec_id, score,
                 row_number() OVER (
                   PARTITION BY label ORDER BY score DESC, vec_id
                 ) AS rn
          FROM sc
        )
        SELECT label, vec_id, score FROM best WHERE rn = 1
    """,
    "q152_sparse_dot_topk": """
        WITH toks AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(text), '\\s+') AS t
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(t)), i -> t[i] || ' ' || t[i+1]
          )) AS term
          FROM toks
        ),
        tf AS (
          SELECT term, doc_id, count(*) AS tf
          FROM bg GROUP BY 1, 2
        ),
        rare AS (
          SELECT term FROM tf GROUP BY term
          HAVING count(*) BETWEEN 2 AND 20
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(sum(x.tf * y.tf) AS BIGINT) AS score
          FROM tf x
          JOIN tf y ON x.term = y.term AND x.doc_id < y.doc_id
          JOIN rare r ON x.term = r.term
          GROUP BY 1, 2
        )
        SELECT a, b, score FROM pairs
        ORDER BY score DESC, a, b LIMIT 20
    """,
    "q156_semdedup": """
        -- q92's fixed-centroid assignment over corpus ∪ exact clones,
        -- then the SemDeDup lower-id prune; threshold 0.9 sits in the
        -- measured (0.48, 1.0) cosine gap so float noise cannot flip it
        WITH all_v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
          UNION ALL
          SELECT vec_id + 10000, CAST(embedding AS DOUBLE[])
          FROM embeddings
        ),
        cen AS (
          SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
          FROM embeddings WHERE vec_id < 8
        ),
        a AS (
          SELECT all_v.vec_id, cid, v,
                 row_number() OVER (
                   PARTITION BY all_v.vec_id
                   ORDER BY list_distance(v, cvec), cid
                 ) AS rn
          FROM all_v CROSS JOIN cen
        ),
        asg AS (
          SELECT vec_id, cid AS cluster, v FROM a WHERE rn = 1
        )
        SELECT s.vec_id, CAST(s.cluster AS BIGINT) AS cluster
        FROM asg s
        WHERE NOT EXISTS (
          SELECT 1 FROM asg t
          WHERE t.cluster = s.cluster AND t.vec_id < s.vec_id
            AND list_cosine_similarity(t.v, s.v) >= 0.9
        )
    """,
    "q166_rrf_fusion": r"""
        -- hybrid retrieval: dense cosine top-5 + sparse rare-bigram
        -- top-5 fused by RRF (k=60; at most two fixed-order additions,
        -- so the float comparison is engine-identical); integer output
        WITH dsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a, embeddings b
          WHERE a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        d5 AS (
          SELECT query_id, cand_id, r FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY sim DESC, cand_id
                   ) AS r
            FROM dsim) WHERE r <= 5
        ),
        toks AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(text), '\s+') AS t
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(t)), i -> t[i] || ' ' || t[i+1]
          )) AS term
          FROM toks
        ),
        tf AS (
          SELECT term, doc_id, count(*) AS tf
          FROM bg GROUP BY 1, 2
        ),
        rare AS (
          SELECT term FROM tf GROUP BY term
          HAVING count(*) BETWEEN 2 AND 20
        ),
        sp AS (
          SELECT x.doc_id AS query_id, y.doc_id AS cand_id,
                 CAST(sum(x.tf * y.tf) AS BIGINT) AS score
          FROM tf x
          JOIN tf y ON x.term = y.term AND y.doc_id <> x.doc_id
          JOIN rare r ON x.term = r.term
          WHERE x.doc_id % 10 = 0
          GROUP BY 1, 2
        ),
        s5 AS (
          SELECT query_id, cand_id, r FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, cand_id
                   ) AS r
            FROM sp) WHERE r <= 5
        ),
        u AS (
          SELECT coalesce(d.query_id, s.query_id) AS query_id,
                 coalesce(d.cand_id, s.cand_id) AS cand_id,
                 coalesce(d.r, 0) AS r_dense,
                 coalesce(s.r, 0) AS r_sparse
          FROM d5 d FULL OUTER JOIN s5 s
            ON d.query_id = s.query_id AND d.cand_id = s.cand_id
        ),
        f AS (
          SELECT query_id, cand_id, r_dense, r_sparse,
                 (CASE WHEN r_dense > 0
                       THEN 1.0 / (60 + r_dense) ELSE 0.0 END)
                 + (CASE WHEN r_sparse > 0
                         THEN 1.0 / (60 + r_sparse) ELSE 0.0 END) AS rrf
          FROM u
        )
        SELECT query_id, cand_id,
               CAST(fr AS BIGINT) AS fused_rank,
               CAST(r_dense AS BIGINT) AS r_dense,
               CAST(r_sparse AS BIGINT) AS r_sparse
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, cand_id
          ) AS fr FROM f
        ) WHERE fr <= 3
    """,
    "q167_margin_mining": """
        -- CCMatrix-style ratio margin: source side = label 0; per
        -- (source, top-4 candidate) margin = cos / mean of top-4
        -- cosines of each endpoint against the other side
        WITH a AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE label = 0
        ),
        b AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings WHERE label <> 0
        ),
        sims AS (
          SELECT a.vec_id AS sa, b.vec_id AS sb,
                 list_cosine_similarity(a.e, b.e) AS s
          FROM a, b
        ),
        atop AS (
          SELECT sa, sb, s,
                 row_number() OVER (
                   PARTITION BY sa ORDER BY s DESC, sb
                 ) AS rn
          FROM sims
        ),
        aavg AS (
          SELECT sa, avg(s) AS aa FROM atop WHERE rn <= 4 GROUP BY sa
        ),
        btop AS (
          SELECT sb, s,
                 row_number() OVER (
                   PARTITION BY sb ORDER BY s DESC, sa
                 ) AS rn
          FROM sims
        ),
        bavg AS (
          SELECT sb, avg(s) AS ab FROM btop WHERE rn <= 4 GROUP BY sb
        )
        SELECT t.sa AS src_id, t.sb AS cand_id,
               round(t.s / ((aavg.aa + bavg.ab) / 2), 6) AS margin
        FROM atop t
        JOIN aavg USING (sa)
        JOIN bavg ON t.sb = bavg.sb
        WHERE t.rn <= 4
    """,
    "q174_grouped_covariance": """
        -- integer-quantized moment sums: x_i = floor(1e6 * dim_i) is an
        -- exact BIGINT in both engines, so every sum is order-invariant
        WITH q AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x0,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x1,
                 CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x2,
                 CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000)
                      AS BIGINT) AS x3
          FROM embeddings
        )
        SELECT label, count(*) AS n,
               CAST(sum(x0) AS BIGINT) AS s0,
               CAST(sum(x1) AS BIGINT) AS s1,
               CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x3) AS BIGINT) AS s3,
               CAST(sum(x0*x0) AS BIGINT) AS c00,
               CAST(sum(x0*x1) AS BIGINT) AS c01,
               CAST(sum(x0*x2) AS BIGINT) AS c02,
               CAST(sum(x0*x3) AS BIGINT) AS c03,
               CAST(sum(x1*x1) AS BIGINT) AS c11,
               CAST(sum(x1*x2) AS BIGINT) AS c12,
               CAST(sum(x1*x3) AS BIGINT) AS c13,
               CAST(sum(x2*x2) AS BIGINT) AS c22,
               CAST(sum(x2*x3) AS BIGINT) AS c23,
               CAST(sum(x3*x3) AS BIGINT) AS c33
        FROM q GROUP BY 1
    """,
    "q182_quant_recall": """
        -- exact-cosine top-10 vs int-quantized-dot top-10 per query;
        -- the quantized dot is integer-valued (floor(1e3·x) per dim)
        -- so even a double-valued SQL dot is exact
        WITH dsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])) AS sim
          FROM embeddings a, embeddings b
          WHERE a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        e10 AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, cand_id) AS rn
            FROM dsim
          ) WHERE rn <= 10
        ),
        qv AS (
          SELECT vec_id, list_transform(
                   embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
          FROM embeddings
        ),
        qsim AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
                 CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
          FROM qv a JOIN qv b
            ON a.vec_id % 10 = 0 AND b.vec_id <> a.vec_id
        ),
        q10 AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dot DESC, cand_id) AS rn
            FROM qsim
          ) WHERE rn <= 10
        ),
        queries AS (
          SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 10 = 0
        ),
        hits AS (
          SELECT e10.query_id, count(*) AS c
          FROM e10 JOIN q10 USING (query_id, cand_id) GROUP BY 1
        )
        SELECT q.query_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits
        FROM queries q LEFT JOIN hits h USING (query_id)
    """,
    "q322_mmr_diversified_topk": """
        -- five explicit greedy rounds over exact-integer quantized dots
        WITH e AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]),
                                x -> CAST(round(x * 1000000) AS BIGINT)) AS q
          FROM embeddings
        ),
        qv AS (SELECT q FROM e WHERE vec_id = 0),
        rel AS (
          SELECT e.vec_id,
                 CAST(list_dot_product(
                   CAST(e.q AS DOUBLE[]), CAST(qv.q AS DOUBLE[])
                 ) AS BIGINT) AS r
          FROM e, qv WHERE e.vec_id <> 0
        ),
        s1 AS (SELECT vec_id, 2 * r AS sc FROM rel
               ORDER BY sc DESC, vec_id LIMIT 1),
        sel1 AS (SELECT vec_id FROM s1),
        s2 AS (
          SELECT ei.vec_id,
                 2 * max(rel.r) - max(CAST(list_dot_product(
                   CAST(ei.q AS DOUBLE[]), CAST(es.q AS DOUBLE[])
                 ) AS BIGINT)) AS sc
          FROM rel JOIN e ei ON ei.vec_id = rel.vec_id
          JOIN e es ON es.vec_id IN (SELECT vec_id FROM sel1)
          WHERE ei.vec_id NOT IN (SELECT vec_id FROM sel1)
          GROUP BY ei.vec_id ORDER BY sc DESC, ei.vec_id LIMIT 1
        ),
        sel2 AS (SELECT vec_id FROM sel1 UNION ALL SELECT vec_id FROM s2),
        s3 AS (
          SELECT ei.vec_id,
                 2 * max(rel.r) - max(CAST(list_dot_product(
                   CAST(ei.q AS DOUBLE[]), CAST(es.q AS DOUBLE[])
                 ) AS BIGINT)) AS sc
          FROM rel JOIN e ei ON ei.vec_id = rel.vec_id
          JOIN e es ON es.vec_id IN (SELECT vec_id FROM sel2)
          WHERE ei.vec_id NOT IN (SELECT vec_id FROM sel2)
          GROUP BY ei.vec_id ORDER BY sc DESC, ei.vec_id LIMIT 1
        ),
        sel3 AS (SELECT vec_id FROM sel2 UNION ALL SELECT vec_id FROM s3),
        s4 AS (
          SELECT ei.vec_id,
                 2 * max(rel.r) - max(CAST(list_dot_product(
                   CAST(ei.q AS DOUBLE[]), CAST(es.q AS DOUBLE[])
                 ) AS BIGINT)) AS sc
          FROM rel JOIN e ei ON ei.vec_id = rel.vec_id
          JOIN e es ON es.vec_id IN (SELECT vec_id FROM sel3)
          WHERE ei.vec_id NOT IN (SELECT vec_id FROM sel3)
          GROUP BY ei.vec_id ORDER BY sc DESC, ei.vec_id LIMIT 1
        ),
        sel4 AS (SELECT vec_id FROM sel3 UNION ALL SELECT vec_id FROM s4),
        s5 AS (
          SELECT ei.vec_id,
                 2 * max(rel.r) - max(CAST(list_dot_product(
                   CAST(ei.q AS DOUBLE[]), CAST(es.q AS DOUBLE[])
                 ) AS BIGINT)) AS sc
          FROM rel JOIN e ei ON ei.vec_id = rel.vec_id
          JOIN e es ON es.vec_id IN (SELECT vec_id FROM sel4)
          WHERE ei.vec_id NOT IN (SELECT vec_id FROM sel4)
          GROUP BY ei.vec_id ORDER BY sc DESC, ei.vec_id LIMIT 1
        )
        SELECT CAST(1 AS BIGINT) AS rank, vec_id, CAST(sc AS BIGINT)
               AS score FROM s1
        UNION ALL SELECT 2, vec_id, CAST(sc AS BIGINT) FROM s2
        UNION ALL SELECT 3, vec_id, CAST(sc AS BIGINT) FROM s3
        UNION ALL SELECT 4, vec_id, CAST(sc AS BIGINT) FROM s4
        UNION ALL SELECT 5, vec_id, CAST(sc AS BIGINT) FROM s5
    """,
}
