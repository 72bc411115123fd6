"""Text analysis over documents: tokens, n-grams, quality, lang-id, PII (SURVEY §2.2 M7-M11, G3; LLM-data brief).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.core.textstats import ws_tokens
from basicocr_ray.core.textstats import md5_low64 as _md5_low64
from basicocr_ray.stages.wide import count_terms
from basicocr_ray.stages.wide import make_ngram_items
from basicocr_ray.stages.wide import token_items
from basicocr_ray.stages.wide import top_k

from ._shared import (
    _TOKS,
    _read,
    _round_col,
    _round_half_up,
)


def q07_token_freq(sf_dir: str):
    """Word-frequency build (G3): flat_map tokens → partial counts →
    groupby sum → top-100."""
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", token_items, "token")
    return top_k(counts, 100, "cnt", "token")


def q08_bigram_freq(sf_dir: str):
    """n-gram count/merge (G4) with n=2 — the language-model.md:168-197
    sharded count-then-merge, as partial+final groupby."""
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", make_ngram_items(2), "bigram")
    return top_k(counts, 100, "cnt", "bigram")


def q26_trigram_freq(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])
    counts = count_terms(ds, "text", make_ngram_items(3), "trigram")
    return top_k(counts, 100, "cnt", "trigram")


def q12_token_count(sf_dir: str):
    """Per-doc token counting (text-analysis op)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def cnt(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(
                    [len(ws_tokens(t or "")) for t in batch["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(cnt, batch_format="pyarrow")


_STOP5 = ("the", "a", "data", "key", "value")


def q16_quality(sf_dir: str):
    """Quality scoring: token/stopword stats per doc (text-analysis op)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def q(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        nt, ns, ratio = [], [], []
        for t in batch["text"].to_pylist():
            toks = ws_tokens(t or "")
            s = sum(1 for x in toks if x in _STOP5)
            nt.append(len(toks))
            ns.append(s)
            ratio.append(_round_half_up(s / len(toks), 6) if toks else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "stop_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")


def q25_normalize(sf_dir: str):
    """Width-fold + lowercase normalization (M8, `trietree_correct.py:45-72`
    `uniform`): full-width → half-width then lowercase. On the ASCII
    `documents` corpus Q2B is the identity, so the oracle reduces to
    lower(text); the fold itself is golden-tested in tests/test_core.py."""
    from basicocr_ray.core.normalize import uniform

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "norm_text": pa.array(
                    [uniform(t or "") for t in batch["text"].to_pylist()],
                    pa.large_string(),
                ),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def q48_tf_df(sf_dir: str):
    """Doc-term matrix with corpus document frequencies — the exact
    integer core of TF-IDF (the log-weighted score itself is libm float;
    its inputs hash): per-doc term frequencies from one flat pass, df per
    token via the count_terms discipline over per-doc DISTINCT tokens,
    attached via a BUCKETED HASH JOIN on the token (string keys bucket by
    a stable hash) — the df relation never touches the driver, so an
    open-vocabulary corpus stays bounded (the round-2 formulation
    `take_all()`'d the whole (token, df) table and broadcast it). Emits
    (doc_id, token, tf, df) for tf ≥ 2."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import count_terms, token_items

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def distinct_items(text: str) -> list[str]:
        return sorted(set(token_items(text)))

    df_ds = count_terms(ds, "text", distinct_items, "token").map_batches(
        lambda b: pa.table({"token": b["token"], "df": b["cnt"]}),
        batch_format="pyarrow",
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter

        out_doc, out_tok, out_tf = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok, n in Counter(token_items(t or "")).items():
                if n >= 2:
                    out_doc.append(did)
                    out_tok.append(tok)
                    out_tf.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "token": pa.array(out_tok, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )

    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow")
    return bucketed_hash_join(
        tf_ds, df_ds, "token", ["doc_id", "tf"], ["df"]
    ).select_columns(["doc_id", "token", "tf", "df"])


def q52_pii_redact(sf_dir: str):
    """PII scrub — the redaction pass every crawl-to-training-corpus
    pipeline runs before anything else. Emails are PLANTED deterministically
    (doc_id ≡ 0 mod 3 → appended address; the q50 planting discipline, so
    the oracle predicts exact counts), matched with a regex valid under
    BOTH engines (Python `re` and DuckDB's RE2 agree on this subset), and
    the redacted text is verified by md5 + removed-byte count — exact
    string evidence, not just counts."""
    import hashlib
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    email_re = _re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")

    def redact(batch: pa.Table) -> pa.Table:
        out_id, out_n, out_removed, out_md5 = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = t or ""
            if did % 3 == 0:
                t = f"{t} contact-{did}@example.com"
            red, n = email_re.subn("<EMAIL>", t)
            out_id.append(did)
            out_n.append(n)
            out_removed.append(len(t) - len(red))
            out_md5.append(hashlib.md5(red.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_emails": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_removed, pa.int64()),
                "redacted_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(redact, batch_format="pyarrow")


def q54_grouped_string_agg(sf_dir: str):
    """ORDERED in-group aggregation (string_agg with ORDER BY — an operator
    shape none of q01–q53 exercise): per order status, the comma-joined
    keys of its 3 highest-value orders. Per-batch partial top-3 bounds the
    shuffle at 3 rows × statuses per batch; the final per-status sort+join
    is exact because top-3-of-top-3s is top-3."""
    ds = _read(
        sf_dir, "orders",
        columns=["o_orderstatus", "o_totalprice", "o_orderkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_orderstatus", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("o_orderstatus", group_keys=False)[df.columns].head(3)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(3)
        return pd.DataFrame(
            {
                "o_orderstatus": [df["o_orderstatus"].iloc[0]],
                "top_keys": [",".join(str(k) for k in df["o_orderkey"])],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderstatus")
        .map_groups(final, batch_format="pandas")
    )


def q64_tfidf_topk(sf_dir: str):
    """TF-IDF top-3 terms per document, end to end distributed: q48's
    tf⋈df bucketed join (token-keyed, df never on the driver) → score →
    per-doc top-3 in doc-keyed coarse groups (the q18 discipline). The
    score is the exact rational tf·N/df — ONE IEEE division of exactly
    representable ints, so Ray and the SQL twin agree bit-for-bit where a
    libm log() would drift ulps; ties break on the token."""
    from basicocr_ray.stages.dedup import _coarse_salts

    tfdf = q48_tf_df(sf_dir)
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    salts = _coarse_salts(None)

    def add_score(b: pa.Table) -> pa.Table:
        score = pc.divide(
            pc.cast(pc.multiply(b["tf"], n_docs), pa.float64()),
            pc.cast(b["df"], pa.float64()),
        )
        cg = pc.cast(
            pc.bit_wise_and(pc.cast(b["doc_id"], pa.int64()), salts - 1),
            pa.int32(),
        )
        return pa.table(
            {"doc_id": b["doc_id"], "token": b["token"],
             "score": score, "cg": cg}
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        return g.groupby("doc_id").head(3)[["doc_id", "token", "score"]]

    return (
        tfdf.map_batches(add_score, batch_format="pyarrow")
        .groupby("cg")
        .map_groups(topk, batch_format="pandas")
    )


def q72_repetition_stats(sf_dir: str):
    """Per-document repetition signal (the Gopher/MassiveText
    duplicate-n-gram quality rule, Rae et al. 2021 §A1.1 — kept as the
    integer pair (total, distinct) so the driver hash is float-free):
    word-bigram totals vs distincts per doc. Pure per-batch map — no
    shuffle at any scale."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        ids, tot, dis = [], [], []
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            toks = (t or "").lower().split()
            grams = list(zip(toks, toks[1:]))
            ids.append(did)
            tot.append(len(grams))
            dis.append(len(set(grams)))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(tot, pa.int64()),
                "n_distinct": pa.array(dis, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def q86_dense_rank_tokens(sf_dir: str):
    """Per-language DENSE_RANK token leaderboard: every token whose
    count ties one of the top-2 distinct frequency values in its
    language (rank-with-ties — the variant plain top-k truncates
    wrong). Two metadata shuffles: (lang, token) partial counts fold in
    coarse groups of the composite hash; the per-lang dense-rank filter
    then runs in coarse groups of the LANG hash, where pandas
    rank(method="dense") over the (small) aggregated count table is the
    whole window function."""
    from basicocr_ray.stages.dedup import _coarse_salts

    salts = _coarse_salts(None)
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def explode_count(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower().str.split()
        e = pd.DataFrame(
            {"lang": df["lang"], "token": t}
        ).explode("token")
        e = e[e["token"].notna() & (e["token"] != "")]
        g = e.groupby(["lang", "token"], as_index=False).agg(
            n=("token", "size")
        )
        h = pd.util.hash_pandas_object(
            g[["lang", "token"]], index=False
        ).to_numpy()
        g["cg"] = (h & (salts - 1)).astype("int32")
        return g

    def final_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "token"], as_index=False)["n"].sum()
        h = pd.util.hash_array(out["lang"].to_numpy())
        out["cg2"] = (h & (salts - 1)).astype("int32")
        return out.astype({"n": "int64"})

    def dense_top2(df: pd.DataFrame) -> pd.DataFrame:
        rnk = (
            df.groupby("lang")["n"]
            .rank(method="dense", ascending=False)
            .astype("int64")
        )
        out = df.loc[rnk <= 2, ["lang", "token", "n"]].copy()
        out["rnk"] = rnk[rnk <= 2]
        return out.astype({"n": "int64", "rnk": "int64"})

    return (
        ds.map_batches(explode_count, batch_format="pandas")
        .groupby("cg")
        .map_groups(final_counts, batch_format="pandas")
        .groupby("cg2")
        .map_groups(dense_top2, batch_format="pandas")
    )


def q87_oov_rate(sf_dir: str):
    """OOV-rate quality signal (the CCNet/fastText-era LM-vocabulary
    filter reduced to its integer core): per document, total tokens and
    tokens OUTSIDE the corpus top-100 vocabulary. The vocabulary comes
    from the distributed count (count_terms partial+final) pruned to a
    deterministic top-k (count desc, token asc) — a BOUNDED broadcast by
    construction (K entries, the fit_bigram_lm max_vocab discipline),
    then one zero-shuffle membership scan."""
    import ray

    from basicocr_ray.core.collect import collect_rows
    from basicocr_ray.stages.wide import count_terms, token_items, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counts = count_terms(
        _read(sf_dir, "documents", columns=["text"]), "text", token_items
    )
    vocab = frozenset(
        r["token"] for r in collect_rows(top_k(counts, 100, "cnt", "token"))
    )
    ref = ray.put(vocab)

    def stats(b: pa.Table) -> pa.Table:
        v = ray.get(ref)
        ids, n_tok, n_oov = [], [], []
        for did, t in zip(
            b["doc_id"].to_pylist(), b["text"].to_pylist()
        ):
            toks = token_items(t or "")
            ids.append(did)
            n_tok.append(len(toks))
            n_oov.append(sum(1 for x in toks if x not in v))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def q40_cjk_segment(sf_dir: str):
    """Dictionary-based CJK segmentation end-to-end (M14, the HanLP pass of
    `Test.java:20-53`): synthesize zh text from each document via a
    BIJECTIVE token → 2-CJK-char mapping (every glyph char belongs to
    exactly one word, so forward maximum matching provably recovers the
    original token sequence), segment with the broadcast-lexicon FMM actor
    pool, and return per-doc segment counts. The DuckDB twin computes the
    same counts from the original whitespace tokens — equal by the
    bijection, so the hash check verifies the segmenter recovered every
    word boundary."""
    import ray

    from basicocr_ray.stages.segment import SegmentTokenizer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = sorted(
        r["token"]
        for r in collect_rows(count_terms(ds, "text", token_items, "token"))
    )
    def glyph_pair(i: int) -> str:
        # Two consecutive codepoints per token starting at U+4E00, hopping
        # over the UTF-16 surrogate block U+D800–U+DFFF (unpaired
        # surrogates are not Unicode scalar values — pyarrow's string
        # conversion raises — and the naive 0x4E00+2i walk reaches the
        # block at i >= 17664, i.e. any vocabulary above ~17.6k tokens).
        base = 0x4E00 + 2 * i
        if base >= 0xD800:
            base += 0x800
        return chr(base) + chr(base + 1)

    mapping = {tok: glyph_pair(i) for i, tok in enumerate(vocab)}
    map_ref = ray.put(mapping)

    def make_zh(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        texts = [
            "".join(m[t] for t in (x or "").lower().split())
            for x in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(texts, pa.string()),
            }
        )

    lex_ref = ray.put(sorted(mapping.values()))
    segged = ds.map_batches(make_zh, batch_format="pyarrow").map_batches(
        SegmentTokenizer,
        fn_constructor_kwargs={"lexicon_ref": lex_ref},
        batch_format="pyarrow",
        concurrency=2,
    )
    return segged.select_columns(
        ["doc_id", "n_segments", "n_distinct_segments"]
    )


def q94_lang_mix_weights(sf_dir: str):
    """Multilingual sampling-temperature weights (the mBERT/XLM exponent
    trick at α=0.5): per-lang share ∝ sqrt(n_l/N). One tiny aggregate;
    sqrt and the n/N division are IEEE-exact-rounded so both engines agree
    bitwise, and the ≤5-term normalizing sum hides any last-ulp
    order drift under round-6."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["lang"])
    df = ds.groupby("lang").aggregate(Count(alias_name="n_docs")).to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    n_total = int(df["n_docs"].sum())
    w = np.sqrt(df["n_docs"].to_numpy(dtype=np.float64) / float(n_total))
    total_w = float(w.sum())
    df["sample_share"] = [_round_half_up(x / total_w, 6) for x in w]
    return df


def q95_pmi_collocations(sf_dir: str):
    """PMI-ranked collocations: lift(x,y) = c_xy·N / (c_x·c_y) over
    whitespace bigrams with c_xy ≥ 5. Distributed shape: partial+final
    unigram AND bigram counts (G3/G4), then the bigram relation joins the
    unigram counts TWICE via the bucketed hash join on each constituent
    token — open-vocabulary safe (no driver-side vocab dict; contrast the
    round-2 q48 anti-pattern). All counts are exact int64; the score is
    ONE division of exact integers (< 2^53) so both engines produce the
    identical double, then round-6."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["text"])
    uni = count_terms(ds, "text", token_items, "token")
    bi = count_terms(ds, "text", make_ngram_items(2), "bigram")

    n_total = int(
        uni.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b["cnt"]).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("s")
    )

    def split_bi(b: pa.Table) -> pa.Table:
        big = b["bigram"].to_pylist()
        w1, w2 = [], []
        for g in big:
            a, _, c = g.partition(" ")
            w1.append(a)
            w2.append(c)
        return pa.table(
            {
                "bigram": b["bigram"],
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "cnt_xy": b["cnt"],
            }
        )

    bi_f = bi.map_batches(
        lambda b: b.filter(pc.greater_equal(b["cnt"], 5)),
        batch_format="pyarrow",
    ).map_batches(split_bi, batch_format="pyarrow")

    uni1 = uni.map_batches(
        lambda b: pa.table({"w1": b["token"], "cnt_x": b["cnt"]}),
        batch_format="pyarrow",
    )
    uni2 = uni.map_batches(
        lambda b: pa.table({"w2": b["token"], "cnt_y": b["cnt"]}),
        batch_format="pyarrow",
    )
    j1 = bucketed_hash_join(
        bi_f, uni1, key="w1",
        left_columns=["bigram", "w2", "cnt_xy"], right_columns=["cnt_x"],
    )
    j2 = bucketed_hash_join(
        j1, uni2, key="w2",
        left_columns=["bigram", "cnt_xy", "cnt_x"], right_columns=["cnt_y"],
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        num = df["cnt_xy"].to_numpy(dtype=np.int64) * np.int64(n_total)
        den = df["cnt_x"].to_numpy(dtype=np.int64) * df["cnt_y"].to_numpy(
            dtype=np.int64
        )
        df = df[["bigram", "cnt_xy"]].copy()
        df["lift"] = num.astype(np.float64) / den.astype(np.float64)
        # local prune: top-20 per batch before the tiny global sort
        return df.sort_values(
            ["lift", "bigram"], ascending=[False, True], kind="mergesort"
        ).head(20)

    top = (
        j2.map_batches(score, batch_format="pandas")
        .sort(["lift", "bigram"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return _round_col(top, "lift", 6)


def q97_ngram_langid(sf_dir: str):
    """Cavnar–Trenkle (1994) n-gram-profile language ID — the classic
    langid a crawl pipeline runs before routing (reference analogue: the
    per-lang corpus routing of SURVEY §2.5 G7). Integer end-to-end, so the
    whole train→classify→confusion-matrix chain hash-matches SQL exactly:

    * TRAIN: char-trigram counts per (lang, gram) via the G4 partial+final
      shape (shuffle carries (lang\\x1fgram, cnt) partials, never text);
      each lang's profile is its top-K grams ranked (cnt desc, gram asc).
      #langs is small and K fixed → the profile relation is BOUNDED
      (≤ langs×K rows) and broadcasts legitimately.
    * CLASSIFY: one streaming map_batches; a doc's own top-K gram ranks
      measure out-of-place distance |r_doc − r_profile| (missing gram =
      K penalty) against every profile; argmin (dist, lang) predicts.
    * OUTPUT: the (actual, predicted) confusion matrix — per-batch partial
      counts, tiny final groupby."""
    from ray.data.aggregate import Sum

    K = 50
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    # ---- train ----------------------------------------------------------
    def lg_items(lt: str) -> list[str]:
        lang, _, text = lt.partition("\x1f")
        return [lang + "\x1f" + text[i : i + 3] for i in range(len(text) - 2)]

    with_lt = ds.map_batches(
        lambda b: pa.table(
            {
                "lt": pc.binary_join_element_wise(
                    b["lang"], b["text"], "\x1f"
                )
            }
        ),
        batch_format="pyarrow",
    )
    counts = count_terms(with_lt, "lt", lg_items, "lg")

    def top_per_lang(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["lg"].str.partition("\x1f")
        df = pd.DataFrame(
            {"lang": parts[0], "gram": parts[2], "cnt": df["cnt"]}
        )
        df = df.sort_values(
            ["lang", "cnt", "gram"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("lang", as_index=False).head(K)
        df["r"] = df.groupby("lang").cumcount() + 1
        return df[["lang", "gram", "r"]]

    def add_lang_cg(b: pa.Table) -> pa.Table:
        # group by the LANG prefix so each lang's top-K is computed whole;
        # vectorized split — this relation is vocabulary-scale (the
        # per-row pylist loop here is the round-2 q07/q08 regression class)
        parts = pc.split_pattern(b["lg"], pattern="\x1f", max_splits=1)
        return b.append_column("langkey", pc.list_element(parts, 0))

    prof_rows = collect_rows(
        counts.map_batches(add_lang_cg, batch_format="pyarrow")
        .groupby("langkey")
        .map_groups(
            lambda df: top_per_lang(df.drop(columns=["langkey"])),
            batch_format="pandas",
        )
    )  # ≤ langs×K rows — bounded metadata
    profiles: dict[str, dict[str, int]] = {}
    for row in prof_rows:
        profiles.setdefault(row["lang"], {})[row["gram"]] = int(row["r"])
    lang_list = sorted(profiles)

    import ray

    prof_ref = ray.put((lang_list, profiles))

    # ---- classify -------------------------------------------------------
    def classify(batch: pa.Table) -> pa.Table:
        from collections import Counter

        import ray as _ray

        langs, profs = _ray.get(prof_ref)
        out: Counter[tuple[str, str]] = Counter()
        for text, actual in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            if len(text) < 3:
                continue
            c = Counter(text[i : i + 3] for i in range(len(text) - 2))
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
            best = None
            for lang in langs:
                p = profs[lang]
                d = 0
                for r, (g, _) in enumerate(top, 1):
                    pr = p.get(g)
                    d += K if pr is None else abs(r - pr)
                if best is None or d < best[0]:
                    best = (d, lang)
            out[(actual, best[1])] += 1
        keys = list(out.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "pred_lang": pa.array([k[1] for k in keys], pa.string()),
                "n_docs": pa.array([out[k] for k in keys], pa.int64()),
            }
        )

    df = (
        ds.map_batches(classify, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    df["n_docs"] = df["n_docs"].astype("int64")
    return df


def q98_importance_ratio(sf_dir: str):
    """DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed unigram features are.
    Exact-evidence variant: with Laplace-smoothed integer bucket counts
    t[b], r[b] (target = lang='en' docs, raw = all docs), a doc scores
    num = Σ(t[b]+1), den = Σ(r[b]+1) over its token buckets — both exact
    int64 — and ratio = num/den is ONE IEEE division both engines compute
    identically (the q95 discipline). Distributed shape: the B=1024-bucket
    histograms aggregate from per-batch partials (groupby on a
    BOUNDED-cardinality key), broadcast once via ray.put (8 KB, not a
    vocabulary); scoring is a zero-shuffle scan with per-batch local
    top-k before the tiny global sort."""
    from ray.data.aggregate import Sum

    from basicocr_ray.core.textstats import md5_hex

    B = 1024
    TARGET = "en"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        t_hist = np.zeros(B, dtype=np.int64)
        r_hist = np.zeros(B, dtype=np.int64)
        bucket_of: dict[str, int] = {}
        for text, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            for tok in token_items(text):
                b = bucket_of.get(tok)
                if b is None:
                    b = int(md5_hex(tok)[:8], 16) % B
                    bucket_of[tok] = b
                r_hist[b] += 1
                if lang == TARGET:
                    t_hist[b] += 1
        nz = np.nonzero(r_hist)[0]
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "tc": pa.array(t_hist[nz], pa.int64()),
                "rc": pa.array(r_hist[nz], pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("b")  # key cardinality ≤ B — bounded, no salt needed
        .aggregate(Sum("tc", alias_name="tc"), Sum("rc", alias_name="rc"))
    )
    t_arr = np.ones(B, dtype=np.int64)  # +1 Laplace baked in
    r_arr = np.ones(B, dtype=np.int64)
    for row in collect_rows(hist):  # ≤ B rows — metadata
        t_arr[int(row["b"])] += int(row["tc"])
        r_arr[int(row["b"])] += int(row["rc"])

    import ray

    arrs_ref = ray.put((t_arr, r_arr))

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t_a, r_a = _ray.get(arrs_ref)
        ids, nums, dens = [], [], []
        bucket_of: dict[str, int] = {}
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = token_items(text)
            if not toks:
                continue
            bs = np.empty(len(toks), dtype=np.int64)
            for i, tok in enumerate(toks):
                b = bucket_of.get(tok)
                if b is None:
                    b = int(md5_hex(tok)[:8], 16) % B
                    bucket_of[tok] = b
                bs[i] = b
            ids.append(did)
            nums.append(int(t_a[bs].sum()))
            dens.append(int(r_a[bs].sum()))
        out = pd.DataFrame({"doc_id": ids, "num": nums, "den": dens})
        out["ratio"] = out["num"].to_numpy(dtype=np.float64) / out[
            "den"
        ].to_numpy(dtype=np.float64)
        # local prune before the tiny global sort
        return out.sort_values(
            ["ratio", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(20)

    top = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["ratio", "doc_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    top["doc_id"] = top["doc_id"].astype("int64")
    top["num"] = top["num"].astype("int64")
    top["den"] = top["den"].astype("int64")
    return _round_col(top, "ratio", 6)


def q105_source_lang_entropy(sf_dir: str):
    """Per-source language-mix diagnostics (the corpus-composition
    dashboard every multilingual pipeline keeps): Shannon entropy (bits)
    of each source's language distribution plus its dominant-language doc
    count. Distributed shape: per-batch (source, lang) partial counts →
    coarse-salted source groups → one vectorized in-group pass. Counts
    stay exact int64; each entropy term −p·log2(p) is computed from the
    identical IEEE division on both engines and the ≤5-term sum hides
    any last-ulp libm/accumulation drift under round-6 (the q94
    discipline)."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size")
        )

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False)["n"].sum()
        rows = []
        for src, grp in g.groupby("source"):
            n = grp["n"].to_numpy(dtype=np.int64)
            tot = int(n.sum())
            p = n.astype(np.float64) / float(tot)
            ent = float(np.sum(-p * np.log2(p)))
            rows.append(
                {
                    "source": src,
                    "n_docs": tot,
                    "lang_entropy": _round_half_up(ent, 6),
                    "max_lang_docs": int(n.max()),
                }
            )
        out = pd.DataFrame(rows)
        return out.astype(
            {"n_docs": "int64", "max_lang_docs": "int64"}
        )

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pandas"), "source", entropy
    )


def q116_gopher_rules(sf_dir: str):
    """Gopher-style quality filtering (Rae et al. 2021 Table A1 subset)
    with EXACT integer evidence — every ratio threshold is a
    cross-multiplied integer comparison, so the rule vector hashes:
    word count in [50, 100000], mean word length in [3, 10]
    (3·n ≤ Σlen ≤ 10·n), ≤10% no-alphanumeric words (10·n_nonal ≤ n),
    ≥80% words containing a letter (5·n_alpha ≥ 4·n), ≥2 stopwords.
    Zero-shuffle per-doc scan (the C4/Gopher quality pass is
    embarrassingly parallel — only the rollup would ever aggregate).
    Kernel single-sourced in `core/textstats.py:gopher_counts` /
    `gopher_keep` (also the `gopher_filter` spec op)."""
    from basicocr_ray.core.textstats import gopher_counts, gopher_keep

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rules(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        nw, sl, na, nn, ns, kept = [], [], [], [], [], []
        for t in batch["text"].to_pylist():
            n, s, a, z, st = gopher_counts(t or "", _STOP5)
            ok = gopher_keep(n, s, a, z, st)
            nw.append(n)
            sl.append(s)
            na.append(a)
            nn.append(z)
            ns.append(st)
            kept.append(1 if ok else 0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "sum_len": pa.array(sl, pa.int64()),
                "n_alpha": pa.array(na, pa.int64()),
                "n_nonal": pa.array(nn, pa.int64()),
                "n_stop": pa.array(ns, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    return ds.map_batches(rules, batch_format="pyarrow")


def q118_inverted_index(sf_dir: str):
    """Inverted-index build with positions — the IR structure a search
    stack derives from a crawl: one flat pass emits (token, doc_id, pos)
    postings (positions are 1-based over the nonempty whitespace
    tokens), a coarse-grouped exchange co-locates each token's postings
    (the shuffle carries the postings themselves — that IS the index
    build's irreducible exchange; document text never moves), and the
    in-group reduce emits (token, df, n_postings, postings) with the
    posting list string-agg'd in (doc_id, pos) order. Hapax pruning
    (df ≥ 2) drops the singleton tail; at 100 TB the same reduce would
    also tier by df and shard each hot token's postings by doc range."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        out_t, out_d, out_p = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            for i, tok in enumerate(token_items(t or ""), start=1):
                out_t.append(tok)
                out_d.append(did)
                out_p.append(i)
        return pa.table(
            {
                "token": pa.array(out_t, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
            }
        )

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "doc_id", "pos"], kind="mergesort")
        df["post"] = (
            df["doc_id"].astype(str) + ":" + df["pos"].astype(str)
        )
        out = df.groupby("token", as_index=False).agg(
            df=("doc_id", "nunique"),
            n_postings=("post", "size"),
            postings=("post", ",".join),
        )
        out = out[out["df"] >= 2]
        return out.astype({"df": "int64", "n_postings": "int64"})

    return coarse_group_reduce(
        ds.map_batches(postings, batch_format="pyarrow"), "token", build
    )


def q124_rare_feature_pairs(sf_dir: str):
    """Cross-lingual document PAIRING via rare shared features — the
    bitext-mining candidate-generation shape (shared rare n-grams as
    alignment anchors, cf. the anchor heuristics of parallel-corpus
    mining): word trigrams with GLOBAL df exactly 2 name their own
    candidate pair; pairs of docs in DIFFERENT languages sharing ≥ 2
    such anchors survive. Two bounded exchanges, both payload-light:
    (trigram, id, lang) rows group by trigram hash (all occurrences of
    a trigram co-locate, so the df==2 test is exact in-group), then
    (id_a, id_b) partials sum per pair. Document text never moves."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def trigrams(batch: pa.Table) -> pa.Table:
        out_g, out_id, out_lang = [], [], []
        for did, t, lg in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            toks = token_items(t or "")
            seen = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
            for g in sorted(seen):
                out_g.append(g)
                out_id.append(did)
                out_lang.append(lg)
        return pa.table(
            {
                "g": pa.array(out_g, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
            }
        )

    def anchor_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ia, ib, la, lb = [], [], [], []
        for _, grp in df.groupby("g"):
            if len(grp) != 2:  # global df==2: the group holds all of g
                continue
            rows = sorted(zip(grp["doc_id"], grp["lang"]))
            if rows[0][1] == rows[1][1]:
                continue
            ia.append(rows[0][0])
            ib.append(rows[1][0])
            la.append(rows[0][1])
            lb.append(rows[1][1])
        return pd.DataFrame(
            {"id_a": pd.array(ia, dtype="int64"),
             "id_b": pd.array(ib, dtype="int64"),
             "lang_a": la, "lang_b": lb}
        )

    anchors = coarse_group_reduce(
        ds.map_batches(trigrams, batch_format="pyarrow"), "g", anchor_pairs
    )

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["id_a", "id_b", "lang_a", "lang_b"], as_index=False
        ).agg(n_shared=("id_a", "size"))
        out = out[out["n_shared"] >= 2]
        return out.astype({"n_shared": "int64"})

    return coarse_group_reduce(anchors, ["id_a", "id_b"], sum_pairs)


def q126_padding_waste(sf_dir: str):
    """PADDING-WASTE accounting for length-bucketed batching — the
    measurement behind dynamic batching in training loaders: documents
    take the deterministic md5 global order (q55/q100 discipline), form
    fixed batches of 64, and each batch reports n_docs, its max token
    length, and waste = n_docs·max_len − Σlen (tokens burned padding
    every sequence to the batch max). The 0-based rank is `global_rank`
    (ROW_NUMBER()−1 under the md5 order without a global sort); the
    per-batch reduce runs in coarse groups of the batch id. Integers
    end-to-end."""
    from basicocr_ray.stages.sample import global_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    BATCH = 64
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def lengths(batch: pa.Table) -> pa.Table:
        n = [len(token_items(t or "")) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tok": pa.array(n, pa.int64()),
            }
        )

    ranked = global_rank(
        ds.map_batches(lengths, batch_format="pyarrow"),
        "doc_id", seed=42, out_column="rank0",
    ).map_batches(
        lambda b: pa.table(
            {
                "batch_id": pc.divide(b["rank0"], BATCH),
                "n_tok": b["n_tok"],
            }
        ),
        batch_format="pyarrow",
    )

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("batch_id", as_index=False).agg(
            n_docs=("n_tok", "size"),
            max_len=("n_tok", "max"),
            sum_len=("n_tok", "sum"),
        )
        out["waste"] = out["n_docs"] * out["max_len"] - out["sum_len"]
        return out.astype(
            {"n_docs": "int64", "max_len": "int64",
             "sum_len": "int64", "waste": "int64"}
        )

    return coarse_group_reduce(ranked, "batch_id", per_batch)


def q129_quality_classifier(sf_dir: str):
    """Hashed-linear QUALITY-CLASSIFIER inference — the fastText-style
    quality gate of the GPT-3/LLaMA curation recipes as a Ray stage:
    tokens hash into B=64 feature buckets, each bucket carries a FIXED
    integer weight in [-10, 10] derived from md5-low64('w:b') (a stand-in
    for trained weights with the same execution shape: the weight vector
    broadcasts once, inference is a zero-shuffle scan, scores are exact
    int64 so the oracle reconstructs them bit-for-bit). Output: per-doc
    score and the keep verdict (score > 0). A real model swaps the weight
    table; nothing else changes — this is A1's load-once scorer semantics
    on the documents table. Scoring kernel single-sourced in
    `core/textstats.py:hashed_linear_score` (shared with the
    `quality_gate` spec op)."""
    from basicocr_ray.core.textstats import hashed_linear_score

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        out_id, out_s = [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            out_id.append(did)
            out_s.append(
                hashed_linear_score(token_items(t) if t else [], weights)
            )
        kept = [1 if s > 0 else 0 for s in out_s]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
                "kept": pa.array(kept, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def q148_pii_scrub_net(sf_dir: str):
    """PII scrub, NETWORK-identifier flavor (q52's email pass extended
    to the other two identifiers every release-safety checklist names):
    deterministic planted phone numbers (doc_id ≡ 1 mod 3) and IPv4
    addresses (doc_id ≡ 2 mod 3), scrubbed with regexes chosen from the
    Python-re ∩ DuckDB-RE2 common subset (explicit [0-9] classes — the
    q85 engine-parity discipline), verified by exact counts, removed
    bytes, and the md5 of the scrubbed text."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    phone_re = _re.compile(r"\+1555[0-9]{4}")
    ip_re = _re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")

    def scrub(batch: pa.Table) -> pa.Table:
        out_id, out_p, out_ip, out_rm, out_md5 = [], [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            t = t or ""
            if did % 3 == 1:
                t = f"{t} call +1555{did % 10000:04d}"
            if did % 3 == 2:
                t = (
                    f"{t} from {did % 256}.{(did * 3) % 256}"
                    f".{(did * 7) % 256}.{(did * 11) % 256}"
                )
            s1, n_phone = phone_re.subn("<PHONE>", t)
            s2, n_ip = ip_re.subn("<IP>", s1)
            out_id.append(did)
            out_p.append(n_phone)
            out_ip.append(n_ip)
            out_rm.append(len(t) - len(s2))
            out_md5.append(md5_hex(s2))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_phones": pa.array(out_p, pa.int64()),
                "n_ips": pa.array(out_ip, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "scrubbed_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def _bp_host(doc_id: int) -> str:
    return f"site{doc_id % 7}"


def _bp_paras(doc_id: int, text: str) -> list[str]:
    """The planted page structure q151 strips: every doc carries its
    host's footer paragraph; even docs also carry a promo banner. The
    original text is (almost surely) unique per doc and must survive."""
    host = _bp_host(doc_id)
    paras = [
        text,
        f"host {host} footer navigation copyright terms privacy contact",
    ]
    if doc_id % 2 == 0:
        paras.append(f"subscribe newsletter promo banner {host}")
    return paras


def q151_boilerplate_paras(sf_dir: str):
    """Per-host BOILERPLATE PARAGRAPH removal — the CCNet-style dedup
    pass every crawl corpus runs before training (footer/nav/cookie
    banners repeat across a site's pages; body text doesn't): paragraphs
    hash to md5, a (host, para_md5) document-frequency reduce finds
    paragraphs present in a strict MAJORITY of the host's docs
    (2·df > n_docs, exact integers — no float threshold), and a second
    doc scan drops them and re-emits the cleaned text's md5.

    Scale shape: the paragraph exchange carries (host, md5, doc_id) —
    never text. The boilerplate relation is PROVABLY bounded: each
    boilerplate paragraph has df > n_docs/2, and Σ df over a host's
    paragraphs = its total paragraph instances ≤ n_docs·P̄, so a host
    has < 2·P̄ boilerplate paragraphs — a broadcast-sized set at any
    corpus size (the driver collect here is metadata, not data). Host
    doc-counts are a ≤-hosts-sized rollup. Reference anchor: the strip
    generalizes the AC stopword anti-membership (J3/D2,
    contrib/acautomata) from tokens to host-scoped paragraphs."""
    import ray

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def para_instances(batch: pa.Table) -> pa.Table:
        out_h, out_m, out_d = [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            host = _bp_host(did)
            for pm in {md5_hex(p) for p in _bp_paras(did, t or "")}:
                out_h.append(host)
                out_m.append(pm)
                out_d.append(did)
        return pa.table(
            {
                "host": pa.array(out_h, pa.string()),
                "pm": pa.array(out_m, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
            }
        )

    # host doc counts: ≤ #hosts rows — a metadata-sized rollup
    def host_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        mods, cnts = np.unique(ids % 7, return_counts=True)
        return pa.table(
            {
                "host": pa.array(
                    [f"site{m}" for m in mods], pa.string()
                ),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    n_docs: dict[str, int] = {}
    for row in collect_rows(
        ds.map_batches(host_partial, batch_format="pyarrow")
    ):
        n_docs[row["host"]] = n_docs.get(row["host"], 0) + int(row["n"])

    def df_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["host", "pm"], as_index=False).agg(
            df=("doc_id", "nunique")
        )
        nd = out["host"].map(n_docs).to_numpy()
        return out[2 * out["df"].to_numpy() > nd][["host", "pm"]]

    boiler_rows = collect_rows(
        coarse_group_reduce(
            ds.map_batches(para_instances, batch_format="pyarrow"),
            ["host", "pm"],
            df_final,
        )
    )  # < 2·P̄ rows per host by the df>n/2 bound — broadcastable always
    boiler_ref = ray.put(
        {(r["host"], r["pm"]) for r in boiler_rows}
    )

    def strip(batch: pa.Table) -> pa.Table:
        boiler = ray.get(boiler_ref)
        out_id, out_np, out_rm, out_md5 = [], [], [], []
        for did, t in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            host = _bp_host(did)
            paras = _bp_paras(did, t or "")
            kept = [
                p for p in paras if (host, md5_hex(p)) not in boiler
            ]
            out_id.append(did)
            out_np.append(len(paras))
            out_rm.append(len(paras) - len(kept))
            out_md5.append(md5_hex("\n".join(kept)))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_paras": pa.array(out_np, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "cleaned_md5": pa.array(out_md5, pa.string()),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")


def q155_pareto_docs(sf_dir: str):
    """Per-language PARETO SKYLINE of documents on (n_chars, distinct
    tokens) — the multi-objective curation frontier ("longest AND most
    lexically diverse"): a doc survives iff no same-lang doc is ≥ in
    both metrics and > in one. Integer metrics only — no float
    dominance ties.

    Scale shape: skylines compose — skyline(∪ local skylines) =
    skyline(all) (a global dominator either survives its local prune or
    is itself dominated by a local survivor that transitively dominates)
    — so each batch prunes to its local frontier FIRST and only
    survivors reach the per-lang final (the classic distributed-skyline
    two-phase). The sweep is vectorized: per n_chars level keep rows at
    the level max of n_uniq, survive if that max beats the running max
    over strictly-longer levels. Worst case (an anti-chain) the skyline
    IS the data — at 100 TB the next refinement is range-partitioning
    by n_chars with cross-partition max filtering; the local-prune
    shape here already does the data reduction that matters."""
    ds = _read(
        sf_dir, "documents", columns=["doc_id", "lang", "text", "n_chars"]
    )

    def metrics(batch: pa.Table) -> pa.Table:
        uniq = [
            len(set((t or "").lower().split()))
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(batch["n_chars"], pa.int64()),
                "n_uniq": pa.array(uniq, pa.int64()),
            }
        )

    def skyline(df: pd.DataFrame) -> pd.DataFrame:
        # max n_uniq per n_chars level, scanned from longest down
        lvl = (
            df.groupby("n_chars")["n_uniq"].max()
            .sort_index(ascending=False)
        )
        prev_max = lvl.cummax().shift(1, fill_value=-1)
        alive = lvl[lvl > prev_max]  # level max beats all longer docs
        sel = df["n_chars"].map(alive).eq(df["n_uniq"])
        return df[sel.fillna(False)]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.groupby("lang", group_keys=False)
            .apply(skyline)
            .reset_index(drop=True)
        )

    return (
        ds.map_batches(metrics, batch_format="pyarrow")
        .map_batches(local_prune, batch_format="pandas")
        .groupby("lang")
        .map_groups(skyline, batch_format="pandas")
    )


def q161_percent_rank_hist(sf_dir: str):
    """PERCENT-RANK WITHOUT A PER-GROUP SORT — every doc's strict rank of
    its character length within its language, computed the
    histogram-rank way: (lang, n_chars) counts through the coarse-salted
    reduce (the histogram is bounded by DISTINCT lengths, not rows),
    per-lang exclusive cumulative counts over the sorted values
    (n_smaller = rank()-1), then ONE bucketed hash join on a composite
    (lang:value) key attaches (n_smaller, n_lang) back to the docs.
    Integer evidence only — percent_rank = n_smaller/(n_lang-1) is left
    to the consumer so the driver hash stays float-free. The shape that
    replaces ``rank() OVER (PARTITION BY g ORDER BY v)`` when a group
    exceeds one task."""
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def measure(b: pa.Table) -> pa.Table:
        langs = [
            l if l is not None else "" for l in b["lang"].to_pylist()
        ]
        n = [len(t or "") for t in b["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "v": pa.array(n, pa.int64()),
            }
        )

    rows = ds.map_batches(measure, batch_format="pyarrow")

    def hist_partial(b: pa.Table) -> pa.Table:
        t = b.group_by(["lang", "v"]).aggregate([("v", "count")])
        return t.rename_columns(["lang", "v", "cnt"])

    def hist_final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["lang", "v"], as_index=False)["cnt"].sum()
        return out.astype({"v": "int64", "cnt": "int64"})

    hist = coarse_group_reduce(
        rows.map_batches(hist_partial, batch_format="pyarrow"),
        ["lang", "v"],
        hist_final,
    )

    def ranks(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lang, g in df.groupby("lang"):
            g = g.sort_values("v")
            cnt = g["cnt"].to_numpy(dtype=np.int64)
            n_smaller = np.cumsum(cnt) - cnt
            out.append(pd.DataFrame(
                {
                    "k": lang + ":" + g["v"].astype(str),
                    "lang": lang,
                    "n_chars": g["v"].astype("int64"),
                    "n_smaller": n_smaller,
                    "n_lang": int(cnt.sum()),
                }
            ))
        return pd.concat(out) if out else pd.DataFrame(
            {"k": pd.array([], dtype="object"),
             "lang": pd.array([], dtype="object"),
             "n_chars": pd.array([], dtype="int64"),
             "n_smaller": pd.array([], dtype="int64"),
             "n_lang": pd.array([], dtype="int64")}
        )

    rank_rel = coarse_group_reduce(hist, "lang", ranks)

    def keyed(b: pa.Table) -> pa.Table:
        ks = [
            f"{l}:{v}" for l, v in zip(
                b["lang"].to_pylist(), b["v"].to_pylist()
            )
        ]
        return pa.table(
            {
                "k": pa.array(ks, pa.string()),
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
            }
        )

    joined = bucketed_hash_join(
        rows.map_batches(keyed, batch_format="pyarrow"),
        rank_rel,
        key="k",
        left_columns=["doc_id"],
        right_columns=["lang", "n_chars", "n_smaller", "n_lang"],
    )

    def narrow(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "lang": pc.cast(b["lang"], pa.string()),
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
                "n_smaller": pc.cast(b["n_smaller"], pa.int64()),
                "n_lang": pc.cast(b["n_lang"], pa.int64()),
            }
        )

    return joined.map_batches(narrow, batch_format="pyarrow")


def q176_phrase_positions(sf_dir: str):
    """POSITIONAL PHRASE SEARCH — the positional-postings operation a
    token-level inverted index (q118) can't answer: find every
    (doc_id, token_position) occurrence of the corpus's most frequent
    word trigram (ties: trigram asc). Two scans: (1) the distributed
    trigram count (count_terms partials) pruned to a global top-1 — a
    bounded driver scalar, the phrase IS the query; (2) a per-batch
    vectorized position scan (numpy equality over three shifted token
    arrays — no per-row phrase matching in Python). Output positions
    are 0-based."""
    from basicocr_ray.stages.wide import count_terms, make_ngram_items, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tri = count_terms(ds, "text", make_ngram_items(3), "tri")
    top = top_k(tri, 1, "cnt", "tri").take(1)
    phrase = top[0]["tri"]
    w0, w1, w2 = phrase.split(" ")

    def positions(b: pa.Table) -> pa.Table:
        out_d, out_p = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if not t:
                continue
            toks = np.asarray(t.lower().split(), dtype=object)
            if len(toks) < 3:
                continue
            hit = (
                (toks[:-2] == w0) & (toks[1:-1] == w1) & (toks[2:] == w2)
            )
            for p in np.flatnonzero(hit):
                out_d.append(did)
                out_p.append(int(p))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "phrase": pa.array([phrase] * len(out_d), pa.string()),
            }
        )

    return ds.map_batches(positions, batch_format="pyarrow")


def q181_skipgram_pairs(sf_dir: str):
    """SKIP-GRAM window co-occurrence counts (the word2vec/GloVe corpus
    statistic; q95's adjacent bigrams are its w=1 slice): unordered
    token pairs within window distance ≤ 3, pair key = 'min max' under
    binary collation (Python str and DuckDB VARCHAR compare identically
    on codepoints), global top-100 by (count desc, pair asc). The pair
    explode is 3 shifted-array zips per batch feeding the house
    count_terms partial+final reduce — open-vocabulary safe, rows never
    shuffle."""
    from basicocr_ray.stages.wide import count_terms, top_k

    W = 3

    def skipgram_items(text: str) -> list:
        toks = text.lower().split()
        out = []
        for d in range(1, W + 1):
            for a, b in zip(toks[:-d], toks[d:]):
                out.append(a + " " + b if a <= b else b + " " + a)
        return out

    ds = _read(sf_dir, "documents", columns=["text"])
    pairs = count_terms(ds, "text", skipgram_items, "pair")
    return top_k(pairs, 100, "cnt", "pair")


def q184_calibration_bins(sf_dir: str):
    """CLASSIFIER CALIBRATION BINS — the reliability-diagram evidence
    (per-bin n, positives, score mass) behind ECE, over the q129
    hashed-linear quality scores with lang = 'en' as the deterministic
    reference label: scores clamp to [-1024, 1023] and shift NONNEGATIVE
    before the width-16 binning because DuckDB's ``//`` truncates toward
    zero while Python floors — on a nonnegative dividend they agree (the
    q180 discipline). All-integer output: (bin, n, n_pos, sum_score)."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            s = hashed_linear_score(token_items(t) if t else [], weights)
            sc = min(max(s, -1024), 1023)
            bin_id = (sc + 1024) // 16
            a = acc.setdefault(bin_id, [0, 0, 0])
            a[0] += 1
            a[1] += 1 if lang == "en" else 0
            a[2] += s
        ks = sorted(acc)
        return pa.table(
            {
                "bin": pa.array(ks, pa.int64()),
                "n": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n_pos": pa.array([acc[k][1] for k in ks], pa.int64()),
                "sum_score": pa.array([acc[k][2] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bin", as_index=False).sum()
        return out.astype({c: "int64" for c in out.columns})

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "bin", final
    )


def q186_classifier_agreement(sf_dir: str):
    """TWO-CLASSIFIER AGREEMENT (the inter-rater / model-upgrade audit
    that precedes any classifier swap — the integer evidence behind
    Cohen's κ): classifier A = the q129 hashed-linear scorer (weight
    seed 'w:'), classifier B = the same architecture with independent
    weights (seed 'v:'); per language, the full confusion matrix of
    keep verdicts (n00, n01, n10, n11). ONE pass scores both models
    (the weight tables broadcast in the closure); partials carry four
    counters per (batch, lang)."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    w_a = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]
    w_b = [_md5_low64(f"v:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            toks = token_items(t) if t else []
            ka = 1 if hashed_linear_score(toks, w_a) > 0 else 0
            kb = 1 if hashed_linear_score(toks, w_b) > 0 else 0
            lang = lang if lang is not None else ""
            a = acc.setdefault(lang, [0, 0, 0, 0])
            a[2 * ka + kb] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "n00": pa.array([acc[k][0] for k in ks], pa.int64()),
                "n01": pa.array([acc[k][1] for k in ks], pa.int64()),
                "n10": pa.array([acc[k][2] for k in ks], pa.int64()),
                "n11": pa.array([acc[k][3] for k in ks], pa.int64()),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).sum()
        for c in ("n00", "n01", "n10", "n11"):
            out[c] = out[c].astype("int64")
        return out

    return coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "lang", final
    )


def q187_auc_evidence(sf_dir: str):
    """AUC AS A RANK-SUM STATISTIC with exact integer evidence — the
    Mann-Whitney U identity ties AUC to pure counting, so the driver
    hash needs no float: with label = (lang = 'en') and the q129
    integer scores, 2U = Σ_s [2·n_pos(s)·(negatives strictly below s)
    + n_pos(s)·n_neg(s)] (the n_pos·n_neg term is the tie ½-credit,
    doubled to stay integer); AUC = u2 / (2·n_pos·n_neg) is a derived
    epilogue. Shape: per-batch (score, n_pos, n_neg) partials → exact
    coarse reduce on the score VALUE (the distinct-score relation is
    bounded by the score range, not the corpus) → one ordered scan of
    that metadata relation."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.stages.wide import coarse_group_reduce

    B = 64
    weights = [_md5_low64(f"w:{b}") % 21 - 10 for b in range(B)]

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for t, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            s = hashed_linear_score(token_items(t) if t else [], weights)
            a = acc.setdefault(s, [0, 0])
            if lang == "en":
                a[0] += 1
            else:
                a[1] += 1
        ks = sorted(acc)
        return pa.table(
            {
                "score": pa.array(ks, pa.int64()),
                "np_": pa.array([acc[k][0] for k in ks], pa.int64()),
                "nn_": pa.array([acc[k][1] for k in ks], pa.int64()),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("score", as_index=False).sum()
        return out.astype({"score": "int64", "np_": "int64", "nn_": "int64"})

    per_score = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"), "score", merge
    )

    def u_stat(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values("score", kind="mergesort").reset_index(drop=True)
        npos = g["np_"].to_numpy(dtype=np.int64)
        nneg = g["nn_"].to_numpy(dtype=np.int64)
        cneg = np.cumsum(nneg) - nneg  # negatives strictly below
        u2 = int((2 * npos * cneg + npos * nneg).sum())
        return pd.DataFrame(
            {
                "n_pos": pd.array([int(npos.sum())], dtype="int64"),
                "n_neg": pd.array([int(nneg.sum())], dtype="int64"),
                "u2": pd.array([u2], dtype="int64"),
            }
        )

    # the per-score relation is metadata-sized: one constant-key group
    return (
        per_score.map_batches(
            lambda b: b.append_column(
                "cg", pa.array(np.zeros(len(b), dtype=np.int32))
            ),
            batch_format="pyarrow",
        )
        .groupby("cg")
        .map_groups(
            lambda df: u_stat(df.drop(columns=["cg"])),
            batch_format="pandas",
        )
    )


def q189_lang_overlap_matrix(sf_dir: str):
    """CROSS-SPLIT CONTAMINATION MATRIX — exact pairwise overlap of the
    unigram ∪ bigram feature sets between languages (the audit run
    between train/eval splits before training; q75's decontamination is
    its targeted cousin): for every lang pair (a < b), |F_a ∩ F_b| plus
    each side's |F|. Shape: per-batch distinct (feature, lang) rows →
    coarse groups of the FEATURE hash, where each feature's lang set
    emits one row per lang pair (C(k,2) per feature — bounded by the
    lang count, not the corpus) and one per lang for the sizes; a
    bounded pair-keyed Sum finishes. Features never meet except
    through their own hash group — no cross-product of vocabularies."""
    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce, make_ngram_items

    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def feat_partial(b: pa.Table) -> pa.Table:
        seen: set = set()
        for t, lang in zip(
            b["text"].to_pylist(), b["lang"].to_pylist()
        ):
            if not t or lang is None:
                continue
            toks = token_items(t)
            for f in toks:
                seen.add((f, lang))
            for f in make_ngram_items(2)(t):
                seen.add((f, lang))
        rows = sorted(seen)
        return pa.table(
            {
                "feature": pa.array([r[0] for r in rows], pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_n = [], [], []
        for _, g in df.drop_duplicates().groupby("feature"):
            langs = sorted(set(g["lang"]))
            for la in langs:
                out_a.append(la)
                out_b.append(la)  # diagonal carries |F_lang|
                out_n.append(1)
            for i in range(len(langs)):
                for j in range(i + 1, len(langs)):
                    out_a.append(langs[i])
                    out_b.append(langs[j])
                    out_n.append(1)
        return pd.DataFrame(
            {
                "lang_a": pd.array(out_a, dtype="object"),
                "lang_b": pd.array(out_b, dtype="object"),
                "n": pd.array(out_n, dtype="int64"),
            }
        )

    pairs = coarse_group_reduce(
        ds.map_batches(feat_partial, batch_format="pyarrow"),
        "feature",
        pair_counts,
    )
    out = (
        pairs.groupby(["lang_a", "lang_b"])  # bounded: ≤ L + C(L,2) keys
        .aggregate(Sum("n", alias_name="n_common"))
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "lang_a": b["lang_a"],
                "lang_b": b["lang_b"],
                "n_common": pc.cast(b["n_common"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q195_k_anonymity(sf_dir: str):
    """K-ANONYMITY AUDIT — the privacy gate before any data release:
    quasi-identifier = (lang, source, n_chars // 100 length band);
    output the equivalence-class size histogram (k → number of classes
    of that size). The release rule 'suppress classes with k < K' reads
    straight off the result; min k is the headline number. Two bounded
    reduces: per-QI counts in coarse composite-hash groups, then the
    size histogram."""
    from ray.data.aggregate import Count

    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pylist(),
                "source": b["source"].to_pylist(),
                "band": np.asarray(
                    b["n_chars"].to_pylist(), dtype=np.int64
                ) // 100,
            }
        )
        out = df.groupby(
            ["lang", "source", "band"], as_index=False
        ).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(
            out.astype({"band": "int64", "n": "int64"}),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(
            ["lang", "source", "band"], as_index=False
        )["n"].sum()
        return out.astype({"band": "int64", "n": "int64"})

    classes = coarse_group_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source", "band"],
        merge,
    )
    hist = (
        classes.map_batches(
            lambda b: pa.table({"k": pc.cast(b["n"], pa.int64())}),
            batch_format="pyarrow",
        )
        .groupby("k")  # bounded: ≤ max class size
        .aggregate(Count(alias_name="n_classes"))
    )
    return hist.map_batches(
        lambda b: pa.table(
            {
                "k": pc.cast(b["k"], pa.int64()),
                "n_classes": pc.cast(b["n_classes"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q197_gini_evidence(sf_dir: str):
    """GINI MEAN DIFFERENCE per language with exact integers — the
    inequality statistic behind corpus-balance dashboards: Σ_{i<j}
    |x_i − x_j| over doc lengths via the sorted-order identity
    Σ_i (2i − n − 1)·x_(i) (1-based i; tie-order-invariant because
    tied values contribute zero differences) — O(n log n), no pairwise
    loop, every term int64. The Gini coefficient itself is
    gini_num / (n·sum_x), a derived epilogue. One vectorized sort +
    cumcount per coarse language group."""
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["lang", "n_chars", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        x = g["n_chars"].to_numpy(dtype=np.int64)
        i1 = g.groupby("lang").cumcount().to_numpy() + 1  # 1-based
        n_per = g.groupby("lang")["n_chars"].transform("size").to_numpy()
        g = g.assign(term=(2 * i1 - n_per - 1) * x)
        out = g.groupby("lang", as_index=False).agg(
            n=("n_chars", "size"),
            sum_x=("n_chars", "sum"),
            gini_num=("term", "sum"),
        )
        return out.astype(
            {"n": "int64", "sum_x": "int64", "gini_num": "int64"}
        )

    return coarse_group_reduce(ds, "lang", gini)


def q199_kwic_contexts(sf_dir: str):
    """KWIC (KeyWord In Context) concordance — the corpus-linguistics
    view every annotation UI renders: for the corpus's most frequent
    token (tie: token asc), every occurrence with two tokens of left
    and right context. The keyword is a bounded top-1 scalar (the q176
    discipline); the context scan is one shifted-array pass per batch;
    context strings are built from the SAME token arrays both engines
    tokenize, so the driver hash checks the string assembly too."""
    from basicocr_ray.stages.wide import count_terms, top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tok_counts = count_terms(ds, "text", token_items, "token")
    top = top_k(tok_counts, 1, "cnt", "token").take(1)
    kw = top[0]["token"]

    def contexts(b: pa.Table) -> pa.Table:
        out_d, out_p, out_l, out_r = [], [], [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            if not t:
                continue
            toks = t.lower().split()
            arr = np.asarray(toks, dtype=object)
            for p in np.flatnonzero(arr == kw):
                p = int(p)
                out_d.append(did)
                out_p.append(p)
                out_l.append(" ".join(toks[max(0, p - 2):p]))
                out_r.append(" ".join(toks[p + 1:p + 3]))
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "pos": pa.array(out_p, pa.int64()),
                "left_ctx": pa.array(out_l, pa.string()),
                "right_ctx": pa.array(out_r, pa.string()),
            }
        )

    return ds.map_batches(contexts, batch_format="pyarrow")


def q330_dehyphenate(sf_dir: str):
    """LINE-BREAK DE-HYPHENATION ROUNDTRIP — the OCR/print artifact
    the reference's domain is full of: hard line wraps split words as
    'exam-\\n ple'. Each doc gets deterministic hyphen-newline breaks
    injected mid-word (every 7th word of length ≥ 6, and mid-run for
    space-free CJK), then the repair kernel (compiled regex joining
    'X-\\nY' across any non-space pair) must restore the original text
    BYTE-IDENTICALLY. Inject+repair stay in one map_batches; the
    corpus precondition (no native '-\\n') is what makes the roundtrip
    exact, mirroring q13's boilerplate-wrap discipline."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    joiner = _re.compile(r"(\S)-\n(\S)")

    def inject(text: str, doc_id: int) -> str:
        words = text.split(" ")
        out = []
        for j, w in enumerate(words):
            if len(w) >= 6 and (j + doc_id) % 7 == 0:
                m = len(w) // 2
                w = w[:m] + "-\n" + w[m:]
            out.append(w)
        return " ".join(out)

    def roundtrip(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        repaired = []
        n_breaks = []
        for i, t in zip(ids, texts):
            broken = inject(t, int(i))
            n_breaks.append(broken.count("-\n"))
            repaired.append(joiner.sub(r"\1\2", broken))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(repaired, pa.string()),
                "n_breaks": pa.array(n_breaks, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


_LIG_FOLD = {"ﬁ": "fi", "ﬂ": "fl", "ﬀ": "ff", "­": ""}


def q331_ligature_fold(sf_dir: str):
    """LIGATURE / SOFT-HYPHEN FOLD ROUNDTRIP — the PDF-extraction
    cleanup (print shaping turns 'fi'→'ﬁ', justification inserts
    U+00AD): every 'fi'/'fl' in each doc is replaced by its
    typographic ligature and a soft hyphen lands after every 20th
    char, then the fold kernel must restore the original bytes. The
    fold table is the standard compatibility mapping; one translate
    pass per row, map-only."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fold(s: str) -> str:
        for k, v in _LIG_FOLD.items():
            s = s.replace(k, v)
        return s

    def roundtrip(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out = []
        n_lig = []
        for t in b["text"].to_pylist():
            shaped = t.replace("fi", "ﬁ").replace("fl", "ﬂ")
            shaped = "­".join(
                shaped[k : k + 20] for k in range(0, max(len(shaped), 1), 20)
            )
            n_lig.append(shaped.count("ﬁ") + shaped.count("ﬂ"))
            out.append(fold(shaped))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(out, pa.string()),
                "n_ligatures": pa.array(n_lig, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


__all__ = [
    "q07_token_freq",
    "q08_bigram_freq",
    "q12_token_count",
    "q16_quality",
    "q25_normalize",
    "q26_trigram_freq",
    "q40_cjk_segment",
    "q48_tf_df",
    "q52_pii_redact",
    "q54_grouped_string_agg",
    "q64_tfidf_topk",
    "q72_repetition_stats",
    "q86_dense_rank_tokens",
    "q87_oov_rate",
    "q94_lang_mix_weights",
    "q95_pmi_collocations",
    "q97_ngram_langid",
    "q98_importance_ratio",
    "q105_source_lang_entropy",
    "q116_gopher_rules",
    "q118_inverted_index",
    "q124_rare_feature_pairs",
    "q126_padding_waste",
    "q129_quality_classifier",
    "q148_pii_scrub_net",
    "q151_boilerplate_paras",
    "q155_pareto_docs",
    "q161_percent_rank_hist",
    "q176_phrase_positions",
    "q181_skipgram_pairs",
    "q184_calibration_bins",
    "q186_classifier_agreement",
    "q187_auc_evidence",
    "q189_lang_overlap_matrix",
    "q195_k_anonymity",
    "q197_gini_evidence",
    "q199_kwic_contexts",
    "q330_dehyphenate",
    "q331_ligature_fold",
]


QUERIES = {
    "q07_token_freq": q07_token_freq,
    "q08_bigram_freq": q08_bigram_freq,
    "q12_token_count": q12_token_count,
    "q16_quality": q16_quality,
    "q25_normalize": q25_normalize,
    "q26_trigram_freq": q26_trigram_freq,
    "q40_cjk_segment": q40_cjk_segment,
    "q48_tf_df": q48_tf_df,
    "q52_pii_redact": q52_pii_redact,
    "q54_grouped_string_agg": q54_grouped_string_agg,
    "q64_tfidf_topk": q64_tfidf_topk,
    "q72_repetition_stats": q72_repetition_stats,
    "q86_dense_rank_tokens": q86_dense_rank_tokens,
    "q87_oov_rate": q87_oov_rate,
    "q94_lang_mix_weights": q94_lang_mix_weights,
    "q95_pmi_collocations": q95_pmi_collocations,
    "q97_ngram_langid": q97_ngram_langid,
    "q98_importance_ratio": q98_importance_ratio,
    "q105_source_lang_entropy": q105_source_lang_entropy,
    "q116_gopher_rules": q116_gopher_rules,
    "q118_inverted_index": q118_inverted_index,
    "q124_rare_feature_pairs": q124_rare_feature_pairs,
    "q126_padding_waste": q126_padding_waste,
    "q129_quality_classifier": q129_quality_classifier,
    "q148_pii_scrub_net": q148_pii_scrub_net,
    "q151_boilerplate_paras": q151_boilerplate_paras,
    "q155_pareto_docs": q155_pareto_docs,
    "q161_percent_rank_hist": q161_percent_rank_hist,
    "q176_phrase_positions": q176_phrase_positions,
    "q181_skipgram_pairs": q181_skipgram_pairs,
    "q184_calibration_bins": q184_calibration_bins,
    "q186_classifier_agreement": q186_classifier_agreement,
    "q187_auc_evidence": q187_auc_evidence,
    "q189_lang_overlap_matrix": q189_lang_overlap_matrix,
    "q195_k_anonymity": q195_k_anonymity,
    "q197_gini_evidence": q197_gini_evidence,
    "q199_kwic_contexts": q199_kwic_contexts,
    "q330_dehyphenate": q330_dehyphenate,
    "q331_ligature_fold": q331_ligature_fold,
}


ORACLE_SQL = {
    "q07_token_freq": f"""
        SELECT token, count(*) AS cnt FROM (
          SELECT unnest({_TOKS}) AS token FROM documents
        ) WHERE token <> ''
        GROUP BY token ORDER BY cnt DESC, token LIMIT 100
    """,
    "q08_bigram_freq": f"""
        SELECT bigram, count(*) AS cnt FROM (
          SELECT unnest(list_transform(
            range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]
          )) AS bigram
          FROM (SELECT {_TOKS} AS toks FROM documents)
        ) GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 100
    """,
    "q12_token_count": f"""
        SELECT doc_id,
               len(list_filter({_TOKS}, t -> t <> '')) AS n_tokens
        FROM documents
    """,
    "q16_quality": f"""
        SELECT doc_id,
               len(list_filter(toks, t -> t <> '')) AS n_tokens,
               len(list_filter(toks,
                   t -> t IN ('the','a','data','key','value'))) AS n_stop,
               CASE WHEN len(list_filter(toks, t -> t <> '')) = 0 THEN 0.0
                    ELSE round(
                      len(list_filter(toks,
                        t -> t IN ('the','a','data','key','value')))::DOUBLE
                      / len(list_filter(toks, t -> t <> '')), 6)
               END AS stop_ratio
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    """,
    "q25_normalize": """
        SELECT doc_id, lower(text) AS norm_text FROM documents
    """,
    "q26_trigram_freq": f"""
        SELECT trigram, count(*) AS cnt FROM (
          SELECT unnest(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS trigram
          FROM (SELECT {_TOKS} AS toks FROM documents)
        ) GROUP BY trigram ORDER BY cnt DESC, trigram LIMIT 100
    """,
    "q40_cjk_segment": f"""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_segments,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_segments
        FROM (SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
              FROM documents)
    """,
    "q48_tf_df": f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks
          GROUP BY doc_id, token HAVING count(*) >= 2
        ),
        df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
        )
        SELECT tf.doc_id, tf.token, tf.tf, df.df
        FROM tf JOIN df USING (token)
    """,
    "q52_pii_redact": r"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' contact-' || CAST(doc_id AS VARCHAR)
                           || '@example.com'
                      ELSE text END AS t
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
               )) AS BIGINT) AS n_emails,
               CAST(length(t) - length(regexp_replace(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'
               )) AS BIGINT) AS n_removed,
               md5(regexp_replace(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'
               )) AS redacted_md5
        FROM planted
    """,
    "q54_grouped_string_agg": """
        WITH ranked AS (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        )
        SELECT o_orderstatus,
               string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY o_totalprice DESC, o_orderkey) AS top_keys
        FROM ranked WHERE rn <= 3 GROUP BY o_orderstatus
    """,
    "q64_tfidf_topk": f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter({_TOKS}, t -> t <> '')) AS token
          FROM documents
        ),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM toks
          GROUP BY doc_id, token HAVING count(*) >= 2
        ),
        df AS (
          SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
        ),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 (tf.tf * (SELECT count(*) FROM documents))
                   / CAST(df.df AS DOUBLE) AS score
          FROM tf JOIN df USING (token)
        )
        SELECT doc_id, token, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token
          ) AS rn FROM scored
        ) WHERE rn <= 3
    """,
    "q72_repetition_stats": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '') AS ts
          FROM documents
        )
        SELECT doc_id,
               greatest(len(ts) - 1, 0) AS n_bigrams,
               CASE WHEN len(ts) < 2 THEN 0
                    ELSE len(list_distinct(list_transform(
                           generate_series(1, CAST(len(ts) - 1 AS BIGINT)),
                           i -> ts[i] || chr(31) || ts[i+1])))
               END AS n_distinct
        FROM toks
    """,
    "q86_dense_rank_tokens": """
        WITH tok AS (
          SELECT lang,
                 unnest(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '')) AS token
          FROM documents
        ), c AS (
          SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2
        ), r AS (
          SELECT *, dense_rank() OVER (
            PARTITION BY lang ORDER BY n DESC) AS rnk
          FROM c
        )
        SELECT lang, token, CAST(n AS BIGINT) AS n,
               CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 2
    """,
    "q87_oov_rate": """
        WITH tok AS (
          SELECT doc_id,
                 unnest(list_filter(
                   regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                   x -> x <> '')) AS token
          FROM documents
        ), cnt AS (
          SELECT token, count(*) AS n FROM tok GROUP BY token
        ), vocab AS (
          SELECT token FROM cnt ORDER BY n DESC, token ASC LIMIT 100
        ), per AS (
          SELECT t.doc_id,
                 count(*) AS n_tokens,
                 count(*) FILTER (
                   t.token NOT IN (SELECT token FROM vocab)) AS n_oov
          FROM tok t GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "q94_lang_mix_weights": """
        WITH c AS (
          SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
        w AS (
          SELECT lang, n_docs,
                 sqrt(CAST(n_docs AS DOUBLE) / total) AS wt
          FROM c, t
        )
        SELECT lang, n_docs,
               round(wt / (SELECT sum(wt) FROM w), 6) AS sample_share
        FROM w
    """,
    "q95_pmi_collocations": f"""
        WITH toks AS (SELECT {_TOKS} AS toks FROM documents),
        uni AS (
          SELECT token, count(*) AS cnt FROM (
            SELECT unnest(toks) AS token FROM toks
          ) WHERE token <> '' GROUP BY token
        ),
        n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
        bi AS (
          SELECT bigram, count(*) AS cnt_xy FROM (
            SELECT unnest(list_transform(
              range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]
            )) AS bigram FROM toks
          ) GROUP BY bigram HAVING count(*) >= 5
        )
        SELECT bigram, cnt_xy,
               round(CAST(cnt_xy * total AS DOUBLE)
                     / CAST(u1.cnt * u2.cnt AS DOUBLE), 6) AS lift
        FROM bi, n
        JOIN uni u1 ON split_part(bigram, ' ', 1) = u1.token
        JOIN uni u2 ON split_part(bigram, ' ', 2) = u2.token
        ORDER BY CAST(cnt_xy * total AS DOUBLE)
                 / CAST(u1.cnt * u2.cnt AS DOUBLE) DESC, bigram
        LIMIT 20
    """,
    "q97_ngram_langid": """
        -- Cavnar–Trenkle out-of-place distance, integers end to end
        WITH grams AS (
          SELECT doc_id, lang,
                 unnest(list_transform(
                   range(1, len(text) - 1), i -> substr(text, i, 3)
                 )) AS g
          FROM documents
        ),
        langcnt AS (
          SELECT lang, g, count(*) AS c FROM grams GROUP BY 1, 2
        ),
        prof AS (
          SELECT lang, g,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY c DESC, g
                 ) AS r
          FROM langcnt QUALIFY r <= 50
        ),
        doccnt AS (
          SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
        ),
        docprof AS (
          SELECT doc_id, g,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY c DESC, g
                 ) AS r
          FROM doccnt QUALIFY r <= 50
        ),
        dist AS (
          SELECT d.doc_id, l.lang,
                 sum(CASE WHEN p.r IS NULL THEN 50
                          ELSE abs(d.r - p.r) END) AS dist
          FROM docprof d
          CROSS JOIN (SELECT DISTINCT lang FROM documents) l
          LEFT JOIN prof p ON p.lang = l.lang AND p.g = d.g
          GROUP BY 1, 2
        ),
        pred AS (
          SELECT doc_id, lang AS pred_lang,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY dist, lang
                 ) AS rn
          FROM dist QUALIFY rn = 1
        )
        SELECT dd.lang, p.pred_lang, count(*) AS n_docs
        FROM pred p JOIN documents dd USING (doc_id)
        GROUP BY 1, 2
    """,
    "q98_importance_ratio": f"""
        -- DSIR-style hashed importance ratio: exact integer evidence,
        -- one IEEE division (Ray side is bit-identical by construction)
        WITH tok2 AS (
          SELECT doc_id, lang,
                 CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)
                   % 1024 AS b
          FROM (SELECT doc_id, lang, unnest({_TOKS}) AS token
                FROM documents)
          WHERE token <> ''
        ),
        tcnt AS (
          SELECT b, count(*) AS tc FROM tok2 WHERE lang = 'en' GROUP BY b
        ),
        rcnt AS (SELECT b, count(*) AS rc FROM tok2 GROUP BY b),
        sc AS (
          SELECT doc_id,
                 CAST(sum(coalesce(tc, 0) + 1) AS BIGINT) AS num,
                 CAST(sum(rc + 1) AS BIGINT) AS den
          FROM tok2
          LEFT JOIN tcnt USING (b) JOIN rcnt USING (b)
          GROUP BY doc_id
        )
        SELECT doc_id, num, den,
               round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ratio
        FROM sc
        ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC, doc_id
        LIMIT 20
    """,
    "q105_source_lang_entropy": """
        WITH c AS (
          SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
        ),
        t AS (
          SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
        )
        SELECT c.source, t.tot AS n_docs,
               round(sum(-(CAST(n AS DOUBLE) / tot)
                         * log2(CAST(n AS DOUBLE) / tot)), 6)
                 AS lang_entropy,
               CAST(max(n) AS BIGINT) AS max_lang_docs
        FROM c JOIN t USING (source)
        GROUP BY c.source, t.tot
    """,
    "q116_gopher_rules": f"""
        WITH t AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(
                   list_transform(toks, x -> length(x))), 0
                 ) AS BIGINT) AS sum_len,
                 CAST(len(list_filter(toks,
                   x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
                 CAST(len(list_filter(toks,
                   x -> NOT regexp_matches(x, '[a-z0-9]')
                 )) AS BIGINT) AS n_nonal,
                 CAST(len(list_filter(toks,
                   x -> x IN ('the', 'a', 'data', 'key', 'value')
                 )) AS BIGINT) AS n_stop
          FROM t
        )
        SELECT doc_id, n_words, sum_len, n_alpha, n_nonal, n_stop,
               CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                          AND 3 * n_words <= sum_len
                          AND sum_len <= 10 * n_words
                          AND 10 * n_nonal <= n_words
                          AND 5 * n_alpha >= 4 * n_words
                          AND n_stop >= 2
                    THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM m
    """,
    "q118_inverted_index": f"""
        WITH t AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents
        ),
        p AS (
          SELECT doc_id, unnest(toks) AS token,
                 unnest(range(1, len(toks) + 1)) AS pos
          FROM t
        ),
        g AS (
          SELECT token,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(count(*) AS BIGINT) AS n_postings,
                 string_agg(
                   CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR),
                   ',' ORDER BY doc_id, pos
                 ) AS postings
          FROM p GROUP BY token
        )
        SELECT token, df, n_postings, postings
        FROM g WHERE df >= 2
    """,
    "q124_rare_feature_pairs": f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter({_TOKS}, x -> x <> '') AS tk
          FROM documents
        ),
        tri AS (
          SELECT DISTINCT doc_id, lang,
                 unnest(list_transform(
                   range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]
                 )) AS g
          FROM toks
        ),
        g2 AS (
          SELECT g, min(doc_id) AS ia, max(doc_id) AS ib
          FROM tri GROUP BY g HAVING count(*) = 2
        ),
        langs AS (SELECT doc_id, lang FROM documents),
        p AS (
          SELECT g2.ia, g2.ib, x.lang AS la, y.lang AS lb
          FROM g2
          JOIN langs x ON x.doc_id = g2.ia
          JOIN langs y ON y.doc_id = g2.ib
          WHERE x.lang <> y.lang
        )
        SELECT ia AS id_a, ib AS id_b, la AS lang_a, lb AS lang_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM p GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2
    """,
    "q126_padding_waste": f"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter({_TOKS}, x -> x <> ''))
                      AS BIGINT) AS n_tok
          FROM documents
        ),
        o AS (
          SELECT n_tok,
                 (row_number() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) - 1) // 64 AS batch_id
          FROM t
        )
        SELECT CAST(batch_id AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(n_tok) AS BIGINT) AS max_len,
               CAST(sum(n_tok) AS BIGINT) AS sum_len,
               CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS waste
        FROM o GROUP BY 1
    """,
    "q129_quality_classifier": f"""
        -- B=64 hashed buckets, integer weights in [-10, 10] from
        -- md5_number_lower('w:b'); scores are exact int64
        WITH w AS (
          SELECT b.b AS b,
                 CAST(md5_number_lower(
                   'w:' || CAST(b.b AS VARCHAR)
                 ) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t
          JOIN w ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(s.score, 0) AS BIGINT) AS score,
               CAST(CASE WHEN coalesce(s.score, 0) > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM documents d LEFT JOIN s USING (doc_id)
    """,
    "q148_pii_scrub_net": r"""
        -- coalesce keeps NULL text in lockstep with the Ray side's
        -- `t or ""` (the q119 NULL-lockstep convention)
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 1
                      THEN coalesce(text, '') || ' call +1555'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      WHEN doc_id % 3 = 2
                      THEN coalesce(text, '') || ' from '
                           || CAST(doc_id % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 3) % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                           || CAST((doc_id * 11) % 256 AS VARCHAR)
                      ELSE coalesce(text, '') END AS t
          FROM documents
        ),
        s AS (
          SELECT doc_id, t,
                 regexp_replace(t, '\+1555[0-9]{4}', '<PHONE>', 'g') AS s1
          FROM planted
        ),
        s2 AS (
          SELECT doc_id, t, s1,
                 regexp_replace(
                   s1,
                   '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                   '<IP>', 'g'
                 ) AS scrubbed
          FROM s
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                 t, '\+1555[0-9]{4}')) AS BIGINT) AS n_phones,
               CAST(len(regexp_extract_all(
                 s1, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'
               )) AS BIGINT) AS n_ips,
               CAST(length(t) - length(scrubbed) AS BIGINT) AS n_removed,
               md5(scrubbed) AS scrubbed_md5
        FROM s2
    """,
    "q151_boilerplate_paras": """
        -- planted page structure: [text, host footer] (+ promo banner
        -- on even doc_ids); boilerplate = paragraphs in a strict
        -- majority of the host's docs (2*df > n_docs, exact integers)
        WITH d AS (
          SELECT doc_id, 'site' || (doc_id % 7) AS host,
                 CASE WHEN doc_id % 2 = 0 THEN
                   [coalesce(text, ''),
                    'host site' || (doc_id % 7)
                      || ' footer navigation copyright terms privacy'
                      || ' contact',
                    'subscribe newsletter promo banner site'
                      || (doc_id % 7)]
                 ELSE
                   [coalesce(text, ''),
                    'host site' || (doc_id % 7)
                      || ' footer navigation copyright terms privacy'
                      || ' contact']
                 END AS paras
          FROM documents
        ),
        p AS (
          SELECT doc_id, host, unnest(paras) AS para,
                 unnest(range(1, len(paras) + 1)) AS pos
          FROM d
        ),
        hn AS (SELECT host, count(*) AS n_docs FROM d GROUP BY host),
        fdf AS (
          SELECT host, md5(para) AS pm,
                 count(DISTINCT doc_id) AS df
          FROM p GROUP BY 1, 2
        ),
        boiler AS (
          SELECT fdf.host, fdf.pm
          FROM fdf JOIN hn ON fdf.host = hn.host
          WHERE 2 * fdf.df > hn.n_docs
        ),
        kept AS (
          SELECT p.doc_id, p.para, p.pos
          FROM p LEFT JOIN boiler b
            ON p.host = b.host AND md5(p.para) = b.pm
          WHERE b.pm IS NULL
        )
        SELECT d.doc_id,
               CAST(len(d.paras) AS BIGINT) AS n_paras,
               CAST(len(d.paras) - count(k.para) AS BIGINT) AS n_removed,
               md5(coalesce(
                 string_agg(k.para, chr(10) ORDER BY k.pos), ''
               )) AS cleaned_md5
        FROM d LEFT JOIN kept k ON d.doc_id = k.doc_id
        GROUP BY d.doc_id, len(d.paras)
    """,
    "q155_pareto_docs": """
        WITH m AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(len(list_filter(
                   list_distinct(
                     regexp_split_to_array(lower(text), '\\s+')
                   ), t -> t <> ''
                 )) AS BIGINT) AS n_uniq
          FROM documents
        )
        SELECT a.lang, a.doc_id, a.n_chars, a.n_uniq
        FROM m a
        WHERE NOT EXISTS (
          SELECT 1 FROM m b
          WHERE b.lang = a.lang AND b.doc_id <> a.doc_id
            AND b.n_chars >= a.n_chars AND b.n_uniq >= a.n_uniq
            AND (b.n_chars > a.n_chars OR b.n_uniq > a.n_uniq)
        )
    """,
    "q161_percent_rank_hist": """
        -- strict within-lang rank of character length + group size:
        -- integer evidence for percent_rank = n_smaller / (n_lang - 1)
        WITH d AS (
          SELECT doc_id, coalesce(lang, '') AS lang,
                 length(coalesce(text, '')) AS n_chars
          FROM documents
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(rank() OVER (
                 PARTITION BY lang ORDER BY n_chars
               ) - 1 AS BIGINT) AS n_smaller,
               CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                 AS n_lang
        FROM d
    """,
    "q176_phrase_positions": f"""
        -- positional postings: every (doc, 0-based token position) of
        -- the corpus top-1 trigram (ties: trigram asc)
        WITH base AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        tri AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - 1),
            i -> {{'pos': i,
                   'tg': toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]}}
          ), recursive := true)
          FROM base
        ),
        top AS (
          SELECT tg FROM tri GROUP BY tg
          ORDER BY count(*) DESC, tg LIMIT 1
        )
        SELECT t.doc_id, CAST(t.pos - 1 AS BIGINT) AS pos, t.tg AS phrase
        FROM tri t JOIN top ON t.tg = top.tg
    """,
    "q181_skipgram_pairs": f"""
        -- unordered within-window (d <= 3) token pairs under binary
        -- collation; top-100 by (count desc, pair asc)
        WITH base AS (
          SELECT {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
        ),
        p AS (
          SELECT unnest(list_transform(range(1, len(toks)),
            i -> CASE WHEN toks[i] <= toks[i+1]
                      THEN toks[i] || ' ' || toks[i+1]
                      ELSE toks[i+1] || ' ' || toks[i] END)) AS pair
          FROM base
          UNION ALL
          SELECT unnest(list_transform(range(1, len(toks) - 1),
            i -> CASE WHEN toks[i] <= toks[i+2]
                      THEN toks[i] || ' ' || toks[i+2]
                      ELSE toks[i+2] || ' ' || toks[i] END))
          FROM base
          UNION ALL
          SELECT unnest(list_transform(range(1, len(toks) - 2),
            i -> CASE WHEN toks[i] <= toks[i+3]
                      THEN toks[i] || ' ' || toks[i+3]
                      ELSE toks[i+3] || ' ' || toks[i] END))
          FROM base
        )
        SELECT pair, count(*) AS cnt FROM p
        GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 100
    """,
    "q184_calibration_bins": f"""
        -- reliability-diagram evidence over the q129 integer scores;
        -- clamp+shift keeps the width-16 binning division nonnegative
        -- (DuckDB // truncates, Python floors — they agree on >= 0)
        WITH w AS (
          SELECT b.b AS b,
                 CAST(md5_number_lower(
                   'w:' || CAST(b.b AS VARCHAR)
                 ) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t
          JOIN w ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        d AS (
          SELECT d.doc_id, coalesce(s.score, 0) AS score,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents d LEFT JOIN s USING (doc_id)
        )
        SELECT (least(greatest(score, -1024), 1023) + 1024) // 16 AS bin,
               count(*) AS n,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(score) AS BIGINT) AS sum_score
        FROM d GROUP BY 1
    """,
    "q186_classifier_agreement": f"""
        -- per-lang confusion matrix of two hashed-linear keep verdicts
        -- (weight seeds 'w:' and 'v:')
        WITH wa AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'w:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        wb AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'v:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        sa AS (
          SELECT t.doc_id, CAST(sum(wa.w) AS BIGINT) AS score
          FROM toks t JOIN wa
            ON wa.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        sb AS (
          SELECT t.doc_id, CAST(sum(wb.w) AS BIGINT) AS score
          FROM toks t JOIN wb
            ON wb.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        d AS (
          SELECT coalesce(d.lang, '') AS lang,
                 CASE WHEN coalesce(sa.score, 0) > 0 THEN 1 ELSE 0 END
                   AS ka,
                 CASE WHEN coalesce(sb.score, 0) > 0 THEN 1 ELSE 0 END
                   AS kb
          FROM documents d
          LEFT JOIN sa USING (doc_id) LEFT JOIN sb USING (doc_id)
        )
        SELECT lang,
          CAST(sum(CASE WHEN ka = 0 AND kb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n00,
          CAST(sum(CASE WHEN ka = 0 AND kb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n01,
          CAST(sum(CASE WHEN ka = 1 AND kb = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
          CAST(sum(CASE WHEN ka = 1 AND kb = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n11
        FROM d GROUP BY 1
    """,
    "q187_auc_evidence": f"""
        -- Mann-Whitney: 2U = sum over score values of
        -- 2·n_pos(s)·cum_neg(<s) + n_pos(s)·n_neg(s); all integers
        WITH w AS (
          SELECT b.b AS b, CAST(md5_number_lower(
            'w:' || CAST(b.b AS VARCHAR)) % 21 AS BIGINT) - 10 AS w
          FROM range(64) b(b)
        ),
        toks AS (
          SELECT doc_id,
                 unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        s AS (
          SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS score
          FROM toks t JOIN w
            ON w.b = CAST(md5_number_lower(t.token) % 64 AS BIGINT)
          GROUP BY 1
        ),
        d AS (
          SELECT coalesce(s.score, 0) AS score,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
          FROM documents d LEFT JOIN s USING (doc_id)
        ),
        g AS (
          SELECT score, CAST(sum(pos) AS BIGINT) AS np_,
                 CAST(sum(1 - pos) AS BIGINT) AS nn_
          FROM d GROUP BY 1
        ),
        o AS (
          SELECT score, np_, nn_,
                 coalesce(sum(nn_) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cneg
          FROM g
        )
        SELECT CAST(sum(np_) AS BIGINT) AS n_pos,
               CAST(sum(nn_) AS BIGINT) AS n_neg,
               CAST(sum(2 * np_ * cneg + np_ * nn_) AS BIGINT) AS u2
        FROM o
    """,
    "q189_lang_overlap_matrix": f"""
        -- exact pairwise overlap of unigram ∪ bigram feature sets;
        -- the diagonal (a = b) carries each side's |F|
        WITH base AS (
          SELECT lang, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        ),
        f AS (
          SELECT DISTINCT lang, tok FROM (
            SELECT lang, unnest(toks) AS tok FROM base
            UNION ALL
            SELECT lang, unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) FROM base
          ) WHERE tok <> ''
        )
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               count(*) AS n_common
        FROM f a JOIN f b ON a.tok = b.tok AND a.lang <= b.lang
        GROUP BY 1, 2
    """,
    "q195_k_anonymity": """
        -- equivalence-class size histogram over the quasi-identifier
        -- (lang, source, n_chars length band)
        WITH c AS (
          SELECT lang, source, n_chars // 100 AS band, count(*) AS n
          FROM documents GROUP BY 1, 2, 3
        )
        SELECT n AS k, count(*) AS n_classes FROM c GROUP BY 1
    """,
    "q197_gini_evidence": """
        -- sorted-order identity: sum over i of (2i - n - 1) * x_(i)
        -- equals the sum of all pairwise absolute differences
        WITH r AS (
          SELECT lang, n_chars,
                 row_number() OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id) AS i,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT lang, CAST(max(n) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS sum_x,
               CAST(sum((2 * i - n - 1) * n_chars) AS BIGINT) AS gini_num
        FROM r GROUP BY lang
    """,
    "q199_kwic_contexts": f"""
        -- concordance of the corpus top-1 token with 2-token contexts
        WITH base AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        tok AS (
          SELECT tok FROM (
            SELECT unnest(toks) AS tok FROM base
          ) WHERE tok <> ''
          GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 1
        ),
        pos AS (
          SELECT doc_id, toks,
                 unnest(list_transform(range(1, len(toks) + 1), i -> i))
                   AS i
          FROM base
        ),
        hits AS (
          SELECT doc_id, toks, i FROM pos, tok WHERE toks[i] = tok.tok
        )
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               coalesce(array_to_string(
                 list_slice(toks, greatest(1, i - 2), i - 1), ' '), '')
                 AS left_ctx,
               coalesce(array_to_string(
                 list_slice(toks, i + 1, least(len(toks), i + 2)), ' '), '')
                 AS right_ctx
        FROM hits
    """,
    "q330_dehyphenate": """
        -- repaired text must equal the original; break count mirrors
        -- the injection rule (0-based word index, length >= 6)
        WITH s AS (
          SELECT doc_id, text, string_split(text, ' ') AS wl
          FROM documents WHERE text IS NOT NULL
        ),
        w AS (
          SELECT doc_id, unnest(wl) AS word,
                 unnest(range(0, len(wl))) AS j
          FROM s
        ),
        b AS (
          SELECT doc_id,
                 count(*) FILTER (length(word) >= 6
                                  AND (j + doc_id) % 7 = 0) AS nb
          FROM w GROUP BY doc_id
        )
        SELECT d.doc_id, d.text,
               CAST(coalesce(b.nb, 0) AS BIGINT) AS n_breaks
        FROM documents d LEFT JOIN b USING (doc_id)
        WHERE d.text IS NOT NULL
    """,
    "q331_ligature_fold": """
        -- folded text must equal the original; ligature count via the
        -- replace-length trick (non-overlapping, same greedy scan)
        SELECT doc_id, text,
               CAST((length(text) - length(replace(text, 'fi', ''))) // 2
                    + (length(text) - length(replace(text, 'fl', ''))) // 2
                    AS BIGINT) AS n_ligatures
        FROM documents WHERE text IS NOT NULL
    """,
}
