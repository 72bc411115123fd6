"""Vocab/LM/BPE/trie/AC correction (SURVEY §2.3 A2/A3/A5, M3/M4).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.core.collect import collect_rows
from basicocr_ray.core.textstats import md5_hex
from basicocr_ray.stages.wide import count_terms
from basicocr_ray.stages.wide import make_ngram_items
from basicocr_ray.stages.wide import token_items
from basicocr_ray.stages.wide import top_k

from ._shared import (
    _TOKS,
    _p,
    _read,
)


def q20_ac_strip(sf_dir: str):
    """AC-automaton boilerplate-phrase stripping (A3/J3) on an actor pool;
    non-overlapping phrase set ⇒ equivalent to the oracle's chained
    replace()."""
    from basicocr_ray.stages.correct import ACStripper

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    stripped = ds.map_batches(
        ACStripper,
        fn_constructor_kwargs={
            "phrases": ["vector window", "hash scan"],
            "column": "text",
            "out_column": "stripped_text",
        },
        batch_format="pyarrow",
        concurrency=2,
    )
    return stripped.select_columns(["doc_id", "stripped_text"])


def q21_trie_correct(sf_dir: str):
    """Trie-corrector end-to-end (A2): dictionary = corpus token counts
    (G3 output broadcast); deterministically corrupt every 7th token (drop
    last char when len>3) then correct with bounded-edit-distance trie
    search (max_cost 1, retry +3, tie ladder per trietree_correct.py)."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # top-K cap (sorted+limited DISTRIBUTEDLY, before anything reaches the
    # driver) keeps the dictionary broadcast bounded on an open-vocabulary
    # corpus; 100k ≫ the fixture vocab so the oracle tie ladder is exact
    dict_rows = (
        count_terms(ds, "text", token_items, "token")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(100_000)
    )
    dict_rows = collect_rows(dict_rows)
    entries = [(r["token"], int(r["cnt"])) for r in dict_rows]
    entries_ref = ray.put(entries)

    class CorruptCorrect:
        def __init__(self, entries_ref):
            from basicocr_ray.core.trie import TrieDict

            self.trie = TrieDict(ray.get(entries_ref))
            self._cache: dict[str, str] = {}

        def _correct(self, tok: str) -> str:
            hit = self._cache.get(tok)
            if hit is None:
                hit = self.trie.correct(tok, 1)
                self._cache[tok] = hit
            return hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            out = []
            for did, t in zip(ids, batch["text"].to_pylist()):
                toks = (t or "").lower().split()
                fixed = []
                for i, tok in enumerate(toks):
                    if (did + i) % 7 == 0 and len(tok) > 3:
                        tok = tok[:-1]
                    fixed.append(self._correct(tok))
                out.append(" ".join(fixed))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "corrected_text": pa.array(out, pa.large_string()),
                }
            )

    return ds.map_batches(
        CorruptCorrect,
        fn_constructor_kwargs={"entries_ref": entries_ref},
        batch_format="pyarrow",
        concurrency=2,
    )


def q222_correction_chain(sf_dir: str):
    """The CHAINED correction flow under ONE driver hash (round-4 verdict
    item 4): AC-strip boilerplate phrases → derive the dictionary from
    the STRIPPED corpus (G3 broadcast) → deterministically corrupt every
    7th token → trie-correct (max_cost 1, retry +3, tie ladder). q20/q21
    hash the stages in isolation; this is the composition the reference
    runs in its driver flow (contrib/trietree/trietree_correct.py:245-274
    chains correction after recognition; acautomata Test.java:58-82
    builds + scans in the same driver), so a stage-boundary bug — e.g.
    dictionary built from pre-strip text, or corruption indices computed
    on the wrong token stream — fails THIS hash even when both stage
    hashes stay green."""
    import ray

    from basicocr_ray.stages.correct import ACStripper

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # stage 1: AC boilerplate strip (A3) on an actor pool; materialized
    # ONCE because it feeds BOTH the dictionary build and the correction
    stripped = ds.map_batches(
        ACStripper,
        fn_constructor_kwargs={
            "phrases": ["vector window", "hash scan"],
            "column": "text",
            "out_column": "stripped_text",
        },
        batch_format="pyarrow",
        concurrency=2,
    ).select_columns(["doc_id", "stripped_text"]).materialize()

    # stage 2: dictionary from the stripped corpus — the chain order
    # matters: a dictionary built pre-strip would contain the boilerplate
    # phrases' tokens and correct differently
    dict_rows = (
        count_terms(stripped, "stripped_text", token_items, "token")
        .sort(["cnt", "token"], descending=[True, False])
        .limit(100_000)
    )
    entries = [
        (r["token"], int(r["cnt"])) for r in collect_rows(dict_rows)
    ]
    entries_ref = ray.put(entries)

    class CorruptCorrect:
        def __init__(self, entries_ref):
            from basicocr_ray.core.trie import TrieDict

            self.trie = TrieDict(ray.get(entries_ref))
            self._cache: dict[str, str] = {}

        def _correct(self, tok: str) -> str:
            hit = self._cache.get(tok)
            if hit is None:
                hit = self.trie.correct(tok, 1)
                self._cache[tok] = hit
            return hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            out = []
            for did, t in zip(ids, batch["stripped_text"].to_pylist()):
                toks = (t or "").lower().split()
                fixed = []
                for i, tok in enumerate(toks):
                    if (did + i) % 7 == 0 and len(tok) > 3:
                        tok = tok[:-1]
                    fixed.append(self._correct(tok))
                out.append(" ".join(fixed))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "corrected_text": pa.array(out, pa.large_string()),
                }
            )

    return stripped.map_batches(
        CorruptCorrect,
        fn_constructor_kwargs={"entries_ref": entries_ref},
        batch_format="pyarrow",
        concurrency=2,
    )


_VOCAB_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def q27_vocab_roundtrip(sf_dir: str):
    """Label codec end-to-end (M3/M4, `utils.py:44-101`): encode each doc
    against a fixed alphabet (unknown chars dropped), decode raw, compare.
    Output: (doc_id, n_codes, roundtrip_ok); the oracle computes n_codes as
    the length of the alphabet-filtered text and asserts roundtrip_ok."""
    from basicocr_ray.core.vocab import Vocab

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    vocab = Vocab(_VOCAB_ALPHABET)
    allowed = frozenset(_VOCAB_ALPHABET)

    def rt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n_codes, oks = [], []
        for t in batch["text"].to_pylist():
            t = (t or "").lower()
            codes, lens = vocab.encode([t])
            decoded = vocab.decode(codes, lens, raw=True)[0]
            expected = "".join(c for c in t if c in allowed)
            n_codes.append(lens[0])
            oks.append(decoded == expected)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_codes": pa.array(n_codes, pa.int64()),
                "roundtrip_ok": pa.array(oks, pa.bool_()),
            }
        )

    return ds.map_batches(rt, batch_format="pyarrow")


def q32_lm_score(sf_dir: str):
    """Bigram LM fit (distributed count/merge, G4) + broadcast scoring
    (A5). The hashable result is the EXACT INTEGER EVIDENCE the score is
    built from (token count + summed corpus bigram counts per doc), which
    the DuckDB oracle reproduces bit-for-bit; the libm-dependent log-prob
    itself stays out of the hash (semantics unit-tested in
    tests/test_multimodal_lm.py)."""
    from basicocr_ray.pipelines.lm import fit_bigram_lm, score_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_bigram_lm(ds)
    return score_documents(ds, lm).select_columns(
        ["doc_id", "n_tokens", "sum_bigram_count"]
    )


def q49_trigram_lm_score(sf_dir: str):
    """TRIGRAM interpolated-KN LM fit (distributed order-3 counts through
    the same partial+final count/merge as q32's bigram pipeline — the
    reference's `make-big-lm` at its real order) + broadcast actor-pool
    scoring. Hashable result: the exact integer evidence (token count +
    summed corpus trigram counts per doc); the libm log-prob stays out of
    the hash (KN semantics unit-tested in tests/test_multimodal_lm.py)."""
    from basicocr_ray.pipelines.lm import fit_trigram_lm, score_documents_trigram

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    lm = fit_trigram_lm(ds)
    return score_documents_trigram(ds, lm).select_columns(
        ["doc_id", "n_tokens", "sum_trigram_count"]
    )


def q85_bpe_token_stats(sf_dir: str):
    """BPE-ish regex pre-tokenization counts (the GPT-2 pre-tokenizer
    class split, simplified to its three run classes): alphabetic runs,
    digit runs, and single non-alnum-non-space marks per document —
    the token-budget estimate every corpus costing pass needs. Three
    VECTORIZED pandas str.count passes per batch (no per-row Python);
    character classes are spelled in explicit ASCII so Python re and
    DuckDB's RE2 agree (\\s is unicode-wide in Python, ASCII in RE2)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    WS = " \\t\\n\\r\\f"

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower()
        n_alpha = t.str.count(r"[a-z]+").astype("int64")
        n_num = t.str.count(r"[0-9]+").astype("int64")
        n_other = t.str.count(f"[^a-z0-9{WS}]").astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_alpha": n_alpha,
                "n_num": n_num,
                "n_other": n_other,
                "n_bpe_tokens": n_alpha + n_num + n_other,
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def q104_bpe_merges(sf_dir: str):
    """BPE tokenizer TRAINING (Sennrich et al. 2016), distributed: learn
    the first 5 merge rules from the corpus word-frequency table. The
    textbook shape — pair statistics over the (word, count) relation,
    not the corpus — means ONE corpus scan total (the count_terms G3
    build); each merge round is then a scan of the small vocab relation:
    per-batch weighted pair partials → coarse-group exact sum → global
    top-1 (cnt desc, pair asc) → ONE merge row to the driver (metadata)
    → vectorized merge application. Merge application is the
    'space-padded non-overlapping replace' both engines implement
    identically (Python str.replace ≡ SQL replace, left-to-right
    non-overlapping), so the learned merge table hash-matches the
    5-round unrolled SQL twin exactly — integers end to end."""
    return _learn_bpe_merges(sf_dir, steps=5)


def _learn_bpe_merges(sf_dir: str, steps: int = 5) -> pd.DataFrame:
    """q104's distributed BPE merge learning, factored so q143 can apply
    the same merge table; → DataFrame(step, pair, cnt)."""
    from collections import Counter

    from basicocr_ray.stages.wide import coarse_group_reduce

    STEPS = steps
    ds = _read(sf_dir, "documents", columns=["text"])
    words = count_terms(ds, "text", token_items, "token")

    def symbolize(b: pa.Table) -> pa.Table:
        toks = b["token"].to_pylist()
        return pa.table(
            {
                "s": pa.array([" ".join(t) for t in toks], pa.string()),
                "c": pc.cast(b["cnt"], pa.int64()),
            }
        )

    words = words.map_batches(symbolize, batch_format="pyarrow").materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        cnt: Counter[str] = Counter()
        for s, c in zip(batch["s"].to_pylist(), batch["c"].to_pylist()):
            syms = s.split(" ")
            for a, b2 in zip(syms, syms[1:]):
                cnt[a + " " + b2] += c
        keys = list(cnt.keys())
        return pa.table(
            {
                "pair": pa.array(keys, pa.string()),
                "cnt": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("pair", as_index=False)["cnt"].sum()
        return out.astype({"cnt": "int64"})

    steps, pairs_out, cnts_out = [], [], []
    for step in range(1, STEPS + 1):
        pair_counts = coarse_group_reduce(
            words.map_batches(pair_partial, batch_format="pyarrow"),
            "pair", final_sum,
        )
        best = collect_rows(top_k(pair_counts, 1, "cnt", "pair"))
        pair, cnt = best[0]["pair"], int(best[0]["cnt"])
        steps.append(step)
        pairs_out.append(pair)
        cnts_out.append(cnt)
        merged = pair.replace(" ", "")

        def apply(b: pa.Table, _p=pair, _m=merged) -> pa.Table:
            ss = [
                (" " + s + " ").replace(f" {_p} ", f" {_m} ").strip()
                for s in b["s"].to_pylist()
            ]
            return pa.table(
                {"s": pa.array(ss, pa.string()), "c": b["c"]}
            )

        words = words.map_batches(apply, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        {
            "step": pd.array(steps, dtype="int64"),
            "pair": pairs_out,
            "cnt": pd.array(cnts_out, dtype="int64"),
        }
    )


def q108_vocab_growth(sf_dir: str):
    """Vocabulary-growth profile (the Heaps-law curve a tokenizer-corpus
    sizing study needs): for every word bigram (unigram vocab saturates
    on this corpus), the FIRST document position
    (under the deterministic md5 global order) at which it appears, then
    a histogram of first occurrences per corpus decile. Distributed
    shape: `global_rank` numbers docs with O(S) driver state; the
    shuffle then carries (token, min-pos) PARTIALS (per-batch min before
    the exchange, coarse-salted exact min groups after — G4 with min
    instead of sum); the decile rollup is tiny. Integers end to end."""
    from ray.data.aggregate import Count

    from basicocr_ray.core.textstats import md5_hex
    from basicocr_ray.stages.joins import bucketed_hash_join
    from basicocr_ray.stages.sample import global_rank
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_total = int(ds.count())
    # pos numbering runs over (doc_id) ONLY — text never rides the rank
    # shuffle; the per-token shuffle below carries (token, rank, id)
    # partials, and pos attaches to the ≤|vocab| winners via one join
    positioned = global_rank(
        ds.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ),
        "doc_id", seed=42, out_column="pos",
    )

    bigram_items = make_ngram_items(2)

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        # min over (md5 rank, id) == min over pos: rank order IS the
        # position order, so first-occurrence reduces on the rank string
        first: dict[str, tuple[str, int]] = {}
        for did, text in zip(df["doc_id"], df["text"]):
            key = (md5_hex(f"42:{int(did)}"), int(did))
            for tok in bigram_items(text):
                old = first.get(tok)
                if old is None or key < old:
                    first[tok] = key
        return pd.DataFrame(
            {
                "token": list(first.keys()),
                "rk": [v[0] for v in first.values()],
                "doc_id": pd.array(
                    [v[1] for v in first.values()], dtype="int64"
                ),
            }
        )

    def final_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["token", "rk", "doc_id"], kind="mergesort")
        out = df.drop_duplicates("token")[["token", "doc_id"]]
        return out.astype({"doc_id": "int64"})

    firsts = (
        coarse_group_reduce(
            ds.map_batches(partial_min, batch_format="pandas"),
            "token", final_min,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "token": pc.cast(b["token"], pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    with_pos = bucketed_hash_join(
        firsts,
        positioned.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "pos": pc.cast(b["pos"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        key="doc_id", left_columns=["token"], right_columns=["pos"],
    )

    def decile(b: pa.Table) -> pa.Table:
        fp = b["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"decile": pa.array(fp * 10 // n_total, pa.int64())}
        )

    df = (
        with_pos.map_batches(decile, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Count(alias_name="n_new_tokens"))
        .to_pandas()
    )
    df["decile"] = df["decile"].astype("int64")
    df["n_new_tokens"] = df["n_new_tokens"].astype("int64")
    return df


def _apply_bpe_merges(token: str, merges: list[str]) -> int:
    """Pieces a token splits into after applying ``merges`` in order —
    the space-padded non-overlapping replace both engines implement
    identically (q104's application kernel)."""
    s = " ".join(token)
    for pair in merges:
        s = (" " + s + " ").replace(
            f" {pair} ", f" {pair.replace(' ', '')} "
        ).strip()
    return len(s.split(" "))


def q143_bpe_apply(sf_dir: str):
    """BPE tokenizer APPLICATION — the fertility measurement (pieces per
    word, per language) that decides whether a learned vocab is usable
    for a multilingual corpus: the q104 merge table is learned first
    (same distributed loop, one corpus scan), then merges apply to the
    DISTINCT (lang, token) relation inside its coarse-group reduce —
    vocab-sized work, never corpus-sized — and per-lang word/piece
    totals come from a tiny final sum. The oracle re-learns the merges
    with q104's unrolled CTEs AND re-applies them to a distinct-word
    map, so the whole train→apply chain is hash-checked."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from basicocr_ray.stages.wide import coarse_group_reduce

    merges = _learn_bpe_merges(sf_dir, steps=5)["pair"].tolist()

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def lt_partial(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for lang, t in zip(
            batch["lang"].to_pylist(), batch["text"].to_pylist()
        ):
            for tok in token_items(t) if t else []:
                cnt[(lang, tok)] += 1
        keys = list(cnt.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "token": pa.array([k[1] for k in keys], pa.string()),
                "c": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "token"], as_index=False)["c"].sum()
        pieces = g["token"].map(lambda t: _apply_bpe_merges(t, merges))
        out = pd.DataFrame(
            {
                "lang": g["lang"],
                "n_words": g["c"].astype("int64"),
                "n_pieces": (g["c"] * pieces).astype("int64"),
            }
        )
        return out.groupby("lang", as_index=False)[
            ["n_words", "n_pieces"]
        ].sum()

    agg = (
        coarse_group_reduce(
            ds.map_batches(lt_partial, batch_format="pyarrow"),
            ["lang", "token"], fold,
        )
        .groupby("lang")
        .aggregate(
            Sum("n_words", alias_name="n_words"),
            Sum("n_pieces", alias_name="n_pieces"),
        )
        .to_pandas()
    )
    for c in ("n_words", "n_pieces"):
        agg[c] = agg[c].astype("int64")
    return agg


def q347_ac_replace(sf_dir: str):
    """AC MULTI-PATTERN REWRITE — strip's masking generalization
    (PII tokens, term canonicalization): deterministic sensitive
    phrases are injected into each doc ('secret key %d' every doc;
    the shorter prefix 'secret' in odd docs elsewhere), then ONE
    Aho-Corasick pass replaces leftmost-longest non-overlapping
    matches with their mask tokens — the nested prefix proves the
    LONGEST rule (never 'secret'-inside-'secret key'). The automaton
    builds once per actor (A1 pattern); the oracle mirrors via
    longest-first sequential replace, equivalent on this non-
    overlapping injection."""
    from basicocr_ray.core.ac import ACAutomaton, ac_replace

    MAPPING = {
        "secret key": "[KEY]",
        "secret": "[SECRET]",
        "password": "[PW]",
    }
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    class Replacer:
        def __init__(self):
            self.ac = ACAutomaton(list(MAPPING))

        def __call__(self, b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b["text"]))
            ids = b["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False
            )
            out_id, out_text = [], []
            for i, t in zip(ids, b["text"].to_pylist()):
                i = int(i)
                injected = "secret key start " + t
                if i % 2 == 1:
                    injected = injected + " secret password end"
                out_id.append(i)
                out_text.append(ac_replace(self.ac, injected, MAPPING))
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "text": pa.array(out_text, pa.string()),
                }
            )

    return ds.map_batches(Replacer, concurrency=2, batch_format="pyarrow")


def q352_ac_pattern_freq(sf_dir: str):
    """ONE-PASS MULTI-PATTERN FREQUENCY — the dictionary-grep verb:
    corpus occurrence counts for a phrase dictionary in a SINGLE
    Aho-Corasick scan per doc (K patterns, one automaton, one pass —
    vs K replace-scans). Patterns here are border-free so the
    replace-length SQL twin (non-overlapping count) equals the AC
    all-occurrence count exactly. Automaton builds once per actor;
    partial counts reduce per pattern."""
    from basicocr_ray.core.ac import ACAutomaton
    from basicocr_ray.stages.wide import coarse_group_reduce

    PATTERNS = ["data", "the", "table", "查询", "page"]
    ds = _read(sf_dir, "documents", columns=["text"])

    class Scanner:
        def __init__(self):
            self.ac = ACAutomaton(PATTERNS)

        def __call__(self, b: pa.Table) -> pa.Table:
            cnt = {p: 0 for p in PATTERNS}
            for t in b["text"].to_pylist():
                if t:
                    for _s, _e, pat in self.ac.find_all(t):
                        cnt[pat] += 1
            return pa.table(
                {
                    "pattern": pa.array(list(cnt), pa.string()),
                    "n": pa.array(
                        [cnt[p] for p in cnt], pa.int64()
                    ),
                }
            )

    out = coarse_group_reduce(
        ds.map_batches(Scanner, concurrency=2, batch_format="pyarrow"),
        "pattern",
        lambda df: df.groupby("pattern", as_index=False)["n"]
        .sum()
        .astype({"n": "int64"}),
    ).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "pattern": pd.array([], dtype="object"),
                "n": pd.array([], dtype="int64"),
            }
        )
    return out


def _bpe_oracle_sql(steps: int = 5) -> str:
    """Unrolled SQL twin of q104: `steps` rounds of weighted pair count →
    argmax (cnt desc, pair asc) → space-padded non-overlapping replace."""
    parts = [
        f"""WITH w0 AS (
          SELECT trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({_TOKS}) AS token FROM documents)
          WHERE token <> '' GROUP BY 1
        )"""
    ]
    for r in range(1, steps + 1):
        prev = f"w{r - 1}"
        parts.append(
            f""", p{r} AS (
          SELECT pr AS pair, CAST(sum(c) AS BIGINT) AS cnt FROM (
            SELECT c, unnest(list_transform(
              range(1, len(a)), i -> a[i] || ' ' || a[i+1]
            )) AS pr
            FROM (SELECT c, string_split(s, ' ') AS a FROM {prev})
          ) GROUP BY 1
        ), m{r} AS (
          SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
        ), w{r} AS (
          SELECT trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s, c FROM {prev}
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, pair, cnt FROM m{r}"
        for r in range(1, steps + 1)
    )
    parts.append(f" SELECT * FROM ({selects})")
    return "".join(parts)


def _bpe_apply_oracle_sql(steps: int = 5) -> str:
    """Unrolled SQL twin of q143: learn `steps` merges with q104's CTEs
    (weighted pair count over the corpus word-frequency table), apply
    the same replaces to a DISTINCT word map, and roll per-lang
    word/piece totals through a join of the token stream to the map."""
    parts = [
        f"""WITH lt AS (
          SELECT lang, unnest(list_filter({_TOKS}, x -> x <> '')) AS token
          FROM documents
        ),
        w0 AS (
          SELECT trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s,
                 CAST(count(*) AS BIGINT) AS c
          FROM (SELECT unnest({_TOKS}) AS token FROM documents)
          WHERE token <> '' GROUP BY 1
        ),
        v0 AS (
          SELECT DISTINCT token,
                 trim(regexp_replace(token, '(.)', '\\1 ', 'g')) AS s
          FROM lt
        )"""
    ]
    for r in range(1, steps + 1):
        prev = f"w{r - 1}"
        parts.append(
            f""", p{r} AS (
          SELECT pr AS pair, CAST(sum(c) AS BIGINT) AS cnt FROM (
            SELECT c, unnest(list_transform(
              range(1, len(a)), i -> a[i] || ' ' || a[i+1]
            )) AS pr
            FROM (SELECT c, string_split(s, ' ') AS a FROM {prev})
          ) GROUP BY 1
        ), m{r} AS (
          SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
        ), w{r} AS (
          SELECT trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s, c FROM {prev}
        ), v{r} AS (
          SELECT token, trim(replace(' ' || s || ' ',
                 ' ' || (SELECT pair FROM m{r}) || ' ',
                 ' ' || replace((SELECT pair FROM m{r}), ' ', '') || ' '
          )) AS s FROM v{r - 1}
        )"""
        )
    parts.append(
        f""" SELECT lt.lang, count(*) AS n_words,
               CAST(sum(len(string_split(v{steps}.s, ' '))) AS BIGINT)
                 AS n_pieces
        FROM lt JOIN v{steps} ON lt.token = v{steps}.token
        GROUP BY 1"""
    )
    return "".join(parts)


__all__ = [
    "q20_ac_strip",
    "q21_trie_correct",
    "q222_correction_chain",
    "q27_vocab_roundtrip",
    "q32_lm_score",
    "q49_trigram_lm_score",
    "q85_bpe_token_stats",
    "q104_bpe_merges",
    "q108_vocab_growth",
    "q143_bpe_apply",
    "q347_ac_replace",
    "q352_ac_pattern_freq",
]


QUERIES = {
    "q20_ac_strip": q20_ac_strip,
    "q21_trie_correct": q21_trie_correct,
    "q222_correction_chain": q222_correction_chain,
    "q27_vocab_roundtrip": q27_vocab_roundtrip,
    "q32_lm_score": q32_lm_score,
    "q49_trigram_lm_score": q49_trigram_lm_score,
    "q85_bpe_token_stats": q85_bpe_token_stats,
    "q104_bpe_merges": q104_bpe_merges,
    "q108_vocab_growth": q108_vocab_growth,
    "q143_bpe_apply": q143_bpe_apply,
    "q347_ac_replace": q347_ac_replace,
    "q352_ac_pattern_freq": q352_ac_pattern_freq,
}


ORACLE_SQL = {
    "q20_ac_strip": """
        SELECT doc_id,
               replace(replace(text, 'vector window', ''),
                       'hash scan', '') AS stripped_text
        FROM documents
    """,
    "q222_correction_chain": """
        -- the CHAIN: strip boilerplate → tokenize the stripped text
        -- (filtering boundary empties so indices match Python split())
        -- → dictionary from the stripped tokens → corrupt every 7th
        -- token → min-levenshtein correction with the q21 tie ladder;
        -- docs whose stripped text has no tokens still emit '' rows
        WITH stripped AS (
          SELECT doc_id,
                 replace(replace(coalesce(text, ''), 'vector window', ''),
                         'hash scan', '') AS text
          FROM documents
        ), tl AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM stripped
        ),
        toks AS (
          SELECT doc_id, CAST(r.i AS BIGINT) AS i,
                 tl.toks[CAST(r.i AS BIGINT) + 1] AS tok
          FROM tl, range(2000) r(i) WHERE r.i < len(tl.toks)
        ),
        ctoks AS (
          SELECT doc_id, i,
                 CASE WHEN (doc_id + i) % 7 = 0 AND len(tok) > 3
                      THEN substr(tok, 1, len(tok) - 1) ELSE tok END AS ctok
          FROM toks
        ),
        dict AS (
          SELECT tok AS word, count(*) AS freq FROM toks GROUP BY tok
        ),
        distinct_c AS (SELECT DISTINCT ctok FROM ctoks),
        best AS (
          SELECT ctok, word FROM (
            SELECT c.ctok, d.word,
                   row_number() OVER (
                     PARTITION BY c.ctok
                     ORDER BY levenshtein(c.ctok, d.word),
                              CASE WHEN len(d.word) = len(c.ctok)
                                   THEN 0 ELSE 1 END,
                              d.freq DESC, d.word) AS rn
            FROM distinct_c c CROSS JOIN dict d
            WHERE levenshtein(c.ctok, d.word) <= 4
          ) WHERE rn = 1
        ),
        agg AS (
          SELECT t.doc_id,
                 string_agg(COALESCE(b.word, t.ctok), ' ' ORDER BY t.i)
                   AS corrected_text
          FROM ctoks t LEFT JOIN best b ON b.ctok = t.ctok
          GROUP BY t.doc_id
        )
        SELECT d.doc_id, coalesce(a.corrected_text, '') AS corrected_text
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "q21_trie_correct": f"""
        WITH tl AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        toks AS (
          SELECT doc_id, CAST(r.i AS BIGINT) AS i, tl.toks[CAST(r.i AS BIGINT) + 1] AS tok
          FROM tl, range(2000) r(i) WHERE r.i < len(tl.toks)
        ),
        ctoks AS (
          SELECT doc_id, i,
                 CASE WHEN (doc_id + i) % 7 = 0 AND len(tok) > 3
                      THEN substr(tok, 1, len(tok) - 1) ELSE tok END AS ctok
          FROM toks
        ),
        dict AS (
          SELECT tok AS word, count(*) AS freq FROM toks GROUP BY tok
        ),
        distinct_c AS (SELECT DISTINCT ctok FROM ctoks),
        best AS (
          SELECT ctok, word FROM (
            SELECT c.ctok, d.word,
                   row_number() OVER (
                     PARTITION BY c.ctok
                     ORDER BY levenshtein(c.ctok, d.word),
                              CASE WHEN len(d.word) = len(c.ctok)
                                   THEN 0 ELSE 1 END,
                              d.freq DESC, d.word) AS rn
            FROM distinct_c c CROSS JOIN dict d
            WHERE levenshtein(c.ctok, d.word) <= 4
          ) WHERE rn = 1
        )
        SELECT t.doc_id,
               string_agg(COALESCE(b.word, t.ctok), ' ' ORDER BY t.i)
                 AS corrected_text
        FROM ctoks t LEFT JOIN best b ON b.ctok = t.ctok
        GROUP BY t.doc_id
    """,
    "q27_vocab_roundtrip": """
        SELECT doc_id,
               length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
                 AS n_codes,
               TRUE AS roundtrip_ok
        FROM documents
    """,
    "q32_lm_score": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1]
          )) AS bigram
          FROM toks
        ),
        cnt AS (SELECT bigram, count(*) AS c FROM bg GROUP BY bigram),
        per_doc AS (
          SELECT bg.doc_id, CAST(sum(cnt.c) AS BIGINT) AS sum_bigram_count
          FROM bg JOIN cnt USING (bigram) GROUP BY bg.doc_id
        )
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               COALESCE(p.sum_bigram_count, 0) AS sum_bigram_count
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
    "q49_trigram_lm_score": f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, t -> t <> '') AS toks
          FROM documents
        ),
        tg AS (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          )) AS trigram
          FROM toks
        ),
        cnt AS (SELECT trigram, count(*) AS c FROM tg GROUP BY trigram),
        per_doc AS (
          SELECT tg.doc_id, CAST(sum(cnt.c) AS BIGINT) AS sum_trigram_count
          FROM tg JOIN cnt USING (trigram) GROUP BY tg.doc_id
        )
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               COALESCE(p.sum_trigram_count, 0) AS sum_trigram_count
        FROM toks t LEFT JOIN per_doc p USING (doc_id)
    """,
    "q85_bpe_token_stats": """
        WITH t AS (
          SELECT doc_id, lower(coalesce(text, '')) AS s FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(s, '[a-z]+')) AS BIGINT)
                 AS n_alpha,
               CAST(len(regexp_extract_all(s, '[0-9]+')) AS BIGINT)
                 AS n_num,
               CAST(len(regexp_extract_all(s, '[^a-z0-9 \\t\\n\\r\\f]'))
                 AS BIGINT) AS n_other,
               CAST(len(regexp_extract_all(s, '[a-z]+'))
                    + len(regexp_extract_all(s, '[0-9]+'))
                    + len(regexp_extract_all(s, '[^a-z0-9 \\t\\n\\r\\f]'))
                 AS BIGINT) AS n_bpe_tokens
        FROM t
    """,
    "q104_bpe_merges": _bpe_oracle_sql(5),
    "q108_vocab_growth": f"""
        WITH pos AS (
          SELECT text,
                 row_number() OVER (
                   ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
                 ) - 1 AS pos
          FROM documents
        ),
        toks AS (
          SELECT pos, unnest(list_transform(
            range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]
          )) AS token
          FROM (SELECT pos, {_TOKS} AS ws FROM pos)
        ),
        firsts AS (
          SELECT token, min(pos) AS fp FROM toks GROUP BY token
        ),
        n AS (SELECT count(*) AS total FROM documents)
        SELECT CAST(fp * 10 // total AS BIGINT) AS decile,
               count(*) AS n_new_tokens
        FROM firsts, n GROUP BY 1
    """,
    "q143_bpe_apply": _bpe_apply_oracle_sql(5),
    "q347_ac_replace": """
        -- longest-first sequential replace mirrors leftmost-longest
        -- AC on this prefix-nested pattern set
        SELECT doc_id,
               replace(replace(replace(
                 'secret key start ' || text ||
                 CASE WHEN doc_id % 2 = 1
                      THEN ' secret password end' ELSE '' END,
                 'secret key', '[KEY]'),
                 'secret', '[SECRET]'),
                 'password', '[PW]') AS text
        FROM documents WHERE text IS NOT NULL
    """,
    "q352_ac_pattern_freq": """
        -- border-free patterns: replace-length count equals the AC
        -- all-occurrence count
        WITH pats(pattern, plen) AS (VALUES
          ('data', 4), ('the', 3), ('table', 5), ('查询', 2),
          ('page', 4))
        SELECT pattern,
               CAST(coalesce(sum((length(text)
                    - length(replace(text, pattern, ''))) // plen), 0)
                 AS BIGINT) AS n
        FROM pats LEFT JOIN documents ON text IS NOT NULL
        GROUP BY pattern
    """,
}
