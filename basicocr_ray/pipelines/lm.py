"""Bigram language model: distributed count/merge → broadcast scorer.

SURVEY §2 G4/A5: the reference's n-gram pipeline is `split -l 10000` →
per-shard `ngram-count` → `merge-batch-counts` → `make-big-lm` → apply
(`docs/yangzhanku/n-gram/language-model.md:140-197`). Ray translation:

  counts  = partial token/bigram counts per batch → groupby sum (G3/G4)
  model   = driver-side fit (add-one smoothed conditional log-probs) —
            the artifact is small (vocab²-bounded, sparse)
  scoring = broadcast the model via ray.put, score docs per batch in an
            actor pool (A5: LM applied to sequences)
"""

from __future__ import annotations

import math

import pyarrow as pa

from basicocr_ray.stages.wide import count_terms, make_ngram_items, token_items


class BigramLM:
    """Add-one-smoothed bigram LM over whitespace tokens.

    Deterministic: probabilities are rationals evaluated in fixed order;
    scores are log-sums rounded at presentation time only."""

    def __init__(
        self,
        unigram_counts: dict[str, int],
        bigram_counts: dict[str, int],
    ):
        self.uni = dict(unigram_counts)
        self.bi = dict(bigram_counts)
        self.vocab_size = len(self.uni)
        self.total = sum(self.uni.values())

    def logp_bigram(self, w1: str, w2: str) -> float:
        num = self.bi.get(w1 + " " + w2, 0) + 1
        den = self.uni.get(w1, 0) + self.vocab_size
        return math.log(num / den)

    def logp_unigram(self, w: str) -> float:
        return math.log((self.uni.get(w, 0) + 1) / (self.total + self.vocab_size))

    def score(self, tokens: list[str]) -> float:
        """Mean per-token log-probability (length-normalized)."""
        if not tokens:
            return 0.0
        lp = self.logp_unigram(tokens[0])
        for a, b in zip(tokens, tokens[1:]):
            lp += self.logp_bigram(a, b)
        return lp / len(tokens)


def fit_bigram_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> BigramLM:
    """Distributed counts (partial+final, the merge-batch-counts shape) →
    small driver-side model object ready for broadcast.

    On an open-vocabulary corpus the full count tables are unbounded —
    ``min_count`` (frequency floor) and ``max_vocab`` (top-K by count,
    ties broken by token for determinism) prune DISTRIBUTEDLY, before
    anything reaches the driver, so the broadcast stays bounded. Unpruned
    defaults keep the fixture-scale oracle exact."""
    import pyarrow.compute as _pc

    def bounded(counts_ds, key: str):
        if min_count > 1:
            counts_ds = counts_ds.map_batches(
                lambda b: b.filter(_pc.greater_equal(b["cnt"], min_count)),
                batch_format="pyarrow",
            )
        if max_vocab is not None:
            counts_ds = counts_ds.sort(
                ["cnt", key], descending=[True, False]
            ).limit(max_vocab)
        return counts_ds.take_all()

    uni_rows = bounded(
        count_terms(docs_ds, text_column, token_items, "token"), "token"
    )
    bi_rows = bounded(
        count_terms(docs_ds, text_column, make_ngram_items(2), "bigram"),
        "bigram",
    )
    return BigramLM(
        {r["token"]: int(r["cnt"]) for r in uni_rows},
        {r["bigram"]: int(r["cnt"]) for r in bi_rows},
    )


class BackoffBigramLM:
    """Absolute-discounted bigram LM with unigram backoff — the
    `make-big-lm` end state of the reference's n-gram pipeline
    (`docs/yangzhanku/n-gram/language-model.md:192-197` prescribes
    discounted/backoff smoothing; this is the standard absolute-discount
    formulation, Ney–Essen–Kneser 1994):

        P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1) + λ(w1)·P_uni(w2)
        λ(w1)    = D · N1+(w1 ·)/c(w1)        (leftover mass, exact)
        D        = n1/(n1 + 2·n2)             (count-of-counts estimate)

    where N1+(w1 ·) is the number of distinct bigram continuations of w1
    and n1/n2 are the global counts of bigrams seen exactly once/twice —
    both computed DISTRIBUTEDLY as aggregates over the count tables (the
    count-of-count pass is just another partial+final groupby). Unseen w1
    backs off fully to the add-one unigram distribution, so every
    probability is positive and sums to 1 over the vocabulary."""

    def __init__(
        self,
        unigram_counts: dict[str, int],
        bigram_counts: dict[str, int],
        n1: int,
        n2: int,
    ):
        self.uni = dict(unigram_counts)
        self.bi = dict(bigram_counts)
        self.vocab_size = len(self.uni)
        self.total = sum(self.uni.values())
        self.discount = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.5
        # N1+(w1 ·): distinct continuations per history
        self.n_cont: dict[str, int] = {}
        for key in self.bi:
            w1 = key.split(" ", 1)[0]
            self.n_cont[w1] = self.n_cont.get(w1, 0) + 1

    def p_unigram(self, w: str) -> float:
        return (self.uni.get(w, 0) + 1) / (self.total + self.vocab_size)

    def p_bigram(self, w1: str, w2: str) -> float:
        c1 = self.uni.get(w1, 0)
        if c1 == 0:
            return self.p_unigram(w2)
        c12 = self.bi.get(w1 + " " + w2, 0)
        lam = self.discount * self.n_cont.get(w1, 0) / c1
        return max(c12 - self.discount, 0.0) / c1 + lam * self.p_unigram(w2)

    def score(self, tokens: list[str]) -> float:
        """Mean per-token log-probability (length-normalized)."""
        if not tokens:
            return 0.0
        lp = math.log(self.p_unigram(tokens[0]))
        for a, b in zip(tokens, tokens[1:]):
            lp += math.log(self.p_bigram(a, b))
        return lp / len(tokens)


def fit_backoff_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> BackoffBigramLM:
    """Distributed counts + distributed COUNT-OF-COUNTS (n1, n2: bigrams
    seen exactly once/twice — a second tiny partial+final aggregate over
    the count table, never over the corpus) → discounted backoff model."""
    import pyarrow.compute as _pc

    bi_counts = count_terms(docs_ds, text_column, make_ngram_items(2), "bigram")
    bi_counts = bi_counts.materialize()  # reused: count-of-counts + table

    def coc(batch: pa.Table) -> pa.Table:
        c = batch["cnt"]
        return pa.table(
            {
                "n1": pa.array(
                    [_pc.sum(_pc.cast(_pc.equal(c, 1), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "n2": pa.array(
                    [_pc.sum(_pc.cast(_pc.equal(c, 2), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    coc_ds = bi_counts.map_batches(coc, batch_format="pyarrow")
    n1 = coc_ds.sum("n1") or 0
    n2 = coc_ds.sum("n2") or 0

    def bounded(counts_ds, key: str):
        if min_count > 1:
            counts_ds = counts_ds.map_batches(
                lambda b: b.filter(_pc.greater_equal(b["cnt"], min_count)),
                batch_format="pyarrow",
            )
        if max_vocab is not None:
            counts_ds = counts_ds.sort(
                ["cnt", key], descending=[True, False]
            ).limit(max_vocab)
        return counts_ds.take_all()

    uni_rows = bounded(
        count_terms(docs_ds, text_column, token_items, "token"), "token"
    )
    bi_rows = bounded(bi_counts, "bigram")
    return BackoffBigramLM(
        {r["token"]: int(r["cnt"]) for r in uni_rows},
        {r["bigram"]: int(r["cnt"]) for r in bi_rows},
        int(n1),
        int(n2),
    )


class KneserNeyBigramLM(BackoffBigramLM):
    """Interpolated Kneser–Ney bigram LM — the reference pipeline's
    `make-big-lm` target (`language-model.md:192-197`) in its canonical
    modern form (Kneser & Ney 1995; Chen & Goodman 1998): the backoff
    distribution is the CONTINUATION probability

        P_cont(w) = (N1+(· w) + 1) / (N_bigram_types + V)

    (add-one smoothed so OOV words keep positive mass and the
    distribution sums to 1 over the vocabulary), where N1+(· w) is the
    number of distinct left contexts of w — computed DISTRIBUTEDLY from
    the bigram count table (each (w1,w2) count row is one distinct
    context by construction). Discount D comes from the same n1/n2
    count-of-counts as the parent class."""

    def __init__(
        self,
        unigram_counts: dict[str, int],
        bigram_counts: dict[str, int],
        n1: int,
        n2: int,
        continuation_counts: dict[str, int],
        n_bigram_types: int | None = None,
    ):
        super().__init__(unigram_counts, bigram_counts, n1, n2)
        self.cont = dict(continuation_counts)
        self.n_bigram_types = (
            n_bigram_types
            if n_bigram_types is not None
            else sum(self.cont.values())
        )

    def p_unigram(self, w: str) -> float:
        # the backoff distribution IS the continuation distribution; it is
        # also used for the sequence-initial token
        return (self.cont.get(w, 0) + 1) / (self.n_bigram_types + self.vocab_size)


def fit_kneser_ney_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> KneserNeyBigramLM:
    """Backoff fit + one more distributed pass: continuation counts
    N1+(· w) via a coarse-grouped row-count over the bigram-type table
    (no corpus re-scan — the count table's rows ARE the distinct types)."""
    import pyarrow.compute as _pc

    base = fit_backoff_lm(
        docs_ds, text_column, max_vocab=max_vocab, min_count=min_count
    )

    def w2_partial(batch: pa.Table) -> pa.Table:
        # each bigram-type row contributes 1 to its w2's continuation count
        from collections import Counter

        c = Counter(
            b.split(" ", 1)[1] for b in batch["bigram"].to_pylist()
        )
        return pa.table(
            {
                "w2": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    bi_counts = count_terms(docs_ds, text_column, make_ngram_items(2), "bigram")
    n_types = 0
    cont: dict[str, int] = {}
    for row in (
        bi_counts.map_batches(w2_partial, batch_format="pyarrow").take_all()
    ):
        cont[row["w2"]] = cont.get(row["w2"], 0) + int(row["n"])
        n_types += int(row["n"])
    lm = KneserNeyBigramLM(base.uni, base.bi, 1, 1, cont, n_types)
    lm.discount = base.discount  # reuse the count-of-counts estimate
    return lm


class LMScorer:
    """Actor-pool scorer: model fetched from the object store once per
    actor (`ray.put` broadcast, J1 pattern), applied per batch (A5)."""

    def __init__(self, model_ref, text_column: str = "text", id_column: str = "doc_id"):
        import ray

        self.lm: BigramLM = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef
        ) else model_ref
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        scores, n_tokens, sum_bi = [], [], []
        for t in batch[self.text_column].to_pylist():
            toks = (t or "").lower().split()
            scores.append(round(self.lm.score(toks), 6))
            n_tokens.append(len(toks))
            # exact integer evidence of the count tables the score is built
            # from — DuckDB reproduces these exactly (q32's hashable twin)
            # where libm log-probs are platform-dependent
            sum_bi.append(
                sum(
                    self.lm.bi.get(a + " " + b, 0)
                    for a, b in zip(toks, toks[1:])
                )
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lm_score": pa.array(scores, pa.float64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "sum_bigram_count": pa.array(sum_bi, pa.int64()),
            }
        )


def score_documents(docs_ds, model: BigramLM, concurrency: int = 2):
    """docs → (doc_id, lm_score) via broadcast model + actor pool."""
    import ray

    ref = ray.put(model)
    return docs_ds.map_batches(
        LMScorer,
        fn_constructor_kwargs={"model_ref": ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
