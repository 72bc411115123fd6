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

from basicocr_ray.core.collect import collect_rows
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
        return collect_rows(counts_ds)

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


def _pruned_counts(counts_ds, key: str, min_count: int, max_vocab: int | None):
    """Distributed prune of a (key, cnt) table: frequency floor +
    top-K by (cnt desc, key asc — deterministic ties). Returns a Dataset;
    nothing reaches the driver here."""
    import pyarrow.compute as _pc

    if min_count > 1:
        counts_ds = counts_ds.map_batches(
            lambda b: b.filter(_pc.greater_equal(b["cnt"], min_count)),
            batch_format="pyarrow",
        )
    if max_vocab is not None:
        counts_ds = counts_ds.sort(
            ["cnt", key], descending=[True, False]
        ).limit(max_vocab)
    return counts_ds


def _count_of_counts(counts_ds) -> tuple[int, int]:
    """(n1, n2): keys seen exactly once/twice — a tiny partial+final
    aggregate over the COUNT table, never over the corpus."""
    import pyarrow.compute as _pc

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

    coc_ds = counts_ds.map_batches(coc, batch_format="pyarrow")
    return int(coc_ds.sum("n1") or 0), int(coc_ds.sum("n2") or 0)


def fit_backoff_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
    _return_counts: bool = False,
):
    """Distributed counts + distributed COUNT-OF-COUNTS (n1, n2: bigrams
    seen exactly once/twice — a second tiny partial+final aggregate over
    the count table, never over the corpus) → discounted backoff model.

    With ``_return_counts=True`` also returns the PRUNED bigram-count
    Dataset (materialized) so downstream fits (Kneser–Ney) reuse it
    instead of re-scanning the corpus."""
    bi_counts = count_terms(docs_ds, text_column, make_ngram_items(2), "bigram")
    bi_counts = bi_counts.materialize()  # reused: count-of-counts + table

    # D's count-of-counts comes from the UNPRUNED table by construction:
    # n1 counts bigrams seen exactly once — the very rows a min_count
    # floor would delete.
    n1, n2 = _count_of_counts(bi_counts)

    bi_pruned = _pruned_counts(bi_counts, "bigram", min_count, max_vocab)
    if min_count > 1 or max_vocab is not None:
        bi_pruned = bi_pruned.materialize()

    uni_rows = _pruned_counts(
        count_terms(docs_ds, text_column, token_items, "token"),
        "token", min_count, max_vocab,
    )
    uni_rows = collect_rows(uni_rows)
    bi_rows = collect_rows(bi_pruned)
    model = BackoffBigramLM(
        {r["token"]: int(r["cnt"]) for r in uni_rows},
        {r["bigram"]: int(r["cnt"]) for r in bi_rows},
        n1,
        n2,
    )
    if _return_counts:
        return model, bi_pruned
    return model


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


_KN_DEFAULT_MAX_VOCAB = 1_000_000


def fit_kneser_ney_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = _KN_DEFAULT_MAX_VOCAB,
    min_count: int = 1,
) -> KneserNeyBigramLM:
    """Backoff fit + continuation counts N1+(· w) derived from the SAME
    pruned, materialized bigram-count table the backoff fit built — no
    corpus re-scan (the count table's rows ARE the distinct types), and
    continuation counts are consistent with the pruned base counts
    whenever pruning is enabled. The reduce is the house `count_terms`
    partial+final over the count table (each bigram-type row contributes
    1 to its w2), not a driver-side dict loop; only the ≤ max_vocab
    result rows reach the driver — boundedness is enforced by the KN
    path's default ``max_vocab`` (a no-op below 10⁶ types)."""
    base, bi_pruned = fit_backoff_lm(
        docs_ds, text_column, max_vocab=max_vocab, min_count=min_count,
        _return_counts=True,
    )

    cont_rows = count_terms(
        bi_pruned, "bigram", lambda b: [b.split(" ", 1)[1]], "w2"
    )
    cont_rows = collect_rows(cont_rows)
    cont = {r["w2"]: int(r["cnt"]) for r in cont_rows}
    n_types = sum(cont.values())
    lm = KneserNeyBigramLM(base.uni, base.bi, 1, 1, cont, n_types)
    lm.discount = base.discount  # reuse the count-of-counts estimate
    return lm


class KneserNeyTrigramLM:
    """Interpolated Kneser–Ney TRIGRAM LM — the reference's `make-big-lm`
    target order (`docs/yangzhanku/n-gram/language-model.md:192-197`
    prescribes sharded counts merged into one big discounted LM; Chen &
    Goodman 1998 for the interpolated-KN recursion):

        P(w3|w1 w2) = max(c(w1w2w3) − D3, 0)/c(w1w2)
                      + D3·N1+(w1w2 ·)/c(w1w2) · P(w3|w2)

    with the bigram layer P(w3|w2) the interpolated-KN bigram of
    `KneserNeyBigramLM` (absolute discount + continuation-probability
    backoff). D3 comes from the trigram table's own count-of-counts;
    N1+(w1w2 ·) — distinct continuations per history — is derived from
    the trigram-TYPE table (each count row is one distinct type). Unseen
    (w1, w2) histories back off fully to the bigram layer, so every
    probability is positive and the conditional sums to 1 over the
    vocabulary."""

    def __init__(
        self,
        bigram_lm: KneserNeyBigramLM,
        trigram_counts: dict[str, int],
        n1_tri: int,
        n2_tri: int,
    ):
        self.bg = bigram_lm
        self.tri = dict(trigram_counts)
        d = n1_tri + 2 * n2_tri
        self.discount3 = n1_tri / d if d > 0 else 0.5
        # N1+(w1 w2 ·): distinct continuations per trigram history
        self.n_cont3: dict[str, int] = {}
        for key in self.tri:
            hist = key.rsplit(" ", 1)[0]
            self.n_cont3[hist] = self.n_cont3.get(hist, 0) + 1

    def p_trigram(self, w1: str, w2: str, w3: str) -> float:
        hist = w1 + " " + w2
        c12 = self.bg.bi.get(hist, 0)
        if c12 == 0:
            return self.bg.p_bigram(w2, w3)
        c123 = self.tri.get(hist + " " + w3, 0)
        lam = self.discount3 * self.n_cont3.get(hist, 0) / c12
        return (
            max(c123 - self.discount3, 0.0) / c12
            + lam * self.bg.p_bigram(w2, w3)
        )

    def score(self, tokens: list[str]) -> float:
        """Mean per-token log-probability (length-normalized); the first
        two tokens score through the lower orders."""
        if not tokens:
            return 0.0
        lp = math.log(self.bg.p_unigram(tokens[0]))
        if len(tokens) > 1:
            lp += math.log(self.bg.p_bigram(tokens[0], tokens[1]))
        for a, b, c in zip(tokens, tokens[1:], tokens[2:]):
            lp += math.log(self.p_trigram(a, b, c))
        return lp / len(tokens)


def fit_trigram_lm(
    docs_ds,
    text_column: str = "text",
    max_vocab: int | None = _KN_DEFAULT_MAX_VOCAB,
    min_count: int = 1,
) -> KneserNeyTrigramLM:
    """KN bigram fit (its own distributed counts) + ONE more distributed
    count pass for trigrams (`make_ngram_items(3)` through the same
    partial+final `count_terms` shape — the reference's per-shard
    `ngram-count` → `merge-batch-counts` at order 3), with the trigram
    count-of-counts aggregated over the count table. Broadcast size is
    bounded by the same distributed min_count/max_vocab prune."""
    bigram_lm = fit_kneser_ney_lm(
        docs_ds, text_column, max_vocab=max_vocab, min_count=min_count
    )

    tri_counts = count_terms(
        docs_ds, text_column, make_ngram_items(3), "trigram"
    ).materialize()
    n1_tri, n2_tri = _count_of_counts(tri_counts)
    tri_rows = _pruned_counts(
        tri_counts, "trigram", min_count, max_vocab
    )
    tri_rows = collect_rows(tri_rows)
    return KneserNeyTrigramLM(
        bigram_lm,
        {r["trigram"]: int(r["cnt"]) for r in tri_rows},
        n1_tri,
        n2_tri,
    )


class TrigramScorer:
    """Actor-pool trigram scorer (A5 at order 3): model fetched from the
    object store once per actor, applied per batch. Emits the
    libm-independent integer evidence (n_tokens, summed corpus trigram
    counts) alongside the float score — the q49 hash checks the integers,
    mirroring q32's discipline."""

    def __init__(self, model_ref, text_column: str = "text", id_column: str = "doc_id"):
        import ray

        self.lm: KneserNeyTrigramLM = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef
        ) else model_ref
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        scores, n_tokens, sum_tri = [], [], []
        tri = self.lm.tri
        for t in batch[self.text_column].to_pylist():
            toks = (t or "").lower().split()
            scores.append(round(self.lm.score(toks), 6))
            n_tokens.append(len(toks))
            sum_tri.append(
                sum(
                    tri.get(a + " " + b + " " + c, 0)
                    for a, b, c in zip(toks, toks[1:], toks[2:])
                )
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lm_score": pa.array(scores, pa.float64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "sum_trigram_count": pa.array(sum_tri, pa.int64()),
            }
        )


def score_documents_trigram(docs_ds, model: KneserNeyTrigramLM, concurrency: int = 2):
    """docs → (doc_id, lm_score, n_tokens, sum_trigram_count) via
    broadcast model + actor pool."""
    import ray

    ref = ray.put(model)
    return docs_ds.map_batches(
        TrigramScorer,
        fn_constructor_kwargs={"model_ref": ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


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
