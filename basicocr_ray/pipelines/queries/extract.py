"""Flagship extraction queries: tokenize -> score -> CTC-greedy decode, structured extraction, CER/WER (SURVEY §2.2 M5/M6).

Column names/aliases are IDENTICAL between each query and its
DuckDB oracle twin - the driver hashes values after sorting
columns by name."""

from __future__ import annotations

from html import escape as _html_escape
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from basicocr_ray.config import ExtractConfig
from basicocr_ray.sources.docpages import docs_to_pages_batch
from basicocr_ray.stages.extract import extract_batch

from ._shared import (
    _read,
    _round_half_up,
)


def _roundtrip(sf_dir: str, chunked: bool, cfg: ExtractConfig):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap_extract(batch: pa.Table) -> pa.Table:
        pages = docs_to_pages_batch(batch, chunked=chunked)
        ext = extract_batch(pages, cfg)
        return pa.table(
            {"doc_id": pages["doc_id"], "main_text": ext["main_text"]}
        )

    return ds.map_batches(wrap_extract, batch_format="pyarrow")


def q13_extract_roundtrip(sf_dir: str):
    """documents → boilerplate HTML wrap → FULL extraction → must equal the
    original text byte-for-byte (single content block)."""
    return _roundtrip(sf_dir, chunked=False, cfg=ExtractConfig())


def q14_extract_multiblock(sf_dir: str):
    """Multi-block variant: content split across many <p>; CTC-style
    collapse with join_sep=' ' must reassemble the exact original text."""
    return _roundtrip(
        sf_dir, chunked=True,
        # adjacent-dup collapse must be off: a text repeating the same
        # 16-word chunk twice would otherwise lose the repeat and break
        # byte-identity with the oracle
        cfg=ExtractConfig(join_sep=" ", collapse_adjacent_dups=False),
    )


def q39_staged_extract(sf_dir: str):
    """The STAGED pipeline formulation (SURVEY §7.1.4: tokenize → score →
    decode as separate map_batches stages, block sequence riding in a
    nested list<struct> column) driven through the SQL gate: wrapped docs
    tokenize to exactly one kept content block, and the decoded text must
    be byte-identical to the original."""
    from basicocr_ray.stages.extract import (
        decode_batch,
        score_batch,
        tokenize_batch,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap(batch: pa.Table) -> pa.Table:
        pages = docs_to_pages_batch(batch)
        return pages

    staged = (
        ds.map_batches(wrap, batch_format="pyarrow")
        .map_batches(tokenize_batch, batch_format="pyarrow")
        .map_batches(score_batch, batch_format="pyarrow")
        .map_batches(decode_batch, batch_format="pyarrow")
    )

    def project(batch: pa.Table) -> pa.Table:
        ids = [int(u.split(":", 1)[1]) for u in batch["url"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "main_text": batch["main_text"],
                "n_blocks": pc.cast(batch["n_blocks"], pa.int64()),
                "n_blocks_kept": pc.cast(batch["n_blocks_kept"], pa.int64()),
            }
        )

    return staged.map_batches(project, batch_format="pyarrow")


def q50_conformance_accuracy(sf_dir: str):
    """Held-out conformance accuracy as a driver-checked query (G2 — the
    reference's exact-match eval, `contrib/crnn/crnn_main.py:181-190`,
    n_correct/total over decoded vs ground-truth strings): every
    doc_id ≡ 0 (mod 7) gets a deterministic corruption planted in its
    page, the FULL extraction runs, extracted text is BUCKET-JOINED back
    to the `documents` ground truth (two fact-scale sides — the J4/G2
    composition under one driver hash), and per-lang exact-match counts
    roll up via partial+final. The DuckDB twin predicts the outcome
    analytically: corrupted docs mismatch, every other doc matches
    byte-identically — the flagship invariant q13 proves per-row."""
    from basicocr_ray.stages.joins import bucketed_hash_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def wrap_extract(batch: pa.Table) -> pa.Table:
        texts = [
            (t or "") + " __corrupt__" if i % 7 == 0 else (t or "")
            for i, t in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            )
        ]
        pages = docs_to_pages_batch(
            pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "text": pa.array(texts, pa.string()),
                    "lang": batch["lang"],
                }
            ),
            chunked=False,
        )
        ext = extract_batch(pages, ExtractConfig())
        return pa.table(
            {"doc_id": pages["doc_id"], "main_text": ext["main_text"]}
        )

    extracted = ds.map_batches(wrap_extract, batch_format="pyarrow")
    joined = bucketed_hash_join(
        extracted, ds, "doc_id", ["main_text"], ["text", "lang"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["_ok"] = (df["main_text"] == df["text"]).astype("int64")
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("_ok", "size"), n_exact=("_ok", "sum")
        )
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False)[["n_docs", "n_exact"]].sum()
        return out.astype({"n_docs": "int64", "n_exact": "int64"})

    # lang is low-cardinality: the partial shrinks each bucket's rows to
    # ≤|langs|, the final groupby shuffles only those partials
    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q312_html_table_extract(sf_dir: str):
    """HTML <table> STRUCTURED-DATA EXTRACTION ROUNDTRIP — the
    table-lifting verb of a crawl curator: orders rows are rendered
    into deterministic HTML pages (boilerplate nav, a 2-column layout
    decoy table, a script whose BODY contains markup-looking '<td>'
    text, then the 3-column data table with a <th> header), and a real
    tag-soup table parser (`core/structured.parse_tables`, built on
    the flagship lexer) must recover every (orderkey, status,
    total_cents) exactly. Render+parse stay inside one map_batches —
    the same per-page scan shape as the flagship extractor; the data
    row filter is structural (exactly 3 <td> cells)."""
    from basicocr_ray.core.structured import parse_tables

    ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    PER_PAGE = 25

    def render(rows: list[tuple[int, str, int]]) -> str:
        body = "".join(
            "<tr><td>%d</td><td>%s</td><td>%d.%02d</td></tr>"
            % (k, _html_escape(s), c // 100, c % 100)
            for k, s, c in rows
        )
        return (
            "<html><head><title>Orders</title>"
            "<script>var cell = '<td>99999</td><tr><td>0</td></tr>';</script>"
            "</head><body>"
            "<table class='nav'><tr><td>Home</td><td>Login</td></tr></table>"
            "<table class='data'>"
            "<tr><th>Order</th><th>Status</th><th>Total</th></tr>"
            + body
            + "</table><p>footer &amp; legal</p></body></html>"
        )

    def roundtrip(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        stats = b["o_orderstatus"].to_pylist()
        cents = np.rint(
            b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100
        ).astype(np.int64)
        out_k, out_s, out_c = [], [], []
        for lo in range(0, len(keys), PER_PAGE):
            rows = [
                (int(keys[i]), stats[i], int(cents[i]))
                for i in range(lo, min(lo + PER_PAGE, len(keys)))
            ]
            page = render(rows)
            for grid in parse_tables(page):
                for row in grid:
                    cells = [c for c in row if c[0] == "td"]
                    if len(row) != len(cells) or len(cells) != 3:
                        continue  # header (th) or layout decoy
                    whole, frac = cells[2][1].split(".")
                    out_k.append(int(cells[0][1]))
                    out_s.append(cells[1][1])
                    out_c.append(int(whole) * 100 + int(frac))
        return pa.table(
            {
                "orderkey": pa.array(out_k, pa.int64()),
                "status": pa.array(out_s, pa.string()),
                "total_cents": pa.array(out_c, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def q313_jsonld_extract(sf_dir: str):
    """JSON-LD METADATA EXTRACTION — the schema.org lifting verb:
    each documents row is rendered as a page whose <head> carries a
    plain-JS decoy script, a WebSite-typed ld+json decoy, and an
    Article-typed ld+json block holding (identifier, inLanguage,
    contentSize); the body is the escaped document text (so scanning
    runs over realistic page bulk). `core/structured.extract_jsonld`
    must locate the Article block among the decoys, json-parse it and
    emit the fields — per-page kernel, no shuffle."""
    import json as _json

    from basicocr_ray.core.structured import extract_jsonld

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

    def roundtrip(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        langs = b["lang"].to_pylist()
        ncs = b["n_chars"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_lang, out_n = [], [], []
        for i, t in enumerate(b["text"].to_pylist()):
            meta = {
                "@context": "https://schema.org",
                "@type": "Article",
                "identifier": int(ids[i]),
                "inLanguage": langs[i],
                "contentSize": int(ncs[i]),
            }
            page = (
                "<html><head>"
                "<script>var t = {'@type': 'Article', 'identifier': -1};</script>"
                '<script type="application/ld+json">'
                '{"@type": "WebSite", "identifier": -2}</script>'
                '<script type="application/ld+json">'
                + _json.dumps(meta)
                + "</script></head><body><p>"
                + _html_escape(t)
                + "</p></body></html>"
            )
            arts = extract_jsonld(page, want_type="Article")
            if arts:
                out_id.append(int(arts[0]["identifier"]))
                out_lang.append(arts[0]["inLanguage"])
                out_n.append(int(arts[0]["contentSize"]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "lang": pa.array(out_lang, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow")


_OUTLINE_PATTERNS = (
    (1, 2, 2, 3, 2),
    (1, 1, 2),
    (2, 1, 3),
    (1, 2, 3, 3, 1, 2),
)


def q327_heading_outline(sf_dir: str):
    """HEADING-OUTLINE EXTRACTION — the document-structure verb
    (section paths for chunking long docs at heading boundaries): each
    doc renders one of four heading-level patterns (including the
    pathological open-below-h1 case) and `core/structured.
    parse_outline` must emit every heading with its counter-stack
    section path ('1.2.1'); the oracle is the hand-derived golden
    numbering joined on doc_id mod 4. Per-page kernel, no shuffle."""
    from basicocr_ray.core.structured import parse_outline

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def run(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_idx, out_lvl, out_path, out_text = [], [], [], [], []
        for i in ids:
            i = int(i)
            pat = _OUTLINE_PATTERNS[i % 4]
            body = "".join(
                "<h%d>H%d &amp; more</h%d><p>filler</p>" % (l, j, l)
                for j, l in enumerate(pat)
            )
            page = (
                "<html><body><script>var h='<h1>fake</h1>';</script>"
                + body
                + "</body></html>"
            )
            for j, (lvl, path, text) in enumerate(parse_outline(page)):
                out_id.append(i)
                out_idx.append(j)
                out_lvl.append(lvl)
                out_path.append(path)
                out_text.append(text)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "idx": pa.array(out_idx, pa.int64()),
                "level": pa.array(out_lvl, pa.int64()),
                "path": pa.array(out_path, pa.string()),
                "text": pa.array(out_text, pa.string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def _noisy_variant(t: str, doc_id: int) -> str:
    """Deterministic single-edit perturbation (the OCR-noise stand-in
    behind the CER/WER eval queries): sub at pos 5 / del at pos 3 /
    insert 'z' at pos 7, by doc_id mod 3 — each expressible as
    substr concatenation in the SQL twins."""
    r = doc_id % 3
    if r == 0:
        if len(t) > 5:
            c = "x" if t[5] != "x" else "y"
            return t[:5] + c + t[6:]
        return t
    if r == 1:
        if len(t) > 3:
            return t[:3] + t[4:]
        return t
    return t[:7] + "z" + t[7:]


def _levenshtein(a, b) -> int:
    """Unit-cost edit distance (works on strings or token lists) —
    the CRNN eval metric (contrib/crnn/crnn_main.py:181-190 scores
    exact match; CER is its graded refinement). Two-row DP."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            )
        prev = cur
    return prev[-1]


def q336_cer_eval(sf_dir: str):
    """CHARACTER ERROR RATE — the OCR evaluation metric proper: each
    doc's first 200 chars vs its deterministic noisy variant, full
    unit-cost Levenshtein DP (not the edit-1/2 neighborhood tricks of
    q68/q171 — the real O(nm) kernel, two-row memory), CER =
    dist/ref_len. DuckDB's levenshtein() is the twin. Map-only;
    the DP is the per-row parse-kernel exemption."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def eval_batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_len, out_d, out_cer = [], [], [], []
        for i, t in zip(ids, b["text"].to_pylist()):
            t = t[:200]
            if not t:
                continue
            noisy = _noisy_variant(t, int(i))
            d = _levenshtein(t, noisy)
            out_id.append(int(i))
            out_len.append(len(t))
            out_d.append(d)
            out_cer.append(_round_half_up(d / len(t), 9))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "ref_len": pa.array(out_len, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
                "cer": pa.array(out_cer, pa.float64()),
            }
        )

    return ds.map_batches(eval_batch, batch_format="pyarrow")


def q337_wer_eval(sf_dir: str):
    """WORD ERROR RATE — token-level Levenshtein between each doc's
    first-200-char token stream and its noisy variant's. The SQL twin
    proves it with a chr-encoding bijection: per doc, the union of
    both token vocabularies dense-ranks to single code points, both
    streams re-encode as strings, and DuckDB levenshtein() on those
    equals token-level distance exactly. Map-only DP per row."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(s: str) -> list[str]:
        return [w for w in s.split(" ") if w]

    def eval_batch(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["text"]))
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        out_id, out_n, out_d, out_wer = [], [], [], []
        for i, t in zip(ids, b["text"].to_pylist()):
            t = t[:200]
            ref = toks(t)
            if not ref:
                continue
            hyp = toks(_noisy_variant(t, int(i)))
            d = _levenshtein(ref, hyp)
            out_id.append(int(i))
            out_n.append(len(ref))
            out_d.append(d)
            out_wer.append(_round_half_up(d / len(ref), 9))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_ref": pa.array(out_n, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
                "wer": pa.array(out_wer, pa.float64()),
            }
        )

    return ds.map_batches(eval_batch, batch_format="pyarrow")


def q345_html_to_markdown(sf_dir: str):
    """HTML→MARKDOWN CONVERSION — the canonical text-normal form LLM
    training pipelines feed on: each doc synthesizes a page with a
    heading (entity inside), emphasis, a list, and a link, and
    `core/markdown.html_to_markdown` must produce exactly the
    markdown the oracle reconstructs by string concatenation. The
    converter is the block/inline state machine over the shared
    lexer; per-page kernel, no shuffle."""
    from basicocr_ray.core.markdown import html_to_markdown

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def convert(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        langs = b["lang"].to_pylist()
        out_id, out_md = [], []
        for i, lang in zip(ids, langs):
            i = int(i)
            page = (
                "<html><body>"
                "<h2>Title &amp; %d</h2>"
                "<p>Intro <b>bold%d</b> and <i>%s</i> text.</p>"
                "<ul><li>alpha</li><li>beta %d</li></ul>"
                '<p>See <a href="https://example.org/%d">doc %d</a>.</p>'
                "<script>var x = '<h1>fake</h1>';</script>"
                "</body></html>"
            ) % (i, i, lang, i, i, i)
            out_id.append(i)
            out_md.append(html_to_markdown(page))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "md": pa.array(out_md, pa.string()),
            }
        )

    return ds.map_batches(convert, batch_format="pyarrow")


def q349_mime_sniff(sf_dir: str):
    """MIME SNIFFING DISPATCH — the router in front of every
    multimodal ingest stage: synthesized payloads (real magics,
    including the RIFF-without-WAVE deception that must land in
    'unknown') classify per `core/sniff.sniff_payload`; rollup of
    counts per detected type. Per-batch classify + one bounded
    reduce."""
    from basicocr_ray.core.sniff import sniff_payload
    from basicocr_ray.stages.wide import coarse_group_reduce

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def make_payload(i: int) -> bytes:
        r = i % 7
        if r == 0:
            return b"\x89PNG\r\n\x1a\n" + b"\x00" * 8
        if r == 1:
            return b"GIF89a" + bytes([i % 256] * 6)
        if r == 2:
            return b"RIFF" + b"\x10\x00\x00\x00" + b"WAVEfmt "
        if r == 3:
            return b"%PDF-1.4\n%junk"
        if r == 4:
            return b"\x1f\x8b\x08\x00rest"
        if r == 5:
            return b"WARC/1.0\r\nWARC-Type: response"
        return b"RIFF" + b"\x10\x00\x00\x00" + b"JUNK___"  # deceptive

    def classify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        kinds = [sniff_payload(make_payload(int(i))) for i in ids]
        df = pd.DataFrame({"kind": kinds})
        g = df.groupby("kind", as_index=False).size()
        return pa.table(
            {
                "kind": pa.array(g["kind"], pa.string()),
                "n": pa.array(g["size"].astype(np.int64)),
            }
        )

    out = coarse_group_reduce(
        ds.map_batches(classify, batch_format="pyarrow"),
        "kind",
        lambda df: df.groupby("kind", as_index=False)["n"]
        .sum()
        .astype({"n": "int64"}),
    ).to_pandas()
    if len(out.columns) == 0:
        out = pd.DataFrame(
            {
                "kind": pd.array([], dtype="object"),
                "n": pd.array([], dtype="int64"),
            }
        )
    return out


__all__ = [
    "q13_extract_roundtrip",
    "q14_extract_multiblock",
    "q39_staged_extract",
    "q50_conformance_accuracy",
    "q312_html_table_extract",
    "q313_jsonld_extract",
    "q327_heading_outline",
    "q336_cer_eval",
    "q337_wer_eval",
    "q345_html_to_markdown",
    "q349_mime_sniff",
]


QUERIES = {
    "q13_extract_roundtrip": q13_extract_roundtrip,
    "q14_extract_multiblock": q14_extract_multiblock,
    "q39_staged_extract": q39_staged_extract,
    "q50_conformance_accuracy": q50_conformance_accuracy,
    "q312_html_table_extract": q312_html_table_extract,
    "q313_jsonld_extract": q313_jsonld_extract,
    "q327_heading_outline": q327_heading_outline,
    "q336_cer_eval": q336_cer_eval,
    "q337_wer_eval": q337_wer_eval,
    "q345_html_to_markdown": q345_html_to_markdown,
    "q349_mime_sniff": q349_mime_sniff,
}


ORACLE_SQL = {
    "q13_extract_roundtrip": """
        SELECT doc_id, text AS main_text FROM documents
    """,
    "q14_extract_multiblock": """
        SELECT doc_id, text AS main_text FROM documents
    """,
    "q39_staged_extract": """
        SELECT doc_id, text AS main_text,
               CAST(1 AS BIGINT) AS n_blocks,
               CAST(1 AS BIGINT) AS n_blocks_kept
        FROM documents
    """,
    "q50_conformance_accuracy": """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE doc_id % 7 <> 0) AS BIGINT)
                 AS n_exact
        FROM documents GROUP BY lang
    """,
    "q312_html_table_extract": """
        -- the Ray side must roundtrip every order through render+parse
        SELECT o_orderkey AS orderkey, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        FROM orders
    """,
    "q313_jsonld_extract": """
        -- roundtrip: the Article ld+json block carries exactly these
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL
    """,
    "q327_heading_outline": """
        -- hand-derived golden counter-stack numbering per pattern
        WITH golden(pat, idx, level, path) AS (VALUES
          (0, 0, 1, '1'), (0, 1, 2, '1.1'), (0, 2, 2, '1.2'),
          (0, 3, 3, '1.2.1'), (0, 4, 2, '1.3'),
          (1, 0, 1, '1'), (1, 1, 1, '2'), (1, 2, 2, '2.1'),
          (2, 0, 2, '0.1'), (2, 1, 1, '1'), (2, 2, 3, '1.0.1'),
          (3, 0, 1, '1'), (3, 1, 2, '1.1'), (3, 2, 3, '1.1.1'),
          (3, 3, 3, '1.1.2'), (3, 4, 1, '2'), (3, 5, 2, '2.1')
        )
        SELECT d.doc_id, CAST(g.idx AS BIGINT) AS idx,
               CAST(g.level AS BIGINT) AS level, g.path,
               'H' || g.idx || ' & more' AS text
        FROM documents d JOIN golden g ON g.pat = d.doc_id % 4
    """,
    "q336_cer_eval": """
        -- full unit-cost Levenshtein vs the deterministic noisy
        -- variant (sub@5 / del@3 / ins 'z'@7 by doc_id mod 3)
        WITH base AS (
          SELECT doc_id, substr(text, 1, 200) AS t FROM documents
          WHERE text IS NOT NULL AND length(substr(text, 1, 200)) > 0
        ),
        nv AS (
          SELECT doc_id, t,
                 CASE doc_id % 3
                   WHEN 0 THEN CASE WHEN length(t) > 5
                     THEN substr(t, 1, 5)
                          || (CASE WHEN substr(t, 6, 1) <> 'x'
                              THEN 'x' ELSE 'y' END)
                          || substr(t, 7)
                     ELSE t END
                   WHEN 1 THEN CASE WHEN length(t) > 3
                     THEN substr(t, 1, 3) || substr(t, 5) ELSE t END
                   ELSE substr(t, 1, 7) || 'z' || substr(t, 8)
                 END AS s
          FROM base
        )
        SELECT doc_id, CAST(length(t) AS BIGINT) AS ref_len,
               CAST(levenshtein(t, s) AS BIGINT) AS dist,
               round(CAST(levenshtein(t, s) AS DOUBLE) / length(t), 9)
                 AS cer
        FROM nv
    """,
    "q337_wer_eval": """
        -- token-level distance proven by a per-doc chr-encoding
        -- bijection: union vocab dense-ranks to code points, both
        -- streams re-encode, char levenshtein = token levenshtein
        WITH base AS (
          SELECT doc_id, substr(text, 1, 200) AS t FROM documents
          WHERE text IS NOT NULL
        ),
        nv AS (
          SELECT doc_id, t,
                 CASE doc_id % 3
                   WHEN 0 THEN CASE WHEN length(t) > 5
                     THEN substr(t, 1, 5)
                          || (CASE WHEN substr(t, 6, 1) <> 'x'
                              THEN 'x' ELSE 'y' END)
                          || substr(t, 7)
                     ELSE t END
                   WHEN 1 THEN CASE WHEN length(t) > 3
                     THEN substr(t, 1, 3) || substr(t, 5) ELSE t END
                   ELSE substr(t, 1, 7) || 'z' || substr(t, 8)
                 END AS s
          FROM base
        ),
        la AS (SELECT doc_id,
                      list_filter(string_split(t, ' '), x -> x <> '') AS l
               FROM nv),
        lb AS (SELECT doc_id,
                      list_filter(string_split(s, ' '), x -> x <> '') AS l
               FROM nv),
        toks AS (
          SELECT doc_id, unnest(l) AS tok FROM la
          UNION
          SELECT doc_id, unnest(l) AS tok FROM lb
        ),
        ids AS (
          SELECT doc_id, tok,
                 dense_rank() OVER (PARTITION BY doc_id ORDER BY tok)
                   AS id
          FROM toks
        ),
        ea AS (
          SELECT w.doc_id,
                 string_agg(chr(64 + CAST(i.id AS INTEGER)), ''
                            ORDER BY w.pos) AS e,
                 count(*) AS n
          FROM (SELECT doc_id, unnest(l) AS tok,
                       unnest(range(1, len(l) + 1)) AS pos FROM la) w
          JOIN ids i ON i.doc_id = w.doc_id AND i.tok = w.tok
          GROUP BY w.doc_id
        ),
        eb AS (
          SELECT w.doc_id,
                 string_agg(chr(64 + CAST(i.id AS INTEGER)), ''
                            ORDER BY w.pos) AS e
          FROM (SELECT doc_id, unnest(l) AS tok,
                       unnest(range(1, len(l) + 1)) AS pos FROM lb) w
          JOIN ids i ON i.doc_id = w.doc_id AND i.tok = w.tok
          GROUP BY w.doc_id
        )
        SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_ref,
               CAST(levenshtein(a.e, coalesce(b.e, '')) AS BIGINT)
                 AS dist,
               round(CAST(levenshtein(a.e, coalesce(b.e, '')) AS DOUBLE)
                     / a.n, 9) AS wer
        FROM ea a LEFT JOIN eb b USING (doc_id)
    """,
    "q345_html_to_markdown": """
        -- the converter must emit exactly this markdown
        SELECT doc_id,
               '## Title & ' || doc_id || chr(10) || chr(10)
               || 'Intro **bold' || doc_id || '** and *' || lang
               || '* text.' || chr(10) || chr(10)
               || '- alpha' || chr(10) || '- beta ' || doc_id
               || chr(10) || chr(10)
               || 'See [doc ' || doc_id || '](https://example.org/'
               || doc_id || ').' AS md
        FROM documents
    """,
    "q349_mime_sniff": """
        SELECT kind, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT CASE doc_id % 7
                   WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                   WHEN 2 THEN 'wav' WHEN 3 THEN 'pdf'
                   WHEN 4 THEN 'gzip' WHEN 5 THEN 'warc'
                   ELSE 'unknown' END AS kind
          FROM documents
        ) GROUP BY kind
    """,
}
