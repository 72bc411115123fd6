"""Synthetic `pages` corpus generator — the plateGen analogue (SURVEY §2 S6).

The reference's generator composes a known label from positional alphabets,
renders it deterministically, applies an augmentation chain and keeps the
(image, label) pair — labels correct by construction
(`/root/reference/tool/plateGen/genplate_plate.py:192-226`). Here the label
is the expected main-content text; the render is an HTML boilerplate
template (nav + sidebar + content paragraphs + footer); augmentations are
noise injectors (comments, broken tags, entities, charset variation).

Determinism contract (FIXTURES.md): per-row RNG
``np.random.default_rng(seed * 1_000_003 + row_index)`` — any row is
reproducible in isolation, independent of partitioning/batching.

Special row classes (per-row rng draws, fixed fractions):
  * 1%   duplicate url (dedup tests) — duplicates url of row-1
  * 0.5% oversized (~100× paragraphs) — skew-splitter exercise
  * 0.2% corrupt (empty / truncated multibyte) → must land in `failed`
  * 1%   PDF payload (`%PDF-FAKE\\n...`) → actor-pool PDF branch
Charsets: utf-8 90%, gbk 5%, latin-1 5% (with matching <meta charset>).
Langs: en 60%, zh 25%, de 10%, ja 5%.
"""

from __future__ import annotations

import html as _htmllib

import numpy as np
import pyarrow as pa

from basicocr_ray.config import DEFAULT_CONFIG
from basicocr_ray.core.oracle import extract_one

SEED = 42

_EN_WORDS = (
    "the data query engine stream batch vector join filter sort merge table "
    "row column index scan hash group window page content article text main "
    "extract crawl parse block score decode span language quality token"
).split()
_DE_WORDS = (
    "der die das und ist nicht ein mit auf für daten abfrage tabelle zeile "
    "spalte inhalt seite text haupt block sprache"
).split()
_ES_WORDS = (
    "el la de que y en un los datos consulta tabla fila columna contenido "
    "página texto principal bloque idioma"
).split()
_ZH_WORDS = list("数据查询引擎流批向量连接过滤排序合并表行列索引扫描哈希分组窗口页面内容文章文本主要提取爬取解析块评分解码跨度语言质量词元")
_JA_WORDS = ["データ", "クエリ", "エンジン", "ストリーム", "テーブル", "コンテンツ",
             "ページ", "テキスト", "ブロック", "げんご", "ひんしつ", "かいせき"]

_NAV_ITEMS = ["Home", "About", "Products", "Contact", "Blog", "Careers", "Login"]
_FOOTER = "© 2024 example.com — All rights reserved. Privacy. Terms of service."


def _words_for(lang: str):
    return {"en": _EN_WORDS, "de": _DE_WORDS, "es": _ES_WORDS,
            "zh": _ZH_WORDS, "ja": _JA_WORDS}[lang]


def _sentence(rng: np.random.Generator, lang: str, n_words: int) -> str:
    words = _words_for(lang)
    idx = rng.integers(0, len(words), size=n_words)
    if lang in ("zh", "ja"):
        return "".join(words[i] for i in idx) + "。"
    return " ".join(words[i] for i in idx) + "."


def _paragraph(rng: np.random.Generator, lang: str, oversized: bool) -> str:
    n_sent = int(rng.integers(2, 6)) * (1 if not oversized else 1)
    return " ".join(_sentence(rng, lang, int(rng.integers(6, 16))) for _ in range(n_sent))


def synthesize_page(row_index: int, seed: int = SEED) -> dict:
    """One deterministic (url, warc_ts, html, text, lang) row + its class."""
    rng = np.random.default_rng(seed * 1_000_003 + row_index)
    u = rng.random(4)  # class draws: [dup, oversized, corrupt, pdf]
    lang = ["en", "zh", "de", "ja"][
        int(np.searchsorted([0.60, 0.85, 0.95], rng.random()))
    ]
    charset = ["utf-8", "gbk", "latin-1"][
        int(np.searchsorted([0.90, 0.95], rng.random()))
    ]
    # charset constraints: gbk can't encode umlauts etc., latin-1 no CJK
    if lang in ("zh", "ja"):
        charset = "utf-8" if charset == "latin-1" else charset
    if lang == "ja" and charset == "gbk":
        charset = "utf-8"  # gbk lacks some kana/forms; keep it clean
    site = int(rng.integers(0, 500))
    url = f"https://site{site:04d}.example/{lang}/page{row_index:07d}"

    is_corrupt = u[2] < 0.002
    is_pdf = (not is_corrupt) and u[3] < 0.01
    is_oversized = (not is_corrupt and not is_pdf) and u[1] < 0.005
    is_dup = (not is_corrupt and not is_pdf) and u[0] < 0.01 and row_index > 0
    if is_dup:
        # duplicate of the previous row's ACTUAL url (following dup chains:
        # if row i-1 was itself a dup its emitted url is further back) —
        # exact url-dup with differing payload, the D3 dedup case
        url = _actual_url(row_index - 1, seed)

    n_paras = int(rng.integers(2, 6))
    if is_oversized:
        n_paras = int(rng.integers(150, 250))
    paras = [_paragraph(rng, lang, is_oversized) for _ in range(n_paras)]
    expected = DEFAULT_CONFIG.join_sep.join(paras)

    if is_corrupt:
        kind = int(rng.integers(0, 2))
        html_bytes = b"" if kind == 0 else "页".encode("gbk")[:1] * 7
        return {
            "url": url, "row_class": "corrupt", "lang": lang,
            "html": html_bytes, "text": "", "charset": charset,
        }
    if is_pdf:
        return {
            "url": url, "row_class": "pdf", "lang": lang,
            "html": b"%PDF-FAKE\n" + expected.encode("utf-8"),
            "text": expected, "charset": "pdf",
        }

    nav = " ".join(
        f'<a href="/{w.lower()}">{w}</a>' for w in _NAV_ITEMS[: int(rng.integers(3, 8))]
    )
    sidebar = "".join(
        f'<li><a href="/p/{i}">{_sentence(rng, "en", 2)}</a></li>'
        for i in range(int(rng.integers(3, 9)))
    )
    # noise injectors (augmentation-chain analogue, genplate_plate.py:42-148)
    noise_comment = "<!-- id:%d rev:%d -->" % (row_index, int(rng.integers(0, 9999)))
    broken = "<div <span>" if rng.random() < 0.2 else ""
    fw_punct = "（広告）" if rng.random() < 0.15 else ""
    body_paras = "".join(
        f"<p>{_htmllib.escape(p)}</p>{noise_comment if i == 0 else ''}"
        for i, p in enumerate(paras)
    )
    doc = (
        f'<!DOCTYPE html><html><head><meta charset="{charset}">'
        f"<title>{_sentence(rng, 'en', 3)}</title>"
        f"<script>var page={row_index};//<p>fake</p></script>"
        f"<style>.x{{color:red}}</style></head>"
        f"<body><header><h1>site{site:04d}</h1>{fw_punct}</header>"
        f"<nav>{nav}</nav>{broken}"
        f'<aside><ul>{sidebar}</ul></aside>'
        f"<article>{body_paras}</article>"
        f"<footer>{_FOOTER}</footer></body></html>"
    )
    # xmlcharrefreplace: chars outside the target charset become numeric
    # entities, which the extractor unescapes back to the same char — keeps
    # the label byte-identical AND exercises the entity path (noise analogue)
    html_bytes = doc.encode(charset, errors="xmlcharrefreplace")
    return {
        "url": url, "row_class": "big" if is_oversized else "ok",
        "lang": lang, "html": html_bytes, "text": expected, "charset": charset,
    }


def _base_meta(row_index: int, seed: int) -> tuple[str, bool]:
    """(base url, is_dup) for a row, replaying the generator's rng draws
    in the exact order `synthesize_page` makes them."""
    rng = np.random.default_rng(seed * 1_000_003 + row_index)
    u = rng.random(4)
    lang = ["en", "zh", "de", "ja"][
        int(np.searchsorted([0.60, 0.85, 0.95], rng.random()))
    ]
    rng.random()  # charset draw
    site = int(rng.integers(0, 500))
    url = f"https://site{site:04d}.example/{lang}/page{row_index:07d}"
    is_corrupt = u[2] < 0.002
    is_pdf = (not is_corrupt) and u[3] < 0.01
    is_dup = (not is_corrupt and not is_pdf) and u[0] < 0.01 and row_index > 0
    return url, is_dup


def _actual_url(row_index: int, seed: int) -> str:
    """The url a row actually EMITS: its base url, unless the row is a dup,
    in which case walk back to the nearest non-dup ancestor's base url."""
    i = row_index
    while True:
        url, is_dup = _base_meta(i, seed)
        if not is_dup or i == 0:
            return url
        i -= 1


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def make_pages_table(start: int, stop: int, seed: int = SEED) -> pa.Table:
    """Rows [start, stop) of the synthetic corpus as one Arrow table."""
    rows = [synthesize_page(i, seed) for i in range(start, stop)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [EPOCH_US + i * 1000 for i in range(start, stop)],
                pa.timestamp("us"),
            ),
            "html": pa.array([r["html"] for r in rows], pa.large_binary()),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


def make_expected_table(start: int, stop: int, seed: int = SEED) -> pa.Table:
    """`pages_expected` golden (FIXTURES.md §2): oracle output per row.

    Derived by running `extract_one` over the generated html — NOT by
    echoing the label — so the golden exercises the full oracle path, and
    the generator's label is cross-checked against it in tests."""
    rows = [synthesize_page(i, seed) for i in range(start, stop)]
    res = [extract_one(r["html"]) for r in rows]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "main_text": pa.array([x["main_text"] for x in res], pa.large_string()),
            "ok": pa.array([x["ok"] for x in res], pa.bool_()),
            "row_class": pa.array([r["row_class"] for r in rows], pa.string()),
        }
    )


def write_pages_parquet(
    out_path: str, n_rows: int, seed: int = SEED, rows_per_group: int = 2000
) -> None:
    """Driver-side writer for test fixtures (small scales). Bench scales go
    through `ray.data.range(n).map_batches(...)` instead (fixtures stay
    streaming at size — see bench.py)."""
    import pyarrow.parquet as pq

    with pq.ParquetWriter(out_path, PAGES_SCHEMA) as w:
        for lo in range(0, n_rows, rows_per_group):
            w.write_table(make_pages_table(lo, min(lo + rows_per_group, n_rows), seed))
