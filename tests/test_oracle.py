"""Single-doc oracle extractor tests: structure drops, entity handling,
charsets, PDF stub, poison-pill routing, and the generator label contract
(labels correct by construction, plateGen-style)."""

from __future__ import annotations

from basicocr_ray.config import ExtractConfig
from basicocr_ray.core.oracle import extract_one
from basicocr_ray.core.tokenize import tokenize_html
from basicocr_ray.fixtures.gen import synthesize_page


HTML = b"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>T</title>
<script>var x = '<p>not content</p>';</script><style>.x{}</style></head>
<body><nav><a href="/">Home</a> <a href="/x">About</a></nav>
<div><ul><li><a href="1">Link one</a></li><li><a href="2">Link two</a></li></ul></div>
<article><p>This is the first real paragraph of the page, with enough text.</p>
<!-- c --><p>Second paragraph has an &amp; entity and <b>bold</b> text.</p></article>
<footer>(c) 2024. All rights reserved.</footer></body></html>"""


def test_extract_structure_and_entities():
    r = extract_one(HTML)
    assert r["ok"]
    assert r["main_text"] == (
        "This is the first real paragraph of the page, with enough text."
        "\n\nSecond paragraph has an & entity and bold text."
    )
    # spans index into main_text
    for s, e, _ in r["spans"]:
        assert r["main_text"][s:e]


def test_tokenizer_drops_script_style_nav():
    blocks = tokenize_html(HTML.decode("utf-8"))
    texts = " ".join(b.text for b in blocks)
    assert "not content" not in texts
    assert "Home" not in texts          # nav subtree dropped structurally
    assert "All rights reserved" not in texts  # footer dropped


def test_link_density_drops_sidebar():
    r = extract_one(HTML)
    assert "Link one" not in r["main_text"]


def test_charset_paths():
    gbk = (
        '<html><head><meta charset=gbk></head><body><p>'
        + "中文段落内容在这里，很长的中文内容。" * 2
        + "</p></body>"
    ).encode("gbk")
    r = extract_one(gbk)
    assert r["ok"] and r["encoding"] == "gbk"
    assert r["main_text"].startswith("中文段落内容")

    latin = "<p>Latin-1 pàge with enough téxt content</p>".encode("latin-1")
    r2 = extract_one(latin)
    assert r2["ok"] and r2["encoding"] == "latin-1"
    assert "pàge" in r2["main_text"]


def test_pdf_branch_and_poison():
    r = extract_one(b"%PDF-FAKE\nhello pdf text")
    assert r["ok"] and r["main_text"] == "hello pdf text"
    assert r["encoding"] == "pdf"
    bad = extract_one(b"")
    assert not bad["ok"] and "ValueError" in bad["error"]
    trunc = extract_one("页".encode("gbk")[:1] * 7)
    assert not trunc["ok"]  # short mojibake → no_content


def test_unterminated_comment_and_broken_tags():
    r = extract_one(b"<p>good paragraph text here</p><!-- unterminated")
    assert r["main_text"] == "good paragraph text here"
    r2 = extract_one(b"<div <span><p>content paragraph is long enough</p>")
    assert "content paragraph is long enough" in r2["main_text"]


def test_generator_label_contract():
    """plateGen property: every synthetic row's label equals the oracle
    output (checked across all row classes in the first 300 rows)."""
    for i in range(300):
        row = synthesize_page(i)
        res = extract_one(row["html"])
        if row["row_class"] in ("ok", "big", "pdf"):
            assert res["main_text"] == row["text"], (i, row["row_class"])
        else:
            assert not res["ok"]


def test_generator_determinism():
    a, b = synthesize_page(7), synthesize_page(7)
    assert a["html"] == b["html"] and a["url"] == b["url"]


def test_config_join_sep_and_dedup():
    html = b"<p>same paragraph here</p><p>same paragraph here</p><p>other text here</p>"
    r = extract_one(html)  # default: adjacent dup collapsed
    assert r["main_text"] == "same paragraph here\n\nother text here"
    cfg = ExtractConfig(collapse_adjacent_dups=False, join_sep=" | ")
    r2 = extract_one(html, cfg)
    assert r2["main_text"] == "same paragraph here | same paragraph here | other text here"
