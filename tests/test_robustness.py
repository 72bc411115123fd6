"""Adversarial-input robustness: real web crawls are tag soup. The
extractor must never raise, never hang, and stay deterministic on
arbitrary byte garbage; oversized documents must stream through the
pipeline without blowing memory."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from basicocr_ray.core.oracle import extract_one
from basicocr_ray.core.tokenize import tokenize_html

soup_atoms = st.sampled_from(
    ["<div", "<p>", "</p>", ">", "<", "</", "<!--", "-->", "<![CDATA[",
     "]]>", "<script>", "</script>", "<a href='", "'>", "&amp;", "&#x41;",
     "&bogus;", "text content here ", "<nav>", "</nav>", "\x00", "中文",
     "<br/>", "<P >", "< p>", "<style>", "=\"", "<table><tr><td>", "<>",
     "<!DOCTYPE", "<?xml ", "attr='v alue'", '"quoted"', "\n\t "]
)


@given(st.lists(soup_atoms, max_size=60))
@settings(max_examples=200, deadline=2000)
def test_tokenizer_never_raises_on_soup(atoms):
    doc = "".join(atoms)
    blocks = tokenize_html(doc)
    for b in blocks:
        assert b.text  # no empty blocks emitted
        assert b.n_chars == len(b.text)
    # deterministic
    again = tokenize_html(doc)
    assert [b.text for b in again] == [b.text for b in blocks]


@given(st.binary(max_size=400))
@settings(max_examples=200, deadline=2000)
def test_extract_one_never_raises_on_bytes(data):
    r = extract_one(data)
    assert set(r) >= {"main_text", "spans", "ok", "error"}
    r2 = extract_one(data)
    assert r2["main_text"] == r["main_text"]


def test_unterminated_raw_text_and_nesting_bombs():
    # unterminated <script> swallows the rest — no hang, no crash
    assert extract_one(b"<p>kept paragraph text</p><script>var x=1;")["main_text"] \
        == "kept paragraph text"
    # deeply nested unclosed divs
    bomb = (b"<div>" * 5000) + b"<p>deep paragraph content</p>"
    r = extract_one(bomb)
    assert r["main_text"] == "deep paragraph content"
    # many unclosed anchors (a_depth runaway guard)
    anchors = (b"<a href=x>" * 2000) + b"<p>plain long enough paragraph</p>"
    assert extract_one(anchors)["ok"] in (True, False)  # no exception


def test_multi_megabyte_doc_streams():
    import time

    para = "<p>" + "word " * 400 + "</p>"
    doc = ("<html><body>" + para * 2500 + "</body></html>").encode()  # ~5 MB
    t0 = time.perf_counter()
    r = extract_one(doc)
    dt = time.perf_counter() - t0
    assert r["ok"] and r["n_blocks_kept"] == 1  # adjacent dups collapse
    assert dt < 15.0  # linear-ish, no quadratic blowup


def test_null_bytes_and_mixed_encodings():
    r = extract_one(b"<p>text with \x00 null byte padding content</p>")
    assert r["ok"]
    # BOM + utf-16 content
    import codecs

    doc = codecs.BOM_UTF16_LE + "<p>utf16 content that is long enough</p>".encode(
        "utf-16-le"
    )
    assert extract_one(doc)["main_text"] == "utf16 content that is long enough"


def test_unterminated_quoted_tag_is_linear_time():
    """Regression: a + quantifier inside the tag attribute group
    ((?:"..."|'...'|[^>"']+)*) backtracks exponentially on an unterminated
    tag whose attribute soup mixes quotes — a 100-char input hung the
    lexer. Pin linear-ish behavior with a strict wall-clock budget."""
    import time

    from basicocr_ray.core.tokenize import tokenize_html

    soup = "<a " + 'ab"cd"ef' * 2000  # unterminated, quote-riddled
    t0 = time.time()
    tokenize_html(soup)
    assert time.time() - t0 < 2.0
