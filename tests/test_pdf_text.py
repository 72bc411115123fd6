"""Real stdlib PDF text extraction goldens + flagship-branch integration."""

from __future__ import annotations

import zlib

import pytest

from basicocr_ray.core.pdf_text import (
    extract_pdf_text,
    extract_stream_text,
    make_pdf,
)


def test_roundtrip_compressed_and_raw():
    lines = ["Hello PDF world.", "Second line with (parens) and \\ slash.", "Third."]
    for compress in (True, False):
        pdf = make_pdf(lines, compress=compress)
        assert pdf.startswith(b"%PDF")
        assert extract_pdf_text(pdf) == "\n".join(lines)


def test_stream_text_operators():
    content = (
        b"BT (abc) Tj 0 -14 Td (def) Tj ET "
        b"BT [(gh)-120(i)] TJ T* (jk) ' ET"
    )
    pieces = extract_stream_text(content)
    joined = []
    line = ""
    for p in pieces:
        if p == "":
            if line:
                joined.append(line)
                line = ""
        else:
            line += p
    if line:
        joined.append(line)
    assert joined == ["abc", "def", "ghi", "jk"]


def test_escapes_and_hex_strings():
    content = rb"BT (a\(b\)c\\d\n) Tj <48656C6C6F> Tj (\101\102) Tj ET"
    pieces = [p for p in extract_stream_text(content) if p]
    assert pieces == ["a(b)c\\d\n", "Hello", "AB"]


def test_utf16_string():
    payload = "中文".encode("utf-16-be")
    hexstr = (b"\xfe\xff" + payload).hex().encode()
    content = b"BT <" + hexstr + b"> Tj ET"
    assert [p for p in extract_stream_text(content) if p] == ["中文"]


def test_corrupt_stream_skipped_not_fatal():
    pdf = make_pdf(["good line"])
    # append a broken FlateDecode stream: extractor must skip it
    pdf += (
        b"9 0 obj\n<< /Filter /FlateDecode /Length 8 >>\n"
        b"stream\nNOTZLIB!\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "good line"


def test_non_pdf_rejected():
    with pytest.raises(ValueError):
        extract_pdf_text(b"plain text")


def test_flagship_branch_parses_real_pdf():
    """extract_one routes real %PDF payloads through the stdlib extractor."""
    from basicocr_ray.core.oracle import extract_one

    pdf = make_pdf(["Real pdf content here.", "And a second paragraph line."])
    rec = extract_one(pdf)
    assert rec["ok"]
    assert rec["main_text"] == "Real pdf content here.\nAnd a second paragraph line."
    # fixture convention still byte-exact
    fake = b"%PDF-FAKE\nfixture body"
    assert extract_one(fake)["main_text"] == "fixture body"


@pytest.mark.usefixtures("ray_session")
def test_pdf_actor_branch_with_real_pdfs():
    import pyarrow as pa
    import ray.data

    from basicocr_ray.config import ExtractConfig
    from basicocr_ray.pipelines.extract_pipeline import build_extract_ds

    pdfs = [make_pdf([f"doc {i} line one", f"doc {i} line two"]) for i in range(6)]
    rows = pa.table(
        {
            "url": pa.array([f"p:{i}" for i in range(6)], pa.string()),
            "html": pa.array(pdfs, pa.large_binary()),
            "lang": pa.array(["en"] * 6, pa.string()),
        }
    )
    for mode in (True, "split", False, "finisher"):
        ds = build_extract_ds(ray.data.from_arrow(rows), ExtractConfig(), pdf_branch=mode)
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        assert df["ok"].all(), mode
        assert df.loc[0, "main_text"] == "doc 0 line one\ndoc 0 line two"


def test_stream_data_ending_in_cr_not_truncated():
    """The deflate bytes for some payloads end in \r; the EOL-delimited
    `\r?\nendstream` span would eat that DATA byte and truncate the zlib
    stream. The direct /Length in the stream dict is authoritative
    (regression: hypothesis found lines=['^'] extracting as '')."""
    assert extract_pdf_text(make_pdf(["^"])) == "^"
    # and a stress sweep: single chars whose compressed tail varies
    for ch in "^~`|!@#$%&*_-+=":
        assert extract_pdf_text(make_pdf([ch])) == ch, ch
