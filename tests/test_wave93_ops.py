"""Wave-93 operator pins: markdown conversion, quoted spans, AC rewrite."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, texts):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["s"] * len(texts),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_html_to_markdown_core_shapes():
    from basicocr_ray.core.markdown import html_to_markdown

    assert html_to_markdown("<h1>T</h1><p>a <b>b</b> c</p>") == (
        "# T\n\na **b** c"
    )
    assert html_to_markdown(
        "<ul><li>x</li><li>y</li></ul>"
    ) == "- x\n- y"
    assert html_to_markdown(
        '<p><a href="u?a=1&amp;b=2">t</a></p>'
    ) == "[t](u?a=1&b=2)"
    # script body must vanish, including markup-looking content
    assert html_to_markdown(
        "<p>keep</p><script>var h='<h1>no</h1>';</script><p>tail</p>"
    ) == "keep\n\ntail"
    # unclosed li, line break
    assert html_to_markdown("<ul><li>a<li>b</ul>") == "- a\n- b"
    assert html_to_markdown("<p>a<br>b</p>") == "a\nb"


def test_iter_tags_rawtext_end_spans_body():
    from basicocr_ray.core.structured import iter_tags

    doc = "<p>x</p><script>var a = 1;</script><p>y</p>"
    tags = list(iter_tags(doc))
    names = [t[0] for t in tags]
    assert names == ["p", "p", "script", "p", "p"]
    sc = tags[2]
    assert doc[sc[4]:].startswith("<p>y")  # end is past the close tag




@pytest.mark.usefixtures("ray_session")
def test_ac_replace_leftmost_longest(tmp_path):
    """'secret key' must mask as [KEY], never as [SECRET] + ' key' —
    the prefix-nesting proof; patterns inside the doc body mask too."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(tmp_path, ["body has secret key and password here"])
    got = QUERIES["q347_ac_replace"](str(tmp_path)).to_pandas()
    assert got["text"].tolist() == [
        "[KEY] start body has [KEY] and [PW] here"
    ]


def test_ac_replace_kernel_on_both_backends():
    from basicocr_ray.core.ac import ACAutomaton, ACDoubleArray, ac_replace

    mapping = {"ab": "1", "abc": "2", "c": "3"}
    for cls in (ACAutomaton, ACDoubleArray):
        ac = cls(list(mapping))
        # leftmost-longest: 'abc' wins over 'ab'; trailing 'c' masks
        assert ac_replace(ac, "xabcc", mapping) == "x23"
        assert ac_replace(ac, "ab c", mapping) == "1 3"
        assert ac_replace(ac, "", mapping) == ""
