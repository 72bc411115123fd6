"""Wave-81 operator pins: HTML table parser, JSON-LD extractor,
index of coincidence."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": langs,
                    "source": ["s"] * len(texts),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            preserve_index=False,
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_parse_tables_tag_soup():
    """Nested table stays independent; unclosed td/tr implicit-close;
    entities unescape; script body with '<td>' injects nothing; th
    tagged distinctly; text outside cells dropped."""
    from basicocr_ray.core.structured import parse_tables

    doc = (
        "<p>pre</p><script>var x = '<td>evil</td>';</script>"
        "<table><caption>ignored</caption>"
        "<tr><th>H1</th><th>H2</th>"
        "<tr><td>a &amp; b<td>c"
        "<td>spill</td></tr>"
        "<tr><td><table><tr><td>inner</td></tr></table></td><td>z</td>"
        "</table>"
    )
    grids = parse_tables(doc)
    assert len(grids) == 2
    # inner table closes first
    assert grids[0] == [[("td", "inner")]]
    outer = grids[1]
    assert outer[0] == [("th", "H1"), ("th", "H2")]
    # <td>a &amp; b<td>c<td>spill: two implicit closes -> 3 cells
    assert outer[1] == [("td", "a & b"), ("td", "c"), ("td", "spill")]
    assert outer[2][-1] == ("td", "z")


def test_parse_tables_unclosed_at_eof():
    from basicocr_ray.core.structured import parse_tables

    grids = parse_tables("<table><tr><td>x")
    assert grids == [[[("td", "x")]]]


def test_extract_jsonld_decoys_and_arrays():
    from basicocr_ray.core.structured import extract_jsonld

    doc = (
        "<script>var a = {'@type': 'Article'};</script>"
        '<script type="application/ld+json">not json at all</script>'
        "<script type='application/ld+json'>"
        '[{"@type": "WebSite", "x": 1}, {"@type": "Article", "x": 2}]'
        "</script>"
        '<script type="application/ld+json">{"@type": "Article", "x": 3}'
        "</script >"
    )
    arts = extract_jsonld(doc, want_type="Article")
    assert [a["x"] for a in arts] == [2, 3]
    assert len(extract_jsonld(doc)) == 3


@pytest.mark.usefixtures("ray_session")
def test_q312_table_roundtrip_vs_sql(tmp_path):
    """Orders with escaping-sensitive status strings roundtrip through
    render+parse; matches the SQL oracle exactly."""
    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    n = 60  # spans multiple 25-row pages
    df = pd.DataFrame(
        {
            "o_orderkey": range(1, n + 1),
            "o_orderstatus": (["O", "F", "P&Q", "<X>"] * 15)[:n],
            "o_totalprice": [i * 7 + 0.05 for i in range(1, n + 1)],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "orders.parquet"),
    )
    got = (
        QUERIES["q312_html_table_extract"](str(tmp_path))
        .to_pandas()
        .sort_values("orderkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "orders.parquet")
    )
    exp = (
        con.execute(ORACLE_SQL["q312_html_table_extract"])
        .df()
        .sort_values("orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert got["status"].tolist()[:4] == ["O", "F", "P&Q", "<X>"]


