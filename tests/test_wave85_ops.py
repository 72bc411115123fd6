"""Wave-85 operator pins: attribute parser / head links, xcorr lag,
anagram classes."""

from __future__ import annotations

import duckdb
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


def _events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["props"] = "{}"
    tab = pa.Table.from_pandas(df, preserve_index=False)
    tab = tab.set_column(
        tab.schema.get_field_index("ts"), "ts",
        tab["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tab, str(tmp_path / "events.parquet"))


def test_parse_attrs_forms():
    from basicocr_ray.core.structured import parse_attrs

    a = parse_attrs(
        "<link rel=canonical href='https://x/?a=1&amp;b=2' "
        'data-x="q\'v" disabled>'
    )
    assert a["rel"] == "canonical"
    assert a["href"] == "https://x/?a=1&b=2"  # entity unescaped
    assert a["data-x"] == "q'v"
    assert a["disabled"] == ""  # boolean attr
    # duplicate: first wins; name case-folds
    b = parse_attrs('<meta NAME="robots" name="decoy" content=noindex>')
    assert b["name"] == "robots" and b["content"] == "noindex"


def test_extract_head_links_skips_script_fakes():
    from basicocr_ray.core.structured import extract_head_links

    doc = (
        "<head><script>var x = '<link rel=\"canonical\" "
        "href=\"https://evil/\">';</script>"
        '<link rel="canonical" href="https://good/">'
        '<meta charset="utf-8"></head>'
    )
    links = extract_head_links(doc)
    hrefs = [l.get("href") for l in links if l.get("rel") == "canonical"]
    assert hrefs == ["https://good/"]
    assert any(l["_tag"] == "meta" and l.get("charset") == "utf-8"
               for l in links)


@pytest.mark.usefixtures("ray_session")
def test_xcorr_lag_finds_shift(tmp_path):
    """Views at hours 0..4, clicks at hours 2..6 (same shape):
    lag 2 aligns perfectly and must win."""
    from basicocr_ray.pipelines.queries import QUERIES

    H = 3_600_000_000
    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 5), (2, 1), (3, 1), (4, 1)]:
        for _ in range(n):
            rows.append((eid, h * H + 1000, 1, "view", 1.0))
            eid += 1
    for h, n in [(2, 1), (3, 5), (4, 1), (5, 1), (6, 1)]:
        for _ in range(n):
            rows.append((eid, h * H + 1000, 1, "click", 1.0))
            eid += 1
    rows.append((eid, 1000, 1, "error", 1.0))  # other types ignored
    _events(tmp_path, rows)
    got = QUERIES["q325_xcorr_lag"](str(tmp_path))
    best = got[got["is_best"]]
    assert best["lag_hours"].tolist() == [2]
    # perfect alignment: 1+25+1+1+1 = 29
    assert best["xcorr"].tolist() == [29]


@pytest.mark.usefixtures("ray_session")
def test_anagram_classes_vs_sql(tmp_path):
    """'listen silent enlist' collide on signature 'eilnst'; winner by
    count then lexicographic; singleton 'word' excluded. Cross-check
    the SQL twin on the same fixture."""
    from basicocr_ray.pipelines.queries import ORACLE_SQL, QUERIES

    _docs(
        tmp_path,
        ["listen silent silent enlist word", "Listen tab bat"],
    )
    got = (
        QUERIES["q326_anagram_classes"](str(tmp_path))
        .sort_values("sig")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["abt", 2, 2, "bat"],
        ["eilnst", 3, 5, "listen"],  # listen 2 (casefolded), silent 2: tie->lex
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
        % str(tmp_path / "documents.parquet")
    )
    exp = (
        con.execute(ORACLE_SQL["q326_anagram_classes"])
        .df()
        .sort_values("sig")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == exp.values.tolist()
