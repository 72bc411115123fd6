"""Wave-95 operator pins: autocomplete, AC pattern frequency, LPT."""

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




@pytest.mark.usefixtures("ray_session")
def test_ac_pattern_freq_substring_hits(tmp_path):
    """'the' inside 'theater' counts (grep semantics); '查询' counts in
    CJK text; multiplicity per doc sums."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(
        tmp_path,
        ["theater the data database", "数据查询引擎查询 page"],
    )
    got = (
        QUERIES["q352_ac_pattern_freq"](str(tmp_path))
        .set_index("pattern")["n"]
    )
    assert got["the"] == 2  # theater + the
    assert got["data"] == 2  # data + database
    assert got["查询"] == 2
    assert got["page"] == 1
    assert got["table"] == 0


