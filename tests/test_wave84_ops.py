"""Wave-84 operator pins: sitemap codec, MMR diversification, linear
interpolation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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


def test_sitemap_roundtrip_escaping_and_partial_fields():
    from basicocr_ray.core.structured import encode_sitemap, parse_sitemap

    entries = [
        {"loc": "https://x.org/?a=1&b=<2>", "lastmod": "2024-02-29",
         "priority": "0.9"},
        {"loc": "https://y.org/"},  # partial: only loc
    ]
    xml = encode_sitemap(entries)
    assert "&amp;" in xml and "&lt;2&gt;" in xml
    back = parse_sitemap(xml)
    assert back[0] == entries[0]
    assert back[1] == entries[1]
    # junk elements and text outside fields are ignored
    noisy = xml.replace(
        "<url>", "<url><!-- c --><junk>zz</junk>stray text ", 1
    )
    assert parse_sitemap(noisy)[0] == entries[0]


@pytest.mark.usefixtures("ray_session")
def test_mmr_prefers_diversity(tmp_path):
    """q=[1,0,0,0]. e2 has HIGHER relevance than e3 (0.8 vs 0.7) but
    hugs the round-1 winner e1 (sim 1.7), so 2*rel - maxsim ranks e3
    (1.4-0.7=0.7) above e2 (1.6-1.7=-0.1): expected greedy order
    1, 3, 4, 5, 2."""
    from basicocr_ray.pipelines.queries import QUERIES

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [1.0, 1.0, 0.0, 0.0],
        2: [0.8, 0.9, 0.0, 0.0],
        3: [0.7, 0.0, 0.0, 0.0],
        4: [0.0, 0.0, 1.0, 0.0],
        5: [0.0, 0.0, 0.0, 0.5],
    }
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    got = QUERIES["q322_mmr_diversified_topk"](str(tmp_path))
    assert got["vec_id"].tolist() == [1, 3, 4, 5, 2]


