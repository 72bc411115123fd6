"""Wave-86 operator pins: outline numbering, Luhn mining, anchor audit."""

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


def test_parse_outline_counter_stack():
    from basicocr_ray.core.structured import parse_outline

    doc = (
        "<h1>A</h1><p>x</p><h2>B &amp; C</h2><h3>D</h3>"
        "<h2>E</h2><h1>F</h1><h3>G</h3>"
        "<script>var h='<h1>fake</h1>';</script>"
    )
    got = parse_outline(doc)
    assert got == [
        (1, "1", "A"),
        (2, "1.1", "B & C"),
        (3, "1.1.1", "D"),
        (2, "1.2", "E"),
        (1, "2", "F"),
        (3, "2.0.1", "G"),  # h2 counter reset by the new h1
    ]
    # opens below h1: honest zero path
    assert parse_outline("<h2>only</h2>")[0] == (2, "0.1", "only")


def test_luhn_kernel():
    from basicocr_ray.pipelines.queries import QUERIES  # noqa: F401

    # 4532015112830366 is a textbook-valid Luhn number
    valid = "4532015112830366"
    invalid = "4532015112830367"
    import re

    def luhn_ok(run):
        s = 0
        for i, ch in enumerate(reversed(run), 1):
            d = ord(ch) - 48
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        return s % 10 == 0

    assert luhn_ok(valid) and not luhn_ok(invalid)


@pytest.mark.usefixtures("ray_session")
def test_luhn_audit_counts(tmp_path):
    """One valid card, one invalid same-length run, one too-short run
    and one too-long run -> candidates 2, valid 1; duplicate valid run
    counts twice."""
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(
        tmp_path,
        [
            "pay 4532015112830366 or 4532015112830367 ref 123 "
            "id 12345678901234567890",
            "twice 4532015112830366 and 4532015112830366",
            "clean text",
        ],
    )
    got = (
        QUERIES["q328_luhn_audit"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[0, 2, 1], [1, 2, 2], [2, 0, 0]]


@pytest.mark.usefixtures("ray_session")
def test_anchor_integrity_split(tmp_path):
    from basicocr_ray.pipelines.queries import QUERIES

    _docs(tmp_path, ["a"] * 6)
    got = (
        QUERIES["q329_anchor_integrity"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_links"].tolist() == [3] * 6
    assert got["n_broken"].tolist() == [1, 0, 0, 0, 0, 1]
