"""Wave-34 operator pins: positional phrase search, LOCF hourly
gap-fill, anchor-text host index."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts):
    df = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return df


@pytest.mark.usefixtures("ray_session")
def test_phrase_positions_overlapping(tmp_path):
    """Top trigram is found at every 0-based token position, including
    OVERLAPPING occurrences and multiple docs; case folding applies."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        "the cat sat on the mat",          # no "a a a"
        "a a a a b",                        # overlapping: pos 0 and 1
        "x A a A y a a a",                  # case-fold: pos 1, 5
        "a a",                              # too short for a trigram
    ]
    _write_docs(tmp_path, texts)
    got = (
        QUERIES["q176_phrase_positions"](str(tmp_path))
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    assert (got["phrase"] == "a a a").all()
    exp = {(1, 0), (1, 1), (2, 1), (2, 5)}
    assert set(zip(got["doc_id"], got["pos"])) == exp


@pytest.mark.usefixtures("ray_session")
def test_locf_gapfill_known_series(tmp_path):
    """Hand-built series: grid spans first..last hour inclusive, gaps
    carry the last value, the last event in an hour wins (ts then
    event_id), and observed rows are not marked filled."""
    from basicocr_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2024-03-01 00:00:00")

    def ev(eid, user, minutes, value):
        return {
            "event_id": eid, "ts": base + pd.Timedelta(minutes=minutes),
            "user_id": user, "event_type": "x", "value": value,
            "props": "{}",
        }

    rows = [
        # user 1: hour 0 has two events (later ts wins), hours 1-2 gap,
        # hour 3 observed
        ev(1, 1, 10, 10.0), ev(2, 1, 50, 20.0),
        ev(3, 1, 3 * 60 + 5, 30.0),
        # user 1: same-ts tie inside hour 3 → higher event_id wins
        ev(4, 1, 3 * 60 + 5, 31.0),
        # user 2: single event → single-row grid
        ev(5, 2, 7 * 60, 70.0),
    ]
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = (
        QUERIES["q177_locf_gapfill"](str(tmp_path))
        .to_pandas().sort_values(["user_id", "h"]).reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1].reset_index(drop=True)
    assert len(u1) == 4  # hours 0..3
    assert u1["value"].tolist() == [20.0, 20.0, 20.0, 31.0]
    assert u1["filled"].tolist() == [0, 1, 1, 0]
    assert u1["h"].iloc[0] == base
    u2 = got[got["user_id"] == 2].reset_index(drop=True)
    assert len(u2) == 1 and u2["value"].iloc[0] == 70.0
    assert int(u2["filled"].iloc[0]) == 0


@pytest.mark.usefixtures("ray_session")
def test_anchor_text_tokenization_lockstep(tmp_path):
    """Anchors are the doc's first two Python-split tokens (runs of
    whitespace collapse); counts land on the arithmetic target hosts."""
    from basicocr_ray.pipelines.queries import QUERIES

    texts = [
        "  alpha   beta gamma",   # leading/multi-space: toks = alpha beta
        "solo",                   # one-token anchor
        "Alpha beta rest",        # case folds into the same tokens
    ]
    _write_docs(tmp_path, texts)
    got = QUERIES["q178_anchor_text_index"](str(tmp_path)).to_pandas()
    cnt = {
        (h, t): int(c)
        for h, t, c in zip(got["dst_host"], got["token"], got["cnt"])
    }
    # doc 0 → hosts (3*0+1)%7=1 and (5*0+2)%7=2, tokens alpha+beta each
    # doc 2 → hosts (7)%7=0 and (12)%7=5, tokens alpha+beta each
    assert cnt[("site1", "alpha")] == 1 and cnt[("site1", "beta")] == 1
    assert cnt[("site0", "alpha")] == 1 and cnt[("site0", "beta")] == 1
    # doc 1 → hosts (4)%7=4 and (7)%7=0, token solo
    assert cnt[("site4", "solo")] == 1 and cnt[("site0", "solo")] == 1
