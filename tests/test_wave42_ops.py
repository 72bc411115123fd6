"""Wave-42 pin: the q200 end-to-end release funnel."""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _md5_low63(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0] & (
        (1 << 63) - 1
    )


@pytest.mark.usefixtures("ray_session")
def test_release_funnel_end_to_end(tmp_path):
    """Planted duplicates collapse to the min id, the per-lang cap
    binds, every stage count matches a brute rebuild, and the release
    digest is the XOR of exactly the surviving rows."""
    from basicocr_ray.core.textstats import hashed_linear_score
    from basicocr_ray.pipelines.queries import QUERIES

    # weights from the unmasked low-64 hash, matching the query
    weights = [
        struct.unpack(
            "<Q", hashlib.md5(f"w:{b}".encode()).digest()[8:]
        )[0] % 21 - 10
        for b in range(64)
    ]

    rng_texts = []
    # 30 'en' docs from a tiny vocab (some pass the gate, some dup)
    for i in range(30):
        rng_texts.append(("en", f"alpha beta tok{i % 8}"))
    # exact duplicates: ids 30..34 share one text → dedup keeps id 30
    for _ in range(5):
        rng_texts.append(("en", "duplicate body text"))
    # 3 'de' docs
    for i in range(3):
        rng_texts.append(("de", f"wort{i} und mehr"))
    df = pd.DataFrame(
        {
            "doc_id": range(len(rng_texts)),
            "text": [t for _, t in rng_texts],
            "lang": [l for l, _ in rng_texts],
            "source": ["s"] * len(rng_texts),
            "n_chars": [len(t) for _, t in rng_texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    got = QUERIES["q200_release_funnel"](str(tmp_path)).to_pandas()
    gm = {
        (s, l): (int(n), int(c))
        for s, l, n, c in zip(
            got["stage"], got["lang"], got["n_docs"], got["chk"]
        )
    }

    # brute rebuild
    def score(t):
        return hashed_linear_score(t.lower().split(), weights)

    rows = [
        (i, l, t) for i, (l, t) in enumerate(rng_texts)
        if score(t) > -180
    ]
    # counts per stage
    from collections import Counter

    inp = Counter(l for l, _ in rng_texts)
    qual = Counter(l for _, l, _ in rows)
    seen, dedup = set(), []
    for i, l, t in rows:  # ids ascending → first occurrence = min id
        if t not in seen:
            seen.add(t)
            dedup.append((i, l, t))
    ded = Counter(l for _, l, _ in dedup)
    rel, relchk = Counter(), {}
    for lang in set(l for _, l, _ in dedup):
        members = [
            (i, t) for i, l, t in dedup if l == lang
        ]
        members.sort(
            key=lambda it: (hashlib.md5(str(it[0]).encode()).hexdigest(),
                            it[0])
        )
        take = members[:20]
        rel[lang] = len(take)
        chk = 0
        for i, t in take:
            chk ^= _md5_low63(f"{i}:{t}")
        relchk[lang] = chk

    for lang in inp:
        assert gm[("input", lang)] == (inp[lang], 0)
    for lang in qual:
        assert gm[("quality", lang)] == (qual[lang], 0)
    for lang in ded:
        assert gm[("dedup", lang)] == (ded[lang], 0)
    for lang in rel:
        assert gm[("release", lang)] == (rel[lang], relchk[lang]), lang
    # the funnel actually narrows: dup cluster collapsed, en cap binds
    if ("dedup", "en") in gm and ("quality", "en") in gm:
        assert gm[("dedup", "en")][0] <= gm[("quality", "en")][0]
    if ("release", "en") in gm:
        assert gm[("release", "en")][0] <= 20
