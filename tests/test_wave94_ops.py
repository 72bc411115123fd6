"""Wave-94 operator pins: merge schedule, MIME sniff, Damerau."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def test_merge_schedule_matches_huffman_hand_case():
    import heapq

    weights = [5, 3, 8, 2, 7]
    heap = list(weights)
    heapq.heapify(heap)
    cost = 0
    while len(heap) > 1:
        a, b = heapq.heappop(heap), heapq.heappop(heap)
        cost += a + b
        heapq.heappush(heap, a + b)
    assert cost == 55  # the recursive-CTE oracle's hand value


def test_sniff_payload_structural_checks():
    from basicocr_ray.core.sniff import sniff_payload

    assert sniff_payload(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_payload(b"GIF87a..") == "gif"
    assert sniff_payload(b"RIFF\x00\x00\x00\x00WAVEfmt") == "wav"
    assert sniff_payload(b"RIFF\x00\x00\x00\x00JUNK") == "unknown"
    assert sniff_payload(b"%PDF-1.7") == "pdf"
    assert sniff_payload(b"\x1f\x8b\x08") == "gzip"
    assert sniff_payload(b"WARC/1.0") == "warc"
    assert sniff_payload(b"") == "unknown"
    assert sniff_payload(b"\x89PNG\r\n\x1a") == "unknown"  # short magic


def test_damerau_known_vectors():
    from basicocr_ray.pipelines.queries import damerau_levenshtein

    assert damerau_levenshtein("ca", "abc") == 2  # unrestricted, not OSA
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("abcd", "acbd") == 1
    assert damerau_levenshtein("", "xyz") == 3
    assert damerau_levenshtein("same", "same") == 0


@settings(max_examples=80, deadline=None)
@given(
    a=st.text(alphabet="abcde", max_size=10),
    b=st.text(alphabet="abcde", max_size=10),
)
def test_damerau_fuzz_vs_duckdb(a, b):
    from basicocr_ray.pipelines.queries import damerau_levenshtein

    con = duckdb.connect()
    exp = con.execute(
        "SELECT damerau_levenshtein(?, ?)", [a, b]
    ).fetchone()[0]
    assert damerau_levenshtein(a, b) == exp
