"""Wave-89 operator pins: Levenshtein kernel, CER/WER, Jaro-Winkler."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs(tmp_path, texts, start_id=0):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": range(start_id, start_id + len(texts)),
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


def test_levenshtein_kernel_cases():
    from basicocr_ray.pipelines.queries.extract import _levenshtein

    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "abc") == 3
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein(list("ab"), list("ba")) == 2
    assert _levenshtein(["the", "cat"], ["the", "dog", "cat"]) == 1


def test_noisy_variant_rules():
    from basicocr_ray.pipelines.queries.extract import _noisy_variant

    assert _noisy_variant("abcdefgh", 0) == "abcdexgh"  # sub@5
    assert _noisy_variant("abxdefgh", 3) == "abxdexgh"
    assert _noisy_variant("abcdexgh", 0) == "abcdeygh"  # already x -> y
    assert _noisy_variant("abcdefgh", 1) == "abcefgh"   # del@3
    assert _noisy_variant("abcdefgh", 2) == "abcdefgzh"  # ins@7
    assert _noisy_variant("ab", 2) == "abz"  # short: append



@pytest.mark.usefixtures("ray_session")
def test_cer_wer_on_known_edit(tmp_path):
    """doc 3 (mod 0): one substitution -> CER 1/len, WER 1/n_tokens
    (exactly one token changes)."""
    from basicocr_ray.pipelines.queries import QUERIES

    t = "abcdefgh ij kl"
    _docs(tmp_path, [t], start_id=3)
    cer = QUERIES["q336_cer_eval"](str(tmp_path)).to_pandas()
    assert cer["dist"].tolist() == [1]
    assert cer["cer"].tolist() == [round(1 / len(t), 9)]
    wer = QUERIES["q337_wer_eval"](str(tmp_path)).to_pandas()
    assert wer["n_ref"].tolist() == [3]
    assert wer["dist"].tolist() == [1]
