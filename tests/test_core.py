"""Unit goldens for the pure kernels — mirrors the reference's only test
file (`contrib/crnn/test/test_utils.py`): tiny hand-computed goldens for
pure functions, including error paths."""

from __future__ import annotations

import pytest

from basicocr_ray.config import ExtractConfig
from basicocr_ray.core.ac import ACAutomaton
from basicocr_ray.core.charset import sniff_decode, sniff_encoding
from basicocr_ray.core.decode import ctc_collapse, greedy_decode
from basicocr_ray.core.normalize import collapse_ws, string_b2q, string_q2b, uniform
from basicocr_ray.core.score import score_values
from basicocr_ray.core.sketches import (
    MinHasher,
    hamming64,
    ngram_jaccard,
    simhash,
)
from basicocr_ray.core.textstats import (
    char_runs,
    lang_id,
    md5_hex,
    quality_stats,
    rolling_fingerprint,
    ws_tokens,
)
from basicocr_ray.core.trie import TrieDict
from basicocr_ray.core.vocab import Vocab


# --- CTC collapse (test_utils.py:31-68 analogues) --------------------------

def test_ctc_collapse_ea_golden():
    # the [5,5,0,1] → "ea" case of test_utils.py:53-56
    assert ctc_collapse([5, 5, 0, 1]) == [5, 1]


def test_ctc_collapse_blank_separated_repeats_kept():
    # "--hh-e-l-ll-oo" → "hello" (crnn.md:58,66): blank-separated repeats stay
    assert ctc_collapse([2, 0, 2]) == [2, 2]
    assert ctc_collapse([0, 0, 0]) == []
    assert ctc_collapse([]) == []


def test_vocab_roundtrip_and_error_path():
    v = Vocab("abcde")
    codes, lens = v.encode(["ab", "cde"])
    assert codes == [1, 2, 3, 4, 5] and lens == [2, 3]
    assert v.decode(codes, lens, raw=True) == ["ab", "cde"]
    assert v.decode([5, 5, 0, 1], [4]) == ["ea"]
    with pytest.raises(ValueError):  # test_utils.py:59-62 error path
        v.decode([1, 2], [3])


def test_greedy_decode_blocks():
    texts = ["nav nav", "para one", "para one", "ads", "para two"]
    keeps = [False, True, True, False, True]
    cfg = ExtractConfig()
    main, spans, n = greedy_decode(texts, keeps, cfg)
    # adjacent dup "para one" collapsed; blank resets nothing here
    assert main == "para one\n\npara two"
    assert n == 2
    assert spans == [(0, 8, 1), (10, 18, 4)]
    # blank between repeats → both kept (CTC rule)
    main2, _, _ = greedy_decode(
        ["x", "drop", "x"], [True, False, True], cfg
    )
    assert main2 == "x\n\nx"
    with pytest.raises(ValueError):
        greedy_decode(["a"], [True, False], cfg)


def test_greedy_decode_spans_offsets():
    cfg = ExtractConfig(join_sep=" ")
    main, spans, _ = greedy_decode(["ab", "cd"], [True, True], cfg)
    assert main == "ab cd"
    assert spans == [(0, 2, 0), (3, 5, 1)]
    assert main[spans[1][0] : spans[1][1]] == "cd"


# --- normalization (trietree_correct.py:45-72) -----------------------------

def test_width_fold_goldens():
    assert string_q2b("　") == " "
    assert string_q2b("ＡＢＣ！") == "ABC!"
    assert string_b2q("ABC!") == "ＡＢＣ！"
    assert uniform("ＡＢＣ！ Ｘ") == "abc! x"


def test_collapse_ws():
    assert collapse_ws("  a \t b\n\nc d　 ") == "a b c d"


# --- charset sniffing ------------------------------------------------------

def test_charset_ladder():
    assert sniff_encoding("中文".encode("utf-8")) == "utf-8"
    gbk = ('<meta charset="gbk"><p>' + "中文" * 4 + "</p>").encode("gbk")
    assert sniff_encoding(gbk) == "gbk"
    assert sniff_encoding(b"\xff plain latin") == "latin-1"
    assert sniff_encoding(b"\xef\xbb\xbfabc") == "utf-8-sig"
    # lying meta charset falls through to utf-8
    lying = ('<meta charset="ascii"><p>' + "中文" + "</p>").encode("utf-8")
    assert sniff_encoding(lying) == "utf-8"
    with pytest.raises(ValueError):
        sniff_decode(b"")


# --- scoring ---------------------------------------------------------------

def test_score_values():
    td, ld, score, keep = score_values(100, 1, 0)
    assert keep and ld == 0.0 and td == 50.0
    # link-heavy → drop
    assert score_values(100, 0, 90)[3] is False
    # too short → drop
    assert score_values(5, 0, 0)[3] is False
    # empty block: link_density defined as 1.0
    assert score_values(0, 0, 0)[1] == 1.0


# --- trie corrector (trietree_correct.py tie-break ladder) -----------------

def test_trie_correct_branches():
    t = TrieDict(
        [("hello", 10), ("help", 5), ("hell", 20), ("word", 9), ("world", 7)]
    )
    assert t.correct("hello") == "hello"          # dist-0 exact hit
    assert t.correct("helo") == "hell"            # same-length pref → max freq
    assert t.correct("wor") == "word"             # unique after length pref
    assert t.correct("zzzzzzzzzz") == "zzzzzzzzzz"  # nothing within maxCost+3
    # retry ladder: dist 2 found only on the +3 retry
    assert t.correct("hexxo") == "hello"


def test_trie_tiebreak_lexicographic():
    t = TrieDict([("aa", 5), ("ab", 5)])
    # dist 1 each, same length, same freq → lexicographically smallest
    assert t.correct("ac") == "aa"


def test_trie_search_prune():
    t = TrieDict([("abcdef", 1)])
    assert t.search("abcdef", 0) == [("abcdef", 0, 1)]
    assert t.search("xyzxyz", 1) == []


# --- AC automaton ----------------------------------------------------------

def test_ac_find_and_strip():
    ac = ACAutomaton(["he", "she", "his", "hers"])
    hits = {(s, e, p) for s, e, p in ac.find_all("ushers")}
    assert hits == {(1, 4, "she"), (2, 4, "he"), (2, 6, "hers")}
    ac2 = ACAutomaton(["vector window", "hash scan"])
    s = "a vector window b hash scan c"
    assert ac2.strip(s) == s.replace("vector window", "").replace("hash scan", "")
    # leftmost-longest: "she" wins over "he" at overlap
    ac3 = ACAutomaton(["she", "he"])
    assert ac3.strip("she") == ""


# --- text stats ------------------------------------------------------------

def test_tokens_and_runs():
    assert ws_tokens("The  fast\nkey") == ["the", "fast", "key"]
    assert char_runs("abc123中文,def") == ["abc", "123", "中文", "def"]


def test_lang_id_closed_set():
    assert lang_id("the cat is on the mat and it was good") == "en"
    assert lang_id("der hund ist nicht da und die katze") == "de"
    assert lang_id("el perro y la casa de los niños") == "es"
    assert lang_id("这是一个中文句子没有假名") == "zh"
    assert lang_id("これは日本語のぶんしょうです") == "ja"
    assert lang_id("") == "other"


def test_quality_and_fingerprints():
    s = quality_stats("the quick brown fox.")
    assert s["n_tokens"] == 4 and s["n_stop"] == 1
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert rolling_fingerprint("hello world abc def") == rolling_fingerprint(
        "hello world abc def"
    )


# --- sketches --------------------------------------------------------------

def test_minhash_similarity_ordering():
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog and runs far away"
    b = a + "!"
    c = "completely different text about databases and query engines"
    sab = MinHasher.jaccard_estimate(mh.signature(a), mh.signature(b))
    sac = MinHasher.jaccard_estimate(mh.signature(a), mh.signature(c))
    assert sab > 0.8 > sac
    assert mh.signature(a).tolist() == mh.signature(a).tolist()  # deterministic


def test_ngram_jaccard_and_simhash():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "zzzzzz") == 0.0
    assert simhash("same text") == simhash("same text")
    assert hamming64(simhash("aaa bbb ccc"), simhash("aaa bbb ccc")) == 0
    assert (
        hamming64(simhash("the quick brown fox"), simhash("the quick brown fix"))
        < hamming64(simhash("the quick brown fox"), simhash("unrelated stuff here"))
    )


# --- web-corpus quality filters + url normalization ------------------------

def test_quality_filter_rules():
    from basicocr_ray.core.textstats import quality_filter

    good = ("the quick brown fox jumps over the lazy dog and then it runs "
            "far away to the old barn where it sleeps all day long " * 3)
    assert quality_filter(good) == (True, "")
    assert quality_filter("too short")[1] == "too_few_words"
    assert quality_filter("a b c d e " * 20)[1] == "mean_word_len"
    assert quality_filter(("#" * 30 + " the word is ") * 20)[1] == "symbol_ratio"
    rep = "\n".join(["the same exact line of words here again"] * 30)
    assert quality_filter(rep)[1] == "dup_lines"
    nostop = "zzz qqq xxx www vvv mmm nnn kkk " * 10
    assert quality_filter(nostop)[1] == "too_few_stopwords"


def test_repetition_stats():
    from basicocr_ray.core.textstats import repetition_stats

    r = repetition_stats("aaa\nbbb\naaa")
    assert 0 < r["dup_line_frac"] < 1
    assert repetition_stats("x\ny\nz")["dup_line_frac"] == 0.0


def test_normalize_url():
    from basicocr_ray.core.textstats import normalize_url

    assert (
        normalize_url("HTTPS://Example.COM:443/Path/?b=2&a=1&utm_source=x#frag")
        == "https://example.com/Path?a=1&b=2"
    )
    assert normalize_url("http://a.com/p/") == "http://a.com/p"
    assert normalize_url("http://a.com") == "http://a.com/"
    # idempotent
    u = normalize_url("https://X.org/a?z=1&y=2&fbclid=abc")
    assert normalize_url(u) == u


def test_ac_double_array_equivalence():
    """ACDoubleArray (the reference's ACDAT layout, Test.java:58-66) is
    match-for-match equivalent to the pointer automaton — randomized
    pattern sets, unicode phrases, and edge cases."""
    import random

    from basicocr_ray.core.ac import ACAutomaton, ACDoubleArray

    rng = random.Random(7)
    alpha = "abcde"
    for _ in range(60):
        pats = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        ]
        text = "".join(
            rng.choice(alpha + "xyz ") for _ in range(rng.randint(0, 120))
        )
        a, d = ACAutomaton(pats), ACDoubleArray(pats)
        assert sorted(a.find_all(text)) == sorted(d.find_all(text))
        assert a.strip(text) == d.strip(text)

    pats = ["版权所有", "all rights reserved", "cookie 政策", "保留一切权利"]
    text = "正文 版权所有 © cookie 政策 all rights reserved 尾 保留一切权利"
    a, d = ACAutomaton(pats), ACDoubleArray(pats)
    assert sorted(a.find_all(text)) == sorted(d.find_all(text))
    assert a.strip(text) == d.strip(text)
    assert ACDoubleArray([]).strip("abc") == "abc"
    assert ACDoubleArray([""]).find_all("x") == []


def test_ac_stripper_dat_backend():
    """The actor stage accepts backend='dat' and produces identical
    output to the default pointer backend."""
    import pyarrow as pa

    from basicocr_ray.stages.correct import ACStripper

    phrases = ["all rights reserved", "cookie banner"]
    batch = pa.table(
        {
            "main_text": pa.array(
                ["keep all rights reserved this", "cookie banner x", "clean"],
                pa.large_string(),
            )
        }
    )
    out_p = ACStripper(phrases)(batch)["stripped_text"].to_pylist()
    out_d = ACStripper(phrases, backend="dat")(batch)["stripped_text"].to_pylist()
    assert out_p == out_d == ["keep  this", " x", "clean"]


def test_minhash_batch_paths_match_per_doc():
    """signatures_batch / bands_batch are bit-identical to the per-doc
    signature() / bands() paths (including empty and short texts)."""
    import numpy as np

    from basicocr_ray.core.sketches import MinHasher

    mh = MinHasher()
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "ab",
        "the quick brown fox jumps over the lazy cat",
        None,
        "completely different content here with many words",
    ]
    sigs = mh.signatures_batch(texts)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(sigs[i], mh.signature(t or ""))
    bb = mh.bands_batch(sigs, 16)
    for i, t in enumerate(texts):
        want = dict(mh.bands(mh.signature(t or ""), 16))
        got = {b: int(bb[i, b]) for b in range(16)}
        assert got == want


def test_simhash_batch_matches_per_doc():
    import numpy as np

    from basicocr_ray.core.sketches import simhash, simhash_batch

    texts = [
        "the quick brown fox", "", None, "abc",
        "the quick brown fax", "totally different words entirely",
    ]
    got = simhash_batch(texts)
    want = np.array([simhash(t or "") for t in texts], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    got4 = simhash_batch(texts, token_k=3)
    want4 = np.array(
        [simhash(t or "", 3) for t in texts], dtype=np.uint64
    )
    np.testing.assert_array_equal(got4, want4)


def test_canonicalize_url_rules():
    from basicocr_ray.core.textstats import normalize_url as c

    # scheme/host lowering, default-port strip per scheme
    assert c("HTTPS://WWW.X.COM:443/p") == "https://www.x.com/p"
    assert c("http://X.com:80/p") == "http://x.com/p"
    # NON-default ports kept, including cross-scheme defaults
    assert c("http://x.com:443/p") == "http://x.com:443/p"
    assert c("https://x.com:80/p") == "https://x.com:80/p"
    assert c("https://x.com:8080/p") == "https://x.com:8080/p"
    # fragment dropped; bare '?' dropped; params sorted; utm_* removed
    assert c("https://x.com/p#frag") == "https://x.com/p"
    assert c("https://x.com/p?") == "https://x.com/p"
    assert c("https://x.com/p?b=2&A=1&utm_source=s") == "https://x.com/p?A=1&b=2"
    # duplicate keys sort by (key, value); blank values kept
    assert c("https://x.com/p?a=2&a=1&a=") == "https://x.com/p?a=&a=1&a=2"
