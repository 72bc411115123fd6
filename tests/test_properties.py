"""Property-based tests (hypothesis) for the pure kernels — the SURVEY §5.2
property level: roundtrips, idempotence, and equivalence laws that guard
distributed correctness without needing a cluster."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from basicocr_ray.config import ExtractConfig
from basicocr_ray.core.ac import ACAutomaton
from basicocr_ray.core.charset import sniff_decode
from basicocr_ray.core.decode import ctc_collapse, greedy_decode
from basicocr_ray.core.normalize import collapse_ws, string_b2q, string_q2b
from basicocr_ray.core.trie import TrieDict
from basicocr_ray.core.vocab import Vocab

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
_vocab = Vocab(ALPHABET)

alpha_text = st.text(alphabet=ALPHABET, max_size=60)
ascii_band = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E), max_size=40
)


@given(st.lists(alpha_text, max_size=8))
def test_vocab_encode_decode_roundtrip(texts):
    codes, lens = _vocab.encode(texts)
    assert _vocab.decode(codes, lens, raw=True) == texts


@given(st.lists(st.integers(min_value=0, max_value=5), max_size=30))
def test_ctc_collapse_matches_spec(seq):
    # independent restatement of utils.py:85-89: emit x_i iff x_i != blank
    # and x_i != x_{i-1} (blank-SEPARATED repeats are kept: [1,0,1] → [1,1])
    want = [
        x for i, x in enumerate(seq) if x != 0 and (i == 0 or seq[i - 1] != x)
    ]
    out = ctc_collapse(seq)
    assert out == want
    assert 0 not in out  # no blanks survive


@given(ascii_band)
def test_width_fold_roundtrip(text):
    assert string_q2b(string_b2q(text)) == text


@given(st.text(max_size=80))
def test_collapse_ws_idempotent(text):
    once = collapse_ws(text)
    assert collapse_ws(once) == once


@given(st.lists(st.tuples(alpha_text.filter(bool), st.booleans()), max_size=10))
def test_greedy_decode_span_integrity(blocks):
    texts = [collapse_ws(t) or "x" for t, _ in blocks]
    keeps = [k for _, k in blocks]
    cfg = ExtractConfig(collapse_adjacent_dups=False)
    main, spans, n = greedy_decode(texts, keeps, cfg)
    assert n == sum(keeps)
    for (s, e, bid) in spans:
        assert main[s:e] == texts[bid]
        assert keeps[bid]


@given(st.text(min_size=1, max_size=200).filter(lambda t: t.strip()))
@settings(max_examples=50)
def test_charset_utf8_roundtrip(text):
    decoded, enc = sniff_decode(text.encode("utf-8"))
    if enc in ("utf-8", "utf-8-sig"):
        assert decoded == text


@st.composite
def dict_and_query(draw):
    words = draw(
        st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=6),
            min_size=1, max_size=8, unique=True,
        )
    )
    query = draw(st.text(alphabet="abcdef", min_size=1, max_size=6))
    return words, query


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(dict_and_query())
@settings(max_examples=80)
def test_trie_search_matches_bruteforce(dq):
    words, query = dq
    trie = TrieDict((w, 1) for w in words)
    for cost in (0, 1, 2):
        got = {(w, d) for w, d, _ in trie.search(query, cost)}
        want = {(w, _lev(query, w)) for w in words if _lev(query, w) <= cost}
        assert got == want


@given(
    st.text(alphabet="xyz ", max_size=60),
    st.text(alphabet="xyz", min_size=2, max_size=4),
)
@settings(max_examples=80)
def test_ac_single_pattern_equals_str_replace(text, pattern):
    ac = ACAutomaton([pattern])
    assert ac.strip(text) == text.replace(pattern, "")


# ---------------------------------------------------------------------------
# Round-2 kernels: PNG / WAV / PDF / FMM property laws
# ---------------------------------------------------------------------------

@given(
    st.integers(1, 12), st.integers(1, 12),
    st.sampled_from([1, 3, 4]), st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    import numpy as np

    from basicocr_ray.core.png import decode_png, encode_png

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()


@given(
    st.integers(1000, 48000),
    st.lists(st.floats(-1.0, 1.0, allow_nan=False), min_size=1, max_size=400),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(rate, samples):
    import numpy as np

    from basicocr_ray.core.wav import decode_wav, encode_wav

    x = np.asarray(samples)
    r2, y = decode_wav(encode_wav(rate, x))
    assert r2 == rate and len(y) == len(x)
    # encode scales by 32767, PCM decode divides by 32768: error bound is
    # |x|/32768 (scale mismatch) + 0.5/32768 (rounding)
    assert np.abs(y - x).max() <= 1.5 / 32768 + 1e-9


@given(st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=40,
    ),
    max_size=6,
))
@settings(max_examples=40, deadline=None)
def test_pdf_text_roundtrip_property(lines):
    from basicocr_ray.core.pdf_text import extract_pdf_text, make_pdf

    # the writer emits one Tj per line; empty lines vanish on extract
    expected = "\n".join(ln for ln in lines if ln)
    assert extract_pdf_text(make_pdf(lines)) == expected


@given(st.lists(st.integers(0, 25), min_size=0, max_size=30))
@settings(max_examples=60, deadline=None)
def test_fmm_bijective_reconstruction_property(token_ids):
    """For any lexicon of 2-char words over DISJOINT characters, FMM
    segmentation of any concatenation recovers the exact word sequence —
    the invariant q40's oracle relies on."""
    from basicocr_ray.core.segment import FmmSegmenter

    words = {i: chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1) for i in range(26)}
    seg = FmmSegmenter(words.values())
    text = "".join(words[i] for i in token_ids)
    assert seg.segment(text) == [words[i] for i in token_ids]


@given(st.text(alphabet="ab", max_size=14))
@settings(max_examples=60, deadline=None)
def test_fmm_covers_input_property(text):
    """Segment output always concatenates back to the input (no loss, no
    duplication) for ANY lexicon, including overlapping entries."""
    from basicocr_ray.core.segment import FmmSegmenter

    seg = FmmSegmenter(["a", "ab", "ba", "aab", "bb"])
    assert "".join(seg.segment(text)) == text


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.binary(max_size=200),
        ),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=80, deadline=None)
def test_warc_roundtrip_property(items):
    """encode→parse is identity for ANY payload bytes — including
    payloads that embed 'WARC/1.0', CRLF pairs, or record terminators
    (Content-Length framing must win over any content sniffing)."""
    from basicocr_ray.sources.warc import encode_warc, parse_warc

    recs = [
        (f"https://h.example/{i}", "2026-01-01T00:00:00Z", payload)
        for i, payload in items
    ]
    back = parse_warc(encode_warc(recs))
    assert [(r["uri"], r["payload"]) for r in back] == [
        (u, p) for u, _, p in recs
    ]
    assert not any(r["_corrupt"] for r in back)
