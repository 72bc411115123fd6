"""Text analysis kernels: tokenization, character classes, language ID,
quality scoring, fingerprinting.

Character-class predicates re-express the reference's code-point range
tests (`/root/reference/contrib/trietree/src/trietree_correct.py:21-43`:
`is_chinese`/`is_alphabet`/`is_number`/`is_other`) and the segmentation of
strings into homogeneous runs (`string2List`, `:74-91`). Language ID and
quality scoring are the n-gram/stopword heuristics a training-data pipeline
needs (task brief) — public-knowledge heuristics, no external models.
"""

from __future__ import annotations

import hashlib
import re

# Whitespace tokenization — the contract shared with the DuckDB oracle
# (`regexp_split_to_array(text, '\s+')`). Lowercasing is the caller's choice.
_WS_SPLIT_RE = re.compile(r"\s+")

# Run segmentation (string2List analogue): CJK | latin word | digits.
_RUN_RE = re.compile(r"([一-鿿]+)|([A-Za-z]+)|([0-9]+)")

_PUNCT_RE = re.compile(r"[.,;:!?'\"()\[\]{}\-—…。，；：！？、]")


def ws_tokens(text: str, lower: bool = True) -> list[str]:
    """Whitespace tokens, empty strings removed (matches the oracle SQL
    `regexp_split_to_array(lower(text),'\\s+')` minus empties)."""
    if lower:
        text = text.lower()
    return [t for t in _WS_SPLIT_RE.split(text) if t]


_ALPHA_RE = re.compile(r"[a-z]")
_ALNUM_RE = re.compile(r"[a-z0-9]")


def gopher_counts(
    text: str, stopwords: tuple[str, ...] | frozenset[str]
) -> tuple[int, int, int, int, int]:
    """Integer evidence for Gopher-style quality rules (Rae et al. 2021
    Table A1): (n_words, sum_word_len, n_alpha_words, n_no_alnum_words,
    n_stopwords) over lowercased whitespace tokens. Every downstream
    ratio threshold is a cross-multiplied integer comparison — no float
    ratio anywhere, so the rule vector is hashable and SQL-twinnable."""
    toks = text.lower().split()
    n = len(toks)
    s = sum(len(x) for x in toks)
    a = sum(1 for x in toks if _ALPHA_RE.search(x))
    z = sum(1 for x in toks if not _ALNUM_RE.search(x))
    st = sum(1 for x in toks if x in stopwords)
    return n, s, a, z, st


def gopher_keep(
    n: int, s: int, a: int, z: int, st: int,
    min_words: int = 50, max_words: int = 100000,
) -> bool:
    """The Gopher rule vector on `gopher_counts` evidence: word count in
    [min,max], mean word length in [3,10] (3n ≤ Σlen ≤ 10n), ≤10%
    no-alphanumeric words, ≥80% words containing a letter, ≥2 stopwords."""
    return (
        min_words <= n <= max_words
        and 3 * n <= s <= 10 * n
        and 10 * z <= n
        and 5 * a >= 4 * n
        and st >= 2
    )


def char_runs(text: str) -> list[str]:
    """Segment into runs of CJK / alphabetic / numeric chars, dropping
    "other" chars (`string2List`, trietree_correct.py:74-91)."""
    out: list[str] = []
    for m in _RUN_RE.finditer(text):
        out.append(m.group(0))
    return out


def is_chinese(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def is_alphabet(ch: str) -> bool:
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z")


def is_number(ch: str) -> bool:
    return "0" <= ch <= "9"


def is_other(ch: str) -> bool:
    return not (is_chinese(ch) or is_alphabet(ch) or is_number(ch))


# ---------------------------------------------------------------------------
# Language identification — closed-set heuristic {en, de, es, zh, ja, other}.
# Signals: CJK/kana character fractions, then per-language stopword hits.
# ---------------------------------------------------------------------------

_STOPWORDS = {
    "en": frozenset("the a of to and in is it you that was for on are".split()),
    "de": frozenset("der die das und ist nicht ein ich sie mit auf für den".split()),
    "es": frozenset("el la de que y en un los se no por las una es".split()),
}
ALL_STOPWORDS = frozenset().union(*_STOPWORDS.values())


def lang_id(text: str) -> str:
    if not text:
        return "other"
    n = len(text)
    n_cjk = sum(1 for c in text if "一" <= c <= "鿿")
    n_kana = sum(1 for c in text if "぀" <= c <= "ヿ")
    if n_kana / n > 0.05:
        return "ja"
    if n_cjk / n > 0.25:
        return "zh"
    toks = ws_tokens(text)
    if not toks:
        return "other"
    scores = {
        lang: sum(1 for t in toks if t in sw) for lang, sw in _STOPWORDS.items()
    }
    # deterministic tie-break: max hits, then language name
    best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    return best[0] if best[1] > 0 else "other"


# ---------------------------------------------------------------------------
# Quality scoring — length / punctuation / stopword ratios (task brief).
# ---------------------------------------------------------------------------

def quality_stats(text: str) -> dict[str, float]:
    toks = ws_tokens(text)
    n_tok = len(toks)
    n_stop = sum(1 for t in toks if t in _STOPWORDS["en"])
    n_punct = len(_PUNCT_RE.findall(text))
    n_chars = len(text)
    mean_tok = (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_stop": n_stop,
        "stop_ratio": (n_stop / n_tok) if n_tok else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "mean_token_len": mean_tok,
    }


def quality_score(text: str) -> float:
    """Composite [0,1] quality score — monotone in length (saturating),
    penalized for extreme punctuation / token-length pathologies."""
    s = quality_stats(text)
    length_part = min(1.0, s["n_tokens"] / 100.0)
    punct_part = 1.0 if s["punct_ratio"] <= 0.2 else max(0.0, 1.0 - (s["punct_ratio"] - 0.2) * 4)
    tok_part = 1.0 if 2.0 <= s["mean_token_len"] <= 12.0 else 0.5
    return round(length_part * punct_part * tok_part, 6)


# ---------------------------------------------------------------------------
# Web-corpus quality filters (public-practice rules in the C4 / Gopher
# family: Raffel et al. 2020; Rae et al. 2021 — thresholds are the
# commonly-published ones, all overridable).
# ---------------------------------------------------------------------------

def repetition_stats(text: str) -> dict[str, float]:
    """Duplicate-line and duplicate-paragraph fractions (char-weighted)."""
    lines = [l for l in text.split("\n") if l.strip()]
    paras = [p for p in text.split("\n\n") if p.strip()]

    def dup_char_frac(parts: list[str]) -> float:
        if not parts:
            return 0.0
        seen: set[str] = set()
        dup_chars = 0
        total = 0
        for p in parts:
            total += len(p)
            if p in seen:
                dup_chars += len(p)
            seen.add(p)
        return dup_chars / total if total else 0.0

    return {
        "dup_line_frac": dup_char_frac(lines),
        "dup_para_frac": dup_char_frac(paras),
    }


def quality_filter(
    text: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_dup_line_frac: float = 0.30,
    min_stop_hits: int = 2,
) -> tuple[bool, str]:
    """→ (keep, reason). First failing rule names the reason (''==kept).

    Gopher-style document filter: word-count window, mean word length
    window, symbol (#/…) ratio, duplicate-line fraction, and the ≥2
    stopwords heuristic."""
    toks = ws_tokens(text)
    n = len(toks)
    if n < min_words:
        return False, "too_few_words"
    if n > max_words:
        return False, "too_many_words"
    mean_len = sum(len(t) for t in toks) / n
    if not (min_mean_word_len <= mean_len <= max_mean_word_len):
        return False, "mean_word_len"
    n_sym = text.count("#") + text.count("…") + text.count("�")
    if n_sym / max(1, len(text)) > max_symbol_ratio:
        return False, "symbol_ratio"
    if repetition_stats(text)["dup_line_frac"] > max_dup_line_frac:
        return False, "dup_lines"
    if sum(1 for t in toks if t in ALL_STOPWORDS) < min_stop_hits:
        return False, "too_few_stopwords"
    return True, ""


# ---------------------------------------------------------------------------
# URL normalization — canonical key for url-based dedup/partitioning.
# ---------------------------------------------------------------------------

_TRACKING_PARAMS = frozenset(
    "utm_source utm_medium utm_campaign utm_term utm_content gclid fbclid "
    "ref referrer mc_cid mc_eid".split()
)


def normalize_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme/host, strip default
    ports, drop fragments and tracking params, sort remaining query params,
    collapse trailing slash on bare paths."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    for port, sch in ((":80", "http"), (":443", "https")):
        if host.endswith(port) and scheme == sch:
            host = host[: -len(port)]
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k.lower() not in _TRACKING_PARAMS
    ]
    q.sort()
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path[:-1]
    return urlunsplit((scheme, host, path, urlencode(q), ""))


# ---------------------------------------------------------------------------
# Fingerprints.
# ---------------------------------------------------------------------------

def md5_hex(text: str) -> str:
    """Exact content fingerprint — matches DuckDB `md5(text)`."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def md5_low64(s: str) -> int:
    """md5 lower-64 bits, little-endian of digest[8:] — EXACTLY DuckDB's
    `md5_number_lower`, so any sketch/weight table built on it is
    SQL-reconstructible (the q109/q117/q122/q123/q128/q129 audit
    discipline)."""
    import struct

    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:])[0]


def hashed_linear_score(tokens, weights) -> int:
    """Hashed-feature linear-model inference kernel (the fastText-style
    quality gate, q129 / spec `quality_gate`): tokens hash into
    len(weights) buckets via the DuckDB-exact `md5_low64`, score =
    Σ weights[bucket] as an exact int. Single-sourced so the oracle
    query and the spec op can never drift."""
    b = len(weights)
    return int(sum(weights[md5_low64(tok) % b] for tok in tokens))


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Winnowing-style document fingerprint: min of rolling hashes over
    ``window``-byte windows (Karp–Rabin rolling hash, Schleimer et al.
    winnowing). Deterministic; returns 0 for short texts."""
    data = text.encode("utf-8")
    if len(data) < window:
        data = data + b"\x00" * (window - len(data))
    h = 0
    power = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    best = None
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % _ROLL_MOD
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
        if i >= window - 1:
            best = h if best is None else min(best, h)
    return best or 0
