"""Wave-108 operator pins: Fibonacci hashing, LCS/indel, trie sizing."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def test_fibonacci_spreads_sequential_keys():
    from basicocr_ray.pipelines.queries import _FIB64

    fib = [((k * _FIB64) % (1 << 64)) >> 54 for k in range(500)]
    naive = [k % 1024 for k in range(500)]
    from collections import Counter

    # sequential keys: both are collision-free here, but Fibonacci
    # must spread them across the bucket RANGE, not a dense prefix
    assert max(Counter(fib).values()) <= 2
    assert max(fib) > 900 and min(fib) < 100
    assert max(naive) == 499  # naive stays in the dense prefix


def brute_lcs(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def f(i, j):
        if i == 0 or j == 0:
            return 0
        if a[i - 1] == b[j - 1]:
            return f(i - 1, j - 1) + 1
        return max(f(i - 1, j), f(i, j - 1))

    return f(len(a), len(b))


@settings(max_examples=60, deadline=None)
@given(
    a=st.text(alphabet="abcd", max_size=14),
    b=st.text(alphabet="abcd", max_size=14),
)
def test_lcs_fuzz(a, b):
    from basicocr_ray.pipelines.queries import lcs_len

    assert lcs_len(a, b) == brute_lcs(a, b)


def test_trie_vs_radix_counts():
    """tokens {cat, car, dog}: trie prefixes c,ca,cat,car,d,do,dog = 7;
    radix keeps ca (branch), cat, car, dog (terminals) = 4."""
    tokens = {"cat", "car", "dog"}
    prefixes = {}
    for tok in tokens:
        for k in range(1, len(tok) + 1):
            p = tok[:k]
            nxt = tok[k] if k < len(tok) else ""
            prefixes.setdefault(p, set()).add(nxt)
    n_trie = len(prefixes)
    n_radix = sum(
        1
        for p, nxt in prefixes.items()
        if p in tokens or len(nxt - {""}) >= 2
    )
    assert n_trie == 7
    assert n_radix == 4
