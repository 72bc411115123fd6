"""Wave-99 operator pins: suffix automaton, Booth rotation, Manacher."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def brute_distinct_substrings(s):
    return len({s[i:j] for i in range(len(s)) for j in range(i + 1, len(s) + 1)})


def test_sam_known():
    from basicocr_ray.pipelines.queries import sam_distinct_substrings

    assert sam_distinct_substrings("aaa") == 3  # a, aa, aaa
    assert sam_distinct_substrings("abab") == 7
    assert sam_distinct_substrings("a") == 1
    assert sam_distinct_substrings("") == 0


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abc", max_size=25))
def test_sam_fuzz(s):
    from basicocr_ray.pipelines.queries import sam_distinct_substrings

    assert sam_distinct_substrings(s) == brute_distinct_substrings(s)


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=20))
def test_booth_fuzz(s):
    from basicocr_ray.pipelines.queries import booth_min_rotation

    rots = [(s[k:] + s[:k], k) for k in range(len(s))]
    exp = min(rots)  # min rotation, least shift on ties
    k = booth_min_rotation(s)
    assert (s[k:] + s[:k], k) == exp


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abc", min_size=1, max_size=25))
def test_manacher_fuzz(s):
    from basicocr_ray.pipelines.queries import manacher_longest_palindrome

    pals = [
        (len(s[i:j]), i, s[i:j])
        for i in range(len(s))
        for j in range(i + 1, len(s) + 1)
        if s[i:j] == s[i:j][::-1]
    ]
    best = max(pals, key=lambda t: (t[0], -t[1]))  # longest, leftmost
    assert manacher_longest_palindrome(s) == best[2]


def test_manacher_known():
    from basicocr_ray.pipelines.queries import manacher_longest_palindrome

    assert manacher_longest_palindrome("babad") == "bab"  # leftmost
    assert manacher_longest_palindrome("cbbd") == "bb"
    assert manacher_longest_palindrome("abc") == "a"
    assert manacher_longest_palindrome("") == ""
