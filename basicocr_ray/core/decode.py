"""CTC-style greedy decode: labelled block sequence → main text + spans.

Direct semantic analogue of the reference's greedy CTC collapse
(`/root/reference/contrib/crnn/utils.py:85-89`): walking the frame label
sequence, emit a label iff it is not blank AND not a repeat of the previous
frame ("--hh-e-l-ll-oo" → "hello", documented in
`docs/yangmiao/CRNN/crnn.md:58,66`). Here a frame is a DOM block, "blank"
is keep == False, and a "repeat" is an adjacent kept block with identical
text; emission concatenates block text and records character spans.

Pure per-document functions — no Ray, no batch state.
"""

from __future__ import annotations

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig

BLANK = 0  # reserved blank label, mirroring `utils.py:25-34` (index 0)


def ctc_collapse(labels: list[int], blank: int = BLANK) -> list[int]:
    """Generic integer-sequence greedy collapse (utils.py:85-89 semantics):
    drop blanks and adjacent repeats. `[5,5,0,1] → [5,1]` (the "ea" golden
    of `contrib/crnn/test/test_utils.py:53-56`)."""
    out: list[int] = []
    prev: int | None = None
    for lab in labels:
        if lab != blank and lab != prev:
            out.append(lab)
        prev = lab
    return out


def greedy_decode(
    texts: list[str],
    keeps: list[bool],
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> tuple[str, list[tuple[int, int, int]], int]:
    """Collapse an ordered (text, keep) block sequence into
    ``(main_text, spans, n_blocks_kept)``.

    spans[i] = (start, end, block_id): half-open char range of kept block i
    inside ``main_text`` (the `extracted.spans` column, SURVEY.md §1.2).

    Raises ``ValueError`` on length mismatch — the error path the reference
    asserts in `test_utils.py:59-62`.
    """
    if len(texts) != len(keeps):
        raise ValueError(
            f"texts ({len(texts)}) and keeps ({len(keeps)}) length mismatch"
        )
    parts: list[str] = []
    spans: list[tuple[int, int, int]] = []
    pos = 0
    prev_kept_text: str | None = None
    prev_was_kept = False
    sep = cfg.join_sep
    for block_id, (text, keep) in enumerate(zip(texts, keeps)):
        if not keep:
            prev_was_kept = False  # a blank resets the repeat window
            continue
        if (
            cfg.collapse_adjacent_dups
            and prev_was_kept
            and text == prev_kept_text
        ):
            continue  # adjacent repeat → merged (CTC repeat rule)
        if parts:
            pos += len(sep)
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((start, pos, block_id))
        prev_kept_text = text
        prev_was_kept = True
    return sep.join(parts), spans, len(spans)
