"""Block scoring: text-density / link-density keep-drop classification.

The recognition-model analogue (SURVEY.md §2 A1/M6): the reference's CRNN
emits a per-frame class distribution and transcription takes the argmax
(`contrib/crnn/crnn_main.py:177-179`); here each block gets a continuous
``score`` (per-frame probability analogue) and a hard ``keep`` label
(argmax analogue) from boilerpipe/trafilatura-class density heuristics.

Decisions depend ONLY on the block itself — never on batch statistics —
so results are invariant under re-batching/partitioning (SURVEY.md §7.4:
the reference's batch-dependent `alignCollate keep_ratio` is the trap we
deliberately avoid).
"""

from __future__ import annotations

from basicocr_ray.config import DEFAULT_CONFIG, ExtractConfig
from basicocr_ray.core.tokenize import Block


def score_values(
    n_chars: int,
    n_tags: int,
    n_link_chars: int,
    cfg: ExtractConfig = DEFAULT_CONFIG,
) -> tuple[float, float, float, bool]:
    """→ (text_density, link_density, score, keep) from raw block stats."""
    link_density = n_link_chars / n_chars if n_chars else 1.0
    text_density = n_chars / (1.0 + n_tags)
    keep = (
        n_chars >= cfg.min_chars
        and link_density <= cfg.max_link_density
        and text_density >= cfg.min_text_density
    )
    # Continuous confidence, only reported (the keep decision is the law).
    score = text_density * (1.0 - link_density)
    return text_density, link_density, score, keep


def score_block(b: Block, cfg: ExtractConfig = DEFAULT_CONFIG) -> tuple[float, float, float, bool]:
    """→ (text_density, link_density, score, keep) for one block."""
    return score_values(b.n_chars, b.n_tags, b.n_link_chars, cfg)


def score_blocks(blocks: list[Block], cfg: ExtractConfig = DEFAULT_CONFIG) -> list[bool]:
    """Hard keep/drop labels for an ordered block sequence."""
    return [score_block(b, cfg)[3] for b in blocks]
