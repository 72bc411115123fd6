"""Pipeline configuration.

The single source of truth for every threshold and separator that affects
extracted bytes. Both the single-doc oracle (`core.oracle.extract_one`) and
the distributed stages import THIS object, so byte-identity under
distribution is structural, not accidental (SURVEY.md §7.4: no per-batch
adaptive behavior — every decision depends only on the document itself).

Reference analogue: the pluggable alphabet / flags surface of the reference
(`contrib/crnn/keys.py:2-5`, `contrib/crnn/crnn_main.py:27-51`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    """Knobs for HTML → main-content extraction.

    All comparisons are exact and order-free so results are independent of
    batch boundaries and partitioning.
    """

    # --- scoring (the CRNN-scorer analogue, heuristics only) ---
    min_chars: int = 10            # blocks shorter than this are "blank" frames
    max_link_density: float = 0.35  # n_link_chars / n_chars above this → drop
    min_text_density: float = 0.0   # n_chars / (1 + n_tags) below this → drop

    # --- decode (CTC greedy collapse, utils.py:85-89 analogue) ---
    join_sep: str = "\n\n"         # separator between kept blocks
    collapse_adjacent_dups: bool = True  # drop adjacent identical kept blocks

    # --- tokenize ---
    collapse_whitespace: bool = True  # browser-like ws folding inside a block

    # --- optional correction post-pass (A2/A3 chained into the
    #     flagship flow: the reference's detect→recognize→CORRECT
    #     dataflow — Test.java:58-82 strip, trietree_correct.py:245-274
    #     correct — runs inside the driver flow, not beside it) ---
    correct: bool = False          # enable AC-strip + trie-correct stages
    correct_max_cost: int = 1      # bounded edit distance for the trie

    # --- partitioning / lineage ---
    num_partitions: int = 32       # partition_id = hash(url) % num_partitions

    # --- skew handling (SURVEY §4: alignCollate keep_ratio hazard) ---
    oversize_bytes: int = 1 << 20  # html larger than this goes to the big-doc branch
    # None = whole-block batches: lets Ray fuse read→extract→spill into
    # ONE operator (no object-store handoff, measured +10% at 8 CPUs);
    # per-task working set stays bounded by the adaptive generator's
    # byte-based yield regardless of batch size. Set an int to pin a
    # row-count batch (the invariance tests do).
    batch_size_small: int | None = None
    batch_size_big: int = 8


DEFAULT_CONFIG = ExtractConfig()

# Tag sets for the tokenizer. Frozen so identical across workers.
BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th
    article section header footer nav aside main blockquote pre br hr body
    html head title figure figcaption form fieldset address center""".split()
)

# Content under these tags is structurally boilerplate: dropped entirely.
DROP_TAGS = frozenset(
    """nav header footer aside form title head figure figcaption iframe
    noscript button select option label svg canvas video audio object
    applet map area""".split()
)

# Raw-text elements: contents are not HTML; skip to the closing tag.
RAW_TEXT_TAGS = frozenset(("script", "style", "textarea"))

# Void elements never push the open-tag stack.
VOID_TAGS = frozenset(
    "br hr img input meta link base col embed source track wbr area param".split()
)
