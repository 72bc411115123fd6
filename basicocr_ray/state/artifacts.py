"""Checkpoint artifacts with partial-merge load (SURVEY §2 S8).

The reference resumes training by loading a checkpoint state-dict and
merging only the keys present in both the model and the file
(`contrib/crnn/crnn_main.py:104-116`, partial load; legacy converter
`tool/convert_t7.py:115-143`). Engine analogue: pipeline/scorer parameter
artifacts saved as JSON, loaded with the same partial-merge semantics —
unknown keys in the artifact are ignored, missing keys keep defaults —
so an old checkpoint keeps working after the config grows a field."""

from __future__ import annotations

import json
import os


def save_artifact(path: str, params: dict) -> None:
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(params, f, sort_keys=True)
    os.replace(tmp, path)  # atomic, like the manifest publish


def load_artifact_partial(path: str, defaults: dict) -> dict:
    """defaults ∪ (artifact ∩ defaults-keys): the crnn_main.py:104-116
    partial state-dict merge, for plain parameter dicts."""
    out = dict(defaults)
    if not os.path.exists(path):
        return out
    with open(path) as f:
        stored = json.load(f)
    for k in defaults:
        if k in stored:
            out[k] = stored[k]
    return out
