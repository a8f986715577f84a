"""OAGBert zero-shot evaluation datasets (reference
cogdl/datasets/oagbert_data.py): l0fos / aff30 / arxivvenue.

Raw layout under ``<root>/raw``:
  ._SUCCESS      one candidate label per line (oagbert_data.py:33-40)
  *.jsonl        paper records, one JSON object per line (oagbert_data.py:42-57)

Returns a graph-less Dataset carrying ``candidates`` (list[str]) and
``samples`` ({filename: list[dict]}); the oagbert pipeline scores each paper
against every candidate.
"""

from __future__ import annotations

import json
import os

from .dataset import Dataset


def build(name: str, root: str, **kwargs) -> Dataset:
    raw = os.path.join(root, "raw")
    success = os.path.join(raw, "._SUCCESS")
    if not os.path.exists(success):
        raise FileNotFoundError(
            f"oagbert dataset {name!r}: place ._SUCCESS (candidate list) and "
            f"the *.jsonl sample files under {raw}")
    with open(success) as f:
        candidates = [line.strip() for line in f if line.strip()]
    samples = {}
    for fn in sorted(os.listdir(raw)):
        if not fn.endswith(".jsonl"):
            continue
        with open(os.path.join(raw, fn)) as f:
            samples[fn] = [json.loads(line) for line in f if line.strip()]
    ds = Dataset(name=name, metric="accuracy")
    ds.candidates = candidates
    ds.samples = samples
    return ds
