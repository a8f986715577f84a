"""Checkpoint / resume — rebuild of reference save_model/load_model
(cogdl/trainer/trainer_utils.py:53-71) with full training state: parameters,
optimizer state, and step counter (the reference saves weights only — its
"resume" restarts epochs; we restore exactly, SURVEY.md §5)."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    extra: Optional[Dict[str, Any]] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params": _to_host(params),
        "opt_state": None if opt_state is None else _to_host(opt_state),
        "epoch": epoch,
        "extra": extra or {},
        "format": 1,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_embedding(path: str, emb: np.ndarray):
    """Reference embed_trainer save_embedding (.npy)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path, np.asarray(emb))


def load_embedding(path: str) -> np.ndarray:
    return np.load(path)
