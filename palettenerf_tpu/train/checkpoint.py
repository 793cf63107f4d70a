"""Checkpoint save/load with the reference's policy surface.

Mirrors ``nerf/utils.py:1083-1205``: per-epoch rolling checkpoints (keep
``max_keep_ckpt``), a separate best checkpoint holding EMA-averaged weights, autoload
policies ``latest`` / ``latest_model`` / ``best`` / ``scratch`` / explicit path, and
cross-stage non-strict loads (NeRF -> Palette warm start by param-name intersection,
``palette/utils.py:1306-1330``).

Format: a single pickle of numpy-ified pytrees — simple, dependency-free, and
orbax-compatible trees (dicts/lists/arrays) should we switch to async orbax later.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: str,
    name: str,
    epoch: int,
    global_step: int,
    params,
    state: Optional[Dict[str, Any]] = None,
    max_keep: int = 2,
    best: bool = False,
) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "global_step": global_step,
        "params": _to_numpy(params),
    }
    if state:
        payload.update({k: _to_numpy(v) for k, v in state.items()})

    if best:
        path = os.path.join(ckpt_dir, f"{name}.ckpt")
    else:
        path = os.path.join(ckpt_dir, f"{name}_ep{epoch:04d}.ckpt")
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    if not best:
        olds = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")))
        for p in olds[:-max_keep]:
            os.remove(p)
    return path


def latest_checkpoint(ckpt_dir: str, name: str) -> Optional[str]:
    paths = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")))
    return paths[-1] if paths else None


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def merge_params_non_strict(target, source) -> tuple:
    """Copy source leaves into target wherever the (path, shape) matches.

    Replacement for torch's ``load_state_dict(strict=False)`` used for the NeRF->Palette
    warm start. Returns (merged, missing_paths, loaded_paths).
    """
    loaded, missing = [], []

    def walk(t, s, path):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if isinstance(s, dict) and k in s:
                    out[k] = walk(v, s[k], path + (k,))
                else:
                    missing.append("/".join(map(str, path + (k,))))
                    out[k] = v
            return out
        if isinstance(t, (list, tuple)):
            out = []
            for i, v in enumerate(t):
                if isinstance(s, (list, tuple)) and i < len(s):
                    out.append(walk(v, s[i], path + (i,)))
                else:
                    missing.append("/".join(map(str, path + (i,))))
                    out.append(v)
            return type(t)(out) if isinstance(t, tuple) else out
        # leaf
        if s is not None and getattr(s, "shape", None) == getattr(t, "shape", None):
            loaded.append("/".join(map(str, path)))
            return np.asarray(s)
        missing.append("/".join(map(str, path)))
        return t

    merged = walk(target, source, ())
    return merged, missing, loaded
