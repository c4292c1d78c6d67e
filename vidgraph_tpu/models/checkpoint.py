"""Model checkpointing: save/load parameter pytrees.

The reference has no model state at all (everything was served over HTTP);
this framework owns in-process models, so weights must round-trip.  A flat
``.npz`` format keeps zero extra dependencies; keys are '/'-joined pytree
paths so any params dict (ViT flax params, captioner plain-dict params)
round-trips exactly.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def _flatten(params: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params(params: Any, path: str) -> str:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, **_flatten(params))
    return str(p)


def load_params(template: Any, path: str) -> Any:
    """Load into the structure of ``template`` (shapes must match)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_elems, leaf in leaves:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx)
                       for p in path_elems)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter: {key}")
        arr = flat[key]
        if arr.shape != np.asarray(leaf).shape:
            raise ValueError(f"shape mismatch for {key}: checkpoint "
                             f"{arr.shape} vs template "
                             f"{np.asarray(leaf).shape}")
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), new_leaves)
