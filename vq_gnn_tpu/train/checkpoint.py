"""Checkpoint / resume.

The reference has no checkpointing at all (SURVEY §5.4 — no torch.save
anywhere); here the full train state (params, VQ codebooks + c_indices + BN
running stats, optimizer accumulators, step counter) round-trips through a
single .npz archive.  Leaves are keyed by their pytree *path* (via
``jax.tree_util.keystr``), so restore matches by name: reordering fields in a
dataclass or adding new leaves does not silently corrupt old checkpoints —
missing/extra names raise with the offending paths listed.  Archives written
by the old flatten-order format (``leaf_<i>`` keys) still restore.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def _named_leaves(tree: Any):
    """[(path-string, leaf)] in flatten order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def save_checkpoint(path: str, state: Any, step: int | None = None) -> None:
    arrays = {}
    for name, leaf in _named_leaves(state):
        key = "leaf:" + name
        if key in arrays:
            raise ValueError(f"duplicate pytree path {name!r}")
        arrays[key] = np.asarray(leaf)
    if step is not None:
        arrays["__step__"] = np.asarray(step)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_step(path: str) -> int:
    with np.load(path) as z:
        return int(z["__step__"]) if "__step__" in z else 0


def restore_checkpoint(path: str, template: Any) -> Any:
    """Load into the structure of ``template``.

    Leaves are matched by pytree path (shape/dtype of each must match);
    legacy order-keyed archives are matched by flatten order.
    """
    with np.load(path) as z:
        named = _named_leaves(template)
        treedef = jax.tree.structure(template)
        legacy = "leaf_0" in z.files and not any(
            k.startswith("leaf:") for k in z.files
        )
        if legacy:
            picked = [z[f"leaf_{i}"] for i in range(len(named))]
        else:
            have = {k for k in z.files if k.startswith("leaf:")}
            want = {"leaf:" + name for name, _ in named}
            if have != want:
                missing = sorted(want - have)
                extra = sorted(have - want)
                raise ValueError(
                    f"checkpoint/template leaf mismatch: missing={missing[:5]} "
                    f"extra={extra[:5]} (of {len(missing)}/{len(extra)})"
                )
            picked = [z["leaf:" + name] for name, _ in named]
        loaded = []
        for a, (name, leaf) in zip(picked, named):
            if tuple(a.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint leaf {name!r} shape {a.shape} != template "
                    f"{np.shape(leaf)}"
                )
            loaded.append(a)
        return jax.tree.unflatten(treedef, loaded)
