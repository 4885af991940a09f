"""Checkpoint / resume.

The reference has no checkpointing at all (SURVEY §5.4 — no torch.save
anywhere); here the full train state (params, VQ codebooks + c_indices + BN
running stats, optimizer accumulators, step counter) round-trips through a
single .npz archive.  Restore is template-based: leaves are matched by pytree
flatten order against a freshly initialized state, which keeps the format
independent of class definitions and framework versions.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def save_checkpoint(path: str, state: Any, step: int | None = None) -> None:
    leaves = jax.tree.leaves(state)
    arrays = {f"leaf_{i}": np.asarray(a) for i, a in enumerate(leaves)}
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
    """Load into the structure of ``template`` (shapes/dtypes must match)."""
    with np.load(path) as z:
        leaves, treedef = jax.tree.flatten(template)
        loaded = []
        for i, leaf in enumerate(leaves):
            a = z[f"leaf_{i}"]
            if tuple(a.shape) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint leaf {i} shape {a.shape} != template "
                    f"{np.shape(leaf)}"
                )
            loaded.append(a)
        return jax.tree.unflatten(treedef, loaded)
