"""Static-shape padded mini-batches.

XLA compiles one program per shape, so every batch is padded to bucketed
sizes: batch nodes to ``B_pad``, 1-hop boundary nodes to ``Bp_pad``, edges to
``E_pad``.  Padding conventions (enforced here, relied on everywhere):

- padded node slots carry the **dustbin id N** (features row N is zero, VQ
  scatters land in the dustbin row of ``c_indices``);
- padded edges are sentinels ``row = col = dim_pad, val = 0``;
- boolean masks ``valid_B`` / ``valid_fo`` gate all batch statistics.

Local node numbering inside a batch: batch nodes occupy [0, B_pad) (real ones
first), boundary (B') nodes occupy [B_pad, B_pad + Bp_pad).  This mirrors the
reference's ``subset = [B || B']`` layout (``dataloader.py v2:119-128``) with
static offsets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from vq_gnn_tpu.ops.spmm import Edges


class PaddedBatch(struct.PyTreeNode):
    batch_idx: jnp.ndarray  # [B_pad] int32 global node ids (pad -> N)
    fo_ids: jnp.ndarray  # [Bp_pad] int32 global 1-hop boundary ids (pad -> N)
    valid_B: jnp.ndarray  # [B_pad] bool
    valid_fo: jnp.ndarray  # [Bp_pad] bool
    edges: Edges  # local numbering, num_rows = B_pad + Bp_pad
    num_B: jnp.ndarray  # scalar int32 (actual batch size)
    y: Optional[jnp.ndarray] = None  # [B_pad] int32 or [B_pad, C] float32
    train_mask: Optional[jnp.ndarray] = None  # [B_pad] bool
    # v1 "B+M" formulation: deg_inv of batch rows for mapper self-loops
    deg_inv_B: Optional[jnp.ndarray] = None

    @property
    def B_pad(self) -> int:
        return self.batch_idx.shape[0]

    @property
    def Bp_pad(self) -> int:
        return self.fo_ids.shape[0]


def round_up(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def build_padded_batch(
    node_idx: np.ndarray,
    fo_ids: np.ndarray,
    edge_row: np.ndarray,  # local indices: batch rows < len(node_idx),
    edge_col: np.ndarray,  # boundary ids offset by len(node_idx)
    edge_val: np.ndarray,
    num_N: int,
    B_pad: int,
    Bp_pad: int,
    E_pad: int,
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    deg_inv_B: Optional[np.ndarray] = None,
    with_transpose: bool = True,
) -> PaddedBatch:
    """Pad a host-built subgraph batch to static shapes.

    Inputs use a compact local numbering where boundary node j is
    ``len(node_idx) + j``; this function shifts boundary indices to the
    static offset ``B_pad`` and pads everything.
    """
    B, Bp, E = len(node_idx), len(fo_ids), len(edge_row)
    if B > B_pad or Bp > Bp_pad or E > E_pad:
        raise ValueError(
            f"batch exceeds pad sizes: B={B}/{B_pad} Bp={Bp}/{Bp_pad} E={E}/{E_pad}"
        )
    dim_pad = B_pad + Bp_pad

    def pad_ids(ids, size):
        out = np.full(size, num_N, np.int32)
        out[: len(ids)] = ids
        return out

    # shift boundary-local indices from B to B_pad
    def shift(a):
        a = np.asarray(a, np.int64)
        return np.where(a >= B, a - B + B_pad, a).astype(np.int32)

    row = np.full(E_pad, dim_pad, np.int32)
    col = np.full(E_pad, dim_pad, np.int32)
    val = np.zeros(E_pad, np.float32)
    r, c = shift(edge_row), shift(edge_col)
    order = np.argsort(r, kind="stable")
    row[:E], col[:E], val[:E] = r[order], c[order], np.asarray(edge_val, np.float32)[order]
    tperm = np.argsort(col, kind="stable").astype(np.int32) if with_transpose else None

    valid_B = np.zeros(B_pad, bool)
    valid_B[:B] = True
    valid_fo = np.zeros(Bp_pad, bool)
    valid_fo[:Bp] = True

    def pad_rows(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.full((B_pad,) + a.shape[1:], fill, a.dtype)
        out[:B] = a
        return out

    return PaddedBatch(
        batch_idx=jnp.asarray(pad_ids(node_idx, B_pad)),
        fo_ids=jnp.asarray(pad_ids(fo_ids, Bp_pad)),
        valid_B=jnp.asarray(valid_B),
        valid_fo=jnp.asarray(valid_fo),
        edges=Edges(
            row=jnp.asarray(row),
            col=jnp.asarray(col),
            val=jnp.asarray(val),
            tperm=None if tperm is None else jnp.asarray(tperm),
            num_rows=dim_pad,
        ),
        num_B=jnp.asarray(B, jnp.int32),
        y=None if y is None else jnp.asarray(pad_rows(y)),
        train_mask=None if train_mask is None else jnp.asarray(pad_rows(train_mask, False)),
        deg_inv_B=None if deg_inv_B is None else jnp.asarray(pad_rows(deg_inv_B, 0.0)),
    )
