"""Sparse matrix-times-dense-matrix (SpMM) for graph aggregation.

This is the hot op of every conv forward/backward (reference bottoms out in
``torch_sparse::spmm`` via PyG's ``message_and_aggregate``, ``convs.py v2:95``).
TPU-native design:

- Edge list is COO, **sorted by destination row**, padded to a static bucket
  size with sentinel ``row = col = num_rows`` and ``val = 0`` (XLA clamps the
  out-of-bounds gather; the zero value kills the contribution, and the
  sentinel lands in a dustbin segment that is sliced off).
- Forward: gather + ``segment_sum`` with ``indices_are_sorted=True``.
- Backward: a custom VJP that is itself an SpMM over the transpose.  The
  batch can carry ``tperm`` (a host-precomputed permutation sorting edges by
  source col) so the transposed segment_sum also runs on sorted segments.
- ``d val`` (needed for GAT attention) is an SDDMM: ``sum(g[row] * x[col])``.
  XLA dead-code-eliminates it when the caller doesn't differentiate wrt val.

An optional Pallas row-block kernel can be slotted in behind the same
interface (``spmm_backend='pallas'``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


class Edges(struct.PyTreeNode):
    """A padded, row-sorted COO edge list over a local node numbering."""

    row: jnp.ndarray  # [E_pad] int32, ascending; padding rows = num_rows
    col: jnp.ndarray  # [E_pad] int32; padding cols = num_rows
    val: jnp.ndarray  # [E_pad] float32; padding vals = 0
    # Permutation sorting edges by col (for the transposed/backward SpMM).
    tperm: Optional[jnp.ndarray] = None  # [E_pad] int32
    num_rows: int = struct.field(pytree_node=False, default=0)


def _segment_matvec(row, col, val, x, num_rows, sorted_rows):
    msgs = jnp.take(x, col, axis=0, mode="clip") * val[:, None]
    out = jax.ops.segment_sum(
        msgs, row, num_segments=num_rows + 1, indices_are_sorted=sorted_rows
    )
    return out[:num_rows]


@jax.custom_vjp
def spmm(edges: Edges, x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_e 1[row_e == r] * val_e * x[col_e]  ->  [num_rows, D]."""
    return _segment_matvec(edges.row, edges.col, edges.val, x, edges.num_rows, True)


def _spmm_fwd(edges: Edges, x: jnp.ndarray):
    return spmm(edges, x), (edges, x)


def _spmm_bwd(res, g):
    edges, x = res
    num_cols = x.shape[0]
    if edges.tperm is not None:
        t_row = jnp.take(edges.col, edges.tperm)
        t_col = jnp.take(edges.row, edges.tperm)
        t_val = jnp.take(edges.val, edges.tperm)
        dx = _segment_matvec(t_row, t_col, t_val, g, num_cols, True)
    else:
        dx = _segment_matvec(edges.col, edges.row, edges.val, g, num_cols, False)
    # SDDMM for d val (only materialized if the caller needs grads wrt val).
    dval = jnp.sum(
        jnp.take(g, edges.row, axis=0, mode="clip")
        * jnp.take(x, edges.col, axis=0, mode="clip"),
        axis=-1,
    )
    d_edges = Edges(
        row=jnp.zeros_like(edges.row),
        col=jnp.zeros_like(edges.col),
        val=dval,
        tperm=None if edges.tperm is None else jnp.zeros_like(edges.tperm),
        num_rows=edges.num_rows,
    )
    return d_edges, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def make_edges(row, col, val, num_rows, with_transpose: bool = True) -> Edges:
    """Host-side helper: sort by row, attach the col-sorting permutation."""
    import numpy as np

    row = np.asarray(row, dtype=np.int32)
    col = np.asarray(col, dtype=np.int32)
    val = np.asarray(val, dtype=np.float32)
    order = np.argsort(row, kind="stable")
    row, col, val = row[order], col[order], val[order]
    tperm = np.argsort(col, kind="stable").astype(np.int32) if with_transpose else None
    return Edges(
        row=jnp.asarray(row),
        col=jnp.asarray(col),
        val=jnp.asarray(val),
        tperm=None if tperm is None else jnp.asarray(tperm),
        num_rows=int(num_rows),
    )
