"""GAT edge attention — the SDDMM side of the reference's OurGATConv.

Reference semantics (``vq_gnn_v2/convs.py:165-266`` + ``utils/vq_softmax.py``):

- per-node attention logits ``alpha_l = sum(x * att_l, -1)``,
  ``alpha_r = sum(x * att_r, -1)`` over the (in_channels+1)-wide input that
  already carries the appended ones column;
- "Trick 1": both are divided by the global explosion guard
  ``scale = sqrt(max(alpha_l)^2 + 1) * sqrt(max(alpha_r)^2 + 1)``;
- per-edge weight is the **unnormalized exponential**
  ``exp(leaky_relu(alpha_l[src] + alpha_r[dst]))`` (vq_softmax returns bare
  exp — no max subtraction, no sum normalization, ``vq_softmax.py:38-57``);
- "Trick 2": multiplied by the row-normalized adjacency value injected by
  PyG as ``edge_weight`` (``convs.py v2:264``).

Normalization happens later in the model via the ones column
(``models.py v2:187-189``).  Convention: adj_t layout, row = dst, col = src;
``alpha_j`` in PyG is the source (col) and ``alpha_i`` the destination (row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_logits(x, att_l, att_r):
    """Per-node logits for heads=1: x [n, C], att_* [C] -> ([n], [n])."""
    return x @ att_l, x @ att_r


def explosion_scale(alpha_l, alpha_r, valid=None):
    """Trick 1 scale. ``valid`` masks padded rows out of the global max."""
    if valid is not None:
        neg = jnp.float32(-jnp.inf)
        ml = jnp.max(jnp.where(valid, alpha_l, neg))
        mr = jnp.max(jnp.where(valid, alpha_r, neg))
    else:
        ml, mr = jnp.max(alpha_l), jnp.max(alpha_r)
    return jnp.sqrt(ml**2 + 1.0) * jnp.sqrt(mr**2 + 1.0)


def gat_edge_values(row, col, adj_val, alpha_l, alpha_r, negative_slope=0.2):
    """Unnormalized-exp attention times the normalized adjacency value."""
    a = jnp.take(alpha_l, col, mode="clip") + jnp.take(alpha_r, row, mode="clip")
    a = jax.nn.leaky_relu(a, negative_slope)
    return jnp.exp(a) * adj_val
