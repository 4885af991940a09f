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


NEGATIVE_SLOPE = 0.2  # PyG GATConv default, reference convs.py v2:131


@jax.custom_vjp
def gat_ell_values(edges, alpha_l, alpha_r):
    """Slot-ELL attention edge values, forward AND transposed layout at once.

    The transposed value of an edge equals its forward value, so ``ev_t`` is a
    single permutation gather of ``ev`` via the host-precomputed position map
    ``edges.t_from_f`` — no second logit-gather/exp pass.  The custom backward
    reduces d_alpha with *sorted* segment-sums in both layouts (ell_row and
    t_ell_row are ascending), avoiding the unsorted scatter-adds jax AD would
    emit for the ``jnp.take``s.  Replaces the reference's per-edge
    ``vq_softmax``+``edge_weight`` message (convs.py v2:252-266).
    """
    ev, ev_t, _ = _gat_ell_fwd_impl(edges, alpha_l, alpha_r)
    return ev, ev_t


def _gat_ell_fwd_impl(edges, alpha_l, alpha_r):
    a = jnp.take(alpha_l, edges.ell_col, mode="clip") + jnp.take(
        alpha_r, edges.ell_row, mode="clip"
    )[:, None]
    ev = jnp.exp(jax.nn.leaky_relu(a, NEGATIVE_SLOPE)) * edges.ell_val
    St, K = edges.t_ell_col.shape
    ev_t = jnp.take(
        ev.reshape(-1), edges.t_from_f.reshape(-1), mode="fill", fill_value=0.0
    ).reshape(St, K)
    return ev, ev_t, a > 0


def _gat_ell_vjp_fwd(edges, alpha_l, alpha_r):
    ev, ev_t, pos = _gat_ell_fwd_impl(edges, alpha_l, alpha_r)
    return (ev, ev_t), (edges, ev, pos)


def _gat_ell_vjp_bwd(res, g):
    edges, ev, pos = res
    g_ev, g_ev_t = g
    S, K = ev.shape
    num_rows = edges.num_rows
    # fold any cotangent arriving through the transposed copy back into the
    # forward layout (zero in the spmm path, kept for generality)
    g_total = g_ev + jnp.take(
        g_ev_t.reshape(-1), edges.f_from_t.reshape(-1), mode="fill", fill_value=0.0
    ).reshape(S, K)
    # d ev / d a = ev * leaky_relu'(a); padding cells have ev = 0
    d_a = g_total * ev * jnp.where(pos, 1.0, NEGATIVE_SLOPE)
    d_ar = jax.ops.segment_sum(
        jnp.sum(d_a, axis=1), edges.ell_row,
        num_segments=num_rows + 1, indices_are_sorted=True,
    )[:num_rows]
    d_a_t = jnp.take(
        d_a.reshape(-1), edges.t_from_f.reshape(-1), mode="fill", fill_value=0.0
    ).reshape(edges.t_ell_col.shape)
    d_al = jax.ops.segment_sum(
        jnp.sum(d_a_t, axis=1), edges.t_ell_row,
        num_segments=num_rows + 1, indices_are_sorted=True,
    )[:num_rows]
    return jax.tree.map(jnp.zeros_like, edges), d_al, d_ar


gat_ell_values.defvjp(_gat_ell_vjp_fwd, _gat_ell_vjp_bwd)
