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

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


class Edges(struct.PyTreeNode):
    """A padded edge list over a local node numbering.

    Two layouts:

    - COO (row/col/val, row-sorted): the reference layout; used by tests and
      as fallback.
    - **slot-ELL** (ell_*): each row's edges are split into slots of K
      contiguous edges; a slot is (output row, K cols, K vals).  The
      aggregate becomes gather + dense K-reduction + a segment-sum over
      S ~ E/K slots — 16x less scatter traffic than per-edge segment-sum,
      which is the TPU bottleneck (scatters serialize; gathers stream).
      ``t_ell_*`` is the same layout for the transposed graph, so the
      backward dx is another gather-heavy ELL pass instead of an AD scatter.
    """

    row: Optional[jnp.ndarray] = None  # [E_pad] int32, ascending; pad = num_rows
    col: Optional[jnp.ndarray] = None  # [E_pad] int32; pad = num_rows
    val: Optional[jnp.ndarray] = None  # [E_pad] float32; pad = 0
    # Permutation sorting edges by col (for the transposed/backward SpMM).
    tperm: Optional[jnp.ndarray] = None  # [E_pad] int32
    # slot-ELL layout
    ell_row: Optional[jnp.ndarray] = None  # [S_pad] int32 ascending; pad = num_rows
    ell_col: Optional[jnp.ndarray] = None  # [S_pad, K] int32; pad = num_rows
    ell_val: Optional[jnp.ndarray] = None  # [S_pad, K] f32; pad = 0
    t_ell_row: Optional[jnp.ndarray] = None
    t_ell_col: Optional[jnp.ndarray] = None
    t_ell_val: Optional[jnp.ndarray] = None
    # Position maps between the two ELL layouts (same underlying edge set):
    # t_from_f[s, k] = flattened forward position of the edge at transposed
    # cell (s, k), sentinel S_pad*K for padding (gather with mode='fill').
    # f_from_t is the inverse. Lets GAT compute attention values ONCE and
    # mirror them into the transposed layout with a single gather, and lets
    # its backward reduce d_alpha with sorted segment-sums in both layouts.
    t_from_f: Optional[jnp.ndarray] = None  # [St_pad, K] int32
    f_from_t: Optional[jnp.ndarray] = None  # [S_pad, K] int32
    # ---- mixed-K layout (single-K ELL wastes ~33% of gathered cells as
    # slot padding at K=8 on arxiv-degree graphs; splitting each row's edges
    # into full K-slots + a narrow-K tail cuts that to ~7%) ----
    # HEAD family: only the full K-wide slots, in a COMPACT row numbering
    # (rank among rows owning >= 1 full slot) so sorted rows stay gap-free
    # for the windowed Pallas segment-sum; head_inv maps global row ->
    # compact id (sentinel num_rows -> fill-0 gather).
    head_rowc: Optional[jnp.ndarray] = None  # [Sh_pad] int32 compact, ascending
    head_col: Optional[jnp.ndarray] = None  # [Sh_pad, K] int32
    head_val: Optional[jnp.ndarray] = None  # [Sh_pad, K] f32
    head_inv: Optional[jnp.ndarray] = None  # [num_rows] int32
    head_rowg: Optional[jnp.ndarray] = None  # [Sh_pad] int32 GLOBAL rows (GAT)
    # TAIL family: remainder edges in Kt-wide slots, global rows, dense
    # (every row owns >= 1 tail slot) -> windowed segsum directly.
    tail_row: Optional[jnp.ndarray] = None  # [St2_pad] int32 global, ascending
    tail_col: Optional[jnp.ndarray] = None  # [St2_pad, Kt] int32
    tail_val: Optional[jnp.ndarray] = None  # [St2_pad, Kt] f32
    # transposed-direction mixed families (for the backward dx pass)
    t_head_rowc: Optional[jnp.ndarray] = None
    t_head_col: Optional[jnp.ndarray] = None
    t_head_val: Optional[jnp.ndarray] = None
    t_head_inv: Optional[jnp.ndarray] = None
    t_head_rowg: Optional[jnp.ndarray] = None
    t_tail_row: Optional[jnp.ndarray] = None
    t_tail_col: Optional[jnp.ndarray] = None
    t_tail_val: Optional[jnp.ndarray] = None
    # truncation prefix bounds for the mixed transposed families (see
    # b_rows/t_b_slots below; 0 = no truncation)
    t_head_b_slots: int = struct.field(pytree_node=False, default=0)
    t_tail_b_slots: int = struct.field(pytree_node=False, default=0)
    num_rows: int = struct.field(pytree_node=False, default=0)
    # True when the ELL builder guaranteed every row in [0, num_rows) owns
    # >= 1 slot (empty rows get a zero-valued dustbin-col slot).  Gap-free
    # sorted rows let aggregates use the windowed Pallas segment-sum.
    dense_rows: bool = struct.field(pytree_node=False, default=False)
    # Backward truncation contract (set by the bbprime batch builder): x
    # rows >= b_rows are codebook lookups whose cotangent has no consumer,
    # so the spmm VJP only materializes dx for rows < b_rows and returns
    # zeros above.  t_b_slots is a static bound (>= actual, bucket-
    # quantized) on the prefix of the row-ascending transposed ELL whose
    # rows are < b_rows; slots beyond it are skipped entirely — measured
    # 47.5% of transposed slots on the cluster-sampled arxiv workload.
    # 0/0 = disabled (exact full VJP, the default for hand-built Edges).
    b_rows: int = struct.field(pytree_node=False, default=0)
    t_b_slots: int = struct.field(pytree_node=False, default=0)


def _segment_matvec(row, col, val, x, num_rows, sorted_rows):
    msgs = jnp.take(x, col, axis=0, mode="clip") * val[:, None]
    if msgs.dtype != jnp.float32:  # bf16 inputs: accumulate in f32
        msgs = msgs.astype(jnp.float32)
    out = jax.ops.segment_sum(
        msgs, row, num_segments=num_rows + 1, indices_are_sorted=sorted_rows
    )
    return out[:num_rows]


_SEGSUM_MODE = os.environ.get("VQ_GNN_SEGSUM", "auto")  # auto | xla


def pallas_interpret_mode() -> bool:
    """VQ_GNN_ELL_FUSED=interpret forces the fused/windowed Pallas paths in
    interpreter mode — lets CI exercise the exact fused dispatch (incl. the
    bf16 seam) on CPU, where the kernels otherwise never engage."""
    return os.environ.get("VQ_GNN_ELL_FUSED") == "interpret"


def pallas_segsum_ok(dense_rows: bool, lanes: int = 128) -> bool:
    """True when the windowed Pallas segment-sum applies: gap-free sorted
    ELL rows, lane-tileable width, real TPU lowering, not disabled by env."""
    if pallas_interpret_mode():
        return dense_rows and lanes % 128 == 0
    return (
        _SEGSUM_MODE == "auto"
        and dense_rows
        and lanes % 128 == 0
        and jax.default_backend() != "cpu"
    )


def ell_fused_ok(dense_rows: bool, S: int, lanes: int = 128) -> bool:
    """True when the fully-fused ELL aggregate kernel applies (gather output
    consumed in VMEM: weighting + K-reduce + windowed segment-sum in one
    pass).  Same invariants as the windowed segment-sum plus a slot count
    divisible by a supported tile.

    VMEM scaling note: the kernels' per-tile footprint is R-independent —
    the GAT ``ar`` vector stays in HBM and is window-DMA'd per tile
    (pallas_ell.py), after a full-graph N=169k run showed a whole-array
    [R_pad, 1] VMEM input lane-pads 1 -> 128 and alone eats 90.7MB of the
    100MB scoped stack."""
    # read the env per call: tools/benchmarks toggle it between jit traces
    if os.environ.get("VQ_GNN_ELL_FUSED", "auto") not in (
        "auto", "interpret"
    ) or not pallas_segsum_ok(dense_rows, lanes):
        return False
    from vq_gnn_tpu.ops.pallas_ell import fused_tile_ok

    return fused_tile_ok(S)


def sorted_segment_sum(part, seg, num_rows, dense_rows):
    """Dispatch: windowed Pallas kernel when the ELL guarantees gap-free
    sorted rows and the lane width tiles cleanly; XLA scatter otherwise."""
    if part.ndim == 2 and pallas_segsum_ok(dense_rows, part.shape[1]):
        from vq_gnn_tpu.ops.pallas_segsum import segment_sum_sorted

        return segment_sum_sorted(part, seg, num_rows)
    return jax.ops.segment_sum(
        part, seg, num_segments=num_rows + 1, indices_are_sorted=True
    )[:num_rows]


def _ell_matvec(ell_row, ell_col, ell_val, x, num_rows, dense_rows=False):
    """Slot-ELL aggregate: gather K neighbors per slot, dense K-reduce,
    segment-sum partials over sorted slot rows.  When the fused kernel
    applies, everything downstream of the gather runs in one VMEM pass."""
    S, K = ell_col.shape
    nbrs_flat = jnp.take(x, ell_col.reshape(-1), axis=0, mode="clip")
    if ell_fused_ok(dense_rows, S, x.shape[1]):
        from vq_gnn_tpu.ops.pallas_ell import ell_aggregate_fused

        return ell_aggregate_fused(nbrs_flat, ell_row, ell_val, num_rows)
    nbrs = nbrs_flat.reshape(S, K, x.shape[1])
    # f32 accumulation regardless of the (possibly bf16) streaming dtype
    part = jnp.einsum(
        "sk,skd->sd", ell_val, nbrs, preferred_element_type=jnp.float32
    )
    return sorted_segment_sum(part, ell_row, num_rows, dense_rows)


def _ell_sddmm(ell_row, ell_col, g, x):
    """d val[s,k] = g[row_s] . x[col_sk] — all gathers."""
    S, K = ell_col.shape
    g_rows = jnp.take(g, ell_row, axis=0, mode="clip")  # [S, D]
    x_cols = jnp.take(x, ell_col.reshape(-1), axis=0, mode="clip").reshape(
        S, K, x.shape[1]
    )
    return jnp.einsum(
        "sd,skd->sk", g_rows, x_cols, preferred_element_type=jnp.float32
    )


def _mixed_matvec(
    head_rowc, head_col, head_val, head_inv,
    tail_row, tail_col, tail_val,
    x, num_rows, out_rows=None,
):
    """Mixed-K aggregate: tail family reduces directly in the (dense) global
    row space; the head family reduces in its compact row space and is folded
    in with one row gather through head_inv (sentinel num_rows -> fill 0).
    ``out_rows`` < num_rows truncates the output (backward b_rows path) —
    head output stays full-width because compact ids of rows >= out_rows are
    simply never gathered."""
    R = num_rows if out_rows is None else out_rows
    out = _ell_matvec(tail_row, tail_col, tail_val, x, R, dense_rows=True)
    head = _ell_matvec(head_rowc, head_col, head_val, x, num_rows, dense_rows=True)
    inv = head_inv if out_rows is None else head_inv[:out_rows]
    return out + jnp.take(head, inv, axis=0, mode="fill", fill_value=0.0)


@jax.custom_vjp
def spmm(edges: Edges, x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_e 1[row_e == r] * val_e * x[col_e]  ->  [num_rows, D]."""
    if edges.tail_row is not None:
        return _mixed_matvec(
            edges.head_rowc, edges.head_col, edges.head_val, edges.head_inv,
            edges.tail_row, edges.tail_col, edges.tail_val,
            x, edges.num_rows,
        )
    if edges.ell_row is not None:
        return _ell_matvec(
            edges.ell_row, edges.ell_col, edges.ell_val, x, edges.num_rows,
            edges.dense_rows,
        )
    return _segment_matvec(edges.row, edges.col, edges.val, x, edges.num_rows, True)


def _spmm_fwd(edges: Edges, x: jnp.ndarray):
    return spmm(edges, x), (edges, x)


def _spmm_bwd(res, g):
    edges, x = res
    num_cols = x.shape[0]
    if edges.tail_row is not None:
        g_s = g.astype(x.dtype) if x.dtype != g.dtype else g
        tbt, tbh = edges.t_tail_b_slots, edges.t_head_b_slots
        if edges.b_rows and tbt and tbt < edges.t_tail_row.shape[0]:
            # truncated dx: tail prefix rows clamp ride-overs to the b_rows
            # dustbin; head prefix needs no clamp — compact ids of rows
            # >= b_rows are never gathered by t_head_inv[:b_rows]
            dx_b = _mixed_matvec(
                edges.t_head_rowc[:tbh], edges.t_head_col[:tbh],
                edges.t_head_val[:tbh], edges.t_head_inv,
                jnp.minimum(edges.t_tail_row[:tbt], edges.b_rows),
                edges.t_tail_col[:tbt], edges.t_tail_val[:tbt],
                g_s, num_cols, out_rows=edges.b_rows,
            )
            dx = jnp.concatenate(
                [dx_b, jnp.zeros((num_cols - edges.b_rows, dx_b.shape[1]),
                                 dx_b.dtype)]
            ).astype(x.dtype)
        else:
            dx = _mixed_matvec(
                edges.t_head_rowc, edges.t_head_col, edges.t_head_val,
                edges.t_head_inv,
                edges.t_tail_row, edges.t_tail_col, edges.t_tail_val,
                g_s, num_cols,
            ).astype(x.dtype)
        # no d val on the mixed path: GCN/SAGE adjacency values are constants
        # (GAT, which differentiates edge values, uses gat_conv_ell instead)
        d_edges = jax.tree.map(jnp.zeros_like, edges)
        return d_edges, dx
    if edges.ell_row is not None:
        if edges.t_ell_row is None:
            raise ValueError("ELL edges need t_ell_* for the backward pass")
        # stream the cotangent at the forward's compute dtype (bf16 halves
        # the backward gather traffic too); accumulation stays f32
        g_s = g.astype(x.dtype) if x.dtype != g.dtype else g
        tb = edges.t_b_slots
        if edges.b_rows and tb and tb < edges.t_ell_row.shape[0]:
            # rows are ascending, so the < b_rows slots are a prefix; the
            # few ride-over slots inside the bound clamp to the b_rows
            # dustbin (their dx lands in the sliced-off segment)
            t_row = jnp.minimum(edges.t_ell_row[:tb], edges.b_rows)
            dx_b = _ell_matvec(
                t_row, edges.t_ell_col[:tb], edges.t_ell_val[:tb], g_s,
                edges.b_rows, edges.dense_rows,
            )
            dx = jnp.concatenate(
                [dx_b, jnp.zeros((num_cols - edges.b_rows, dx_b.shape[1]),
                                 dx_b.dtype)]
            ).astype(x.dtype)
        else:
            dx = _ell_matvec(
                edges.t_ell_row, edges.t_ell_col, edges.t_ell_val, g_s,
                num_cols, edges.dense_rows,
            ).astype(x.dtype)
        dval_ell = _ell_sddmm(edges.ell_row, edges.ell_col, g_s, x).astype(
            edges.ell_val.dtype
        )
        d_edges = jax.tree.map(jnp.zeros_like, edges).replace(ell_val=dval_ell)
        return d_edges, dx

    g_s = g.astype(x.dtype) if x.dtype != g.dtype else g
    if edges.tperm is not None:
        t_row = jnp.take(edges.col, edges.tperm)
        t_col = jnp.take(edges.row, edges.tperm)
        t_val = jnp.take(edges.val, edges.tperm)
        dx = _segment_matvec(t_row, t_col, t_val, g_s, num_cols, True)
    else:
        dx = _segment_matvec(edges.col, edges.row, edges.val, g_s, num_cols, False)
    dx = dx.astype(x.dtype)
    # SDDMM for d val (only materialized if the caller needs grads wrt val).
    dval = jnp.sum(
        jnp.take(g, edges.row, axis=0, mode="clip")
        * jnp.take(x, edges.col, axis=0, mode="clip"),
        axis=-1,
    )
    d_edges = jax.tree.map(jnp.zeros_like, edges).replace(val=dval)
    return d_edges, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)


def ell_rowsum(edges: Edges, ell_val: jnp.ndarray) -> jnp.ndarray:
    """Per-row sum of edge values over the ELL layout -> [num_rows, 1].

    Used for the GAT ones-column normalizer: summing the attention-weighted
    values directly avoids appending a ones column to the feature matrix
    (129 columns would lane-pad every gather/einsum to 256)."""
    part = jnp.sum(ell_val, axis=1, keepdims=True)  # [S, 1]
    out = jax.ops.segment_sum(
        part, edges.ell_row, num_segments=edges.num_rows + 1, indices_are_sorted=True
    )
    return out[: edges.num_rows]


def build_ell_host(row, col, val, num_rows: int, K: int, S_pad: int = 0):
    """Host-side slot-ELL construction from row-sorted COO (numpy).

    Returns (ell_row [S_pad], ell_col [S_pad, K], ell_val [S_pad, K]).
    Padding slots carry row = num_rows (dustbin segment), col = num_rows
    (clamped gather), val = 0.

    Rows are **dense**: a row with no edges still gets one zero-valued slot
    (col = dustbin), so sorted slot rows are gap-free over [0, num_rows) —
    the invariant the windowed Pallas segment-sum relies on.  Real batches
    only pay this for the pad margins (every real row carries a self-loop).
    """
    import numpy as np

    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    if S_pad > 0:
        try:
            from vq_gnn_tpu.native import lib as native_lib

            if native_lib.available():
                return native_lib.build_ell(row, col, val, num_rows, K, S_pad)
        except ImportError:
            pass
    deg = np.bincount(row, minlength=num_rows)
    starts = np.concatenate([[0], np.cumsum(deg)])
    pos = np.arange(len(row)) - starts[row]
    nslot = np.maximum((deg + K - 1) // K, 1)  # empty rows: one dustbin slot
    slot_base = np.concatenate([[0], np.cumsum(nslot)])
    S = int(slot_base[-1])
    if S_pad <= 0:
        S_pad = S
    if S > S_pad:
        raise ValueError(f"slots {S} exceed S_pad={S_pad}")
    sid = slot_base[row] + pos // K
    k = pos % K
    ell_row = np.full(S_pad, num_rows, np.int32)
    ell_row[:S] = np.repeat(np.arange(num_rows), nslot).astype(np.int32)
    ell_col = np.full((S_pad, K), num_rows, np.int32)
    ell_val = np.zeros((S_pad, K), np.float32)
    ell_col[sid, k] = col
    ell_val[sid, k] = val
    return ell_row, ell_col, ell_val


def build_mixed_ell_host(
    row, col, val, num_rows: int, K: int, Kt: int, Sh_pad: int, St2_pad: int
):
    """Host-side mixed-K construction from row-sorted COO (numpy).

    Per row: the first ``floor(deg/K)*K`` edges fill full K-wide HEAD slots;
    the remainder goes to Kt-wide TAIL slots.  Head slots carry a COMPACT row
    id (rank among rows with >= 1 head slot; gap-free ascending); tail rows
    are global and DENSE (every one of ``num_rows`` rows owns >= 1 tail slot,
    zero-valued when empty).  Returns
    (head_rowc [Sh_pad], head_col/val [Sh_pad, K], head_inv [num_rows],
     tail_row [St2_pad], tail_col/val [St2_pad, Kt]).
    Padding: head_rowc -> n_head_rows (unwritten compact rows are never
    gathered), head_inv -> num_rows sentinel (fill-0 gather), tail sentinels
    as build_ell_host.
    """
    import numpy as np

    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    deg = np.bincount(row, minlength=num_rows)
    starts = np.concatenate([[0], np.cumsum(deg)])
    pos = np.arange(len(row)) - starts[row]

    nh = deg // K  # full head slots per row
    head_rows = np.flatnonzero(nh > 0)
    n_head_rows = len(head_rows)
    rank = np.full(num_rows, num_rows, np.int64)  # sentinel = num_rows
    rank[head_rows] = np.arange(n_head_rows)
    h_base = np.concatenate([[0], np.cumsum(nh)])
    Sh = int(h_base[-1])
    if Sh > Sh_pad:
        raise ValueError(f"head slots {Sh} exceed Sh_pad={Sh_pad}")

    in_head = pos < nh[row] * K
    hr, hp = row[in_head], pos[in_head]
    h_sid = h_base[hr] + hp // K
    head_rowc = np.full(Sh_pad, n_head_rows, np.int32)
    head_rowc[:Sh] = np.repeat(rank[head_rows], nh[head_rows]).astype(np.int32)
    head_rowg = np.full(Sh_pad, num_rows, np.int32)  # global rows (GAT logits)
    head_rowg[:Sh] = np.repeat(head_rows, nh[head_rows]).astype(np.int32)
    head_col = np.full((Sh_pad, K), num_rows, np.int32)
    head_val = np.zeros((Sh_pad, K), np.float32)
    head_col[h_sid, hp % K] = col[in_head]
    head_val[h_sid, hp % K] = val[in_head]

    rem = deg - nh * K
    nt = np.maximum((rem + Kt - 1) // Kt, 1)  # dense: >= 1 tail slot per row
    t_base = np.concatenate([[0], np.cumsum(nt)])
    St2 = int(t_base[-1])
    if St2 > St2_pad:
        raise ValueError(f"tail slots {St2} exceed St2_pad={St2_pad}")
    tr, tp = row[~in_head], pos[~in_head] - nh[row[~in_head]] * K
    t_sid = t_base[tr] + tp // Kt
    tail_row = np.full(St2_pad, num_rows, np.int32)
    tail_row[:St2] = np.repeat(np.arange(num_rows), nt).astype(np.int32)
    tail_col = np.full((St2_pad, Kt), num_rows, np.int32)
    tail_val = np.zeros((St2_pad, Kt), np.float32)
    tail_col[t_sid, tp % Kt] = col[~in_head]
    tail_val[t_sid, tp % Kt] = val[~in_head]

    # h_base/t_base: per-family slot counts below each row (cumsum), for the
    # backward-truncation prefix bounds (slots with global row < b_rows)
    return (
        head_rowc, head_col, head_val, rank.astype(np.int32),
        tail_row, tail_col, tail_val, h_base, t_base, head_rowg,
    )


def ell_positions(row_sorted, K: int, num_rows: int = 0):
    """Flattened slot-ELL cell position (sid*K + k) of each edge, given the
    row-sorted row array the ELL was built from (numpy, host-side).  Must
    mirror build_ell_host's dense-rows slot layout."""
    import numpy as np

    row = np.asarray(row_sorted, np.int64)
    if num_rows <= 0:
        num_rows = int(row[-1]) + 1 if len(row) else 0
    deg = np.bincount(row, minlength=num_rows)
    starts = np.concatenate([[0], np.cumsum(deg)])
    pos = np.arange(len(row)) - starts[row]
    nslot = np.maximum((deg + K - 1) // K, 1)
    slot_base = np.concatenate([[0], np.cumsum(nslot)])
    sid = slot_base[row] + pos // K
    return (sid * K + pos % K).astype(np.int64)


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
