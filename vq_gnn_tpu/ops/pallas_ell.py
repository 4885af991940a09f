"""Fused slot-ELL aggregate kernels (Pallas TPU).

The profiled GAT forward spends more time BETWEEN ops than in them: after the
one unavoidable neighbor row gather (``nbrs = x[ell_col]``), XLA runs the
logit einsum, the ``ar`` row gather, exp/leaky, TWO ev-weighted K-reduce
einsums (main + a<=0 masked channel) and two windowed segment-sum kernels —
each a separate HBM round-trip over [S, K, C]-sized data (measured ~10.5
ms/layer of the ~14 ms GAT forward at S*K=2.1M, C=256).  These kernels fuse
everything downstream of the gather into ONE VMEM pass per slot tile:

- attention logits ``al = (nbrs @ att_l + b) / scale`` from the tile that is
  already resident;
- the row-side logit ``ar`` is recovered from an 8-aligned [T+8] window of
  the per-row vector — sorted gap-free slot rows mean a tile's rows live in
  ``[r0, r0+T)`` — via a one-hot MXU matvec, replacing the separate [S, 1]
  row gather (measured 1.9 ms/layer: narrow gathers pay full row cost);
- ``ev = exp(leaky(a)) * val`` and the (a<=0)-masked backward channel on the
  VPU; weighted K-reduction of the resident neighbor block;
- the 8-aligned windowed segment-sum write of pallas_segsum.py (one-hot
  reduce + overlap refill + boundary carry + aligned window DMA) for the
  matrix channels and the fused ones-normalizer scalar channels.

The backward kernel does the symmetric transposed-layout pass: recompute
a/ev from the resident gathered cotangent block, per-cell d_a, dx partials,
d_al reduce.  The same forward kernel with attention disabled is the plain
SpMM aggregate (gather + K-reduce + segment-sum fused) used by GCN/SAGE.

Replaces (semantics unchanged): reference OurGATConv message/aggregate
``vq_gnn_v2/convs.py:165-266`` + ``utils/vq_softmax.py`` exp, and the
``torch_sparse::spmm`` aggregate (``convs.py v2:95``).

Mosaic notes (hard-won, keep):
- keep SLOTS on the sublane axis everywhere: seg ids stream as a [S, 1]
  column (block (T, 1) is legal: trailing dim equals the array's), the
  one-hot is built [T slots, W rel-rows] against a lane iota, and every
  reduce is a dot_general contracting the slot sublanes — no lane-dim
  reshape, no transpose, no 1-D arrays (1-D blocks carry a 1024-multiple
  layout rule; 2-D tiles only need 8/128 divisibility or dim-equality);
- Mosaic dots are 2-D only: [T, K, C]-shaped contractions are
  broadcast-multiply + lane (axis=2) or sublane (axis=1) reduces;
- leading-dim reshapes ([T*K, C] -> [T, K, C]) are free; NEVER reshape the
  lane dim inside a kernel, and never mix newaxis with a slice in one
  indexing expression (``x[:, None, :C1]`` lowers to lax.gather — slice
  first, then expand);
- dynamic-offset reads/DMA need a PROVABLY 8-aligned start: precompute
  ``(r0 // 8) * 8`` starts (scalar prefetch) + ``pl.multiple_of``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vq_gnn_tpu.ops.pallas_segsum import aligned_window_meta, make_window_reducer

NEGATIVE_SLOPE = 0.2  # PyG GATConv default (reference convs.py v2:131)


def _lane0():
    return (
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
    ).astype(jnp.float32)


def _channel_outputs(T, C, channels):
    """(out_shapes, out_specs=ANY, scratch) for n windowed output channels:
    each gets win + carry + prev_win + DMA sem.  channels = list of lane
    widths (C for matrix, 1 for scalar — written as lane 0 of 128)."""
    out_shapes, scratch = [], []
    for w in channels:
        wl = 128 if w == 1 else w
        out_shapes.append(("win", wl))
        scratch += [
            pltpu.VMEM((T + 8, wl), jnp.float32),  # win (DMA source)
            pltpu.VMEM((1, w), jnp.float32),  # carry
            pltpu.VMEM((T + 8, w), jnp.float32),  # prev_win
            pltpu.SemaphoreType.DMA,
        ]
    return out_shapes, scratch


def _emit_channels(reduce, r0a, T, parts, outs, scratch, i):
    """Run the shared window reducer per channel and DMA each window out."""

    @pl.when(i == 0)
    def _zero_prev():  # scratch starts uninitialized; 0 * NaN = NaN
        for c in range(len(parts)):
            scratch[4 * c + 2][:] = jnp.zeros_like(scratch[4 * c + 2])

    r0a_hint = pl.multiple_of(r0a, 8)
    cps = []
    for c, part in enumerate(parts):
        win, carry, prev_win, sem = scratch[4 * c : 4 * c + 4]
        rows = reduce(part, carry, prev_win)
        if rows.shape[1] == 1:  # scalar channel rides lane 0 of 128
            win[:] = rows * _lane0()
        else:
            win[:] = rows
        cp = pltpu.make_async_copy(win, outs[c].at[pl.ds(r0a_hint, T + 8)], sem)
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


def _make_fwd_kernel(K: int, C: int, gat: bool, with_neg: bool,
                     with_rowsum: bool):
    n_mat = 2 if (gat and with_neg) else 1
    n_scal = (1 + (1 if with_neg else 0)) if (gat and with_rowsum) else 0
    n_ch = n_mat + n_scal

    def kernel(r0as_ref, prev_eq_ref, seg_ref, nb_ref, val_ref, *rest):
        j = 0
        if gat:
            ar_ref, alv_ref, alb_ref = rest[0:3]
            j = 3
        outs = list(rest[j : j + n_ch])
        scratch = list(rest[j + n_ch :])
        if gat:
            # ar stays in HBM ([R_pad, 1] resident in VMEM lane-pads 1 -> 128
            # physically: 90.7MB of scoped stack at full-graph N=169k, the
            # measured OOM); stream the 8-aligned [T+8] row window per tile.
            # The HBM array is [R_pad, 128] with lane 0 live — Mosaic requires
            # HBM slices lane-aligned to 128, so a [*, 1] window is illegal.
            ar_hbm_win, ar_sem = scratch[0], scratch[1]
            scratch = scratch[2:]
        i = pl.program_id(0)
        T = seg_ref.shape[0]
        r0a = r0as_ref[i]
        r0a_prev = r0as_ref[jnp.maximum(i - 1, 0)]
        seg = seg_ref[:]
        reduce = make_window_reducer(T, seg, r0a, r0a_prev, prev_eq_ref[i])

        nb3 = nb_ref[:].reshape(T, K, C)
        val = val_ref[:]  # [T, K] f32

        if gat:
            # same op order as the unfused path: (x @ att_l + bias) / scale
            al = (
                jnp.sum(
                    nb3.astype(jnp.float32) * alv_ref[:][None, :, :], axis=2
                )
                + alb_ref[0, 0]
            ) / alb_ref[0, 1]  # [T, K]
            # row-side logits from the same 8-aligned row window (HBM DMA)
            cp_ar = pltpu.make_async_copy(
                ar_ref.at[pl.ds(pl.multiple_of(r0a, 8), T + 8)],
                ar_hbm_win,
                ar_sem,
            )
            cp_ar.start()
            cp_ar.wait()
            rel_a = jnp.clip(seg - r0a, 0, T + 7)
            iota_a = jax.lax.broadcasted_iota(jnp.int32, (1, T + 8), 1)
            ohA = (rel_a == iota_a).astype(jnp.float32)  # [T, T+8]
            # lane-0 extraction via basis dot (a [*, :1] slice of the
            # (8,128)-tiled window would be an unaligned lane slice)
            e0 = (
                jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) == 0
            ).astype(jnp.float32)
            ar_col = jax.lax.dot_general(
                ar_hbm_win[:], e0, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T+8, 1]
            ar_slot = jax.lax.dot_general(
                ohA, ar_col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, 1]
            a = al + ar_slot
            ev = jnp.exp(jax.nn.leaky_relu(a, NEGATIVE_SLOPE)) * val
        else:
            ev = val

        parts = [jnp.sum(ev[:, :, None] * nb3, axis=1)]  # [T, C] f32 (VPU)
        if gat and with_neg:
            evn = ev * (a <= 0)
            parts.append(jnp.sum(evn[:, :, None] * nb3, axis=1))
        if gat and with_rowsum:
            parts.append(jnp.sum(ev, axis=1)[:, None])
            if with_neg:
                parts.append(jnp.sum(evn, axis=1)[:, None])
        _emit_channels(reduce, r0a, T, parts, outs, scratch, i)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "gat", "with_neg", "with_rowsum", "tile",
                     "interpret"),
)
def _ell_fused_impl(
    nbrs_flat, seg, val, ar, alv, alb, scale, num_rows, gat, with_neg,
    with_rowsum, tile, interpret,
):
    S, K = val.shape
    C = nbrs_flat.shape[1]
    T = tile
    assert S % T == 0, f"S_pad={S} not a multiple of tile={T}"
    n_tiles = S // T
    seg = seg.astype(jnp.int32)
    r0as, prev_eq = aligned_window_meta(seg, T)
    R_pad = ((num_rows + T + 16) // 8) * 8

    in_specs = [
        pl.BlockSpec((T, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T * K, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, K), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [seg.reshape(S, 1), nbrs_flat, val.astype(jnp.float32)]
    if gat:
        # ar window reads reach [r0a, r0a + T + 8) incl. the dustbin tile;
        # the array stays in HBM (ANY) and the kernel DMAs the aligned
        # window — VMEM use is then R-independent (see kernel comment).
        # The [R_pad, 128] lane-0-live expansion (vs a [R_pad, 1] column)
        # is a deliberate 128x HBM zero-fill: Mosaic requires 128-lane-
        # aligned HBM window slices, and the fill (~R_pad*512B/forward) is
        # cheaper than the relayout a 1-lane window DMA would force.
        ar_pad = jnp.zeros((R_pad, 128), jnp.float32).at[: ar.shape[0], 0].set(ar)
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # ar [R_pad, 128] lane-0-live, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # alv [1, C], whole
            pl.BlockSpec((1, 2), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
        ]
        inputs += [
            ar_pad,
            alv.astype(jnp.float32).reshape(1, C),
            jnp.stack(
                [jnp.asarray(alb, jnp.float32), jnp.asarray(scale, jnp.float32)]
            ).reshape(1, 2),
        ]

    n_mat = 2 if (gat and with_neg) else 1
    n_scal = (1 + (1 if with_neg else 0)) if (gat and with_rowsum) else 0
    widths = [C] * n_mat + [1] * n_scal
    ch_meta, scratch = _channel_outputs(T, C, widths)
    if gat:  # ar window scratch + DMA sem, read by the kernel before channels
        scratch = [
            pltpu.VMEM((T + 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ] + scratch
    out_shapes = [
        jax.ShapeDtypeStruct((R_pad, wl), jnp.float32) for _, wl in ch_meta
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # r0as, prev_eq
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in out_shapes],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        _make_fwd_kernel(K, C, gat, with_neg, with_rowsum),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(r0as, prev_eq, *inputs)
    res = [outs[i][:num_rows] for i in range(n_mat)]
    res += [outs[n_mat + i][:num_rows, 0] for i in range(n_scal)]
    return tuple(res)


def _make_bwd_kernel(K: int, C: int, C1: int, W: int):
    """Transposed-layout GAT backward tile: recompute a/ev from the resident
    gathered cotangent block (ar rides lane W-1, the rowsum cotangent lane
    W-2), form per-cell d_a and the ev-weighted dx partial, and reduce both
    with the aligned windowed segment-sum.

    Outputs dx [R, C] and d_al [R] only: d_ar keeps its closed form from the
    forward aggregates, and d_scale collapses exactly to
    ``-(<al, d_al> + <ar, d_ar>) / scale`` (a = al[col] + ar[row] is
    row/col-separable), so no per-cell channel is needed for either."""
    n_hi = (C - C1) // 128

    def kernel(r0as_ref, prev_eq_ref, seg_ref, gl_ref, gh_ref, x_ref, val_ref,
               alv_ref, alb_ref, *rest):
        outs = list(rest[0:2])
        scratch = list(rest[2:])
        i = pl.program_id(0)
        T = seg_ref.shape[0]
        r0a = r0as_ref[i]
        r0a_prev = r0as_ref[jnp.maximum(i - 1, 0)]
        reduce = make_window_reducer(
            T, seg_ref[:], r0a, r0a_prev, prev_eq_ref[i]
        )

        gl3 = gl_ref[:].reshape(T, K, C1)
        gh3 = gh_ref[:].reshape(T, K, W)
        x_l = x_ref[:]  # [T, C]
        val = val_ref[:]  # [T, K]

        # Mosaic dots are 2-D only: every [T, K, C]-shaped contraction is a
        # broadcast-multiply + lane (axis=2) or sublane (axis=1) reduce
        wi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        gh3f = gh3.astype(jnp.float32)
        ar = jnp.sum(gh3f * (wi == W - 1), axis=2)  # [T, K] lane W-1
        al = (
            jnp.sum(x_l.astype(jnp.float32) * alv_ref[:], axis=1,
                    keepdims=True)
            + alb_ref[0, 0]
        ) / alb_ref[0, 1]  # [T, 1]
        a = al + ar
        ev = jnp.exp(jax.nn.leaky_relu(a, NEGATIVE_SLOPE)) * val

        gl3f = gl3.astype(jnp.float32)
        x_f = x_l.astype(jnp.float32)
        # NOTE: x[:, None, :C1] (newaxis mixed with a slice) lowers to
        # lax.gather, which Mosaic rejects — slice first, then expand
        g_ev = jnp.sum(gl3f * x_f[:, :C1][:, None, :], axis=2) + jnp.sum(
            gh3f * (wi == W - 2), axis=2
        )
        dx_chunks = [jnp.sum(ev[:, :, None] * gl3f, axis=1)]
        for j in range(n_hi):
            ghj = gh3f[:, :, j * 128 : (j + 1) * 128]
            g_ev = g_ev + jnp.sum(
                ghj * x_f[:, C1 + j * 128 : C1 + (j + 1) * 128][:, None, :],
                axis=2,
            )
            dx_chunks.append(jnp.sum(ev[:, :, None] * ghj, axis=1))
        d_a = g_ev * ev * jnp.where(a > 0, 1.0, NEGATIVE_SLOPE)
        dx_part = (
            jnp.concatenate(dx_chunks, axis=1) if n_hi else dx_chunks[0]
        )  # [T, C]
        _emit_channels(
            reduce, r0a, T, [dx_part, jnp.sum(d_a, axis=1)[:, None]],
            outs, scratch, i,
        )

    return kernel


def _make_bwd_kernel_merged(K: int, C: int):
    """Merged-gather GAT backward tile: ONE gathered block [T*K, C+2] carries
    the cotangent lanes plus the rowsum-cotangent (lane C) and ar (lane C+1)
    ride-alongs.  Measured motivation (tools/gather_bench.py, 2.1M rows):
    the round-2 two-gather scheme pays full row cost for the narrow [R, 2]
    ride-along source (45.6 ms vs 23.5 for one 128-wide gather — gathers are
    row-count bound); a single [R, C+2] gather is 29.7 ms f32 / 27.3 bf16,
    i.e. ~35-40% less cotangent-gather time.  Same math as _make_bwd_kernel.

    The slot-side x rows are NOT gathered: t_ell_row is ascending gap-free,
    so a tile's rows live in the same 8-aligned [T+8] window the segment-sum
    uses — the kernel DMAs that window of x from HBM and selects per-slot
    rows with a one-hot MXU matmul (an XLA [St, C] row gather of the sorted
    index cost 2.9 ms/layer at the bench shape; the window DMA is ~0.1 ms).
    """
    n_chunks = C // 128

    def kernel(r0as_ref, prev_eq_ref, seg_ref, gf_ref, x_ref, val_ref,
               alv_ref, alb_ref, *rest):
        outs = list(rest[0:2])
        x_win, x_sem = rest[2], rest[3]
        scratch = list(rest[4:])
        i = pl.program_id(0)
        T = seg_ref.shape[0]
        r0a = r0as_ref[i]
        r0a_prev = r0as_ref[jnp.maximum(i - 1, 0)]
        reduce = make_window_reducer(
            T, seg_ref[:], r0a, r0a_prev, prev_eq_ref[i]
        )

        g3 = gf_ref[:].reshape(T, K, C + 2)  # leading-dim reshape only
        cp_x = pltpu.make_async_copy(
            x_ref.at[pl.ds(pl.multiple_of(r0a, 8), T + 8)], x_win, x_sem
        )
        cp_x.start()
        cp_x.wait()
        rel = jnp.clip(seg_ref[:] - r0a, 0, T + 7)  # [T, 1]
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, T + 8), 1)
        ohX = (rel == iota_w).astype(x_win.dtype)  # [T, T+8]
        x_l = jax.lax.dot_general(
            ohX, x_win[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, C] f32
        val = val_ref[:]  # [T, K]
        g3f = g3.astype(jnp.float32)
        # ride-along lane extraction via basis masks (single-lane slices of a
        # lane-tiled block re-read the whole tile row — see module notes)
        wi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C + 2), 2)
        ar = jnp.sum(g3f * (wi == C + 1), axis=2)  # [T, K]
        rs = jnp.sum(g3f * (wi == C), axis=2)  # [T, K] rowsum cotangent
        al = (
            jnp.sum(x_l.astype(jnp.float32) * alv_ref[:], axis=1,
                    keepdims=True)
            + alb_ref[0, 0]
        ) / alb_ref[0, 1]  # [T, 1]
        a = al + ar
        ev = jnp.exp(jax.nn.leaky_relu(a, NEGATIVE_SLOPE)) * val

        x_f = x_l.astype(jnp.float32)
        g_ev = rs
        dx_chunks = []
        for j in range(n_chunks):
            gj = g3f[:, :, j * 128 : (j + 1) * 128]
            g_ev = g_ev + jnp.sum(
                gj * x_f[:, j * 128 : (j + 1) * 128][:, None, :], axis=2
            )
            dx_chunks.append(jnp.sum(ev[:, :, None] * gj, axis=1))
        d_a = g_ev * ev * jnp.where(a > 0, 1.0, NEGATIVE_SLOPE)
        dx_part = (
            jnp.concatenate(dx_chunks, axis=1) if n_chunks > 1 else dx_chunks[0]
        )
        _emit_channels(
            reduce, r0a, T, [dx_part, jnp.sum(d_a, axis=1)[:, None]],
            outs, scratch, i,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_rows", "tile", "interpret")
)
def _gat_bwd_impl_merged(gf, x_full, seg, val, alv, alb, scale, num_rows,
                         tile, interpret):
    St, K = val.shape
    C = x_full.shape[1]
    assert gf.shape[1] == C + 2, (gf.shape, C)
    T = tile
    assert St % T == 0
    n_tiles = St // T
    seg = seg.astype(jnp.int32)
    r0as, prev_eq = aligned_window_meta(seg, T)
    R_pad = ((num_rows + T + 16) // 8) * 8

    # x stays whole in HBM; the kernel DMAs the [r0a, r0a+T+8) row window
    x_pad = jnp.zeros((R_pad, C), x_full.dtype).at[: x_full.shape[0]].set(
        x_full
    )
    in_specs = [
        pl.BlockSpec((T, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T * K, C + 2), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # x [R_pad, C], HBM
        pl.BlockSpec((T, K), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # alv [1, C]
        pl.BlockSpec((1, 2), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [
        seg.reshape(St, 1), gf, x_pad, val.astype(jnp.float32),
        alv.astype(jnp.float32).reshape(1, C),
        jnp.stack(
            [jnp.asarray(alb, jnp.float32), jnp.asarray(scale, jnp.float32)]
        ).reshape(1, 2),
    ]
    ch_meta, scratch = _channel_outputs(T, C, [C, 1])
    scratch = [
        pltpu.VMEM((T + 8, C), x_full.dtype),  # x window (DMA dst)
        pltpu.SemaphoreType.DMA,
    ] + scratch
    out_shapes = [
        jax.ShapeDtypeStruct((R_pad, wl), jnp.float32) for _, wl in ch_meta
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in out_shapes],
        scratch_shapes=scratch,
    )
    dx_w, dal_w = pl.pallas_call(
        _make_bwd_kernel_merged(K, C),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(r0as, prev_eq, *inputs)
    return dx_w[:num_rows], dal_w[:num_rows, 0]


def gat_bwd_fused_merged(
    gf: jnp.ndarray,  # [St*K, C+2] gathered [cotangent | g_rowsum | ar]
    x_full: jnp.ndarray,  # [num_cols, C] whole x — windowed in-kernel
    seg: jnp.ndarray,  # [St] t_ell_row (ascending gap-free)
    val: jnp.ndarray,  # [St, K] t_ell_val
    alv: jnp.ndarray,  # [C] att_l[:C] (unscaled)
    alb,  # scalar att_l[C]
    scale,  # scalar explosion scale
    num_rows: int,
    tile: Optional[int] = None,
    interpret: bool = False,
):
    """Fused transposed GAT backward over ONE merged cotangent gather ->
    (dx_agg [R, C], d_al_node [R]), f32.  See _make_bwd_kernel_merged."""
    from vq_gnn_tpu.ops.spmm import pallas_interpret_mode

    interpret = interpret or pallas_interpret_mode()
    T = _pick_tile(val.shape[0], tile)
    if T is None:
        raise ValueError(f"St={val.shape[0]} has no 128/256/512 tile divisor")
    return _gat_bwd_impl_merged(
        gf, x_full, seg, val, alv, alb, scale, num_rows, T, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("num_rows", "tile", "interpret")
)
def _gat_bwd_impl(gl, gh, x_rows, seg, val, alv, alb, scale, num_rows, tile,
                  interpret):
    St, K = val.shape
    C = x_rows.shape[1]
    C1 = min(128, C)
    W = gh.shape[1]
    T = tile
    assert St % T == 0
    n_tiles = St // T
    seg = seg.astype(jnp.int32)
    r0as, prev_eq = aligned_window_meta(seg, T)
    R_pad = ((num_rows + T + 16) // 8) * 8

    in_specs = [
        pl.BlockSpec((T, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T * K, C1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T * K, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, K), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # alv [1, C]
        pl.BlockSpec((1, 2), lambda i, *_: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [
        seg.reshape(St, 1), gl, gh, x_rows, val.astype(jnp.float32),
        alv.astype(jnp.float32).reshape(1, C),
        jnp.stack(
            [jnp.asarray(alb, jnp.float32), jnp.asarray(scale, jnp.float32)]
        ).reshape(1, 2),
    ]
    ch_meta, scratch = _channel_outputs(T, C, [C, 1])
    out_shapes = [
        jax.ShapeDtypeStruct((R_pad, wl), jnp.float32) for _, wl in ch_meta
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in out_shapes],
        scratch_shapes=scratch,
    )
    dx_w, dal_w = pl.pallas_call(
        _make_bwd_kernel(K, C, C1, W),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(r0as, prev_eq, *inputs)
    return dx_w[:num_rows], dal_w[:num_rows, 0]


def gat_bwd_fused(
    gl: jnp.ndarray,  # [St*K, C1] gathered cotangent lo-lanes per cell
    gh: jnp.ndarray,  # [St*K, W] gathered [g_hi | g_rowsum | ar] per cell
    x_rows: jnp.ndarray,  # [St, C] x gathered by t_ell_row
    seg: jnp.ndarray,  # [St] t_ell_row (ascending gap-free)
    val: jnp.ndarray,  # [St, K] t_ell_val
    alv: jnp.ndarray,  # [C] att_l[:C] (unscaled)
    alb,  # scalar att_l[C]
    scale,  # scalar explosion scale
    num_rows: int,
    tile: Optional[int] = None,
    interpret: bool = False,
):
    """Fused transposed GAT backward -> (dx_agg [R, C], d_al_node [R]), f32.

    Everything the unfused path did between the cotangent gathers and the
    segment-sums (ar/rs lane extraction, a/ev recompute, g_ev SDDMM, d_a,
    dx partials) happens in one VMEM pass per slot tile."""
    from vq_gnn_tpu.ops.spmm import pallas_interpret_mode

    interpret = interpret or pallas_interpret_mode()
    T = _pick_tile(val.shape[0], tile)
    if T is None:
        raise ValueError(f"St={val.shape[0]} has no 128/256/512 tile divisor")
    return _gat_bwd_impl(
        gl, gh, x_rows, seg, val, alv, alb, scale, num_rows, T, interpret
    )


def _pick_tile(S: int, tile: Optional[int]) -> Optional[int]:
    import os

    if tile is None and (env := os.environ.get("VQ_GNN_ELL_TILE")):
        tile = int(env)
    if tile is not None:
        return tile if S % tile == 0 else None
    for t in (512, 256, 128):
        if S % t == 0:
            return t
    return None


def fused_tile_ok(S: int, tile: Optional[int] = None) -> bool:
    return _pick_tile(S, tile) is not None


def ell_aggregate_fused(
    nbrs_flat: jnp.ndarray,  # [S*K, C] gathered x[ell_col.flat] (cd dtype)
    seg: jnp.ndarray,  # [S] int32 ascending gap-free; padding = num_rows
    val: jnp.ndarray,  # [S, K] f32; padding cells = 0
    num_rows: int,
    tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Plain (GCN/SAGE) fused aggregate: out[r] = sum val[s,k]*nbrs[s,k] over
    slots of row r.  Returns f32 [num_rows, C]."""
    from vq_gnn_tpu.ops.spmm import pallas_interpret_mode

    interpret = interpret or pallas_interpret_mode()
    T = _pick_tile(val.shape[0], tile)
    if T is None:
        raise ValueError(f"S={val.shape[0]} has no 128/256/512 tile divisor")
    (out,) = _ell_fused_impl(
        nbrs_flat, seg, val, None, None, None, None, num_rows,
        gat=False, with_neg=False, with_rowsum=False, tile=T,
        interpret=interpret,
    )
    return out


def gat_aggregate_fused(
    nbrs_flat: jnp.ndarray,  # [S*K, C] gathered x[ell_col.flat] (cd dtype)
    seg: jnp.ndarray,  # [S] int32 ascending gap-free; padding = num_rows
    val: jnp.ndarray,  # [S, K] f32 row-normalized adj values; padding = 0
    ar: jnp.ndarray,  # [num_rows] f32 row-side logits (already / scale)
    alv: jnp.ndarray,  # [C] f32 att_l[:C] (unscaled)
    alb,  # scalar f32 att_l[C] (ones-column bias, unscaled)
    scale,  # scalar f32 explosion scale (Trick 1)
    num_rows: int,
    with_neg: bool = True,
    tile: Optional[int] = None,
    interpret: bool = False,
):
    """Fused GAT aggregate.  Per cell ``ev = exp(leaky(al+ar)) * val`` with
    ``al`` computed from the resident neighbor block and ``ar`` recovered
    from the row window; returns
    (agg [R, C], rowsum [R], aggn [R, C] | None, rsn [R] | None), all f32.
    """
    from vq_gnn_tpu.ops.spmm import pallas_interpret_mode

    interpret = interpret or pallas_interpret_mode()
    T = _pick_tile(val.shape[0], tile)
    if T is None:
        raise ValueError(f"S={val.shape[0]} has no 128/256/512 tile divisor")
    res = _ell_fused_impl(
        nbrs_flat, seg, val, ar, alv, alb, scale, num_rows,
        gat=True, with_neg=with_neg, with_rowsum=True, tile=T,
        interpret=interpret,
    )
    if with_neg:
        agg, aggn, rowsum, rsn = res
        return agg, rowsum, aggn, rsn
    agg, rowsum = res
    return agg, rowsum, None, None
