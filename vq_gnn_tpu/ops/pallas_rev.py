"""Pallas TPU kernel: fused rev-ELL recovery for the v1 exact-reverse term.

The v1 mapper's non-GCN recovery (reference ``vq_gnn_v1/utils/dataloader.py:
153-180``) builds, per branch, an [M, B] cell grid ``relu(sum rv - sum A)``
(coalesce + keep-positive), applies the per-cell GAT attention, and
contracts it against the batch features and the codeword grad table.  The
XLA lowering of that math (``nn/model.py:_bm_exact_reverse_info``) was the
measured floor of the whole bm GAT step: ~100 ms/step of unsorted
scatter-add into the [nb, M*B_pad] grid (XLA re-sorts the scatter indices
every step) plus ~30 ms materializing/relu-ing the 1.3 GB grid
(BASELINE.md round-4 bm decomposition).

This kernel removes both: the grid never exists.  The reverse edges are
static per batch, so the host sorts them by batch row, coalesces duplicate
(row, col) pairs (always a subset of the dynamic (row, codeword) coalesce,
so semantics-preserving), and packs them into K-wide row slots plus a
packed (row-tile, slot-chunk) schedule (``build_rev_ell``).  On device,
a sequential grid over (branch, packed-chunk) then:

  1. builds each chunk's per-slot codeword histogram ``part [T_s, M]`` with
     VPU one-hot selects (K lane-column iterations — the per-cell codeword
     ``c = c_indices[col]`` is gathered once outside the kernel);
  2. folds slots onto the tile's rows with an exact 0/1 one-hot MXU matmul
     into a ``S_acc [TB, M]`` VMEM accumulator (the slot two-stage
     amortizes the TB*M fold by K vs a per-cell one-hot);
  3. at each tile's last chunk, applies relu + the separable attention
     surface ``exp(leaky(al[b] + arcb[m]))`` and contracts against
     ``G = xb @ gbar^T`` — computed in-tile from an 8-sublane ``gbarT`` so
     no [B_pad, M] product is ever materialized.

Fold precision: the one-hot operand is exactly representable in bf16, so
``x2`` (default) splits ``part`` into bf16 hi+lo and runs two single-pass
MXU products — ~2^-16 relative error at 1/3 the cost of a HIGHEST f32
fold; ``fast`` is one bf16 pass (~1e-3, for the bf16 bench path);
``highest`` is the 6-pass exact f32 fold.  Select with VQ_GNN_REV_FOLD.

The backward is a custom VJP: the same chunk schedule recomputes S_acc and
emits d_xb / d_al (fused into one [TB, 2*Dp] block write) and an
accumulated d_arcb — vals and the codeword grad table carry no gradient
(reference autograd semantics: the grad table is the stop-gradient hook
payload).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rev_fold_mode() -> str:
    m = os.environ.get("VQ_GNN_REV_FOLD", "x2")
    return m if m in ("x2", "fast", "highest") else "x2"


def rev_tb(B_pad: int, cap: int = 128) -> int:
    """Row-tile size: the largest power-of-2 <= cap dividing B_pad (tiny
    test batches aren't TB=128 multiples).  Deterministic so the host
    builder and the model-side kernel call agree without plumbing."""
    tb = cap
    while tb > 1 and B_pad % tb:
        tb //= 2
    return tb


# --------------------------------------------------------------------------
# host-side builder
# --------------------------------------------------------------------------
def build_rev_ell(rr, rc, rv, B_pad: int, num_N: int, K: int = 8,
                  T_s: int = 128, TB: int = 128):
    """Sort + coalesce the reverse-edge list and build the rev-ELL layout.

    rr/rc/rv: per-entry (local batch row, global neighbor col, value) —
    duplicates allowed (the mapper's reverse-normalized additions and raw-A
    subtractions target the same (row, col) on symmetric in-batch pairs and
    are summed here; identical-(row, col) coalescing commutes with the
    dynamic per-codeword coalesce for any c_indices).

    Returns a dict of numpy arrays (unpadded sizes; ``pad_rev_ell`` applies
    the loader's high-water buckets):
      slot_col [S, K] int32 (pad cells -> num_N), slot_val [S, K] f32,
      slot_row [S, 1] int32 (ascending; pad slots -> B_pad),
      tile_of/blk_of/flags [P] int32 — the packed schedule; flags bit0 =
      first chunk of tile (zero S_acc), bit1 = live (accumulate), bit2 =
      finalize.  Every row tile gets >= 1 entry and exactly one finalize.
    """
    assert B_pad % TB == 0, (B_pad, TB)
    rr = np.asarray(rr, np.int64)
    rc = np.asarray(rc, np.int64)
    rv = np.asarray(rv, np.float64)
    # static coalesce by (row, col); drop exact zeros (keep-positive drops
    # them later anyway, relu(0) == 0)
    key = rr * (num_N + 1) + rc
    uniq, inv = np.unique(key, return_inverse=True)
    vals = np.zeros(len(uniq))
    np.add.at(vals, inv, rv)
    keep = vals != 0.0
    uniq, vals = uniq[keep], vals[keep]
    rows = (uniq // (num_N + 1)).astype(np.int64)  # ascending (key-major)
    cols = (uniq % (num_N + 1)).astype(np.int64)

    # K-wide row slots over the sorted cells
    deg = np.bincount(rows, minlength=B_pad) if len(rows) else np.zeros(
        B_pad, np.int64
    )
    nslot = (deg + K - 1) // K  # rows without cells own no slot
    S = max(int(nslot.sum()), 1)
    slot_row = np.repeat(np.arange(B_pad), nslot).astype(np.int32)
    if len(slot_row) == 0:
        slot_row = np.array([B_pad], np.int32)  # degenerate: one pad slot
    slot_col = np.full((S, K), num_N, np.int32)
    slot_val = np.zeros((S, K), np.float32)
    if len(rows):
        # cell -> (slot, lane): within each row, cells fill lanes 0..K-1
        cum = np.concatenate([[0], np.cumsum(deg)])
        within = np.arange(len(rows)) - cum[rows]
        slot_base = np.concatenate([[0], np.cumsum(nslot)])
        s_idx = slot_base[rows] + within // K
        lane = within % K
        slot_col[s_idx, lane] = cols
        slot_val[s_idx, lane] = vals.astype(np.float32)

    # packed (tile, chunk) schedule: tile i covers rows [i*TB, (i+1)*TB);
    # its cells occupy the contiguous slot range [sb_i, eb_i]; chunk blocks
    # of T_s slots, block-aligned (neighbors' slots in shared blocks are
    # masked by the in-kernel row-range check)
    n_tiles = B_pad // TB
    slot_base_t = np.searchsorted(slot_row, np.arange(0, B_pad + TB, TB))
    tiles, blks, flags = [], [], []
    for i in range(n_tiles):
        sb, eb = int(slot_base_t[i]), int(slot_base_t[i + 1])
        if eb <= sb:  # empty tile: schedule one dead finalize-only entry
            tiles.append(i)
            blks.append(0)
            flags.append(1 | 4)  # first + fin, not live
            continue
        b0, b1 = sb // T_s, (eb - 1) // T_s
        for j, b in enumerate(range(b0, b1 + 1)):
            tiles.append(i)
            blks.append(b)
            f = 2  # live
            if j == 0:
                f |= 1  # first
            if b == b1:
                f |= 4  # fin
            flags.append(f)
    return {
        "slot_col": slot_col,
        "slot_val": slot_val,
        "slot_row": slot_row.reshape(-1, 1),
        "tile_of": np.asarray(tiles, np.int32),
        "blk_of": np.asarray(blks, np.int32),
        "flags": np.asarray(flags, np.int32),
    }


def pad_rev_ell(d: dict, S_pad: int, P_pad: int, B_pad: int, num_N: int,
                T_s: int = 128, TB: int = 128):
    """Pad a build_rev_ell dict to the loader's high-water buckets.
    S_pad must be a T_s multiple.  Padding schedule entries are dead
    (flags 0) and point at the last tile so the pipeline's block indices
    stay monotone."""
    S = d["slot_row"].shape[0]
    P = d["tile_of"].shape[0]
    assert S_pad % T_s == 0 and S_pad >= S and P_pad >= P, (S, S_pad, P, P_pad)
    K = d["slot_col"].shape[1]
    out = dict(d)
    out["slot_col"] = np.concatenate(
        [d["slot_col"], np.full((S_pad - S, K), num_N, np.int32)]
    )
    out["slot_val"] = np.concatenate(
        [d["slot_val"], np.zeros((S_pad - S, K), np.float32)]
    )
    out["slot_row"] = np.concatenate(
        [d["slot_row"], np.full((S_pad - S, 1), B_pad, np.int32)]
    )
    n_tiles = B_pad // TB
    out["tile_of"] = np.concatenate(
        [d["tile_of"], np.full(P_pad - P, n_tiles - 1, np.int32)]
    )
    out["blk_of"] = np.concatenate([d["blk_of"], np.zeros(P_pad - P, np.int32)])
    out["flags"] = np.concatenate([d["flags"], np.zeros(P_pad - P, np.int32)])
    return out


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------
def _fold(row_oh, part, mode):
    """S_acc contribution: [T_s, TB]^T @ [T_s, M].  row_oh is exact 0/1."""
    dn = (((0,), (0,)), ((), ()))
    if mode == "highest":
        return jax.lax.dot_general(
            row_oh.astype(jnp.float32), part, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    oh = row_oh.astype(jnp.bfloat16)
    if mode == "fast":
        return jax.lax.dot_general(
            oh, part.astype(jnp.bfloat16), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    # x2: bf16 hi/lo split of part; the 0/1 operand is exact, so error is
    # only the lo residual's rounding (~2^-16 relative) at 2 single passes
    hi = part.astype(jnp.bfloat16)
    lo = (part - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        oh, hi, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return acc + jax.lax.dot_general(
        oh, lo, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _pick_bb(nb: int, cap: int = 8) -> int:
    """Branches folded per grid step: the round-5 profiler showed the
    per-branch grid (nb x P = 8192 steps at the bm bench shape) was ~85%
    fixed grid-step overhead (~5.5us/step); blocking 8 branches per step
    cuts steps 8x at identical VPU/MXU totals."""
    bb = 1
    while bb < nb and bb < cap:
        bb *= 2
    return bb


def _accumulate(tile_of_ref, blk_of_ref, flags_ref, srow_ref, val_ref, c_ref,
                S_acc, *, TB, T_s, K, M, BB, mode):
    """Shared fwd/bwd chunk step: zero on first; when live, build each
    folded branch's per-slot codeword histogram and one-hot-fold it onto
    the tile's rows (rowOH built once, shared by all BB branches)."""
    p = pl.program_id(1)
    fl = flags_ref[p]

    @pl.when(fl & 1 != 0)
    def _zero():
        S_acc[:] = jnp.zeros_like(S_acc)

    @pl.when(fl & 2 != 0)
    def _live():
        r0 = tile_of_ref[p] * TB
        rel = srow_ref[:] - r0  # [T_s, 1]
        ok = (rel >= 0) & (rel < TB)
        relc = jnp.clip(rel, 0, TB - 1)
        iota_tb = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)
        row_oh = (relc == iota_tb) & ok  # [T_s, TB] bool
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        # 'fast' builds the histogram in bf16 too: the K-loop's [T_s, M]
        # select/accumulate streams are the kernel's VPU/VMEM floor, and
        # bf16 halves that traffic (val rounding ~1e-3 — the same budget
        # as the bf16 bench compute dtype)
        pdt = jnp.bfloat16 if mode == "fast" else jnp.float32
        for bb in range(BB):
            part = jnp.zeros((T_s, M), pdt)
            for k in range(K):
                ck = c_ref[0, :, bb * K + k : bb * K + k + 1]  # [T_s, 1]
                vk = val_ref[:, k : k + 1].astype(pdt)  # [T_s, 1]
                # mask-multiply, not where: Mosaic rejects the bf16 select
                # over an i1 [T_s, M] mask ("Invalid relayout ... i1")
                part = part + (ck == iota_m).astype(pdt) * vk
            S_acc[:, bb * M : (bb + 1) * M] += _fold(row_oh, part, mode)


def _surface_bb(S_acc, al_ref, arcb_ref, bb, M):
    """relu + the separable attention surface for folded branch bb."""
    S = jnp.maximum(S_acc[:, bb * M : (bb + 1) * M], 0.0)  # keep-positive
    a = al_ref[0][:, bb : bb + 1] + arcb_ref[0, bb : bb + 1, :]  # [TB, M]
    att = jnp.exp(jnp.where(a >= 0, a, 0.2 * a))  # bare-exp leaky, slope .2
    return S, a, att


def _fwd_kernel(tile_of_ref, blk_of_ref, flags_ref, srow_ref, val_ref, c_ref,
                xb_ref, al_ref, arcb_ref, gbarT_ref, info_ref, S_out_ref,
                S_acc, *, TB, T_s, K, M, Dp, BB, mode):
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        info_ref[:] = jnp.zeros_like(info_ref)

    _accumulate(tile_of_ref, blk_of_ref, flags_ref, srow_ref, val_ref, c_ref,
                S_acc, TB=TB, T_s=T_s, K=K, M=M, BB=BB, mode=mode)

    @pl.when(flags_ref[p] & 4 != 0)
    def _fin():
        # stash the finalized pre-relu accumulator: the backward becomes a
        # pure per-tile pass over this array instead of re-running the
        # whole chunk accumulation (the round-5 profiler put the recompute
        # at ~37 ms/step at the bm bench shape; the streaming stash write
        # is ~2 ms and the rewritten backward ~6 ms)
        S_out_ref[0] = S_acc[:]
        for bb in range(BB):
            S, _, att = _surface_bb(S_acc, al_ref, arcb_ref, bb, M)
            G = jnp.dot(
                xb_ref[0][:, bb * Dp : (bb + 1) * Dp],
                gbarT_ref[0][bb * Dp : (bb + 1) * Dp, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [TB, Dp] @ [Dp, M]
            info_ref[0, bb : bb + 1, :] += jnp.sum(S * att * G)


def _bwd_kernel(S_in_ref, xb_ref, al_ref, arcb_ref, gbarT_ref, dxbal_ref,
                darcb_ref, *, TB, M, Dp, BB):
    """Per-tile backward over the forward's stashed accumulator: grid
    (nbg, n_tiles), no chunk loop, no scalar prefetch."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        darcb_ref[:] = jnp.zeros_like(darcb_ref)

    cols = []
    for bb in range(BB):
        S = jnp.maximum(S_in_ref[0][:, bb * M : (bb + 1) * M], 0.0)
        a = al_ref[0][:, bb : bb + 1] + arcb_ref[0, bb : bb + 1, :]
        att = jnp.exp(jnp.where(a >= 0, a, 0.2 * a))
        gT = gbarT_ref[0][bb * Dp : (bb + 1) * Dp, :]
        G = jnp.dot(
            xb_ref[0][:, bb * Dp : (bb + 1) * Dp], gT,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        Satt = S * att
        # d info / d xb = Satt @ gbarT^T (unit cotangent; caller scales)
        dxb = jax.lax.dot_general(
            Satt, gT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TB, Dp]
        d_a = Satt * jnp.where(a >= 0, 1.0, 0.2) * G  # [TB, M]
        cols.append(dxb)
        cols.append(jnp.sum(d_a, axis=1, keepdims=True))  # d_al [TB, 1]
        darcb_ref[0, bb : bb + 1, :] += jnp.sum(d_a, axis=0, keepdims=True)
    dxbal_ref[0] = jnp.concatenate(cols, axis=1)  # [TB, BB*(Dp+1)]


# --------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------
def _specs(T_s, K, TB, Dp, M, BB, out):
    """in_specs shared by fwd/bwd over the branch-grouped layouts.
    index_map args: (n, p, tile_of, blk_of, flags) — scalar-prefetch refs
    are appended by PrefetchScalarGridSpec."""
    def by_blk(n, p, t, b, f):
        return (b[p], 0)

    def by_blk_n(n, p, t, b, f):
        return (n, b[p], 0)

    def by_tile_n(n, p, t, b, f):
        return (n, t[p], 0)

    def by_n3(n, p, t, b, f):
        return (n, 0, 0)

    in_specs = [
        pl.BlockSpec((T_s, 1), by_blk, memory_space=pltpu.VMEM),  # slot_row
        pl.BlockSpec((T_s, K), by_blk, memory_space=pltpu.VMEM),  # slot_val
        pl.BlockSpec((1, T_s, BB * K), by_blk_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TB, BB * Dp), by_tile_n, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TB, BB), by_tile_n, memory_space=pltpu.VMEM),  # al
        pl.BlockSpec((1, BB, M), by_n3, memory_space=pltpu.VMEM),  # arcb
        pl.BlockSpec((1, BB * Dp, M), by_n3, memory_space=pltpu.VMEM),
    ]
    if out == "fwd":
        out_specs = [
            pl.BlockSpec((1, BB, 128), by_n3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, BB * M), by_tile_n, memory_space=pltpu.VMEM),
        ]
    else:
        out_specs = [
            pl.BlockSpec(
                (1, TB, BB * (Dp + 1)), by_tile_n, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, BB, M), by_n3, memory_space=pltpu.VMEM),
        ]
    return in_specs, out_specs


def _pack_branches(c_flat, K, xb, al, arcb, gbarT):
    """Group BB branches per grid step: [nb, ...] -> [nbg, ..., BB*lanes]
    layouts (branch-minor lanes).  Padded branches carry zero gbarT, so
    every padded contribution and gradient is exactly zero.

    ``c_flat`` is the gather-natural [S*K, nb] layout (take over
    c_indices rows) — packing it to [nbg, S, BB*K] is then ONE relayout
    instead of the transpose + re-transpose a [nb, S, K] contract costs
    (~15 MB of data-formatting per call at the bm bench shape)."""
    nb = xb.shape[0]
    S = c_flat.shape[0] // K
    B_pad, Dp = xb.shape[1], xb.shape[2]
    M = arcb.shape[1]
    BB = _pick_bb(nb)
    nbg = -(-nb // BB)
    nb_pad = nbg * BB

    def padb(a):
        return jnp.pad(a, ((0, nb_pad - nb),) + ((0, 0),) * (a.ndim - 1))

    c_g = (
        jnp.pad(c_flat, ((0, 0), (0, nb_pad - nb)))
        .reshape(S, K, nbg, BB).transpose(2, 0, 3, 1).reshape(nbg, S, BB * K)
    )
    xb_g = (
        padb(xb).reshape(nbg, BB, B_pad, Dp).transpose(0, 2, 1, 3)
        .reshape(nbg, B_pad, BB * Dp)
    )
    al_g = padb(al)[..., 0].reshape(nbg, BB, B_pad).transpose(0, 2, 1)
    arcb_g = padb(arcb).reshape(nbg, BB, M)
    gbarT_g = padb(gbarT).reshape(nbg, BB * Dp, M)
    return c_g, xb_g, al_g, arcb_g, gbarT_g, BB, nbg, nb_pad


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        # S_acc [TB, BB*M] + per-branch histogram transients exceed the
        # default 16MB scoped budget at BB=8, M=1024
        vmem_limit_bytes=100 * 1024 * 1024,
    )


@functools.partial(
    jax.jit, static_argnames=("T_s", "TB", "mode", "interpret")
)
def _rev_fwd_impl(c_slots, slot_val, slot_row, tile_of, blk_of, flags,
                  xb, al, arcb, gbarT, *, T_s, TB, mode, interpret):
    """-> (info [nb], S_g [nbg, B_pad, BB*M]) — the stashed pre-relu
    accumulator in the packed branch-group layout, consumed by the
    backward's per-tile pass."""
    nb = xb.shape[0]
    K = slot_val.shape[1]
    M = arcb.shape[1]
    Dp = xb.shape[2]
    B_pad = xb.shape[1]
    P = tile_of.shape[0]
    c_g, xb_g, al_g, arcb_g, gbarT_g, BB, nbg, nb_pad = _pack_branches(
        c_slots, K, xb, al, arcb, gbarT
    )
    in_specs, out_specs = _specs(T_s, K, TB, Dp, M, BB, "fwd")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nbg, P),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((TB, BB * M), jnp.float32)],
    )
    info, S_g = pl.pallas_call(
        functools.partial(
            _fwd_kernel, TB=TB, T_s=T_s, K=K, M=M, Dp=Dp, BB=BB, mode=mode
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbg, BB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nbg, B_pad, BB * M), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(tile_of, blk_of, flags, slot_row, slot_val, c_g, xb_g, al_g, arcb_g,
      gbarT_g)
    return info.reshape(nb_pad, 128)[:nb, 0], S_g


@functools.partial(jax.jit, static_argnames=("TB", "interpret"))
def _rev_bwd_impl(S_g, xb, al, arcb, gbarT, *, TB, interpret):
    """Per-tile backward over the stashed accumulator (no chunk loop)."""
    nb = xb.shape[0]
    M = arcb.shape[1]
    Dp = xb.shape[2]
    B_pad = xb.shape[1]
    _, xb_g, al_g, arcb_g, gbarT_g, BB, nbg, nb_pad = _pack_branches(
        jnp.zeros((1, nb), jnp.int32), 1, xb, al, arcb, gbarT
    )
    n_tiles = B_pad // TB

    def by_tile(n, i):
        return (n, i, 0)

    def by_n3(n, i):
        return (n, 0, 0)

    dxbal, darcb = pl.pallas_call(
        functools.partial(_bwd_kernel, TB=TB, M=M, Dp=Dp, BB=BB),
        grid=(nbg, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TB, BB * M), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, BB * Dp), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, BB), by_tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, M), by_n3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB * Dp, M), by_n3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TB, BB * (Dp + 1)), by_tile, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, BB, M), by_n3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbg, B_pad, BB * (Dp + 1)), jnp.float32),
            jax.ShapeDtypeStruct((nbg, BB, M), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(S_g, xb_g, al_g, arcb_g, gbarT_g)
    dxbal = (
        dxbal.reshape(nbg, B_pad, BB, Dp + 1).transpose(0, 2, 1, 3)
        .reshape(nb_pad, B_pad, Dp + 1)[:nb]
    )
    return dxbal, darcb.reshape(nb_pad, M)[:nb]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def rev_recovery_info(c_slots, slot_val, slot_row, tile_of, blk_of, flags,
                      xb, al, arcb, gbarT, T_s, TB, mode, interpret):
    """Per-branch recovery info scalars [nb] from the rev-ELL layout.

    c_slots [S_pad*K, nb] i32 — per-cell codeword, gather-natural layout
    (c_indices rows taken at the flat slot cols); slot_val [S_pad, K] f32;
    slot_row
    [S_pad, 1] i32 ascending; tile_of/blk_of/flags [P] i32 (build_rev_ell);
    xb [nb, B_pad, Dp] f32 (features ‖ ones, zero-padded to Dp sublanes);
    al [nb, B_pad, 1], arcb [nb, M] — attention logit halves (zeros for the
    attention-less SAGE recovery: exp(leaky(0)) == 1);
    gbarT [nb, Dp, M] f32 — transposed stop-gradient grad table.

    Differentiable in xb / al / arcb only (vals and the grad table are
    constants per the reference's hook semantics).
    """
    info, _ = _rev_fwd_impl(
        c_slots, slot_val, slot_row, tile_of, blk_of, flags, xb, al, arcb,
        gbarT, T_s=T_s, TB=TB, mode=mode, interpret=interpret,
    )
    return info


def _rev_fwd(c_slots, slot_val, slot_row, tile_of, blk_of, flags, xb, al,
             arcb, gbarT, T_s, TB, mode, interpret):
    info, S_g = _rev_fwd_impl(
        c_slots, slot_val, slot_row, tile_of, blk_of, flags, xb, al, arcb,
        gbarT, T_s=T_s, TB=TB, mode=mode, interpret=interpret,
    )
    return info, (S_g, c_slots, slot_val, slot_row, tile_of, blk_of, flags,
                  xb, al, arcb, gbarT)


def _rev_bwd(T_s, TB, mode, interpret, res, g):
    (S_g, c_slots, slot_val, slot_row, tile_of, blk_of, flags, xb, al, arcb,
     gbarT) = res
    Dp = xb.shape[2]
    dxbal, darcb = _rev_bwd_impl(
        S_g, xb, al, arcb, gbarT, TB=TB, interpret=interpret,
    )
    gs = g[:, None, None]  # [nb, 1, 1] per-branch cotangent
    d_xb = dxbal[:, :, :Dp] * gs
    d_al = dxbal[:, :, Dp:] * gs
    d_arcb = darcb * g[:, None]
    zeros = jax.tree.map(
        jnp.zeros_like, (c_slots, slot_val, slot_row, tile_of, blk_of, flags)
    )
    return (*zeros, d_xb, d_al, d_arcb, jnp.zeros_like(gbarT))


rev_recovery_info.defvjp(_rev_fwd, _rev_bwd)
