"""Pallas TPU kernel: fused VQ assignment + cluster statistics.

Fuses the reference's four-op hot sequence (``vq.py v2:229-256``):
distance GEMM -> argmin -> one-hot -> (counts, one-hot GEMM sums)
into one pass.  The [B, M] distance matrix and the [B, M] one-hot never
leave VMEM — at B=86k, M=256, nb=32 branches that saves ~1.4GB of HBM
round-trip per layer per step vs the XLA lowering.

Layout: grid over B tiles; the codebook (M<=32767, K<=2*D+1) stays resident
in VMEM; counts/sums accumulate across the sequential TPU grid.

Hard-won lowering notes:
- ``jnp.sum(emb*emb, axis=1)[None, :]`` inside the kernel forces a
  sublane->lane transpose of a [M] vector that Mosaic lowers via ~178MB of
  register spills (!) — the codebook row norms must be computed OUTSIDE and
  passed as a [1, M] operand.
- the assignment index must be produced as [TB, 1] (keepdims) — a [TB]
  1-D value reshaped to rows triggers the same relayout spill.
- Mosaic's generic argmin lowering also blows scoped VMEM; the manual
  min + compare + index-min sequence below is fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _assign_kernel(
    xn_ref, emb_ref, e2_ref, valid_ref, idx_ref, counts_ref, sums_ref, *, fast
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    xn = xn_ref[:]  # [TB, K]
    emb = emb_ref[:]  # [M, K]
    valid = valid_ref[:]  # [TB, 1] f32
    M = emb.shape[0]

    # expanded-square distances on the MXU; ||xn||^2 is constant per row and
    # does not affect the argmin, so skip it.  ``fast`` mirrors the xla_fast
    # backend: bf16 MXU operands (Mosaic requires the accumulator itself to
    # stay 32-bit); near-tie assignments may flip vs exact f32.
    # bf16 dots pin precision=DEFAULT: an ambient
    # jax_default_matmul_precision='highest' would request an fp32-contract
    # on bf16 operands, which Mosaic rejects ("Bad lhs type").
    if fast:
        d = e2_ref[:] - 2.0 * jnp.dot(
            xn.astype(jnp.bfloat16), emb.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    else:
        d = e2_ref[:] - 2.0 * jnp.dot(
            xn, emb.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # manual first-argmin (min + compare + index-min)
    d_min = jnp.min(d, axis=1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    idx = jnp.min(jnp.where(d <= d_min, col, M), axis=1, keepdims=True).astype(
        jnp.int32
    )  # [TB, 1]
    idx_ref[:] = idx

    acc = jnp.bfloat16 if fast else jnp.float32  # 0/1 and the mask are exact
    onehot = (idx == jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)).astype(acc)
    onehot = onehot * valid.astype(acc)
    counts_ref[:] += jnp.sum(onehot.astype(jnp.float32), axis=0)[None, :]
    # contract over the batch tile without an explicit transpose
    sums_ref[:] += jax.lax.dot_general(
        onehot,
        xn.astype(acc) if fast else xn,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT if fast else None,
    )


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret", "fast"))
def fused_assign(
    xn, emb, valid, tile_b: int = 0, interpret: bool = False, fast: bool = False
):
    """(idx [B] i32, counts [M] f32, sums [M, K] f32) for one branch.

    ``fast=False`` matches nearest_codeword + assignment_stats exactly (same
    expanded-square distances, f32 MXU accumulation); ``fast=True`` streams
    the distance tile and the one-hot in bf16 like the xla_fast backend.
    tile_b=0 picks the M-adaptive tile (same formula as fused_assign_branches):
    large tiles amortize the per-program DMA/setup cost (1024-sized tiles
    spent most of the 11.5ms/layer on 2688 tiny program launches), but the
    [TB, M] distance + one-hot VMEM tiles must stay under the 16MB
    scoped-VMEM limit, which rejects TB=4096 once M >= 1024.
    """
    B, K = xn.shape
    M = emb.shape[0]
    if tile_b == 0:
        tile_b = max(512, min(4096, (1 << 20) // M // 512 * 512))
    assert tile_b % 128 == 0
    B_pad = ((B + tile_b - 1) // tile_b) * tile_b
    if B_pad != B:
        xn = jnp.pad(xn, ((0, B_pad - B), (0, 0)))
        valid = jnp.pad(valid, (0, B_pad - B))
    v2 = valid.astype(jnp.float32)[:, None]
    e2 = jnp.sum(emb * emb, axis=1, dtype=jnp.float32)[None, :]  # [1, M]

    grid = (B_pad // tile_b,)
    idx, counts, sums = pl.pallas_call(
        functools.partial(_assign_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, M), jnp.float32),
            jax.ShapeDtypeStruct((M, K), jnp.float32),
        ],
        interpret=interpret,
    )(xn, emb, e2, v2)
    return idx[:B, 0], counts[0], sums


def _assign_kernel_allb(
    xn_ref, emb_ref, e2_ref, valid_ref, idx_ref, counts_ref, sums_ref, *, fast
):
    i = pl.program_id(1)  # B-tile index (grid dim 0 is the branch group)

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    valid = valid_ref[:]  # [1, TB] f32
    nb, K, TB = xn_ref.shape
    M = emb_ref.shape[1]
    acc = jnp.bfloat16 if fast else jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (M, TB), 0)
    ones_col = jnp.ones((TB, 1), jnp.float32)
    # the validity mask redirects invalid lanes to the out-of-range index M
    # BEFORE the one-hot (a [1, TB] select), so their one-hot column is all
    # zero — instead of an [M, TB] mask multiply (a full VPU pass/branch)
    idx_dustbin = jnp.full((1, TB), M, jnp.int32)
    vmask_row = valid > 0.0  # [1, TB]

    # TB rides the 128-lane dimension everywhere (d/one-hot are [M, TB],
    # idx is [1, TB]): the natural [TB, K]/[TB, 1] layouts pad K=8 and 1 up
    # to 128 lanes, inflating the VMEM windows 16-128x (measured 134MB ->
    # rejected).  fori_loop, NOT a Python unroll — unrolled, Mosaic keeps
    # all nb distance/one-hot intermediates live at once.
    def body(b, _):
        xnT = xn_ref[b]  # [K, TB]
        emb = emb_ref[b]  # [M, K]
        if fast:
            # precision pinned: ambient 'highest' + bf16 operands is a
            # Mosaic compile error (fp32 contract on bf16 lhs)
            d = e2_ref[b] - 2.0 * jnp.dot(
                emb.astype(jnp.bfloat16), xnT.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [M, TB]
        else:
            d = e2_ref[b] - 2.0 * jnp.dot(
                emb, xnT, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        d_min = jnp.min(d, axis=0, keepdims=True)  # [1, TB]
        idx = jnp.min(jnp.where(d <= d_min, row, M), axis=0, keepdims=True).astype(
            jnp.int32
        )  # [1, TB]
        idx_ref[b] = idx
        idx_s = jnp.where(vmask_row, idx, idx_dustbin)  # [1, TB]
        onehot = (idx_s == row).astype(acc)
        counts_ref[b] += jnp.dot(
            onehot.astype(jnp.float32), ones_col, preferred_element_type=jnp.float32
        )  # [M, 1]
        sums_ref[b] += jax.lax.dot_general(
            onehot,
            xnT.astype(acc) if fast else xnT,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT if fast else None,
        )  # [M, K]
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret", "fast"))
def fused_assign_branches(
    xn, emb, valid, tile_b: int = 0, interpret: bool = False, fast: bool = False
):
    """All-branch fused assign: xn [nb, B, K], emb [nb, M, K] ->
    (idx [nb, B] i32, counts [nb, M] f32, sums [nb, M, K] f32).

    One grid program handles a B tile across ALL branches with an in-kernel
    fori_loop: a vmap of the single-branch kernel launches nb*B/tile tiny
    programs whose fixed setup/DMA cost dominates the ~10us of real work
    each (measured ~10ms/layer at nb=32); this shape does the same work in
    B/tile programs.  Inputs move through VMEM B-major ([nb, K, TB] /
    [1, TB] / [M, 1] windows) — see the kernel's layout note."""
    nb, B, K = xn.shape
    M = emb.shape[1]
    if tile_b == 0:
        # keep the per-branch [M, TB] distance/one-hot scratch ~4MB so the
        # whole kernel stays inside the 64MB scoped-VMEM stack (M=1024 at
        # TB=4096 needs 73MB and is rejected)
        tile_b = max(512, min(4096, (1 << 20) // M // 512 * 512))
    assert tile_b % 128 == 0
    B_pad = ((B + tile_b - 1) // tile_b) * tile_b
    if B_pad != B:
        xn = jnp.pad(xn, ((0, 0), (0, B_pad - B), (0, 0)))
        valid = jnp.pad(valid, (0, B_pad - B))
    xnT = jnp.swapaxes(xn, 1, 2)  # [nb, K, B_pad]
    v2 = valid.astype(jnp.float32)[None, :]  # [1, B_pad]
    e2 = jnp.sum(emb * emb, axis=2, dtype=jnp.float32)[:, :, None]  # [nb, M, 1]

    # branch-group grid dim: the per-branch emb/e2/counts/sums windows are
    # lane-padded (K or 1 -> 128 lanes), so keeping ALL nb branches resident
    # costs nb*M*128*4 bytes PER BUFFER — at nb=32, M=1024 that is 4 x 16MB
    # of TB-independent VMEM and the 64MB scoped stack rejects the kernel
    # (measured 68.25M on the bm GAT workload, and shrinking TB only saved
    # 2.1M).  Chunking branches over the grid keeps bg*M <= 12288 rows
    # resident; B tiles iterate fastest so counts/sums accumulate per group.
    # largest divisor of nb with bg*M <= 12288 (repeated halving strands odd
    # nb / small power-of-2 factors above the bound and the kernel is still
    # rejected); bg=1 always satisfies M <= 12288 for every shipped config
    bg = max(
        (d for d in range(1, nb + 1) if nb % d == 0 and d * M <= 12288),
        default=1,
    )
    grid = (nb // bg, B_pad // tile_b)
    idx, counts, sums = pl.pallas_call(
        functools.partial(_assign_kernel_allb, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bg, K, tile_b), lambda j, i: (j, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, M, K), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, M, 1), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bg, 1, tile_b), lambda j, i: (j, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, M, 1), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, M, K), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, B_pad), jnp.int32),
            jax.ShapeDtypeStruct((nb, M, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, M, K), jnp.float32),
        ],
        # inside a large jitted step the default scoped-VMEM stack is 16MB;
        # this kernel's windows + per-branch scratch need ~17-32MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xnT, emb, e2, v2)
    return idx[:, 0, :B], counts[:, :, 0], sums


def _lookup_kernel(c_ref, emb_ref, out_ref, *, fast):
    # c_ref [nb, 1, TN] i32; emb_ref [nb, K, M] (M on lanes: K is tiny, so
    # a [.., M, K] layout lane-pads K 8->128 — 16x VMEM, 128 MB at the ppi
    # shape nb=64/M=4096); out_ref [nb, K, TN]
    nb, K, M = emb_ref.shape
    TN = c_ref.shape[2]
    acc = jnp.bfloat16 if fast else jnp.float32
    row = jax.lax.broadcasted_iota(jnp.int32, (M, TN), 0)

    def body(b, _):
        onehot = (c_ref[b] == row).astype(acc)  # [M, TN]; stays in VMEM
        emb = emb_ref[b]  # [K, M]
        if fast:
            out_ref[b] = jax.lax.dot_general(
                emb.astype(jnp.bfloat16), onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [K, TN]
        else:
            out_ref[b] = jax.lax.dot_general(
                emb, onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret", "fast"))
def lookup_branches(
    c, emb_out, tile_n: int = 0, interpret: bool = False, fast: bool = False
):
    """All-branch codebook row lookup: c [nb, n] i32, emb_out [nb, M, K] ->
    table [n, nb, K] f32 (``vq.lookup``'s einsum, ``vq.py v2:168-173``).

    The XLA one-hot GEMM materializes the [nb, n, M] one-hot in HBM (~2GB at
    n=65k, M=256 — the single hottest dot_general in the profiled GCN step);
    here the one-hot lives and dies in VMEM, so HBM traffic is just the
    indices in and the [nb, K, n] table out.  ``fast`` selects codeword
    values at bf16 (same rounding as the bf16-streamed XLA path); exact mode
    is bit-identical to a row gather."""
    nb, n = c.shape
    M, K = emb_out.shape[1], emb_out.shape[2]
    if tile_n <= 0:
        # default tile scales inversely with M so the per-branch [M, TN]
        # one-hot stays ~2 MB of VMEM at any codebook size (M=256 -> 2048,
        # M=1024 -> 512, M=4096 -> 128 — the ppi shape's M=4096 x TN=2048
        # one-hot was 32 MB and OOMed the kernel)
        tile_n = max(128, (2048 * 256 // max(M, 1)) // 128 * 128)
    assert tile_n % 128 == 0
    n_pad = ((n + tile_n - 1) // tile_n) * tile_n
    if n_pad != n:
        c = jnp.pad(c, ((0, 0), (0, n_pad - n)))
    c3 = c[:, None, :]  # [nb, 1, n_pad]

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, fast=fast),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 1, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, K, M), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, K, tile_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, K, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(c3, jnp.transpose(emb_out, (0, 2, 1)))
    return jnp.transpose(out[:, :, :n], (2, 0, 1))  # [n, nb, K]
