"""Pallas TPU kernel: sorted segment-sum via windowed writes + boundary carry.

Every ELL aggregate in this framework ends in
``jax.ops.segment_sum(partials, ell_row, indices_are_sorted=True)``
(ops/spmm.py, ops/gat.py).  XLA lowers that to a sequential scatter-add that
runs at ~45 GB/s on TPU (measured: 3 ms for a [266k, 128] -> [151k, 128]
reduce).  This kernel exploits what XLA ignores — segment ids are sorted and
the row space is gap-free (every row owns >= 1 slot because the normalized
adjacency carries self-loops) — so each slot tile touches a *contiguous* row
window of span < T:

  - sequential grid over slot tiles of T slots;
  - a tile's partials are reduced onto relative row offsets with a one-hot
    MXU matmul;
  - the [T, C] result is DMA-written to ``out[r0 : r0+T]`` (dynamic start,
    static size).  Later tiles overwrite the overlap, so only the boundary
    row (shared between adjacent tiles) needs care: its running sum rides in
    a VMEM carry that persists across the sequential grid — no read-modify-
    write, no scatter;
  - padding slots (dustbin row == num_rows) carry zero partials, so clamping
    their relative offset is harmless.

HBM traffic = one stream of the partials + one write of the window coverage,
~6x less than XLA's scatter-add lowering.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(has_mat: bool, has_scalar: bool):
    """Kernel factory: matrix channel ([T, C] partials -> out [*, C]) and/or
    a fused scalar channel ([T] partials -> lane-0 of out_s [*, 128]); both
    share the one-hot reduce, the boundary carry and the window DMA."""

    def kernel(r0s_ref, prev_eq_ref, seg_ref, *rest):
        ins = list(rest[: has_mat + has_scalar])
        outs = list(rest[has_mat + has_scalar : 2 * (has_mat + has_scalar)])
        scratch = list(rest[2 * (has_mat + has_scalar) :])
        i = pl.program_id(0)
        T = seg_ref.shape[0]
        r0 = r0s_ref[i]

        rel = jnp.clip(seg_ref[:] - r0, 0, T - 1)  # [T]
        iota_rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        oh = (rel[None, :] == iota_rows).astype(jnp.float32)  # [T rows, T slots]
        first_mask = (iota_rows == 0) & (prev_eq_ref[i] != 0)
        last_rel = jnp.clip(seg_ref[T - 1] - r0, 0, T - 1)
        last_mask = (iota_rows == last_rel).astype(jnp.float32)  # [T, 1]

        def reduce_channel(part, carry):
            # precision inherits the ambient jax_default_matmul_precision,
            # matching every other aggregate here: parity/test configs run
            # 'highest' (exact f32 permutation-sum), the bench runs 'default'
            rows = jax.lax.dot_general(
                oh, part.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [T, C]
            # boundary row: the previous tile's last row continues here
            rows = rows + jnp.where(first_mask, carry[:], 0.0)
            # stash this tile's last row (it may continue into the next tile)
            carry[:] = jax.lax.dot_general(
                last_mask, rows,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return rows

        cps = []
        ch = 0
        if has_mat:
            win, carry, sem = scratch[0], scratch[1], scratch[2]
            win[:] = reduce_channel(ins[0][:], carry)
            cp = pltpu.make_async_copy(win, outs[0].at[pl.ds(r0, T)], sem)
            cp.start()
            cps.append(cp)
            ch = 1
        if has_scalar:
            win, carry, sem = scratch[3 * ch], scratch[3 * ch + 1], scratch[3 * ch + 2]
            rows1 = reduce_channel(ins[ch][:][:, None], carry)  # [T, 1]
            # lane 0 of a [T, 128] window (a 1-lane output would break the
            # 128-lane DMA tiling)
            lane0 = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0
            ).astype(jnp.float32)
            win[:] = rows1 * lane0
            cp = pltpu.make_async_copy(win, outs[ch].at[pl.ds(r0, T)], sem)
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_rows", "tile", "interpret")
)
def _segment_sum_impl(partials, scalar_partials, seg, num_rows, tile, interpret):
    has_mat = partials is not None
    has_scalar = scalar_partials is not None
    S = seg.shape[0]
    T = tile
    assert T % 1024 == 0, "tile must be a multiple of 1024 (1-D array layout)"
    S_pad = ((S + T - 1) // T) * T
    if S_pad != S:
        if has_mat:
            partials = jnp.pad(partials, ((0, S_pad - S), (0, 0)))
        if has_scalar:
            scalar_partials = jnp.pad(scalar_partials, (0, S_pad - S))
        seg = jnp.pad(seg, (0, S_pad - S), constant_values=num_rows)
    n_tiles = S_pad // T
    seg = seg.astype(jnp.int32)
    r0s = seg[::T]  # [n_tiles] window starts
    # prev_eq[i]: tile i-1's last row == tile i's first row (carry applies)
    prev_last = seg[T - 1 :: T]  # [n_tiles] last row of each tile
    prev_eq = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (prev_last[:-1] == r0s[1:]).astype(jnp.int32)]
    )
    # window [r0, r0+T) must stay in bounds; dustbin tiles start at num_rows
    R_pad = num_rows + T + 8

    # 1-D arrays carry XLA layout T(1024): blocks must be 1024-multiples,
    # hence the tile % 1024 requirement
    in_specs = [pl.BlockSpec((T,), lambda i, *_: (i,), memory_space=pltpu.VMEM)]
    inputs = [seg]
    out_shapes = []
    scratch = []
    if has_mat:
        C = partials.shape[1]
        in_specs.append(
            pl.BlockSpec((T, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(partials)
        out_shapes.append(jax.ShapeDtypeStruct((R_pad, C), jnp.float32))
        scratch += [
            pltpu.VMEM((T, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
    if has_scalar:
        in_specs.append(
            pl.BlockSpec((T,), lambda i, *_: (i,), memory_space=pltpu.VMEM)
        )
        inputs.append(scalar_partials.astype(jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct((R_pad, 128), jnp.float32))
        scratch += [
            pltpu.VMEM((T, 128), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # r0s, prev_eq
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in out_shapes],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        _make_kernel(has_mat, has_scalar),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(r0s, prev_eq, *inputs)
    res = []
    i = 0
    if has_mat:
        res.append(outs[i][:num_rows])
        i += 1
    if has_scalar:
        res.append(outs[i][:num_rows, 0])
    return tuple(res)


def segment_sum_sorted(
    partials: Optional[jnp.ndarray],  # [S, C] or None (scalar-only)
    seg: jnp.ndarray,  # [S] int32, ascending; padding rows = num_rows
    num_rows: int,
    scalar_partials: Optional[jnp.ndarray] = None,  # [S] fused scalar channel
    tile: int = 1024,
    interpret: bool = False,
):
    """Windowed sorted segment sum.  Requires gap-free sorted segments (every
    row in [0, num_rows) owns >= 1 slot) — the dense-rows ELL invariant.

    Returns f32 ``out [num_rows, C]`` for the matrix channel, ``out_s
    [num_rows]`` for the scalar channel, or ``(out, out_s)`` when both are
    given (sharing one kernel pass over the segment ids)."""
    res = _segment_sum_impl(
        partials, scalar_partials, seg, num_rows, tile, interpret
    )
    return res if len(res) > 1 else res[0]
