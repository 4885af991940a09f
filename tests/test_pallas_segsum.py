"""Windowed Pallas sorted segment-sum (ops/pallas_segsum.py) + the
dense-rows ELL invariant it relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_gnn_tpu.ops.pallas_segsum import segment_sum_sorted
from vq_gnn_tpu.ops.spmm import build_ell_host, ell_positions


def _case(num_rows, S, C, seed, pad):
    rng = np.random.default_rng(seed)
    seg = np.sort(
        np.concatenate([np.arange(num_rows), rng.integers(0, num_rows, S - num_rows)])
    ).astype(np.int32)
    part = rng.standard_normal((S, C)).astype(np.float32)
    seg = np.concatenate([seg, np.full(pad, num_rows, np.int32)])
    part = np.concatenate([part, np.zeros((pad, C), np.float32)])
    return jnp.asarray(part), jnp.asarray(seg)


@pytest.mark.parametrize(
    "num_rows,S,C,pad",
    [(300, 1000, 128, 37), (50, 2600, 128, 1), (7, 1030, 256, 99), (1500, 1501, 128, 0)],
)
def test_matches_xla_segment_sum(num_rows, S, C, pad):
    part, seg = _case(num_rows, S, C, 0, pad)
    out = segment_sum_sorted(part, seg, num_rows, interpret=True)
    ref = jax.ops.segment_sum(
        part, seg, num_segments=num_rows + 1, indices_are_sorted=True
    )[:num_rows]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_fused_scalar_channel():
    """Matrix + scalar channels in one pass match two XLA segment sums."""
    part, seg = _case(300, 1000, 128, 4, 21)
    sp = jnp.asarray(
        np.where(np.asarray(seg) < 300, np.random.default_rng(5).standard_normal(len(seg)), 0.0).astype(np.float32)
    )
    out, out_s = segment_sum_sorted(part, seg, 300, scalar_partials=sp, interpret=True)
    ref = jax.ops.segment_sum(part, seg, num_segments=301, indices_are_sorted=True)[:300]
    ref_s = jax.ops.segment_sum(sp, seg, num_segments=301, indices_are_sorted=True)[:300]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), rtol=1e-5, atol=1e-4)


def test_scalar_only_channel():
    _, seg = _case(300, 1000, 8, 6, 3)
    sp = jnp.asarray(np.random.default_rng(7).standard_normal(len(seg)).astype(np.float32))
    sp = jnp.where(seg < 300, sp, 0.0)
    out_s = segment_sum_sorted(None, seg, 300, scalar_partials=sp, interpret=True)
    ref_s = jax.ops.segment_sum(sp, seg, num_segments=301, indices_are_sorted=True)[:300]
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref_s), rtol=1e-5, atol=1e-4)


def test_row_spanning_many_tiles():
    """One giant row whose slots cover several tiles: the carry must chain."""
    num_rows, C = 5, 128
    seg = np.concatenate(
        [np.zeros(1, np.int32), np.full(4000, 1, np.int32), np.arange(2, 5, dtype=np.int32)]
    )
    part = np.random.default_rng(1).standard_normal((len(seg), C)).astype(np.float32)
    out = segment_sum_sorted(jnp.asarray(part), jnp.asarray(seg), num_rows, interpret=True)
    ref = jax.ops.segment_sum(
        jnp.asarray(part), jnp.asarray(seg), num_segments=num_rows + 1,
        indices_are_sorted=True,
    )[:num_rows]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


def test_build_ell_dense_rows():
    """Every row (including empty ones) must own >= 1 slot; empty rows carry
    a zero-valued dustbin slot.  numpy and native builders must agree."""
    rng = np.random.default_rng(2)
    num_rows = 50
    # rows 10..19 and 40..49 have no edges
    rows = np.sort(rng.integers(0, 10, 200).astype(np.int64))
    rows = np.concatenate([rows, np.sort(rng.integers(20, 40, 100).astype(np.int64))])
    cols = rng.integers(0, num_rows, len(rows)).astype(np.int64)
    vals = rng.standard_normal(len(rows)).astype(np.float32)
    K = 4
    deg = np.bincount(rows, minlength=num_rows)
    S = int(np.maximum((deg + K - 1) // K, 1).sum())
    er, ec, ev = build_ell_host(rows, cols, vals, num_rows, K, S_pad=S + 3)
    # gap-free coverage of [0, num_rows)
    assert set(er[er < num_rows].tolist()) == set(range(num_rows))
    assert (np.diff(er) >= 0).all()
    # empty rows: single slot, dustbin col, zero val
    for r in list(range(10, 20)) + list(range(40, 50)):
        sl = np.where(er == r)[0]
        assert len(sl) == 1
        assert (ec[sl] == num_rows).all() and (ev[sl] == 0).all()
    # aggregate equivalence vs COO
    x = rng.standard_normal((num_rows + 1, 8)).astype(np.float32)
    ref = np.zeros((num_rows, 8), np.float32)
    np.add.at(ref, rows, vals[:, None] * x[cols])
    nbr = x[np.minimum(ec.reshape(-1), num_rows)].reshape(ec.shape + (8,))
    agg = np.zeros((num_rows + 1, 8), np.float32)
    np.add.at(agg, er, np.einsum("sk,ske->se", ev, nbr))
    np.testing.assert_allclose(agg[:num_rows], ref, rtol=1e-5, atol=1e-5)
    # ell_positions must mirror the dense layout
    pos = ell_positions(rows, K, num_rows)
    flat_c = ec.reshape(-1)
    np.testing.assert_array_equal(flat_c[pos], cols)


def test_native_matches_numpy_builder(monkeypatch):
    from vq_gnn_tpu.native import lib as native_lib

    if not native_lib.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(3)
    num_rows = 64
    rows = np.sort(rng.integers(0, 40, 500).astype(np.int64))  # rows 40.. empty
    cols = rng.integers(0, num_rows, 500).astype(np.int64)
    vals = rng.standard_normal(500).astype(np.float32)
    K = 8
    deg = np.bincount(rows, minlength=num_rows)
    S_pad = int(np.maximum((deg + K - 1) // K, 1).sum()) + 5
    nat = native_lib.build_ell(rows, cols, vals, num_rows, K, S_pad)

    monkeypatch.setattr(native_lib, "available", lambda: False)  # numpy path
    ref = build_ell_host(rows, cols, vals, num_rows, K, S_pad)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
