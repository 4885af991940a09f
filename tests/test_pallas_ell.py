"""Fused ELL aggregate kernel (ops/pallas_ell.py) vs the unfused XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_gnn_tpu.ops.pallas_ell import (
    NEGATIVE_SLOPE,
    ell_aggregate_fused,
    gat_aggregate_fused,
)
from vq_gnn_tpu.ops.spmm import build_ell_host


def _ell_case(num_rows, E, K, C, seed, S_pad_extra=0):
    rng = np.random.default_rng(seed)
    row = np.sort(rng.integers(0, num_rows, E))
    col = rng.integers(0, num_rows, E)
    val = rng.standard_normal(E).astype(np.float32)
    ell_row, ell_col, ell_val = build_ell_host(row, col, val, num_rows, K)
    S = len(ell_row)
    T = 128
    S_pad = ((S + T - 1) // T) * T + S_pad_extra * T
    pad = S_pad - S
    ell_row = np.concatenate([ell_row, np.full(pad, num_rows, np.int32)])
    ell_col = np.concatenate([ell_col, np.full((pad, K), num_rows, np.int32)])
    ell_val = np.concatenate([ell_val, np.zeros((pad, K), np.float32)])
    x = rng.standard_normal((num_rows + 1, C)).astype(np.float32)
    x[-1] = 0.0  # dustbin row
    return (
        jnp.asarray(ell_row),
        jnp.asarray(ell_col),
        jnp.asarray(ell_val),
        jnp.asarray(x),
    )


@pytest.mark.parametrize("num_rows,E,K,C", [(300, 2000, 8, 128), (61, 900, 4, 256)])
def test_plain_aggregate_matches_xla(num_rows, E, K, C):
    ell_row, ell_col, ell_val, x = _ell_case(num_rows, E, K, C, 0)
    nbrs_flat = jnp.take(x, ell_col.reshape(-1), axis=0, mode="clip")
    out = ell_aggregate_fused(
        nbrs_flat, ell_row, ell_val, num_rows, interpret=True
    )
    nbrs = nbrs_flat.reshape(ell_col.shape + (C,))
    part = jnp.einsum("sk,skc->sc", ell_val, nbrs)
    ref = jax.ops.segment_sum(
        part, ell_row, num_segments=num_rows + 1, indices_are_sorted=True
    )[:num_rows]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("with_neg", [True, False])
@pytest.mark.parametrize("num_rows,E,K,C", [(300, 2300, 8, 128), (129, 700, 8, 256)])
def test_gat_aggregate_matches_xla(num_rows, E, K, C, with_neg):
    ell_row, ell_col, ell_val, x = _ell_case(num_rows, E, K, C, 1)
    rng = np.random.default_rng(7)
    att_l = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.3)
    att_r = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.3)
    scale = jnp.float32(1.7)
    ar_node = (x[:num_rows] @ att_r[:C] + att_r[C]) / scale

    nbrs_flat = jnp.take(x, ell_col.reshape(-1), axis=0, mode="clip")
    agg, rowsum, aggn, rsn = gat_aggregate_fused(
        nbrs_flat, ell_row, ell_val, ar_node, att_l[:C], att_l[C], scale,
        num_rows, with_neg=with_neg, interpret=True,
    )

    # unfused reference (the XLA path of ops/gat.py:_gat_conv_fwd_impl)
    nbrs = nbrs_flat.reshape(ell_col.shape + (C,))
    al_cols = (jnp.einsum("skc,c->sk", nbrs, att_l[:C]) + att_l[C]) / scale
    ar_pad = jnp.concatenate([ar_node, jnp.zeros((1,), jnp.float32)])
    a = al_cols + jnp.take(ar_pad, ell_row, mode="clip")[:, None]
    ev = jnp.exp(jax.nn.leaky_relu(a, NEGATIVE_SLOPE)) * ell_val

    def seg(p):
        return jax.ops.segment_sum(
            p, ell_row, num_segments=num_rows + 1, indices_are_sorted=True
        )[:num_rows]

    # exp-amplified reduce-order noise: per-cell ev reaches O(700) in this
    # synthetic case, so f32 sum-order differences show up at ~3e-3 abs;
    # indexing bugs produce O(1) errors and still fail these bounds
    np.testing.assert_allclose(
        np.asarray(agg), np.asarray(seg(jnp.einsum("sk,skc->sc", ev, nbrs))),
        rtol=2e-3, atol=8e-3,
    )
    np.testing.assert_allclose(
        np.asarray(rowsum), np.asarray(seg(jnp.sum(ev, axis=1))),
        rtol=2e-3, atol=8e-3,
    )
    if with_neg:
        evn = ev * (a <= 0)
        np.testing.assert_allclose(
            np.asarray(aggn),
            np.asarray(seg(jnp.einsum("sk,skc->sc", evn, nbrs))),
            rtol=2e-3, atol=8e-3,
        )
        np.testing.assert_allclose(
            np.asarray(rsn), np.asarray(seg(jnp.sum(evn, axis=1))),
            rtol=2e-3, atol=8e-3,
        )
    else:
        assert aggn is None and rsn is None


def test_bf16_neighbor_block():
    """bf16 gathered block: kernel accumulates f32, matches the XLA bf16 path."""
    num_rows, E, K, C = 200, 1500, 8, 128
    ell_row, ell_col, ell_val, x = _ell_case(num_rows, E, K, C, 3)
    xb = x.astype(jnp.bfloat16)
    nbrs_flat = jnp.take(xb, ell_col.reshape(-1), axis=0, mode="clip")
    out = ell_aggregate_fused(nbrs_flat, ell_row, ell_val, num_rows, interpret=True)
    nbrs = nbrs_flat.reshape(ell_col.shape + (C,))
    part = jnp.einsum(
        "sk,skc->sc", ell_val, nbrs, preferred_element_type=jnp.float32
    )
    ref = jax.ops.segment_sum(
        part, ell_row, num_segments=num_rows + 1, indices_are_sorted=True
    )[:num_rows]
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=1e-2)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("C", [128, 256])
def test_gat_bwd_merged_matches_split(C, dtype):
    """The merged-gather backward kernel (one [St*K, C+2] block carrying
    cotangent + rowsum-cotangent + ar) computes the same dx/d_al as the
    round-2 split-gather kernel, in f32 and at the bf16 streaming dtype
    (round-3: merged is the C=128 default after tools/gather_bench.py)."""
    num_rows, E, K = 260, 2000, 8
    C1 = 128
    ell_row, ell_col, ell_val, x = _ell_case(num_rows, E, K, C, 13)
    t_row, t_col, t_val = ell_row, ell_col, ell_val
    rng = np.random.default_rng(17)
    att_l = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.1)
    scale = jnp.float32(1.9)
    R = num_rows
    dt = jnp.dtype(dtype)
    g_agg = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32)).astype(dt)
    g_rs = jnp.asarray(rng.standard_normal((R, 1)).astype(np.float32)).astype(dt)
    ar_node = jnp.asarray(
        rng.standard_normal(R).astype(np.float32) * 0.2
    ).astype(dt)
    xs = x[:R].astype(dt)

    from vq_gnn_tpu.ops.pallas_ell import gat_bwd_fused, gat_bwd_fused_merged

    idx = t_col.reshape(-1)
    x_rows = jnp.take(xs, t_row, axis=0, mode="clip")

    g_cat = jnp.concatenate([g_agg, g_rs, ar_node[:, None]], axis=1)
    gf = jnp.take(g_cat, idx, axis=0, mode="clip")
    # merged takes the WHOLE x table and windows it by the sorted t_row
    # in-kernel (round-4); the split kernel still takes gathered rows
    dx_m, dal_m = gat_bwd_fused_merged(
        gf, xs, t_row, t_val, att_l[:C], att_l[C], scale, R,
        interpret=True,
    )

    g_hi_src = jnp.concatenate([g_agg[:, C1:], g_rs, ar_node[:, None]], axis=1)
    gl = jnp.take(g_agg[:, :C1], idx, axis=0, mode="clip")
    gh = jnp.take(g_hi_src, idx, axis=0, mode="clip")
    dx_s, dal_s = gat_bwd_fused(
        gl, gh, x_rows, t_row, t_val, att_l[:C], att_l[C], scale, R,
        interpret=True,
    )
    # both kernels accumulate f32 from identically-quantized inputs; the only
    # difference is contraction order inside the tile
    np.testing.assert_allclose(
        np.asarray(dx_m), np.asarray(dx_s), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dal_m), np.asarray(dal_s), rtol=2e-3, atol=2e-3
    )


def test_gat_bwd_fused_matches_unfused():
    """dx_agg / d_al_node from the fused backward tile == the unfused
    transposed-layout recompute (ops/gat.py:_gat_conv_vjp_bwd)."""
    num_rows, E, K, C = 260, 2000, 8, 256
    C1 = 128
    ell_row, ell_col, ell_val, x = _ell_case(num_rows, E, K, C, 5)
    # reuse the forward-layout ELL arrays AS the transposed layout (the
    # backward only needs *a* sorted gap-free ELL over some graph)
    t_row, t_col, t_val = ell_row, ell_col, ell_val
    rng = np.random.default_rng(11)
    att_l = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.1)
    scale = jnp.float32(1.9)
    R = num_rows
    g_agg = jnp.asarray(rng.standard_normal((R, C)).astype(np.float32))
    g_rs = jnp.asarray(rng.standard_normal((R, 1)).astype(np.float32))
    ar_node = jnp.asarray(rng.standard_normal(R).astype(np.float32) * 0.2)

    from vq_gnn_tpu.ops.pallas_ell import gat_bwd_fused

    g_hi_src = jnp.concatenate([g_agg[:, C1:], g_rs, ar_node[:, None]], axis=1)
    idx = t_col.reshape(-1)
    gl = jnp.take(g_agg[:, :C1], idx, axis=0, mode="clip")
    gh = jnp.take(g_hi_src, idx, axis=0, mode="clip")
    x_rows = jnp.take(x[:R], t_row, axis=0, mode="clip")
    dx, d_al = gat_bwd_fused(
        gl, gh, x_rows, t_row, t_val, att_l[:C], att_l[C], scale, R,
        interpret=True,
    )

    # unfused per-cell reference
    St, Kk = t_col.shape
    W = C - C1 + 2
    gl3 = gl.reshape(St, Kk, C1)
    gh3 = gh.reshape(St, Kk, W)
    ar_t = gh3[:, :, W - 1]
    al_t = (x_rows @ att_l[:C] + att_l[C]) / scale
    a_t = al_t[:, None] + ar_t
    ev_t = jnp.exp(jax.nn.leaky_relu(a_t, NEGATIVE_SLOPE)) * t_val
    x_hi_pad = jnp.concatenate(
        [x_rows[:, C1:], jnp.ones((St, 1)), jnp.zeros((St, 1))], axis=1
    )
    g_ev = jnp.einsum("skc,sc->sk", gl3, x_rows[:, :C1]) + jnp.einsum(
        "skc,sc->sk", gh3, x_hi_pad
    )
    d_a = g_ev * ev_t * jnp.where(a_t > 0, 1.0, NEGATIVE_SLOPE)
    dx_ref_part = jnp.concatenate(
        [
            jnp.einsum("sk,skc->sc", ev_t, gl3),
            jnp.einsum("sk,skc->sc", ev_t, gh3)[:, : C - C1],
        ],
        axis=1,
    )

    def seg(p):
        return jax.ops.segment_sum(
            p, t_row, num_segments=R + 1, indices_are_sorted=True
        )[:R]

    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(seg(dx_ref_part)), rtol=2e-3, atol=8e-3
    )
    np.testing.assert_allclose(
        np.asarray(d_al), np.asarray(seg(jnp.sum(d_a, axis=1))),
        rtol=2e-3, atol=8e-3,
    )
