"""Fused Pallas VQ-assignment kernel vs the XLA reference path.

Runs in interpreter mode on CPU; on a real TPU (VQ_GNN_TEST_TPU=1) it
compiles for the MXU.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vq_gnn_tpu.ops.pallas_vq import fused_assign
from vq_gnn_tpu.ops.vq_ops import assignment_stats, nearest_codeword

INTERPRET = not bool(os.environ.get("VQ_GNN_TEST_TPU"))


def test_fused_assign_matches_xla():
    rng = np.random.RandomState(0)
    B, M, K = 1000, 16, 8
    xn = jnp.asarray(rng.randn(B, K).astype(np.float32))
    emb = jnp.asarray(rng.randn(M, K).astype(np.float32))
    valid = jnp.asarray(np.concatenate([np.ones(900, bool), np.zeros(100, bool)]))

    idx, counts, sums = fused_assign(xn, emb, valid, tile_b=1024, interpret=INTERPRET)

    ref_idx = nearest_codeword(xn, emb)
    ref_counts, ref_sums = assignment_stats(xn, ref_idx, M, valid)

    agree = float(np.mean(np.asarray(idx) == np.asarray(ref_idx)))
    assert agree > 0.999, agree  # fp tie flips only
    # stats must be self-consistent with the kernel's own assignments
    oh = np.zeros((B, M), np.float32)
    oh[np.arange(B), np.asarray(idx)] = 1
    oh *= np.asarray(valid, np.float32)[:, None]
    np.testing.assert_allclose(np.asarray(counts), oh.sum(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sums), oh.T @ np.asarray(xn), rtol=1e-5, atol=1e-5
    )


def test_fused_assign_padding():
    rng = np.random.RandomState(1)
    B, M, K = 130, 8, 4  # non-multiple of tile
    xn = jnp.asarray(rng.randn(B, K).astype(np.float32))
    emb = jnp.asarray(rng.randn(M, K).astype(np.float32))
    valid = jnp.ones(B, bool)
    idx, counts, _ = fused_assign(xn, emb, valid, tile_b=1024, interpret=INTERPRET)
    assert idx.shape == (B,)
    assert float(jnp.sum(counts)) == B


def test_vq_update_pallas_backend_matches_xla():
    import dataclasses

    from vq_gnn_tpu.nn.vq import VQParams, init_vq_state, vq_update

    p_xla = VQParams(num_M=8, num_D=4, warm_up_flag=True, backend="xla")
    p_pl = dataclasses.replace(p_xla, backend="pallas")
    rng = np.random.RandomState(3)
    s0 = init_vq_state(jax.random.PRNGKey(5), 2, 100, p_xla)
    X = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    G = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    idxs = jnp.asarray(np.arange(64))

    s1, i1 = vq_update(s0, X, G, idxs, p_xla)
    s2, i2 = vq_update(s0, X, G, idxs, p_pl)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(s1.embedding), np.asarray(s2.embedding), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s1.embedding_output),
        np.asarray(s2.embedding_output),
        rtol=1e-4,
        atol=1e-4,
    )


def test_scan_backend_matches_xla():
    import dataclasses

    from vq_gnn_tpu.nn.vq import VQParams, init_vq_state, vq_update
    from vq_gnn_tpu.ops.vq_ops import (
        assign_stats_scan,
        assignment_stats,
        nearest_codeword,
    )

    rng = np.random.RandomState(11)
    xn = jnp.asarray(rng.randn(1000, 8).astype(np.float32))
    emb = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    valid = jnp.asarray(np.concatenate([np.ones(950, bool), np.zeros(50, bool)]))
    i1, c1, s1 = assign_stats_scan(xn, emb, valid, chunk=256)
    i2 = nearest_codeword(xn, emb)
    c2, s2 = assignment_stats(xn, i2, 16, valid)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5)

    p_xla = VQParams(num_M=8, num_D=4, warm_up_flag=True, backend="xla")
    p_scan = dataclasses.replace(p_xla, backend="scan")
    s0 = init_vq_state(jax.random.PRNGKey(5), 2, 100, p_xla)
    X = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    G = jnp.asarray(rng.randn(2, 64, 4).astype(np.float32))
    idxs = jnp.asarray(np.arange(64))
    sa, ia = vq_update(s0, X, G, idxs, p_xla)
    sb, ib = vq_update(s0, X, G, idxs, p_scan)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(
        np.asarray(sa.embedding), np.asarray(sb.embedding), rtol=1e-5, atol=1e-5
    )


def test_xla_fast_assign_agreement():
    """bf16 distance streaming: assignments agree with f32 except near-ties."""
    from vq_gnn_tpu.ops.vq_ops import nearest_codeword

    rng = np.random.RandomState(13)
    xn = jnp.asarray(rng.randn(5000, 8).astype(np.float32))
    emb = jnp.asarray(rng.randn(256, 8).astype(np.float32))
    i_exact = nearest_codeword(xn, emb)
    i_fast = nearest_codeword(xn, emb, fast=True)
    agree = float(np.mean(np.asarray(i_exact) == np.asarray(i_fast)))
    assert agree > 0.98, agree


def test_fast_stats_agreement():
    """bf16-streamed one-hot stats: counts exact, sums within bf16 rounding."""
    from vq_gnn_tpu.ops.vq_ops import assignment_stats

    rng = np.random.RandomState(17)
    xn = jnp.asarray(rng.randn(5000, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 256, 5000).astype(np.int32))
    valid = jnp.asarray(rng.rand(5000) > 0.1)
    c0, s0 = assignment_stats(xn, idx, 256, valid)
    c1, s1 = assignment_stats(xn, idx, 256, valid, fast=True)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=0.02, atol=0.05)


@pytest.mark.parametrize("fast", [False, True])
def test_lookup_branches_matches_gather(fast):
    from vq_gnn_tpu.ops.pallas_vq import lookup_branches

    nb, n, M, K = 3, 300, 16, 8
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.integers(0, M, size=(nb, n)), jnp.int32)
    emb = jnp.asarray(rng.normal(size=(nb, M, K)), jnp.float32)
    table = lookup_branches(c, emb, tile_n=128, interpret=True, fast=fast)
    ref = np.stack(
        [emb[b][np.asarray(c[b])] for b in range(nb)], axis=1
    )  # [n, nb, K]
    tol = 1e-2 if fast else 0.0
    np.testing.assert_allclose(np.asarray(table), ref, atol=tol, rtol=tol)


def test_lookup_branches_large_M_default_tile():
    """ppi-shape regression (round 5): M=4096/nb=64 must pick a small
    default tile (the fixed 2048 tile's [M, TN] one-hot was 32 MB of VMEM)
    and the codebook block must ride the padding-free [nb, K, M] layout
    (lane-padding K=8 to 128 cost 16x = 128 MB at this shape on TPU)."""
    from vq_gnn_tpu.ops.pallas_vq import lookup_branches

    nb, n, M, K = 64, 500, 4096, 8
    rng = np.random.default_rng(11)
    c = jnp.asarray(rng.integers(0, M, size=(nb, n)), jnp.int32)
    emb = jnp.asarray(rng.normal(size=(nb, M, K)), jnp.float32)
    table = lookup_branches(c, emb, interpret=True)  # default (adaptive) tile
    ref = np.stack([emb[b][np.asarray(c[b])] for b in range(nb)], axis=1)
    np.testing.assert_allclose(np.asarray(table), ref, atol=0.0, rtol=0.0)
