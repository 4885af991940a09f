"""Diagnostics / scheduler / kmeans-init / STE quantizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from vq_gnn_tpu.nn.vq import (
    VQParams,
    feature_kmeans_init,
    init_vq_state,
    ste_vector_quantizer,
)
from vq_gnn_tpu.utils.diagnostics import (
    approximation_errors,
    assignment_churn,
    codebook_stats,
    pairwise_codeword_distances,
)
from vq_gnn_tpu.utils.scheduler import gradual_warmup, linear_ramp


def test_codebook_stats_shapes():
    p = VQParams(num_M=8, num_D=4)
    s = init_vq_state(jax.random.PRNGKey(0), 3, 100, p)
    stats = codebook_stats(s, p)
    assert stats["effective_codewords"].shape == (3,)
    d = pairwise_codeword_distances(s, p)
    assert d["feat_pairwise_dist"].shape == (3,)
    X = np.random.RandomState(0).randn(3, 16, 4).astype(np.float32)
    e = approximation_errors(s, p, X, np.arange(16))
    assert e["vq_backward_error"].shape == (3,)
    churn = assignment_churn(s, s)
    np.testing.assert_array_equal(churn, np.zeros(3))


def test_schedulers():
    assert linear_ramp(0.01, 100) == 0.01 * 100 / 200
    assert linear_ramp(0.01, 500) == 0.01
    assert gradual_warmup(0.01, 0, 2.0, 10) == 0.01
    assert gradual_warmup(0.01, 10, 2.0, 10) == 0.02
    assert gradual_warmup(0.01, 20, 2.0, 10) == 0.02


def test_kmeans_init_seeds_state():
    p = VQParams(num_M=4, num_D=4)
    s = init_vq_state(jax.random.PRNGKey(1), 2, 50, p)
    rng = np.random.RandomState(0)
    X = rng.randn(2, 40, 4).astype(np.float32)
    idxs = np.arange(40)
    s2 = feature_kmeans_init(s, X, idxs, p)
    counts = np.asarray(s2.ema_cluster_size)
    np.testing.assert_array_equal(counts.sum(axis=1), [40.0, 40.0])
    # embedding feature half = ema_w / counts
    np.testing.assert_allclose(
        np.asarray(s2.embedding)[:, :, :4],
        np.asarray(s2.ema_w)[:, :, :4] / counts[:, :, None],
        rtol=1e-5,
    )


def test_ste_quantizer():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    emb = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    loss, q, onehot, idx = ste_vector_quantizer(x, emb)
    assert q.shape == x.shape and onehot.shape == (10, 6)
    # straight-through: gradient of sum(q) wrt x is ones
    g = jax.grad(lambda xx: jnp.sum(ste_vector_quantizer(xx, emb)[1]))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g))
    # quantized values are the nearest codewords
    d = ((np.asarray(x)[:, None] - np.asarray(emb)[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
