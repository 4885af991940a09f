"""bf16 fused-vs-unfused GAT gradient parity (round-3 verdict #8).

bf16 is the intended GAT compute default on TPU (streams halve the dominant
HBM traffic); this guards the seam the default flip rides on: the SAME loss
(CE + info_backward through the full model forward) with
``compute_dtype='bfloat16'`` must produce the same gradients — wrt parameters
AND wrt the probes, i.e. the payloads that feed the VQ codebook update —
whether the fused Pallas kernels execute it (``VQ_GNN_ELL_FUSED=interpret``,
interpreter mode so this runs on the CI CPU) or the unfused XLA path
(``=off``), for BOTH formulations.  Differences come only from accumulation
order: both paths accumulate f32 from identically bf16-quantized streams.

(Comparing post-optimizer params or post-update codebooks instead is
ill-conditioned: RMSprop normalizes near-zero gradient components to
+-lr/sqrt(1-gamma), and VQ assignment near-ties flip discretely under any
reduction reorder.  Gradients are the well-conditioned seam.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.nn.model import model_forward, model_static, zero_probes
from vq_gnn_tpu.sampler.samplers import BatchLoader
from vq_gnn_tpu.train.loop import device_features
from vq_gnn_tpu.train.state import init_train_state

BASE = Config(
    dataset="synthetic",
    conv_type="GAT",
    num_layers=2,
    hidden_channels=128,
    num_D=4,
    num_M=16,
    sampler_type="node",
    batch_size=256,
    test_batch_size=320,
    vq_update_mode="live",
    skip=True,
    compute_dtype="bfloat16",
    pad_multiple_nodes=64,
    pad_multiple_edges=2048,  # -> slot pads are 256-multiples (fused tiles)
)


def _grads(formulation, monkeypatch, fused):
    monkeypatch.setenv("VQ_GNN_ELL_FUSED", "interpret" if fused else "off")
    cfg = dataclasses.replace(BASE, formulation=formulation)
    g, c = synthetic_sbm(
        num_nodes=320, num_features=128, num_classes=6, seed=3
    )
    g, c, _ = prepare(g, cfg, c)
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    X_dev = device_features(g.x)
    loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=0)
    loader.prefetch = False
    windows, _ = next(iter(loader))
    batch = windows[0]
    probes = zero_probes(ms, batch.B_pad)

    def loss_fn(params, probes):
        x_B = jnp.take(X_dev, batch.batch_idx, axis=0)
        out, info_b, _, _ = model_forward(
            params, state.vq_states, state.bn_state, ms, x_B, batch,
            probes=probes, warm_up_rate=1.0, training=True,
            rng=jax.random.PRNGKey(1),
        )
        mask = batch.train_mask & batch.valid_B
        logz = jax.nn.log_softmax(out)
        ll = jnp.take_along_axis(
            logz, batch.y[:, None].astype(jnp.int32), axis=1
        )[:, 0]
        m = mask.astype(out.dtype)
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0) + info_b

    (loss, grads) = jax.jit(
        jax.value_and_grad(loss_fn, argnums=(0, 1))
    )(state.params, probes)
    return float(loss), jax.device_get(grads)


@pytest.mark.parametrize("formulation", ["bbprime", "bm"])
def test_bf16_fused_grads_match_unfused(formulation, monkeypatch):
    loss_f, grads_f = _grads(formulation, monkeypatch, fused=True)
    loss_u, grads_u = _grads(formulation, monkeypatch, fused=False)
    assert np.isfinite(loss_f) and np.isfinite(loss_u)
    np.testing.assert_allclose(loss_f, loss_u, rtol=5e-3, atol=5e-3)
    flat_f, tree = jax.tree.flatten(grads_f)
    flat_u = jax.tree.leaves(grads_u)
    for a, b in zip(flat_f, flat_u):
        a, b = np.asarray(a), np.asarray(b)
        # per-leaf scale-aware atol: order-noise is relative to the leaf's
        # gradient magnitude, not to each element's.  Floor 3e-5: the att
        # grads at init are O(1e-5) and the d_ar closed form carries a
        # documented cancellation regime (ops/gat.py:_gat_d_ar_closed_form)
        # whose bf16-stream noise lands ~2e-5 absolute; an indexing bug
        # produces O(leaf-max) errors and still fails.
        tol = max(2e-3 * float(np.abs(b).max()), 3e-5)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=tol)
