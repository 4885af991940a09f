"""Micro-parity vs real torch: optimizer, AlphaDropout statistics,
activations, linear init distribution."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from vq_gnn_tpu.nn.model import activation, alpha_dropout, _linear_init
from vq_gnn_tpu.train.optim import init_rmsprop, rmsprop_update


def test_rmsprop_matches_torch():
    rng = np.random.RandomState(0)
    w0 = rng.randn(6, 4).astype(np.float32)
    grads = [rng.randn(6, 4).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.as_tensor(w0.copy()))
    opt = torch.optim.RMSprop([wt], lr=0.01, alpha=0.99)
    for g in grads:
        wt.grad = torch.as_tensor(g.copy())
        opt.step()

    params = {"w": jnp.asarray(w0)}
    nu = init_rmsprop(params)
    for g in grads:
        params, nu = rmsprop_update(
            params, {"w": jnp.asarray(g)}, nu, 0.01, 1.0
        )
    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_activations_match_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    xt = torch.as_tensor(x)
    np.testing.assert_allclose(
        np.asarray(activation(jnp.asarray(x), "relu")),
        torch.nn.functional.relu(xt).numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(activation(jnp.asarray(x), "elu")),
        torch.nn.functional.elu(xt).numpy(),
        rtol=1e-6,
        atol=1e-6,
    )
    # leaky_gelu = 0.1x + 0.9 gelu(x)  (models.py v2:296, exact erf gelu)
    np.testing.assert_allclose(
        np.asarray(activation(jnp.asarray(x), "leaky_gelu")),
        (0.1 * xt + 0.9 * torch.nn.functional.gelu(xt)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_alpha_dropout_constants():
    """AlphaDropout's affine constants must match torch exactly: feed a
    constant input — outputs take exactly two values, a*c+b (kept) and
    a*alpha'+b (dropped), deterministic up to RNG choice of which."""
    p = 0.3
    c = 1.7
    x = jnp.full((20_000,), c)
    y = np.asarray(alpha_dropout(jax.random.PRNGKey(0), x, p, training=True))
    ty = torch.nn.functional.alpha_dropout(
        torch.full((20_000,), c), p, training=True
    ).numpy()
    np.testing.assert_allclose(
        np.unique(y.round(5)), np.unique(ty.round(5)), rtol=1e-4
    )
    # drop rate matches p
    drop_frac = float((y == y.min()).mean())
    assert abs(drop_frac - p) < 0.02


def test_linear_init_bounds():
    """torch Linear default: W,b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    lp = _linear_init(jax.random.PRNGKey(0), 64, 32)
    bound = 1.0 / np.sqrt(64)
    w = np.asarray(lp["w"])
    assert w.min() >= -bound and w.max() <= bound
    # roughly uniform: std close to bound/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.1)
