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


def test_alpha_dropout_statistics():
    """AlphaDropout must preserve mean~0/var~1 inputs (the SELU property),
    matching torch's affine constants."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (200_000,))
    y = alpha_dropout(rng, x, 0.3, training=True)
    ty = torch.nn.functional.alpha_dropout(
        torch.as_tensor(np.asarray(x)), 0.3, training=True
    )
    # identical distributional behavior (different RNG): compare moments
    assert abs(float(jnp.mean(y)) - float(ty.mean())) < 2e-2
    assert abs(float(jnp.var(y)) - float(ty.var())) < 4e-2
    # dropped entries take the exact torch constant a*alpha' + b
    dropped = np.asarray(y)[np.asarray(y) == np.asarray(y).min()]
    tdropped = ty.numpy()[ty.numpy() == ty.numpy().min()]
    np.testing.assert_allclose(dropped[0], tdropped[0], rtol=1e-5)


def test_linear_init_bounds():
    """torch Linear default: W,b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    lp = _linear_init(jax.random.PRNGKey(0), 64, 32)
    bound = 1.0 / np.sqrt(64)
    w = np.asarray(lp["w"])
    assert w.min() >= -bound and w.max() <= bound
    # roughly uniform: std close to bound/sqrt(3)
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.1)
