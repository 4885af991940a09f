"""Optimizers with exact torch semantics.

The reference trains with ``torch.optim.RMSprop(lr, alpha=0.99)``
(``main_node.py v2:244``).  torch's update (no momentum, not centered) is

    nu   <- alpha * nu + (1 - alpha) * g^2
    p    <- p - lr * g / (sqrt(nu) + eps)          # eps OUTSIDE the sqrt

which differs from optax.rmsprop (eps inside the sqrt), so we implement it
directly.  ``do_step`` gates the whole update (the trainer skips window 0 of
multi-window cont batches, ``main_node.py v2:113-116`` — torch skips both the
param update and the nu accumulation there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_rmsprop(params):
    return jax.tree.map(jnp.zeros_like, params)


def rmsprop_update(params, grads, nu, lr, do_step, alpha=0.99, eps=1e-8):
    """Returns (new_params, new_nu). ``do_step`` is a traced 0/1 scalar."""
    new_nu = jax.tree.map(lambda n, g: alpha * n + (1 - alpha) * g * g, nu, grads)
    new_params = jax.tree.map(
        lambda p, g, n: p - lr * g / (jnp.sqrt(n) + eps), params, grads, new_nu
    )
    keep = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(do_step > 0, a, b), new, old
    )
    return keep(new_params, params), keep(new_nu, nu)


def clip_grads_by_norm(grads, max_norm):
    """torch.nn.utils.clip_grad_norm_ over a pytree (main_link.py v2:84-88)."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g**2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)
