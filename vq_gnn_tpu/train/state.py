"""Train state container."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from vq_gnn_tpu.nn.model import ModelStatic, init_bn_state, init_params
from vq_gnn_tpu.nn.vq import init_vq_state
from vq_gnn_tpu.train.optim import init_rmsprop


class TrainState(struct.PyTreeNode):
    params: Any  # list of per-layer param dicts
    vq_states: Any  # list of per-layer VQState
    bn_state: Any  # BNState
    opt_nu: Any  # RMSprop square-avg tree (matches params)
    step: jnp.ndarray
    # v1 transformer branch: parallel VQState list (None when disabled)
    vq_states_tr: Any = None


def init_train_state(rng, ms: ModelStatic, num_N: int) -> TrainState:
    k_p, k_tr, *k_vq = jax.random.split(rng, 2 + ms.num_layers)
    params = init_params(k_p, ms)
    vq_states = [
        init_vq_state(k_vq[l], ms.num_branches[l], num_N, ms.vq)
        for l in range(ms.num_layers)
    ]
    vq_states_tr = None
    if ms.transformer_flag:
        k_trs = jax.random.split(k_tr, ms.num_layers)
        vq_states_tr = [
            init_vq_state(k_trs[l], ms.num_branches[l], num_N, ms.vq_tr)
            for l in range(ms.num_layers)
        ]
    return TrainState(
        params=params,
        vq_states=vq_states,
        bn_state=init_bn_state(ms),
        opt_nu=init_rmsprop(params),
        step=jnp.zeros((), jnp.int32),
        vq_states_tr=vq_states_tr,
    )
