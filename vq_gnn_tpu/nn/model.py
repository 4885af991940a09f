"""LowRankGNN — the VQ-GNN model, functional.

Re-implements the reference model stack (``vq_gnn_v2/models.py:66-374``; v1
``vq_gnn_v1/models.py``) as pure functions over explicit parameter / state
pytrees:

- ``init_params``            torch-matching parameter init
- ``layer_forward``          one LowRankGNNLayer (B+B' formulation)
- ``model_forward``          full stack; returns per-layer inputs + info_backward
- ``full_graph_inference``   exact non-VQ full-graph forward (v1 semantics)

The torch backward hook (``models.py v2:181-185``) is replaced by *probes*:
zero tensors added to each layer's conv output batch rows.  ``jax.grad`` wrt a
probe is exactly ``dL/d(x_output_B)`` — what the reference hook receives — and
feeds the functional VQ update after the step (visible to the next batch,
matching hook timing).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.nn.vq import VQParams, VQState, lookup
from vq_gnn_tpu.ops.gat import attention_logits, explosion_scale, gat_edge_values
from vq_gnn_tpu.ops.spmm import spmm
from vq_gnn_tpu.ops.vq_ops import masked_mean_var
from vq_gnn_tpu.sampler.batch import PaddedBatch

ALPHA_DROPOUT_ALPHA = -1.7580993408473766  # SELU alpha' (torch AlphaDropout)


# --------------------------------------------------------------------------
# static model description
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ModelStatic:
    """Static (hashable) model structure derived from Config."""

    num_layers: int
    channels: Tuple[int, ...]  # [in, hidden, ..., out] length L+1
    conv_type: str
    skip: bool
    act: str
    bn_flag: bool
    dropout: float
    alpha_dropout_flag: bool
    num_D: int
    vq: VQParams

    @property
    def num_branches(self) -> Tuple[int, ...]:
        return tuple(c // self.num_D for c in self.channels[:-1])


def model_static(cfg: Config, in_channels: int, out_channels: int) -> ModelStatic:
    chans = (
        (in_channels,)
        + (cfg.hidden_channels,) * (cfg.num_layers - 1)
        + (out_channels,)
    )
    vq = VQParams(
        num_M=cfg.num_M,
        num_D=cfg.num_D,
        decay=cfg.ema_decay,
        epsilon=cfg.ema_epsilon,
        grad_scale=tuple(cfg.grad_scale),
        warm_up_flag=cfg.warm_up_flag,
        momentum=cfg.momentum,
        add_flag=False,  # v2 always (models.py v2:30); v1 GAT uses True
    )
    if cfg.dropbranch > 0:
        # cat of a branch subset mismatches gnn_transform's fan-in in the
        # reference too (models.py v2:150-174); only dropbranch=0 is runnable.
        raise NotImplementedError("dropbranch > 0 is broken in the reference")
    return ModelStatic(
        num_layers=cfg.num_layers,
        channels=chans,
        conv_type=cfg.conv_type,
        skip=cfg.skip,
        act=cfg.act,
        bn_flag=cfg.bn_flag,
        dropout=cfg.dropout,
        alpha_dropout_flag=cfg.alpha_dropout_flag,
        num_D=cfg.num_D,
        vq=vq,
    )


# --------------------------------------------------------------------------
# parameter / state init (torch-matching distributions)
# --------------------------------------------------------------------------
def _linear_init(rng, fan_in, fan_out):
    """torch.nn.Linear default: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _glorot_vec(rng, c):
    """PyG glorot on att [1, 1, c]: U(-a, a), a = sqrt(6 / (1 + c))."""
    a = jnp.sqrt(6.0 / (1.0 + c))
    return jax.random.uniform(rng, (c,), jnp.float32, -a, a)


def init_params(rng, ms: ModelStatic) -> List[Dict[str, Any]]:
    params = []
    for l in range(ms.num_layers):
        c_in, c_out = ms.channels[l], ms.channels[l + 1]
        rng, k1, k2, k3, k4, k5 = jax.random.split(rng, 6)
        layer = {"gnn_transform": _linear_init(k1, c_in, c_out)}
        if ms.skip:
            layer["linear_skip"] = _linear_init(k2, c_in, c_out)
        if ms.conv_type == "SAGE":
            layer["fc_sage"] = _linear_init(k3, c_in, c_out)
        if ms.conv_type == "GAT":
            layer["att_l"] = _glorot_vec(k4, c_in + 1)
            layer["att_r"] = _glorot_vec(k5, c_in + 1)
        params.append(layer)
    return params


class BNState(struct.PyTreeNode):
    """Running stats of the affine-free inter-layer BatchNorms
    (``models.py v2:262, 319-320``)."""

    mean: List[jnp.ndarray]
    var: List[jnp.ndarray]


def init_bn_state(ms: ModelStatic) -> BNState:
    return BNState(
        mean=[jnp.zeros(ms.channels[l + 1]) for l in range(ms.num_layers - 1)],
        var=[jnp.ones(ms.channels[l + 1]) for l in range(ms.num_layers - 1)],
    )


# --------------------------------------------------------------------------
# activations / dropout
# --------------------------------------------------------------------------
def activation(x, act: str):
    if act == "relu":
        return jax.nn.relu(x)
    if act == "elu":
        return jax.nn.elu(x)
    if act == "leaky_gelu":  # models.py v2:296
        return 0.1 * x + 0.9 * jax.nn.gelu(x, approximate=False)
    raise ValueError("Activation not supported!")


def dropout(rng, x, p, training):
    if not training or p == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def alpha_dropout(rng, x, p, training):
    """torch.nn.AlphaDropout semantics (SELU self-normalizing dropout)."""
    if not training or p == 0.0:
        return x
    alpha = ALPHA_DROPOUT_ALPHA
    q = 1.0 - p
    a = (q * (1.0 + p * alpha**2)) ** -0.5
    b = -a * alpha * p
    keep = jax.random.bernoulli(rng, q, x.shape)
    return a * jnp.where(keep, x, alpha) + b


def batchnorm_infer(x, mean, var, eps=1e-5):
    return (x - mean[None, :]) * jax.lax.rsqrt(var[None, :] + eps)


def batchnorm_train(x, mean, var, valid, eps=1e-5, momentum=0.1):
    """Affine-free BN over valid batch rows; returns (y, new_mean, new_var)."""
    b_mean, b_var = masked_mean_var(x, valid, ddof=0)
    _, b_var_u = masked_mean_var(x, valid, ddof=1)
    y = (x - b_mean[None, :]) * jax.lax.rsqrt(b_var[None, :] + eps)
    return (
        y,
        (1 - momentum) * mean + momentum * b_mean,
        (1 - momentum) * var + momentum * b_var_u,
    )


# --------------------------------------------------------------------------
# one layer, B+B' (v2) formulation
# --------------------------------------------------------------------------
def layer_forward(
    lp: Dict[str, Any],
    vq_state: VQState,
    ms: ModelStatic,
    x: jnp.ndarray,  # [B_pad, C_in]
    batch: PaddedBatch,
    probe: Optional[jnp.ndarray],  # [B_pad, C_conv] or None
    warm_up_rate,
    training: bool,
):
    """One LowRankGNNLayer forward (``models.py v2:144-231``).

    Returns (x_out [B_pad, C_out], info_backward scalar).
    """
    B_pad = batch.B_pad
    gat = ms.conv_type == "GAT"

    # out-of-batch features/grads from the codebook (models.py v2:165-173)
    x_fo, grad_fo = lookup(vq_state, batch.fo_ids, ms.vq)
    fo_mask = batch.valid_fo.astype(x.dtype)[:, None]
    x_fo = x_fo * fo_mask
    grad_fo = jax.lax.stop_gradient(grad_fo * fo_mask)

    x_input = jnp.concatenate([x, x_fo], axis=0)  # [dim_pad, C_in]
    if gat:
        ones = jnp.ones((x_input.shape[0], 1), x_input.dtype)
        x_input = jnp.concatenate([x_input, ones], axis=1)

    # conv: plain (or attention-weighted) SpMM over the padded local adjacency
    if gat:
        al, ar = attention_logits(x_input, lp["att_l"], lp["att_r"])
        valid_all = jnp.concatenate([batch.valid_B, batch.valid_fo])
        scale = explosion_scale(al, ar, valid_all)  # Trick 1 (convs.py v2:209)
        ev = gat_edge_values(
            batch.edges.row, batch.edges.col, batch.edges.val, al / scale, ar / scale
        )
        x_out = spmm(batch.edges.replace(val=ev), x_input)
    else:
        x_out = spmm(batch.edges, x_input)

    # probe == the reference's per-branch grad hook point (models.py v2:181-185)
    if probe is not None:
        x_out = x_out.at[:B_pad].add(probe)

    if gat:  # ones-column normalization of batch rows (models.py v2:187-189)
        x_out_B = x_out[:B_pad, :-1] / (x_out[:B_pad, -1:] + 1e-16)
        x_out_fo = x_out[B_pad:, :-1]
    else:
        x_out_B = x_out[:B_pad]
        x_out_fo = x_out[B_pad:]

    # gradient recovery term (models.py v2:198-200)
    info_backward = jnp.sum(x_out_fo * grad_fo * warm_up_rate)

    out = x_out_B @ lp["gnn_transform"]["w"] + lp["gnn_transform"]["b"]
    if ms.conv_type == "SAGE":  # root weight (models.py v2:203-204)
        out = out + x @ lp["fc_sage"]["w"] + lp["fc_sage"]["b"]
    if ms.skip:
        out = out + x @ lp["linear_skip"]["w"] + lp["linear_skip"]["b"]
    return out, info_backward


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------
def model_forward(
    params: List[Dict[str, Any]],
    vq_states: List[VQState],
    bn_state: BNState,
    ms: ModelStatic,
    x_B: jnp.ndarray,  # [B_pad, F] gathered batch features
    batch: PaddedBatch,
    probes: Optional[List[jnp.ndarray]] = None,
    warm_up_rate=1.0,
    training: bool = False,
    rng: Optional[jnp.ndarray] = None,
    num_layers_to_run: Optional[int] = None,
    with_bn_act: bool = True,
):
    """Full LowRankGNN forward (``models.py v2:308-348``).

    Returns (out [B_pad, C_out], info_backward, layer_inputs, new_bn_state).
    ``num_layers_to_run``/``with_bn_act=False`` implement the layerwise init
    bootstrap partial forward (``models.py v2:370-374``: conv + act only).
    """
    L = num_layers_to_run if num_layers_to_run is not None else ms.num_layers
    x = x_B
    layer_inputs = []
    info_total = 0.0
    new_means, new_vars = list(bn_state.mean), list(bn_state.var)

    for l in range(L):
        layer_inputs.append(x)
        probe = probes[l] if probes is not None else None
        x, info_b = layer_forward(
            params[l], vq_states[l], ms, x, batch, probe, warm_up_rate, training
        )
        info_total = info_total + info_b
        last = l == ms.num_layers - 1
        if not last:
            if with_bn_act:
                if ms.bn_flag:
                    if training:
                        x, new_means[l], new_vars[l] = batchnorm_train(
                            x, bn_state.mean[l], bn_state.var[l], batch.valid_B
                        )
                    else:
                        x = batchnorm_infer(x, bn_state.mean[l], bn_state.var[l])
                x = activation(x, ms.act)
                if ms.dropout > 0 and training:
                    rng, sub = jax.random.split(rng)
                    x = (
                        alpha_dropout(sub, x, ms.dropout, training)
                        if ms.alpha_dropout_flag
                        else dropout(sub, x, ms.dropout, training)
                    )
            else:  # init bootstrap: conv + act only (models.py v2:370-374)
                x = activation(x, ms.act)

    return x, info_total, layer_inputs, BNState(mean=new_means, var=new_vars)


def probe_shapes(ms: ModelStatic, B_pad: int) -> List[Tuple[int, int]]:
    """Conv-output widths per layer (the +1 ones column for GAT)."""
    extra = 1 if ms.conv_type == "GAT" else 0
    return [(B_pad, ms.channels[l] + extra) for l in range(ms.num_layers)]


def zero_probes(ms: ModelStatic, B_pad: int) -> List[jnp.ndarray]:
    return [jnp.zeros(s, jnp.float32) for s in probe_shapes(ms, B_pad)]


# --------------------------------------------------------------------------
# exact full-graph inference (no VQ) — v1 semantics (v1/models.py:486-504)
# --------------------------------------------------------------------------
def full_graph_inference(params, bn_state, ms: ModelStatic, x, edges):
    """Plain conv stack with the learned weights, codebooks bypassed.

    Note: faithful to the reference, fc_sage is NOT applied here and BN runs
    in eval mode.  GAT inference is not defined by the reference (its
    inference() ignores attention entirely); we do the same plain SpMM.
    """
    for l in range(ms.num_layers):
        h = spmm(edges, x)
        h = h @ params[l]["gnn_transform"]["w"] + params[l]["gnn_transform"]["b"]
        if ms.skip:
            h = h + x @ params[l]["linear_skip"]["w"] + params[l]["linear_skip"]["b"]
        x = h
        if l < ms.num_layers - 1:
            if ms.bn_flag:
                x = batchnorm_infer(x, bn_state.mean[l], bn_state.var[l])
            x = activation(x, ms.act)
    return x
