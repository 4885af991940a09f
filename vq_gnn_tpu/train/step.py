"""Jitted train / eval / init-sweep steps.

One training step reproduces the reference hot path (SURVEY §3.1) as a single
XLA program:

1. gather batch features from the device-resident feature table,
2. forward through the LowRankGNN stack (probes added at each conv output),
3. loss = masked CE/BCE + info_backward,
4. one ``jax.grad`` over (params, probes) — the probe gradients are exactly
   what the reference's backward hooks receive,
5. torch-parity RMSprop update (gated by ``do_opt_step`` for multi-window
   batches, ``main_node.py v2:113-116``),
6. in 'live' mode: the functional VQ codebook update per layer (the hook
   body), visible to the *next* batch — matching reference hook timing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.nn.model import (
    ModelStatic,
    activation,
    layer_forward,
    layer_forward_bm,
    model_forward,
    zero_probes,
    zero_probes_tr,
)
from vq_gnn_tpu.nn.vq import feature_update, vq_update
from vq_gnn_tpu.sampler.batch import PaddedBatch
from vq_gnn_tpu.train.optim import rmsprop_update
from vq_gnn_tpu.train.state import TrainState


def _branch_view(x: jnp.ndarray, nb: int, d: int) -> jnp.ndarray:
    """[B, nb*d] -> [nb, B, d] per-branch slices (branch i = cols i*d:(i+1)*d)."""
    B = x.shape[0]
    return jnp.transpose(x.reshape(B, nb, d), (1, 0, 2))


def masked_ce(logits, y, mask):
    logz = jax.nn.log_softmax(logits)
    ll = jnp.take_along_axis(logz, y[:, None].astype(jnp.int32), axis=1)[:, 0]
    m = mask.astype(logits.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_bce(logits, y, mask):
    per = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    m = mask.astype(logits.dtype)[:, None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * logits.shape[1], 1.0)


def masked_accuracy(logits, y, mask):
    hit = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
    m = mask.astype(jnp.float32)
    return jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1.0)


@dataclasses.dataclass
class StepFns:
    train_step: Callable
    eval_step: Callable
    init_step_for: Callable  # layer_idx -> jitted init-sweep step
    eval_assign_step: Callable = None  # inductive per-split c-table eval


def make_step_fns(ms: ModelStatic, cfg: Config, multilabel: bool) -> StepFns:
    live = cfg.vq_update_mode == "live"
    D = ms.num_D

    # ---------------- train ----------------
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState,
        X_dev: jnp.ndarray,
        batch: PaddedBatch,
        warm_up_rate,
        lr,
        do_opt_step,
        rng,
    ):
        probes = zero_probes(ms, batch.B_pad)
        # empty list (not None) so it stays a valid differentiable pytree
        probes_tr = zero_probes_tr(ms, batch.B_pad) if ms.transformer_flag else []

        # dropbranch: per layer keep exactly int(nb*(1-p)) branches (the
        # reference's randperm subset, models.py v2:150-155, with static
        # shapes — see ModelStatic.dropbranch)
        branch_masks = None
        if ms.dropbranch > 0:
            rng, kd = jax.random.split(rng)
            branch_masks = []
            for nb in ms.num_branches:
                kd, sub = jax.random.split(kd)
                kept = int(nb * (1.0 - ms.dropbranch))
                perm = jax.random.permutation(sub, nb)
                branch_masks.append(
                    jnp.zeros((nb,), bool).at[perm[:kept]].set(True)
                )

        def loss_fn(params, probes, probes_tr):
            x_B = jnp.take(X_dev, batch.batch_idx, axis=0)
            out, info_b, layer_inputs, new_bn = model_forward(
                params,
                state.vq_states,
                state.bn_state,
                ms,
                x_B,
                batch,
                probes=probes,
                warm_up_rate=warm_up_rate,
                training=True,
                rng=rng,
                vq_states_tr=state.vq_states_tr,
                probes_tr=probes_tr,
                branch_masks=branch_masks,
            )
            mask = batch.train_mask & batch.valid_B
            if multilabel:
                loss_cls = masked_bce(out, batch.y, mask)
                acc = jnp.float32(0.0)
            else:
                loss_cls = masked_ce(out, batch.y, mask)
                acc = masked_accuracy(out, batch.y, mask)
            loss = loss_cls if cfg.ce_only else loss_cls + info_b
            return loss, (layer_inputs, new_bn, loss_cls, acc, info_b)

        (loss, aux), (g_params, g_probes, g_probes_tr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, probes, probes_tr)
        layer_inputs, new_bn, loss_cls, acc, info_b = aux

        new_params, new_nu = rmsprop_update(
            state.params, g_params, state.opt_nu, lr, do_opt_step
        )

        new_vq = list(state.vq_states)
        if live:
            # the reference hook body (models.py v2:39-56): X_B = layer input
            # slice (detached), grad = dL/d(output slice); runs even on
            # skipped-optimizer windows (backward always fires hooks).
            for l in range(ms.num_layers):
                nb = ms.num_branches[l]
                Xb = _branch_view(jax.lax.stop_gradient(layer_inputs[l]), nb, D)
                gp = g_probes[l]
                if gp.ndim == 3:  # bm GAT: [nb, B_pad, D+1] incl. ones-col grad
                    Gb = gp
                else:
                    Gb = _branch_view(gp[:, : nb * D], nb, D)
                new_vq[l], _ = vq_update(
                    new_vq[l], Xb, Gb, batch.batch_idx, ms.vq, valid=batch.valid_B,
                    branch_keep=None if branch_masks is None else branch_masks[l],
                )

        new_vq_tr = state.vq_states_tr
        if live and ms.transformer_flag:
            new_vq_tr = list(state.vq_states_tr)
            for l in range(ms.num_layers):
                nb = ms.num_branches[l]
                Xb = _branch_view(jax.lax.stop_gradient(layer_inputs[l]), nb, D)
                new_vq_tr[l], _ = vq_update(
                    new_vq_tr[l],
                    Xb,
                    g_probes_tr[l],
                    batch.batch_idx,
                    ms.vq_tr,
                    valid=batch.valid_B,
                    branch_keep=None if branch_masks is None else branch_masks[l],
                )

        bad = [s.bad_init for s in new_vq]
        if ms.transformer_flag:
            bad += [s.bad_init for s in new_vq_tr]
        # grad-norm telemetry (v1 main_node.py:100-114 records these)
        grad_norm = jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree.leaves(g_params))
        )
        metrics = {
            "loss": loss,
            "loss_cls": loss_cls,
            "train_acc": acc,
            "info_backward": info_b,
            "grad_norm": grad_norm,
            "bad_init": jnp.any(jnp.stack(bad)),
        }
        return (
            TrainState(
                params=new_params,
                vq_states=new_vq,
                bn_state=new_bn,
                opt_nu=new_nu,
                step=state.step + 1,
                vq_states_tr=new_vq_tr,
            ),
            metrics,
        )

    # ---------------- eval ----------------
    @jax.jit
    def eval_step(state: TrainState, X_dev: jnp.ndarray, batch: PaddedBatch):
        x_B = jnp.take(X_dev, batch.batch_idx, axis=0)
        out, _, _, _ = model_forward(
            state.params,
            state.vq_states,
            state.bn_state,
            ms,
            x_B,
            batch,
            training=False,
            vq_states_tr=state.vq_states_tr,
        )
        return out

    # ---------------- inductive stochastic eval ----------------
    @jax.jit
    def eval_assign_step(state: TrainState, c_tables, X_dev, batch: PaddedBatch):
        """Stochastic eval on a *different* graph with per-split codeword
        tables (v1 ``models_inductive.py:242-292``): each layer assigns the
        batch's features to their nearest feature-half codeword, scatters
        into the split's own c table (sized for that graph), and runs the
        forward against it.  Codebooks themselves are frozen (eval mode).
        Returns (out, updated c_tables)."""
        x = jnp.take(X_dev, batch.batch_idx, axis=0)
        new_tables = list(c_tables)
        out = x
        for l in range(ms.num_layers):
            nb = ms.num_branches[l]
            Xb = _branch_view(out, nb, D)
            st = state.vq_states[l]
            _, idx = feature_update(
                st, Xb, batch.batch_idx, ms.vq, valid=batch.valid_B, training=False
            )
            new_tables[l] = new_tables[l].at[batch.batch_idx, :].set(
                idx.T.astype(jnp.int16), mode="drop"
            )
            st = st.replace(c_indices=new_tables[l])
            if ms.formulation == "bm":
                out, _ = layer_forward_bm(
                    state.params[l], st, ms, out, batch, None, 1.0, False
                )
            else:
                out, _ = layer_forward(
                    state.params[l], st, ms, out, batch, None, 1.0, False
                )
            if l < ms.num_layers - 1:
                if ms.bn_flag:
                    from vq_gnn_tpu.nn.model import batchnorm_infer

                    out = batchnorm_infer(
                        out, state.bn_state.mean[l], state.bn_state.var[l]
                    )
                out = activation(out, ms.act)
        return out, new_tables

    # ---------------- layerwise init sweep ----------------
    _init_cache: Dict[int, Callable] = {}

    def init_step_for(layer_idx: int) -> Callable:
        if layer_idx in _init_cache:
            return _init_cache[layer_idx]

        @partial(jax.jit, donate_argnums=(0, 1))
        def init_step(vq_states, vq_states_tr, params, X_dev, batch: PaddedBatch):
            """model.init partial forward (``models.py v2:370-374`` +
            ``main_node.py v2:17-37``): every still-uninited block runs
            feature_update on the current activations, then the layer
            forward uses the freshly updated codebook."""
            x = jnp.take(X_dev, batch.batch_idx, axis=0)
            new_states = list(vq_states)
            new_tr = list(vq_states_tr) if vq_states_tr else vq_states_tr
            for l in range(layer_idx):
                nb = ms.num_branches[l]
                Xb = _branch_view(x, nb, D)
                new_states[l], _ = feature_update(
                    new_states[l], Xb, batch.batch_idx, ms.vq, valid=batch.valid_B
                )
                if ms.transformer_flag:
                    new_tr[l], _ = feature_update(
                        new_tr[l], Xb, batch.batch_idx, ms.vq_tr, valid=batch.valid_B
                    )
                if ms.formulation == "bm":
                    x, _ = layer_forward_bm(
                        params[l],
                        new_states[l],
                        ms,
                        x,
                        batch,
                        None,
                        1.0,
                        False,
                        vq_tr=new_tr[l] if ms.transformer_flag else None,
                    )
                else:
                    x, _ = layer_forward(
                        params[l], new_states[l], ms, x, batch, None, 1.0, False
                    )
                x = activation(x, ms.act)
            return new_states, new_tr

        _init_cache[layer_idx] = init_step
        return init_step

    return StepFns(
        train_step=train_step,
        eval_step=eval_step,
        init_step_for=init_step_for,
        eval_assign_step=eval_assign_step,
    )
