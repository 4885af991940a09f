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
from vq_gnn_tpu.ops.gat import (
    attention_logits,
    explosion_scale,
    gat_conv_ell_mh,
    gat_edge_values,
)
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
    # 'bbprime' (v2 B+B') or 'bm' (v1 B+M mapper formulation)
    formulation: str = "bbprime"
    # stochastic branch dropping (reference --dropbranch, models.py v2:150-155).
    # The reference implementation is unrunnable (the branch-subset cat
    # mismatches gnn_transform's fan-in in both v1 and v2); this is the
    # working static-shape semantics: each training step keeps exactly
    # int(nb*(1-p)) branches per layer, and a dropped branch contributes no
    # codebook features, no gradient-recovery term, no VQ/c_indices update
    # (and, in the v1 per-branch-conv formulation, a zeroed hidden slice).
    dropbranch: float = 0.0
    # streaming dtype for the aggregate (gathered features + edge values);
    # accumulation stays f32. 'bfloat16' halves the dominant HBM traffic.
    compute_dtype: str = "float32"
    # v1 parallel low-rank global-attention branch (v1/models.py:342-362)
    transformer_flag: bool = False
    # ce_only runs never consume info_backward — skipping the exact-reverse
    # recovery keeps the full-graph exact-control arm off the rev kernel's
    # HBM stash (22.5 GB at N=169k; the term is semantically inert there)
    ce_only: bool = False

    @property
    def vq_tr(self) -> VQParams:
        """Transformer blocks always quantize the ones-column grad
        (v1/models.py:272 passes transformer_flag=True -> add_flag=True)."""
        return dataclasses.replace(self.vq, add_flag=True)

    @property
    def num_branches(self) -> Tuple[int, ...]:
        return tuple(c // self.num_D for c in self.channels[:-1])


def resolve_vq_backend(backend: str) -> str:
    """'auto' -> fastest backend for the current platform (pallas_fast on
    TPU, xla on CPU where the Pallas kernels only run interpreted)."""
    if backend != "auto":
        return backend
    import jax

    return "pallas_fast" if jax.default_backend() == "tpu" else "xla"


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
        # v2 never quantizes the ones column (models.py v2:30); v1 GNN blocks
        # do only for GAT (v1/models.py:53 with block transformer_flag=False,
        # v1:278); transformer blocks always do (v1:272) — see vq_tr below.
        add_flag=cfg.formulation == "bm" and cfg.conv_type == "GAT",
        backend=resolve_vq_backend(cfg.vq_backend),
    )
    if cfg.dropbranch > 0:
        if not 0.0 < cfg.dropbranch < 1.0:
            raise ValueError("dropbranch must be in [0, 1)")
        for c in chans[:-1]:
            if int((c // cfg.num_D) * (1.0 - cfg.dropbranch)) < 1:
                raise ValueError(
                    "dropbranch too large: a layer would keep zero branches"
                )
    if cfg.transformer_flag and cfg.formulation != "bm":
        # the v2 transformer path is commented out (models.py v2:206-226)
        raise NotImplementedError("transformer_flag requires formulation='bm'")
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
        formulation=cfg.formulation,
        transformer_flag=cfg.transformer_flag,
        compute_dtype=cfg.compute_dtype,
        dropbranch=cfg.dropbranch,
        ce_only=cfg.ce_only,
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
            if ms.formulation == "bm":
                # v1: one OurGATConv per branch, each over its D+1 slice
                nb = ms.num_branches[l]
                ka = jax.random.split(k4, nb)
                kb = jax.random.split(k5, nb)
                layer["att_l"] = jnp.stack(
                    [_glorot_vec(ka[i], ms.num_D + 1) for i in range(nb)]
                )
                layer["att_r"] = jnp.stack(
                    [_glorot_vec(kb[i], ms.num_D + 1) for i in range(nb)]
                )
            else:
                layer["att_l"] = _glorot_vec(k4, c_in + 1)
                layer["att_r"] = _glorot_vec(k5, c_in + 1)
        if ms.transformer_flag:
            nb = ms.num_branches[l]
            rng, kk, kv, kr = jax.random.split(rng, 4)
            kks = jax.random.split(kk, nb)
            tk = [_linear_init(kks[i], ms.num_D, ms.num_D) for i in range(nb)]
            layer["transformer_k"] = {
                "w": jnp.stack([t["w"] for t in tk]),
                "b": jnp.stack([t["b"] for t in tk]),
            }
            layer["transformer_v"] = _linear_init(kv, c_in, c_out)
            layer["transformer_res"] = _linear_init(kr, c_in, c_out)
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
    branch_keep: Optional[jnp.ndarray] = None,  # [nb] bool, dropbranch mask
):
    """One LowRankGNNLayer forward (``models.py v2:144-231``).

    Returns (x_out [B_pad, C_out], info_backward scalar).
    """
    B_pad = batch.B_pad
    gat = ms.conv_type == "GAT"

    # out-of-batch features/grads from the codebook (models.py v2:165-173);
    # the one-hot lookup streams bf16 when the whole compute path does
    _ld = jnp.dtype(ms.compute_dtype)
    x_fo, grad_fo = lookup(
        vq_state, batch.fo_ids, ms.vq,
        stream=_ld if _ld == jnp.bfloat16 else None,
    )
    fo_mask = batch.valid_fo.astype(x.dtype)[:, None]
    x_fo = x_fo * fo_mask
    grad_fo = jax.lax.stop_gradient(grad_fo * fo_mask)
    if branch_keep is not None:
        # dropped branches contribute no codebook features and no
        # gradient-recovery term (batch-row columns stay, like the
        # reference's full-width x into the conv, models.py v2:174)
        x_fo = x_fo * jnp.repeat(branch_keep.astype(x_fo.dtype), ms.num_D)[None, :]
        grad_fo = grad_fo * jnp.repeat(
            branch_keep.astype(grad_fo.dtype), ms.vq.grad_dim
        )[None, :]

    x_input = jnp.concatenate([x, x_fo], axis=0)  # [dim_pad, C_in]
    gat_ell = gat and (
        batch.edges.ell_row is not None or batch.edges.tail_row is not None
    )
    if gat and not gat_ell:
        ones = jnp.ones((x_input.shape[0], 1), x_input.dtype)
        x_input = jnp.concatenate([x_input, ones], axis=1)
    cd = jnp.dtype(ms.compute_dtype)
    if x_input.dtype != cd:
        x_input = x_input.astype(cd)

    # conv: plain (or attention-weighted) SpMM over the padded local adjacency
    norm_col = None  # GAT ELL path keeps the ones-normalizer as its own [*, 1]
    if gat:
        if gat_ell:
            # logits of the (C+1)-wide reference input == C-wide matmul plus
            # the ones-column bias (att[-1]); keeping the feature matrix at C
            # columns avoids lane-padding every gather to the next 128
            C = x_input.shape[1]
            al = x_input @ lp["att_l"][:C].astype(cd) + lp["att_l"][C]
            ar = x_input @ lp["att_r"][:C].astype(cd) + lp["att_r"][C]
        else:
            al, ar = attention_logits(x_input, lp["att_l"], lp["att_r"])
        valid_all = jnp.concatenate([batch.valid_B, batch.valid_fo])
        scale = explosion_scale(al, ar, valid_all)  # Trick 1 (convs.py v2:209)
        al, ar = al / scale, ar / scale
        e = batch.edges
        if gat_ell:
            # fully-fused attention + aggregate + ones-normalizer: col-side
            # logits come from the gathered neighbor rows on the MXU, and the
            # custom backward is all row gathers + sorted segment-sums
            from vq_gnn_tpu.ops.gat import gat_conv_ell

            x_out, norm_col = gat_conv_ell(
                e, x_input, lp["att_l"], lp["att_r"], scale
            )  # [dim_pad, C], [dim_pad, 1]
        else:
            ev = gat_edge_values(e.row, e.col, e.val, al, ar)
            x_out = spmm(e.replace(val=ev), x_input)
    else:
        x_out = spmm(batch.edges, x_input)

    # probe == the reference's per-branch grad hook point (models.py v2:181-185).
    # Concatenate instead of .at[:B_pad].add — the static-slice update lowers
    # to a scatter-add + full-array gather (~3.5ms/step measured); the concat
    # fuses into the consumers.
    def _add_head(arr, p_):
        return jnp.concatenate([arr[:B_pad] + p_, arr[B_pad:]], axis=0)

    if probe is not None:
        if norm_col is not None:
            # probe stays (C+1)-wide like the reference conv output; its last
            # column lands on the separated ones-normalizer
            Cc = x_out.shape[1]
            x_out = _add_head(x_out, probe[:, :Cc])
            norm_col = _add_head(norm_col, probe[:, Cc:])
        else:
            x_out = _add_head(x_out, probe)

    if gat:  # ones-column normalization of batch rows (models.py v2:187-189)
        if norm_col is not None:
            x_out_B = x_out[:B_pad] / (norm_col[:B_pad] + 1e-16)
            x_out_fo = x_out[B_pad:]
        else:
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
# one layer, B+M (v1 mapper) formulation
# --------------------------------------------------------------------------
def _rev_kernel_ok() -> bool:
    """Fused rev-ELL recovery dispatch: TPU, or interpret mode for CI.
    VQ_GNN_REV=off pins the XLA grid path (oracle/A-B runs)."""
    import os

    from vq_gnn_tpu.ops.spmm import pallas_interpret_mode

    if os.environ.get("VQ_GNN_REV", "auto") == "off":
        return False
    return pallas_interpret_mode() or jax.default_backend() != "cpu"


def _bm_exact_reverse_info(
    vq_state, ms: ModelStatic, batch: PaddedBatch, x_cols, warm_up_rate,
    al=None, ar_cb=None, branch_keep=None,
):
    """Exact v1 codeword-row output for non-GCN recovery.

    Builds, per branch, the [M, B] cell matrix relu(sum rv - sum A) the
    mapper produces after coalesce + keep-positive (the reverse-normalized
    additions and raw-A subtractions don't cancel, v1/utils/dataloader.py:
    153-180), applies the per-cell GAT attention when given, and returns
    info_backward = sum(out_M * grad_table) * warm.

    x_cols: [nb, B_pad, Dg_in] per-branch batch-row features.
    """
    B_pad = batch.B_pad
    M, D = ms.vq.num_M, ms.num_D
    if ms.ce_only:
        return jnp.float32(0.0)
    grad_table = jax.lax.stop_gradient(vq_state.embedding_output[:, :, D:])
    use_attention = al is not None
    if not use_attention:
        nb = x_cols.shape[0]
        al = jnp.zeros((nb, B_pad))
        ar_cb = jnp.zeros((nb, M))

    if batch.rev_slot_row is not None and _rev_kernel_ok():
        # fused rev-ELL path (ops/pallas_rev.py): no [nb, M*B_pad] grid,
        # no unsorted scatter — the round-4 bm GAT floor (~130 ms/step of
        # scatter + grid traffic, BASELINE.md) collapses to a few ms
        from vq_gnn_tpu.ops.pallas_rev import (
            rev_fold_mode,
            rev_recovery_info,
            rev_tb,
        )
        from vq_gnn_tpu.ops.spmm import pallas_interpret_mode
        from vq_gnn_tpu.sampler.batch import REV_TB, REV_TS

        nb, _, Dg = x_cols.shape
        Dp = ((Dg + 7) // 8) * 8
        c_flat = jnp.take(
            vq_state.c_indices, batch.rev_slot_col.reshape(-1), axis=0,
            mode="clip",
        ).astype(jnp.int32)  # [S*K, nb] — the kernel's gather-natural layout
        xb = jnp.pad(
            x_cols.astype(jnp.float32), ((0, 0), (0, 0), (0, Dp - Dg))
        )
        gbarT = jnp.pad(
            jnp.transpose(grad_table, (0, 2, 1)).astype(jnp.float32),
            ((0, 0), (0, Dp - Dg), (0, 0)),
        )
        infos = rev_recovery_info(
            c_flat,
            batch.rev_slot_val,
            batch.rev_slot_row,
            batch.rev_tile_of,
            batch.rev_blk_of,
            batch.rev_flags,
            xb,
            al.astype(jnp.float32)[:, :, None],
            ar_cb.astype(jnp.float32),
            gbarT,
            REV_TS,
            rev_tb(B_pad, REV_TB),
            rev_fold_mode(),
            pallas_interpret_mode(),
        )
        if branch_keep is not None:
            infos = infos * branch_keep.astype(infos.dtype)
        return jnp.sum(infos) * warm_up_rate

    local_col = batch.bm_rev_row.astype(jnp.int32)

    def one_branch(c_row, gbar, xb, al_b, arcb_b):
        c = jnp.take(c_row, batch.bm_rev_col, mode="clip").astype(jnp.int32)
        cell = c * B_pad + local_col
        S = jax.ops.segment_sum(batch.bm_rev_val, cell, num_segments=M * B_pad)
        S = jax.nn.relu(S).reshape(M, B_pad)
        if use_attention:
            a = al_b[None, :] + arcb_b[:, None]
            S = S * jnp.exp(jax.nn.leaky_relu(a, 0.2))
        out_M = jnp.dot(S, xb, preferred_element_type=jnp.float32)
        return jnp.sum(out_M * gbar)

    # vmap, not lax.map: the sequential while-loop serialized the nb
    # branches (profiled 204 ms/step of 705 on the bm GAT bench shape);
    # batched, the nb scatters/dots issue together ([nb, M*B_pad] grid =
    # 1.3 GB transient at the reddit shape — fine in 16 GB HBM)
    infos = jax.vmap(one_branch)(
        vq_state.c_indices.T.astype(jnp.int32), grad_table, x_cols, al, ar_cb
    )
    if branch_keep is not None:
        infos = infos * branch_keep.astype(infos.dtype)
    return jnp.sum(infos) * warm_up_rate


def transformer_branch(
    lp: Dict[str, Any],
    vq_tr: VQState,
    ms: ModelStatic,
    x: jnp.ndarray,  # [B_pad, C_in]
    batch: PaddedBatch,
    probe_tr: Optional[jnp.ndarray],  # [nb, B_pad, D+1]
    warm_up_rate,
    branch_keep: Optional[jnp.ndarray] = None,  # [nb] bool, dropbranch mask
):
    """v1 parallel low-rank global-attention branch.

    Per branch (v1/models.py:143-233 with transformer_flag + convs.py:269-287):
    LayerNorm -> transformer_k -> append ones, then two-way exp-attention
    between the batch rows and the codebook, with the global c_max guard.
    Returns (x_out_tr [B_pad, C_out-input of transformer_v], info_backward,
    out_pre [nb, B_pad, D+1] pre-normalization — the hook point).
    """
    B_pad = batch.B_pad
    D = ms.num_D
    nb = x.shape[1] // D
    M = ms.vq.num_M

    xb = jnp.transpose(x.reshape(B_pad, nb, D), (1, 0, 2))  # [nb, B_pad, D]
    xbar = jax.lax.stop_gradient(vq_tr.embedding_output[:, :, :D]) * warm_up_rate
    gbar = jax.lax.stop_gradient(vq_tr.embedding_output[:, :, D:])  # [nb, M, D+1]

    x_in = jnp.concatenate([xb, xbar], axis=1)  # [nb, B_pad+M, D]
    # affine-free LayerNorm over D (v1/models.py:65, 185)
    mu = jnp.mean(x_in, axis=2, keepdims=True)
    var = jnp.mean((x_in - mu) ** 2, axis=2, keepdims=True)
    x_in = (x_in - mu) * jax.lax.rsqrt(var + 1e-5)
    # per-branch transformer_k linear
    x_in = jnp.einsum("nbd,nde->nbe", x_in, lp["transformer_k"]["w"]) + lp[
        "transformer_k"
    ]["b"][:, None, :]
    ones = jnp.ones((nb, x_in.shape[1], 1), x.dtype)
    x_in = jnp.concatenate([x_in, ones], axis=2)  # [nb, B_pad+M, D+1]

    xB, xM = x_in[:, :B_pad], x_in[:, B_pad:]
    C = jnp.einsum("nbd,nmd->nbm", xB, xM) / jnp.sqrt(jnp.float32(D + 1))
    # c_max over valid batch rows + codebook rows (convs.py:279)
    nB = jnp.sum(xB**2, axis=2)  # [nb, B_pad]
    nM = jnp.sum(xM**2, axis=2)
    neg = jnp.float32(-jnp.inf)
    c_max = jnp.maximum(
        jnp.max(jnp.where(batch.valid_B[None, :], nB, neg), axis=1),
        jnp.max(nM, axis=1),
    )[:, None, None]
    C = jnp.exp(C / c_max)
    out_B = jnp.einsum(
        "nbm,nmd->nbd", C / jnp.sum(C, axis=2, keepdims=True), xM
    )  # [nb, B_pad, D+1]
    Cm = C * batch.valid_B.astype(C.dtype)[None, :, None]
    CT = jnp.swapaxes(Cm, 1, 2)  # [nb, M, B_pad]
    out_M = jnp.einsum(
        "nmb,nbd->nmd", CT / jnp.maximum(jnp.sum(CT, axis=2, keepdims=True), 1e-30), xB
    )

    if probe_tr is not None:
        out_B = out_B + probe_tr

    if branch_keep is not None:  # dropped branches: no output, no recovery
        out_M = out_M * branch_keep.astype(out_M.dtype)[:, None, None]
    info_backward = jnp.sum(out_M * gbar * warm_up_rate)
    # ones-column normalization (v1/models.py:209-210)
    out_B_n = out_B[:, :, :D] / (out_B[:, :, D:] + 1e-16)
    if branch_keep is not None:
        out_B_n = out_B_n * branch_keep.astype(out_B_n.dtype)[:, None, None]
    x_out_tr = jnp.transpose(out_B_n, (1, 0, 2)).reshape(B_pad, nb * D)
    return x_out_tr, info_backward


def layer_forward_bm(
    lp: Dict[str, Any],
    vq_state: VQState,
    ms: ModelStatic,
    x: jnp.ndarray,  # [B_pad, C_in]
    batch: PaddedBatch,
    probe: Optional[jnp.ndarray],
    warm_up_rate,
    training: bool,
    vq_tr: Optional[VQState] = None,
    probe_tr: Optional[jnp.ndarray] = None,
    branch_keep: Optional[jnp.ndarray] = None,  # [nb] bool, dropbranch mask
):
    """One v1 LowRankGNNLayer (``vq_gnn_v1/models.py:143-233, 307-367``).

    The sampler already lowered the mapper's (B+M)^2 matrix to per-edge lists
    (see ``bm_subgraph``); here the codebook features are scaled by
    warm_up_rate (v1/models.py:181), GAT runs one attention head per branch
    with its own parameters, and info_backward uses the per-codeword identity
    sum_m out_M[m]*g[m] == sum_j out_fo[j]*g[c[j]].
    """
    B_pad = batch.B_pad
    D = ms.num_D
    nb = x.shape[1] // D
    gat = ms.conv_type == "GAT"

    x_fo, grad_fo = lookup(vq_state, batch.fo_ids, ms.vq)
    fo_mask = batch.valid_fo.astype(x.dtype)[:, None]
    x_fo = x_fo * fo_mask * warm_up_rate
    grad_fo = jax.lax.stop_gradient(grad_fo * fo_mask)  # [fo, nb*Dg]
    if branch_keep is not None:
        # v1 drops the branch's whole block: no codebook features, no
        # recovery term, and (below) a zeroed hidden slice into gnn_transform
        x_fo = x_fo * jnp.repeat(branch_keep.astype(x_fo.dtype), D)[None, :]
        grad_fo = grad_fo * jnp.repeat(
            branch_keep.astype(grad_fo.dtype), ms.vq.grad_dim
        )[None, :]

    if not gat:
        # DEAD-COTANGENT CONTRACT (Edges.b_rows): rows >= B_pad of x_input
        # are the codebook-lookup features x_fo, whose only differentiable
        # consumers are the params/probes paths — gradients wrt the
        # embedding tables themselves are never taken in training (codebooks
        # update by EMA, grad_fo is stop_gradient'ed).  The spmm VJP
        # therefore truncates dx to rows < b_rows and returns zeros above
        # (ops/spmm.py).  Anything that differentiates through vq_state
        # embeddings via THIS spmm (e.g. jax.grad argnums over vq_state, as
        # tests/test_bm.py does for the GAT mh path) must build its Edges
        # with b_rows=0 or it gets silently-zero gradients.
        x_input = jnp.concatenate([x, x_fo], axis=0)
        x_out = spmm(batch.edges, x_input)
        if probe is not None:
            x_out = x_out.at[:B_pad].add(probe)
        if batch.bm_rev_row is not None:  # exact non-GCN recovery reverse
            x_cols = jnp.transpose(x.reshape(B_pad, nb, D), (1, 0, 2))
            info_backward = _bm_exact_reverse_info(
                vq_state, ms, batch, x_cols, warm_up_rate,
                branch_keep=branch_keep,
            )
        else:
            out_fo = x_out[B_pad:]
            info_backward = jnp.sum(out_fo * grad_fo * warm_up_rate)
        out_B = x_out[:B_pad]
        if branch_keep is not None:
            out_B = out_B * jnp.repeat(branch_keep.astype(out_B.dtype), D)[None, :]
    else:
        dim = B_pad + batch.Bp_pad
        e = batch.edges
        # Trick-1 codebook logits per branch over the full codebook
        # (v1 conv computes the max over its B+M input, convs.py:209)
        cb = jnp.concatenate(
            [
                vq_state.embedding_output[:, :, :D] * warm_up_rate,
                jnp.ones((nb, ms.vq.num_M, 1), x.dtype),
            ],
            axis=2,
        )
        al_cb = jnp.einsum("nmc,nc->nm", cb, lp["att_l"])
        ar_cb = jnp.einsum("nmc,nc->nm", cb, lp["att_r"])
        neg = jnp.float32(-jnp.inf)
        if e.ell_row is not None:
            # lane-grouped node logits: ONE block-diagonal MXU matmul on the
            # native [dim, nb*D] input (plus the per-branch ones bias)
            # replaces the per-branch [nb, dim, D+1] einsum, whose 5-lane
            # minor dim pads 5 -> 128 in every TPU tile it touches
            x_input = jnp.concatenate([x, x_fo], axis=0)  # [dim, nb*D]
            eye = jnp.eye(nb, dtype=x.dtype)
            W_l = (lp["att_l"][:, :D, None] * eye[:, None, :]).reshape(
                nb * D, nb
            )
            W_r = (lp["att_r"][:, :D, None] * eye[:, None, :]).reshape(
                nb * D, nb
            )
            al_n = x_input @ W_l + lp["att_l"][None, :, D]  # [dim, nb]
            ar_n = x_input @ W_r + lp["att_r"][None, :, D]
            vb_c = batch.valid_B[:, None]
            ml = jnp.maximum(
                jnp.max(jnp.where(vb_c, al_n[:B_pad], neg), axis=0),
                jnp.max(al_cb, axis=1),
            )
            mr = jnp.maximum(
                jnp.max(jnp.where(vb_c, ar_n[:B_pad], neg), axis=0),
                jnp.max(ar_cb, axis=1),
            )
            scale_n = (jnp.sqrt(ml**2 + 1.0) * jnp.sqrt(mr**2 + 1.0))[None, :]
            al_n, ar_n = al_n / scale_n, ar_n / scale_n
            cd = jnp.dtype(ms.compute_dtype)
            if x_input.dtype != cd:  # bf16 streaming halves the gather bytes
                x_input = x_input.astype(cd)
            # branch-folded lane layout: ONE 128-lane gather/segment-sum pass
            # per direction instead of nb vmapped 5-lane passes (ops/gat.py
            # gat_conv_ell_mh); the ones-normalizer comes back as its own
            # [dim, nb] channel instead of an aggregated ones column
            agg, rs = gat_conv_ell_mh(e, x_input, al_n, ar_n)
            if probe is not None:  # [nb, B_pad, D+1]
                p_agg = jnp.transpose(probe[:, :, :D], (1, 0, 2)).reshape(
                    B_pad, nb * D
                )
                agg = jnp.concatenate([agg[:B_pad] + p_agg, agg[B_pad:]], axis=0)
                rs = jnp.concatenate(
                    [rs[:B_pad] + probe[:, :, D].T, rs[B_pad:]], axis=0
                )
            if batch.bm_rev_row is not None:  # exact non-GCN recovery reverse
                xb = jnp.transpose(x.reshape(B_pad, nb, D), (1, 0, 2))
                x_br_B = jnp.concatenate(
                    [xb, jnp.ones((nb, B_pad, 1), x.dtype)], axis=2
                )
                info_backward = _bm_exact_reverse_info(
                    vq_state,
                    ms,
                    batch,
                    x_br_B,
                    warm_up_rate,
                    al=al_n[:B_pad].T,
                    ar_cb=ar_cb / scale_n.T,
                    branch_keep=branch_keep,
                )
            else:
                gfo_r = grad_fo.reshape(batch.Bp_pad, nb, D + 1)
                info_backward = (
                    jnp.sum(
                        agg[B_pad:].reshape(batch.Bp_pad, nb, D)
                        * gfo_r[:, :, :D]
                    )
                    + jnp.sum(rs[B_pad:] * gfo_r[:, :, D])
                ) * warm_up_rate
            # ones-column normalization of batch rows (v1/models.py:209-210)
            out_B = agg[:B_pad] / (jnp.repeat(rs[:B_pad], D, axis=1) + 1e-16)
            if branch_keep is not None:
                out_B = out_B * jnp.repeat(
                    branch_keep.astype(out_B.dtype), D
                )[None, :]
        else:
            # COO fallback: per-branch inputs with the appended ones column
            # [nb, dim, D+1] and the reference per-branch logit einsums
            xb = jnp.transpose(x.reshape(B_pad, nb, D), (1, 0, 2))
            xfo_b = jnp.transpose(x_fo.reshape(batch.Bp_pad, nb, D), (1, 0, 2))
            ones = jnp.ones((nb, dim, 1), x.dtype)
            x_br = jnp.concatenate(
                [jnp.concatenate([xb, xfo_b], axis=1), ones], axis=2
            )
            al = jnp.einsum("ndc,nc->nd", x_br, lp["att_l"])  # [nb, dim]
            ar = jnp.einsum("ndc,nc->nd", x_br, lp["att_r"])
            vb = batch.valid_B[None, :]
            ml = jnp.maximum(
                jnp.max(jnp.where(vb, al[:, :B_pad], neg), axis=1),
                jnp.max(al_cb, axis=1),
            )
            mr = jnp.maximum(
                jnp.max(jnp.where(vb, ar[:, :B_pad], neg), axis=1),
                jnp.max(ar_cb, axis=1),
            )
            scale = (jnp.sqrt(ml**2 + 1.0) * jnp.sqrt(mr**2 + 1.0))[:, None]
            al, ar = al / scale, ar / scale
            ev = jax.vmap(lambda a_l, a_r: gat_edge_values(e.row, e.col, e.val, a_l, a_r))(
                al, ar
            )
            x_out = jax.vmap(lambda v, xi: spmm(e.replace(val=v), xi))(ev, x_br)

            if probe is not None:  # [nb, B_pad, D+1]
                x_out = x_out.at[:, :B_pad].add(probe)

            if batch.bm_rev_row is not None:  # exact non-GCN recovery reverse
                info_backward = _bm_exact_reverse_info(
                    vq_state,
                    ms,
                    batch,
                    x_br[:, :B_pad],
                    warm_up_rate,
                    al=al[:, :B_pad],
                    ar_cb=ar_cb / scale,
                    branch_keep=branch_keep,
                )
            else:
                out_fo = x_out[:, B_pad:]  # [nb, fo, D+1]
                gfo = jnp.transpose(
                    grad_fo.reshape(batch.Bp_pad, nb, D + 1), (1, 0, 2)
                )
                info_backward = jnp.sum(out_fo * gfo * warm_up_rate)
            # ones-column normalization of batch rows (v1/models.py:209-210)
            outb = x_out[:, :B_pad]
            outb = outb[:, :, :D] / (outb[:, :, D:] + 1e-16)
            if branch_keep is not None:
                outb = outb * branch_keep.astype(outb.dtype)[:, None, None]
            out_B = jnp.transpose(outb, (1, 0, 2)).reshape(B_pad, nb * D)

    out = out_B @ lp["gnn_transform"]["w"] + lp["gnn_transform"]["b"]
    if ms.conv_type == "SAGE":
        out = out + x @ lp["fc_sage"]["w"] + lp["fc_sage"]["b"]
    if ms.transformer_flag:
        x_tr, info_tr = transformer_branch(
            lp, vq_tr, ms, x, batch, probe_tr, warm_up_rate,
            branch_keep=branch_keep,
        )
        out = (
            out
            + x_tr @ lp["transformer_v"]["w"]
            + lp["transformer_v"]["b"]
            + x @ lp["transformer_res"]["w"]
            + lp["transformer_res"]["b"]
        )
        info_backward = info_backward + info_tr
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
    vq_states_tr: Optional[List[VQState]] = None,
    probes_tr: Optional[List[jnp.ndarray]] = None,
    branch_masks: Optional[List[jnp.ndarray]] = None,  # dropbranch keep masks
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
        keep = branch_masks[l] if branch_masks is not None else None
        if ms.formulation == "bm":
            x, info_b = layer_forward_bm(
                params[l],
                vq_states[l],
                ms,
                x,
                batch,
                probe,
                warm_up_rate,
                training,
                vq_tr=None if vq_states_tr is None else vq_states_tr[l],
                probe_tr=probes_tr[l] if probes_tr else None,
                branch_keep=keep,
            )
        else:
            x, info_b = layer_forward(
                params[l], vq_states[l], ms, x, batch, probe, warm_up_rate,
                training, branch_keep=keep,
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


def probe_shapes(ms: ModelStatic, B_pad: int) -> List[Tuple[int, ...]]:
    """Conv-output shapes per layer (the +1 ones column for GAT; v1 GAT runs
    one conv per branch so its probe is [nb, B, D+1])."""
    if ms.formulation == "bm" and ms.conv_type == "GAT":
        return [
            (ms.num_branches[l], B_pad, ms.num_D + 1) for l in range(ms.num_layers)
        ]
    extra = 1 if ms.conv_type == "GAT" else 0
    return [(B_pad, ms.channels[l] + extra) for l in range(ms.num_layers)]


def zero_probes(ms: ModelStatic, B_pad: int) -> List[jnp.ndarray]:
    return [jnp.zeros(s, jnp.float32) for s in probe_shapes(ms, B_pad)]


def zero_probes_tr(ms: ModelStatic, B_pad: int) -> List[jnp.ndarray]:
    """Transformer-branch hook points: [nb, B_pad, D+1] per layer."""
    return [
        jnp.zeros((ms.num_branches[l], B_pad, ms.num_D + 1), jnp.float32)
        for l in range(ms.num_layers)
    ]


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
