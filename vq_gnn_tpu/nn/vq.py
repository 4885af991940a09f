"""Functional EMA vector-quantizer — the VQ core.

Re-implements the semantics of the reference ``VectorQuantizerEMA``
(``vq_gnn_v2/vq.py:60-279``; v1 identical plus ``add_flag`` handling) as pure
state transitions.  The torch version mutates registered buffers inside a
backward hook; here every transition takes and returns an explicit
:class:`VQState`, so the whole thing jits, vmaps over the branch axis, and
psums across replicas.

Per GNN layer there are ``num_branch`` independent codebooks (one per
``num_D``-wide feature slice).  All per-branch arrays carry a leading branch
axis and the transitions are ``vmap``-ed over it.

State layout (K = 2*D, +1 when ``add_flag``):

- ``embedding [nb, M, K]``        codebook in *normalized* space
- ``embedding_output [nb, M, K]`` de-normalized copy used for lookups (``get()``)
- ``ema_cluster_size [nb, M]``, ``ema_w [nb, M, K]``  EMA accumulators
- ``bn_feat_* [nb, D]``, ``bn_grad_* [nb, Dg]``       BatchNorm running stats
- ``c_indices [N+1, nb]`` int16   node -> codeword (last row is a dustbin for
  padded batch slots; int16 matches the reference, ``models.py v2:27-28``).
  Node-major: the per-step rewrite is then a contiguous row scatter at the
  batch indices instead of an [nb, B] column scatter (TPU scatters serialize
  per element; the column layout cost ~2ms/step at B=85k, nb=32)
- ``bn_inited``, ``bad_init``     scalars (the reference raises 'Bad Init!' on
  codebook collapse, ``vq.py:253-254``; we set a flag the trainer checks)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vq_gnn_tpu.ops.vq_ops import assignment_stats, masked_mean_var, nearest_codeword

BN_FEAT_EPS = 1e-5  # torch BatchNorm1d default (vq.py:86)
BN_FEAT_MOMENTUM = 0.1
LAPLACE_EPS = 1e-5  # vq.py:184-186, 249-251


@dataclasses.dataclass(frozen=True)
class VQParams:
    """Static VQ hyperparameters (constructor args of VectorQuantizerEMA)."""

    num_M: int
    num_D: int
    decay: float = 0.99
    epsilon: float = 1e-24
    grad_scale: Tuple[float, float] = (1.0, 1.0)
    warm_up_flag: bool = False  # Laplace smoothing of cluster sizes
    momentum: float = 0.1  # grad-BN running-stat momentum (vq.py:87-88)
    add_flag: bool = False  # quantize one extra (ones-column) grad dim
    # 'pallas' fuses distance->argmin->stats in VMEM (TPU); 'xla' fallback
    backend: str = "xla"

    @property
    def grad_dim(self) -> int:
        return self.num_D + (1 if self.add_flag else 0)

    @property
    def total_dim(self) -> int:
        return 2 * self.num_D + (1 if self.add_flag else 0)


class VQState(struct.PyTreeNode):
    embedding: jnp.ndarray
    embedding_output: jnp.ndarray
    ema_cluster_size: jnp.ndarray
    ema_w: jnp.ndarray
    bn_feat_mean: jnp.ndarray
    bn_feat_var: jnp.ndarray
    bn_grad_mean: jnp.ndarray
    bn_grad_var: jnp.ndarray
    c_indices: jnp.ndarray
    bn_inited: jnp.ndarray  # bool scalar
    bad_init: jnp.ndarray  # bool scalar


def init_vq_state(rng, num_branch: int, num_N: int, p: VQParams) -> VQState:
    """Mirror of the reference buffer init (``vq.py:73-99``, ``models.py v2:27``)."""
    k_emb, k_w, k_c = jax.random.split(rng, 3)
    M, D, K = p.num_M, p.num_D, p.total_dim

    emb = jax.random.normal(k_emb, (num_branch, M, K), dtype=jnp.float32)
    ema_w = (
        jax.random.normal(k_w, (num_branch, M, K), dtype=jnp.float32)
        if p.warm_up_flag
        else jnp.zeros((num_branch, M, K), dtype=jnp.float32)
    )
    gscale = jnp.ones((K,), dtype=jnp.float32)
    gscale = gscale.at[D : 2 * D].set(p.grad_scale[0])
    if p.add_flag:
        gscale = gscale.at[2 * D].set(p.grad_scale[1])
    emb = emb * gscale
    ema_w = ema_w * gscale

    c = jax.random.randint(k_c, (num_N + 1, num_branch), 0, M, dtype=jnp.int32)
    return VQState(
        embedding=emb,
        embedding_output=jnp.zeros((num_branch, M, K), dtype=jnp.float32),
        ema_cluster_size=jnp.zeros((num_branch, M), dtype=jnp.float32),
        ema_w=ema_w,
        bn_feat_mean=jnp.zeros((num_branch, D), dtype=jnp.float32),
        bn_feat_var=jnp.ones((num_branch, D), dtype=jnp.float32),
        bn_grad_mean=jnp.zeros((num_branch, p.grad_dim), dtype=jnp.float32),
        bn_grad_var=jnp.ones((num_branch, p.grad_dim), dtype=jnp.float32),
        c_indices=c.astype(jnp.int16),
        bn_inited=jnp.asarray(False),
        bad_init=jnp.asarray(False),
    )


def _bn_train(x, r_mean, r_var, eps, momentum, valid):
    """torch BatchNorm1d(affine=False) in train mode: normalize by (masked)
    biased batch stats, EMA running stats toward the unbiased batch var."""
    b_mean, b_var = masked_mean_var(x, valid, ddof=0)
    _, b_var_u = masked_mean_var(x, valid, ddof=1)
    xn = (x - b_mean[None, :]) * jax.lax.rsqrt(b_var[None, :] + eps)
    new_mean = (1.0 - momentum) * r_mean + momentum * b_mean
    new_var = (1.0 - momentum) * r_var + momentum * b_var_u
    return xn, new_mean, new_var


def _assign_and_stats(xn, emb, valid, p: VQParams):
    """(idx [nb, B], counts [nb, M], sums [nb, M, k]) over the branch axis.

    The one-hot GEMM lowering round-trips [B, M] one-hot + distance tiles
    through HBM; the Pallas backend keeps both in VMEM (ops/pallas_vq.py).
    """
    if valid is None:
        valid = jnp.ones(xn.shape[1], dtype=bool)
    if p.backend in ("pallas", "pallas_fast"):
        from vq_gnn_tpu.ops.pallas_vq import fused_assign_branches

        # interpret mode keeps the kernel testable on CPU
        return fused_assign_branches(
            xn, emb, valid,
            interpret=jax.default_backend() == "cpu",
            fast=p.backend == "pallas_fast",
        )
    if p.backend == "scan":
        from vq_gnn_tpu.ops.vq_ops import assign_stats_scan

        return jax.vmap(lambda x, e: assign_stats_scan(x, e, valid))(xn, emb)

    fast = p.backend == "xla_fast"  # bf16 distance streaming

    def one(x, e):
        idx = nearest_codeword(x, e, fast=fast)
        counts, sums = assignment_stats(x, idx, p.num_M, valid, fast=fast)
        return idx, counts, sums

    return jax.vmap(one)(xn, emb)


def _ema_counts(size, counts, p: VQParams):
    """EMA cluster-size update + optional Laplace smoothing (vq.py:242-251)."""
    size = size * p.decay + (1.0 - p.decay) * counts
    if p.warm_up_flag:
        n = jnp.sum(size)
        size = (size + LAPLACE_EPS) / (n + p.num_M * LAPLACE_EPS) * n
    return size


def feature_update(
    state: VQState,
    X_B: jnp.ndarray,  # [nb, B, D] per-branch input slices
    batch_idx: jnp.ndarray,  # [B] global node ids (padding slots -> N dustbin)
    p: VQParams,
    valid: Optional[jnp.ndarray] = None,  # [B] bool
    training: bool = True,
) -> Tuple[VQState, jnp.ndarray]:
    """Feature-half codebook update (``vq.py:160-202``): BN-normalize the
    input slice, assign to the nearest feature-half codeword, EMA the feature
    half only, and refresh the de-normalized feature half of the output table.
    Used by the layerwise init bootstrap and by uninited/unlabeled blocks."""
    D = p.num_D

    xn, new_mean, new_var = jax.vmap(
        lambda x, m, v: _bn_train(x, m, v, BN_FEAT_EPS, BN_FEAT_MOMENTUM, valid)
    )(X_B, state.bn_feat_mean, state.bn_feat_var)
    idx, counts, sums = _assign_and_stats(xn, state.embedding[:, :, :D], valid, p)

    if not training:
        return state, idx

    def one_branch(emb, emb_out, size, ema_w, counts_b, sums_b, nm, nv):
        new_size = _ema_counts(size, counts_b, p)
        bad = jnp.any(new_size == 0)
        new_ema_feat = ema_w[:, :D] * p.decay + (1.0 - p.decay) * sums_b
        new_emb_feat = new_ema_feat / new_size[:, None]
        run_std = jnp.sqrt(nv + BN_FEAT_EPS)
        new_out_feat = new_emb_feat * run_std[None, :] + nm[None, :]
        emb = emb.at[:, :D].set(new_emb_feat)
        ema_w = ema_w.at[:, :D].set(new_ema_feat)
        emb_out = emb_out.at[:, :D].set(new_out_feat)
        return emb, emb_out, new_size, ema_w, bad

    emb, emb_out, size, ema_w, bad = jax.vmap(one_branch)(
        state.embedding,
        state.embedding_output,
        state.ema_cluster_size,
        state.ema_w,
        counts,
        sums,
        new_mean,
        new_var,
    )
    r_mean, r_var = new_mean, new_var
    # node-major row scatter: [B, nb] rows land contiguously at batch_idx
    c_indices = state.c_indices.at[batch_idx, :].set(
        idx.T.astype(jnp.int16), mode="drop"
    )
    return (
        state.replace(
            embedding=emb,
            embedding_output=emb_out,
            ema_cluster_size=size,
            ema_w=ema_w,
            bn_feat_mean=r_mean,
            bn_feat_var=r_var,
            c_indices=c_indices,
            bad_init=state.bad_init | jnp.any(bad),
        ),
        idx,
    )


def vq_update(
    state: VQState,
    X_B: jnp.ndarray,  # [nb, B, D] layer-input slices (detached)
    grad: jnp.ndarray,  # [nb, B, Dg] grads of the layer-output slices
    batch_idx: jnp.ndarray,  # [B]
    p: VQParams,
    valid: Optional[jnp.ndarray] = None,
    branch_keep: Optional[jnp.ndarray] = None,  # [nb] bool, dropbranch mask
    cidx_merge_fn=None,  # DDP override for the table scatter (see below)
) -> Tuple[VQState, jnp.ndarray]:
    """Joint feature+gradient codebook update (``vq.py:204-279``) — the body
    of the reference's backward hook.  BN-normalize [X_B || grad] (lazily
    seeding the running stats on first call, vq.py:216-221), scale the grad
    half, nearest-codeword assign, EMA k-means, then store a de-normalized
    copy for lookups.

    ``branch_keep`` implements dropbranch: a dropped branch's hook never
    fires in the reference design, so its entire per-branch state (codebook,
    EMA accumulators, BN running stats, c_indices row) is left untouched.
    (The shared ``bn_inited`` scalar still flips on the first update — a
    documented deviation; the reference's per-instance flag is unobservable
    anyway because its dropbranch path doesn't run.)"""
    D, Dg = p.num_D, p.grad_dim
    gs0, gs1 = p.grad_scale

    # Lazy BN seeding from this batch's (unbiased) stats, shared decision
    # across branches via the scalar bn_inited flag.
    def seed(x, r_mean, r_var):
        b_mean, b_var_u = masked_mean_var(x, valid, ddof=1)
        m = jnp.where(state.bn_inited, r_mean, b_mean)
        v = jnp.where(state.bn_inited, r_var, b_var_u)
        return m, v

    def normalize(x, g, f_mean, f_var, g_mean, g_var):
        f_mean, f_var = seed(x, f_mean, f_var)
        g_mean, g_var = seed(g, g_mean, g_var)
        xn_f, f_mean, f_var = _bn_train(
            x, f_mean, f_var, BN_FEAT_EPS, BN_FEAT_MOMENTUM, valid
        )
        xn_g, g_mean, g_var = _bn_train(g, g_mean, g_var, p.epsilon, p.momentum, valid)
        xn = jnp.concatenate([xn_f, xn_g], axis=1)
        scale = jnp.ones((p.total_dim,), jnp.float32).at[D : 2 * D].set(gs0)
        if p.add_flag:
            scale = scale.at[2 * D].set(gs1)
        return xn * scale[None, :], f_mean, f_var, g_mean, g_var

    xn, f_mean_n, f_var_n, g_mean_n, g_var_n = jax.vmap(normalize)(
        X_B,
        grad,
        state.bn_feat_mean,
        state.bn_feat_var,
        state.bn_grad_mean,
        state.bn_grad_var,
    )
    idx, counts, sums = _assign_and_stats(xn, state.embedding, valid, p)

    def one_branch(emb, emb_out, size, ema_w, counts_b, sums_b, f_mean, f_var, g_mean, g_var):
        new_size = _ema_counts(size, counts_b, p)
        bad = jnp.any(new_size == 0)
        new_ema_w = ema_w * p.decay + (1.0 - p.decay) * sums_b
        new_emb = new_ema_w / new_size[:, None]

        # De-normalize for the lookup table (vq.py:261-272): undo grad_scale
        # on the grad half only, then undo BN with the *running* stats
        # (post-update).
        div = jnp.ones((p.total_dim,), jnp.float32).at[D : 2 * D].set(gs0 + p.epsilon)
        if p.add_flag:
            div = div.at[2 * D].set(gs1 + p.epsilon)
        out = new_emb / div[None, :]
        run_var = jnp.concatenate([f_var + BN_FEAT_EPS, g_var + p.epsilon])
        run_mean = jnp.concatenate([f_mean, g_mean])
        out = out * jnp.sqrt(run_var)[None, :] + run_mean[None, :]
        if gs0 == 0:  # static python float check (vq.py:274-275)
            out = out.at[:, D:].set(0.0)
        return new_emb, out, new_size, new_ema_w, bad

    emb, emb_out, size, ema_w, bad = jax.vmap(one_branch)(
        state.embedding,
        state.embedding_output,
        state.ema_cluster_size,
        state.ema_w,
        counts,
        sums,
        f_mean_n,
        f_var_n,
        g_mean_n,
        g_var_n,
    )
    idx_w = idx.astype(jnp.int16)
    if branch_keep is not None:
        def sel(new, old):
            bk = branch_keep.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(bk, new, old)

        emb = sel(emb, state.embedding)
        emb_out = sel(emb_out, state.embedding_output)
        size = sel(size, state.ema_cluster_size)
        ema_w = sel(ema_w, state.ema_w)
        f_mean_n = sel(f_mean_n, state.bn_feat_mean)
        f_var_n = sel(f_var_n, state.bn_feat_var)
        g_mean_n = sel(g_mean_n, state.bn_grad_mean)
        g_var_n = sel(g_var_n, state.bn_grad_var)
        bad = bad & branch_keep
        idx_w = jnp.where(
            branch_keep[:, None],
            idx_w,
            jnp.take(state.c_indices, batch_idx, axis=0, mode="clip").T,
        )
    if cidx_merge_fn is not None:
        # DDP payload minimization: the replicated c_indices table makes
        # the auto-SPMD partitioner all-gather the scatter operands — s16
        # assignments AND s32 row indices, per layer (the audit-surfaced
        # 17.3 MB/step at arxiv scale).  The override routes the update
        # through an explicit shard_map merge whose collective payload is
        # pinned to the minimal dtype (u8 when M <= 256) — sharding
        # constraints alone don't work: the partitioner hoists the gather
        # above the pack even across an optimization_barrier.
        c_indices = cidx_merge_fn(state.c_indices, batch_idx, idx_w.T)
    else:
        c_indices = state.c_indices.at[batch_idx, :].set(
            idx_w.T, mode="drop"
        )
    return (
        state.replace(
            embedding=emb,
            embedding_output=emb_out,
            ema_cluster_size=size,
            ema_w=ema_w,
            bn_feat_mean=f_mean_n,
            bn_feat_var=f_var_n,
            bn_grad_mean=g_mean_n,
            bn_grad_var=g_var_n,
            c_indices=c_indices,
            bn_inited=jnp.asarray(True),
            bad_init=state.bad_init | jnp.any(bad),
        ),
        idx,
    )


def feature_kmeans_init(
    state: VQState, X_B: "np.ndarray", batch_idx, p: VQParams
) -> VQState:
    """Optional MiniBatchKMeans seeding of the feature half (reference
    ``--kmeans-init``, v1/models.py:147-159 + vq.py:102-105): k-means++ on
    batch-normalized features, then centroids/counts/labels seed the EMA
    state.  Host-side (sklearn), called once before the init sweep."""
    import numpy as np
    from sklearn.cluster import MiniBatchKMeans

    X = np.asarray(X_B)  # [nb, B, D]
    nb = X.shape[0]
    emb = np.asarray(state.embedding).copy()
    ema_w = np.asarray(state.ema_w).copy()
    size = np.asarray(state.ema_cluster_size).copy()
    c_idx = np.asarray(state.c_indices).copy()
    for b in range(nb):
        xb = X[b]
        xn = (xb - xb.mean(0)) / np.sqrt(xb.var(0) + 1e-5)
        km = MiniBatchKMeans(
            n_clusters=p.num_M,
            init="k-means++",
            batch_size=400,
            n_init=10,
            init_size=4000,
            reassignment_ratio=0.3,
        ).fit(xn)
        cent = km.cluster_centers_.astype(np.float32)
        counts = np.bincount(km.labels_, minlength=p.num_M).astype(np.float32)
        emb[b, :, : p.num_D] = cent
        size[b] = counts
        ema_w[b, :, : p.num_D] = cent * counts[:, None]
        c_idx[np.asarray(batch_idx), b] = km.labels_.astype(np.int16)
    return state.replace(
        embedding=jnp.asarray(emb),
        ema_w=jnp.asarray(ema_w),
        ema_cluster_size=jnp.asarray(size),
        c_indices=jnp.asarray(c_idx),
    )


def ste_vector_quantizer(
    inputs: jnp.ndarray,
    embedding: jnp.ndarray,
    commitment_cost: float = 0.5,
    holistic_cost: float = 0.1,
):
    """The legacy straight-through-estimator VQ (reference VectorQuantizer,
    ``vq.py:10-57`` — constructed but unused there).  Returns
    (loss, quantized, encodings, indices)."""
    idx = nearest_codeword(inputs, embedding)
    quantized = jnp.take(embedding, idx, axis=0)
    e_latent = jnp.mean((jax.lax.stop_gradient(quantized) - inputs) ** 2)
    q_latent = jnp.mean((quantized - jax.lax.stop_gradient(inputs)) ** 2)
    loss = holistic_cost * (q_latent + commitment_cost * e_latent)
    st = inputs + jax.lax.stop_gradient(quantized - inputs)
    onehot = jax.nn.one_hot(idx, embedding.shape[0], dtype=inputs.dtype)
    return loss, st, onehot, idx


def lookup(state: VQState, node_ids: jnp.ndarray, p: VQParams, stream=None):
    """Codebook lookup for out-of-batch nodes (``models.py v2:168-173``).

    node_ids [n] -> (features [n, nb*D], grads [n, nb*Dg]) assembled in
    branch-slice order (branch i covers columns i*D:(i+1)*D).

    ``stream`` (a dtype) streams the one-hot operand at that dtype: under a
    bfloat16 compute path the [nb, n, M] one-hot halves its MXU-stream
    traffic; 0/1 entries are exact, so the only rounding is of the selected
    codeword values — the same bf16 rounding the rest of the bf16 path
    applies.  f32/parity paths leave it None.
    """
    # node-major row gather ([n, nb] int16 rows stream contiguously), then a
    # small relayout to the branch-major [nb, n] the kernels consume
    c = jnp.take(state.c_indices, node_ids, axis=0, mode="clip").astype(
        jnp.int32
    ).T  # [nb, n]
    # one-hot MXU GEMM instead of a per-branch [n, 2D]-row gather: rows of
    # width 2D (= 32B at D=4) gather ~3x slower than the equivalent
    # iota-compare einsum on TPU.  Precision inherits the ambient
    # jax_default_matmul_precision (framework convention): parity configs
    # run 'highest' (bit-exact row selection), the bench runs 'default'
    # where the only effect is bf16 rounding of the selected codewords —
    # the same rounding every other default-precision MXU op applies
    # (measured 6.3 -> ~1.5 ms/step at B'=65k, nb=32).
    M = state.embedding_output.shape[1]
    if p.backend in ("pallas", "pallas_fast"):
        from vq_gnn_tpu.ops.pallas_vq import lookup_branches

        # the one-hot never leaves VMEM (vs ~2GB/layer HBM for the XLA
        # lowering at n=65k); exact mode is bit-identical to a row gather.
        # NOTE: bf16 compute (stream is not None) forces fast=True even on
        # the exact 'pallas' backend — mirrors the xla bf16 stream, but the
        # bit-identical-gather guarantee only holds under f32 compute.
        table = lookup_branches(
            c, state.embedding_output,
            interpret=jax.default_backend() == "cpu",
            fast=p.backend == "pallas_fast" or stream is not None,
        )  # [n, nb, K]
    else:
        sdt = jnp.float32 if stream is None else jnp.dtype(stream)
        onehot = (
            c[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
        ).astype(sdt)
        table = jnp.einsum(
            "bim,bmk->ibk", onehot, state.embedding_output.astype(sdt),
            preferred_element_type=jnp.float32,
        )  # [n, nb, K]
    n, nb, _ = table.shape
    feats = table[:, :, : p.num_D].reshape(n, nb * p.num_D)
    grads = table[:, :, p.num_D :].reshape(n, nb * p.grad_dim)
    return feats, grads
