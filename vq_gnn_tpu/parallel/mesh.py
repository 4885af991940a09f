"""Device-mesh sharding for multi-chip training (SPMD/GSPMD).

Scaling recipe (SURVEY §2.3): the reference has no distributed path at all;
here the *edge dimension* and the *batch-row dimension* are the scaling axes.

- 1-D mesh ``('data',)``: batch rows, boundary rows and edges are sharded
  over it; XLA turns the segment-sum aggregate into local partial aggregates
  + an all-reduce over the mesh, and psums parameter gradients and the VQ
  EMA statistics (counts/sums enter as batch-row reductions, so replicated
  codebook state stays bit-identical by construction — there is one logical
  program, not N replicas).
- Parameters, codebooks, BN stats and the feature table are replicated.

Because every transition in this framework is pure, multi-chip is *only*
input shardings + jit: no collective is written by hand in the model path.
Pallas ring/RDMA kernels enter later for the boundary exchange overlap.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices <= 0:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devs)} "
            f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU)"
        )
    mesh_devs = np.asarray(devs[:n_devices])
    return Mesh(mesh_devs, axis_names=("data",))


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """2-D mesh: 'data' shards batch rows/edges, 'model' shards the branch
    axis (the embarrassingly-parallel feature-split codebooks, SURVEY §5.7:
    the branch axis is this workload's tensor-parallel dimension)."""
    devs = jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise RuntimeError(f"need {need} devices, have {len(devs)}")
    mesh_devs = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(mesh_devs, axis_names=("data", "model"))


def _put(x, sharding):
    return None if x is None else jax.device_put(x, sharding)


def _shard_vq_state_model(mesh: Mesh, vq_state):
    """Shard a VQState's leading branch axis over 'model'; scalars replicate.
    c_indices is node-major [N+1, nb], so its branch axis is axis 1."""
    from jax.sharding import NamedSharding as NS

    def place(a):
        if a is None:
            return None
        if getattr(a, "ndim", 0) >= 1:
            return jax.device_put(a, NS(mesh, P(*(("model",) + (None,) * (a.ndim - 1)))))
        return jax.device_put(a, NS(mesh, P()))

    # c_indices must not pass through place() — its leading axis is N+1
    out = jax.tree.map(place, vq_state.replace(c_indices=None))
    return out.replace(
        c_indices=jax.device_put(
            vq_state.c_indices, NS(mesh, P(None, "model"))
        )
    )


def shard_train_inputs_2d(mesh: Mesh, state, X_dev, batch):
    """data x model placement: rows/edges over 'data'; the VQ branch axis and
    the branch-split fan-in of the layer linears over 'model'; everything
    else replicated.  XLA inserts the psums (grad all-reduce over 'data',
    fan-in partial-sum all-reduce over 'model')."""
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))

    def place_params(layer):
        out = {}
        for k, v in layer.items():
            if k in ("gnn_transform", "linear_skip", "fc_sage", "transformer_v", "transformer_res"):
                out[k] = {
                    "w": jax.device_put(v["w"], NamedSharding(mesh, P("model", None))),
                    "b": jax.device_put(v["b"], repl),
                }
            elif k in ("att_l", "att_r") and v.ndim == 2:  # bm per-branch [nb, D+1]
                out[k] = jax.device_put(v, NamedSharding(mesh, P("model", None)))
            else:
                out[k] = jax.tree.map(lambda a: _put(a, repl), v)
        return out

    state_s = state.replace(
        params=[place_params(l) for l in state.params],
        vq_states=[_shard_vq_state_model(mesh, s) for s in state.vq_states],
        vq_states_tr=None
        if state.vq_states_tr is None
        else [_shard_vq_state_model(mesh, s) for s in state.vq_states_tr],
        bn_state=jax.tree.map(lambda a: _put(a, repl), state.bn_state),
        opt_nu=[place_params(l) for l in state.opt_nu],
        step=_put(state.step, repl),
    )
    X_s = _put(X_dev, repl)
    _, _, batch_s = shard_train_inputs(mesh, state.step, X_dev, batch)
    return state_s, X_s, batch_s


def shard_train_inputs(mesh: Mesh, state, X_dev, batch):
    """Place train-step inputs: rows/edges sharded, state replicated."""
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("data"))

    state_s = jax.tree.map(lambda a: _put(a, repl), state)
    X_s = _put(X_dev, repl)

    edges = batch.edges
    edges_s = edges.replace(
        row=_put(edges.row, rows),
        col=_put(edges.col, rows),
        val=_put(edges.val, rows),
        tperm=_put(edges.tperm, rows),
        ell_row=_put(edges.ell_row, rows),
        ell_col=_put(edges.ell_col, rows),
        ell_val=_put(edges.ell_val, rows),
        t_ell_row=_put(edges.t_ell_row, rows),
        t_ell_col=_put(edges.t_ell_col, rows),
        t_ell_val=_put(edges.t_ell_val, rows),
        head_rowc=_put(edges.head_rowc, rows),
        head_col=_put(edges.head_col, rows),
        head_val=_put(edges.head_val, rows),
        head_inv=_put(edges.head_inv, rows),
        head_rowg=_put(edges.head_rowg, rows),
        tail_row=_put(edges.tail_row, rows),
        tail_col=_put(edges.tail_col, rows),
        tail_val=_put(edges.tail_val, rows),
        t_head_rowc=_put(edges.t_head_rowc, rows),
        t_head_col=_put(edges.t_head_col, rows),
        t_head_val=_put(edges.t_head_val, rows),
        t_head_inv=_put(edges.t_head_inv, rows),
        t_head_rowg=_put(edges.t_head_rowg, rows),
        t_tail_row=_put(edges.t_tail_row, rows),
        t_tail_col=_put(edges.t_tail_col, rows),
        t_tail_val=_put(edges.t_tail_val, rows),
    )
    batch_s = batch.replace(
        batch_idx=_put(batch.batch_idx, rows),
        fo_ids=_put(batch.fo_ids, rows),
        valid_B=_put(batch.valid_B, rows),
        valid_fo=_put(batch.valid_fo, rows),
        edges=edges_s,
        num_B=_put(batch.num_B, repl),
        y=_put(batch.y, rows),
        train_mask=_put(batch.train_mask, rows),
        deg_inv_B=_put(batch.deg_inv_B, rows),
        link_src=_put(batch.link_src, rows),
        link_dst=_put(batch.link_dst, rows),
        link_mask=_put(batch.link_mask, rows),
        bm_rev_row=_put(batch.bm_rev_row, rows),
        bm_rev_col=_put(batch.bm_rev_col, rows),
        bm_rev_val=_put(batch.bm_rev_val, rows),
    )
    return state_s, X_s, batch_s
