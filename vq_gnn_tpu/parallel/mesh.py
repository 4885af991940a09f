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


def _put(x, sharding):
    return None if x is None else jax.device_put(x, sharding)


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
