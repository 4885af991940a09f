"""Multi-host training (pod slices / DCN).

The reference has zero distributed machinery (SURVEY §2.3); this module is
the TPU-native design for scaling past one host:

1. ``init_distributed`` — ``jax.distributed.initialize`` (ICI within a host's
   slice, DCN across hosts).
2. ``partition_hosts`` — the graph is node-partitioned per host with the same
   locality partitioner the cluster sampler uses, so most edges are
   host-local and the *codebook replaces cross-host neighbor traffic*: a
   batch's out-of-partition neighbors read replicated codewords instead of
   fetching remote features — the VQ-GNN thesis applied to the DCN boundary.
3. ``global_batch_from_local`` — every host builds a batch from its own node
   partition (identical fixed pad sizes, Config.fixed_*); the per-host arrays
   are assembled into global jax.Arrays sharded over the 'data' axis with
   ``jax.make_array_from_process_local_data``.  The jitted train step is
   unchanged — XLA inserts the psums for gradients and VQ EMA statistics, so
   replicated codebooks stay identical on every host by construction.

Single-process this degenerates to the local mesh (tested); on a real pod
run ``init_distributed`` first and give every process its own
``BatchLoader(node_range=...)``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_hosts(adj, num_hosts: int):
    """Locality-preserving node partition per host; returns (perm, ptr) like
    the cluster partitioner — permute the graph with it, then host h owns
    nodes [ptr[h], ptr[h+1])."""
    from vq_gnn_tpu.graph.partition import partition_graph

    return partition_graph(adj, num_hosts)


def make_ddp_step(ms, cfg, mesh: Mesh = None):
    """Data-parallel train step over a stacked batch [n_shards, ...].

    Each shard's forward runs block-diagonally (vmap); the loss is the
    global masked CE (sum of per-shard sums / sum of counts) plus the summed
    info_backward terms, so gradients are the true global-batch gradients.
    The VQ codebook transition is applied ONCE on the concatenation of all
    shards' (X_B, probe-grad) pairs — the EMA sees globally summed
    assignment counts/sums before the divide, which is exactly the
    psum-before-divide requirement that keeps replicated codebooks
    bit-identical (SURVEY §7.3 hard part 4).  Inter-layer BN runs per shard
    on its own batch statistics; running stats are averaged across shards
    (sync-BN flavor; the reference has no multi-replica notion at all).
    """
    import functools

    import jax.numpy as jnp

    from vq_gnn_tpu.nn.model import model_forward, zero_probes
    from vq_gnn_tpu.nn.vq import vq_update
    from vq_gnn_tpu.train.optim import rmsprop_update
    from vq_gnn_tpu.train.state import TrainState
    from vq_gnn_tpu.train.step import _branch_view

    live = cfg.vq_update_mode == "live"
    D = ms.num_D

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ddp_step(state, X_dev, sbatch, warm_up_rate, lr, do_opt_step, rng):
        n = sbatch.batch_idx.shape[0]
        B_pad = sbatch.batch_idx.shape[1]
        probes = [
            jnp.zeros((n,) + tuple(p.shape), jnp.float32)
            for p in zero_probes(ms, B_pad)
        ]
        keys = jax.random.split(rng, n)

        # dropbranch: one shared mask set per step — every shard drops the
        # same branches so the single global VQ transition below matches
        branch_masks = None
        if ms.dropbranch > 0:
            kd = jax.random.fold_in(rng, 7)
            branch_masks = []
            for nb in ms.num_branches:
                kd, sub = jax.random.split(kd)
                kept = int(nb * (1.0 - ms.dropbranch))
                perm = jax.random.permutation(sub, nb)
                branch_masks.append(jnp.zeros((nb,), bool).at[perm[:kept]].set(True))

        def loss_fn(params, probes):
            def one_shard(batch, probe_rows, key):
                x_B = jnp.take(X_dev, batch.batch_idx, axis=0)
                out, info_b, layer_inputs, new_bn = model_forward(
                    params,
                    state.vq_states,
                    state.bn_state,
                    ms,
                    x_B,
                    batch,
                    probes=list(probe_rows),
                    warm_up_rate=warm_up_rate,
                    training=True,
                    rng=key,
                    branch_masks=branch_masks,
                )
                mask = batch.train_mask & batch.valid_B
                logz = jax.nn.log_softmax(out)
                ll = jnp.take_along_axis(
                    logz, batch.y[:, None].astype(jnp.int32), axis=1
                )[:, 0]
                m = mask.astype(out.dtype)
                return (
                    -jnp.sum(ll * m),
                    jnp.sum(m),
                    info_b,
                    layer_inputs,
                    new_bn,
                )

            ce_sums, counts, infos, layer_inputs, new_bns = jax.vmap(
                one_shard, in_axes=(0, 0, 0)
            )(sbatch, probes, keys)
            loss = jnp.sum(ce_sums) / jnp.maximum(jnp.sum(counts), 1.0) + jnp.sum(
                infos
            )
            return loss, (layer_inputs, new_bns)

        (loss, (layer_inputs, new_bns)), (g_params, g_probes) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, probes)

        new_params, new_nu = rmsprop_update(
            state.params, g_params, state.opt_nu, lr, do_opt_step
        )
        # sync-BN: average per-shard running stats
        new_bn = jax.tree.map(lambda a: jnp.mean(a, axis=0), new_bns)

        new_vq = list(state.vq_states)
        if live:
            flat_idx = sbatch.batch_idx.reshape(-1)
            flat_valid = sbatch.valid_B.reshape(-1)
            merge_fn = None
            if mesh is not None:
                # minimal-payload c_indices merge: ONE explicit u8 (M<=256)
                # all-gather of the packed assignments + one s32 gather of
                # the (layer-shared) row indices, instead of the per-layer
                # s16+s32 gathers auto-SPMD inserts around the replicated-
                # table scatter.  shard_map pins the collective dtype; the
                # replicated row gather is hoisted out of the layer loop by
                # CSE (same operand every layer).
                small = ms.vq.num_M <= 256

                def _merge_body(tbl, rows, upd):
                    rg = jax.lax.all_gather(rows, "data", tiled=True)
                    ug = jax.lax.all_gather(upd, "data", tiled=True)
                    return tbl.at[rg].set(
                        ug.astype(jnp.int16), mode="drop"
                    )

                _merge = jax.shard_map(
                    _merge_body,
                    mesh=mesh,
                    in_specs=(P(), P("data"), P("data", None)),
                    out_specs=P(),
                    check_vma=False,
                )

                def merge_fn(tbl, rows, upd):
                    upd = upd.astype(jnp.uint8) if small else upd
                    return _merge(tbl, rows.astype(jnp.int32), upd)

            for l in range(ms.num_layers):
                nb = ms.num_branches[l]
                xi = layer_inputs[l]  # [n, B_pad, C]
                Xb = jax.vmap(lambda a: _branch_view(a, nb, D))(
                    jax.lax.stop_gradient(xi)
                )  # [n, nb, B_pad, D]
                Xb = jnp.transpose(Xb, (1, 0, 2, 3)).reshape(nb, -1, D)
                gp = g_probes[l][:, :, : nb * D]  # [n, B_pad, nb*D]
                Gb = jax.vmap(lambda a: _branch_view(a, nb, D))(gp)
                Gb = jnp.transpose(Gb, (1, 0, 2, 3)).reshape(nb, -1, D)
                new_vq[l], _ = vq_update(
                    new_vq[l], Xb, Gb, flat_idx, ms.vq, valid=flat_valid,
                    branch_keep=None if branch_masks is None else branch_masks[l],
                    cidx_merge_fn=merge_fn,
                )

        metrics = {
            "loss": loss,
            "bad_init": jnp.any(jnp.stack([s.bad_init for s in new_vq])),
        }
        return (
            TrainState(
                params=new_params,
                vq_states=new_vq,
                bn_state=new_bn,
                opt_nu=new_nu,
                step=state.step + 1,
                vq_states_tr=state.vq_states_tr,
            ),
            metrics,
        )

    return ddp_step


def stack_local_batches(batches):
    """Stack per-host PaddedBatches on a leading shard axis (numpy).

    Host batches are *disjoint subgraphs* (each host samples from its own
    node partition), so the global computation is block-diagonal: no index
    shifting, each shard keeps its local numbering and row-sorted edges.
    All batches must share static shapes (Config.fixed_* pads).
    """

    def stack(*leaves):
        return np.stack([np.asarray(x) for x in leaves])

    return jax.tree.map(stack, *batches)


def shard_stacked_batch(mesh: Mesh, stacked):
    """Place a stacked batch with the shard axis over 'data'."""
    rows = NamedSharding(mesh, P("data"))

    def place(a):
        return None if a is None else jax.device_put(a, rows)

    return jax.tree.map(place, stacked)


def global_batch_from_local(mesh: Mesh, local_batch):
    """Multi-process assembly: each process contributes its local batch as
    one shard row of the stacked global batch."""
    rows = NamedSharding(mesh, P("data"))

    def place(a):
        if a is None:
            return None
        a = np.asarray(a)[None]
        global_shape = (jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(rows, a, global_shape)

    return jax.tree.map(place, local_batch)
