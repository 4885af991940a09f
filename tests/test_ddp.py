"""Multi-host (DDP) step tests: stacked disjoint-shard batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.nn.model import model_static
from vq_gnn_tpu.parallel.mesh import make_mesh
from vq_gnn_tpu.parallel.multihost import (
    make_ddp_step,
    partition_hosts,
    shard_stacked_batch,
    stack_local_batches,
)
from vq_gnn_tpu.graph.partition import permute_graph
from vq_gnn_tpu.sampler.samplers import BatchLoader
from vq_gnn_tpu.train.loop import device_features
from vq_gnn_tpu.train.state import init_train_state


def build_two_shard_setup():
    cfg = Config(
        dataset="synthetic",
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=100,
        skip=True,
        fixed_B_pad=128,
        fixed_Bp_pad=256,
        fixed_E_pad=4096,
        vq_update_mode="live",
    )
    g, c = synthetic_sbm(num_nodes=400, num_features=16, seed=9)
    g, c, _ = prepare(g, cfg, c)
    perm, ptr = partition_hosts(g.adj, 2)
    g = permute_graph(g, perm)
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    X_dev = device_features(g.x)

    # per-"host" loaders over disjoint node partitions
    batches = []
    for h in range(2):
        nodes = np.arange(ptr[h], ptr[h + 1])
        loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=h)
        loader.prefetch = False
        b = loader._build(nodes[:100])
        batches.append(b)
    return cfg, g, ms, state, X_dev, batches


def test_ddp_step_runs_and_updates_both_shards():
    cfg, g, ms, state, X_dev, batches = build_two_shard_setup()
    stacked = stack_local_batches(batches)
    step = make_ddp_step(ms, cfg)
    c0 = [np.asarray(s.c_indices).copy() for s in state.vq_states]
    state2, m = step(
        state,
        X_dev,
        jax.tree.map(jnp.asarray, stacked),
        jnp.float32(1.0),
        jnp.float32(0.01),
        jnp.float32(1.0),
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(m["loss"]))
    assert not bool(m["bad_init"])
    # both shards' nodes got fresh assignments
    for l, s in enumerate(state2.vq_states):
        c1 = np.asarray(s.c_indices)
        assert c1.shape == c0[l].shape
        for h, b in enumerate(batches):
            ids = np.asarray(b.batch_idx)[: int(b.num_B)]
            # at least some assignments for each shard's nodes changed
            assert (c1[ids, :] != c0[l][ids, :]).any(), (
                f"layer {l}: shard {h} nodes kept their initial assignments"
            )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_ddp_step_sharded_matches_unsharded():
    cfg, g, ms, state, X_dev, batches = build_two_shard_setup()
    state_b = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    stacked = jax.tree.map(jnp.asarray, stack_local_batches(batches))
    step = make_ddp_step(ms, cfg)
    args = (jnp.float32(1.0), jnp.float32(0.01), jnp.float32(1.0), jax.random.PRNGKey(2))

    s1, m1 = step(state, X_dev, stacked, *args)

    mesh = make_mesh(2)
    stacked_s = shard_stacked_batch(mesh, stack_local_batches(batches))
    s2, m2 = step(state_b, X_dev, stacked_s, *args)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for l in range(ms.num_layers):
        np.testing.assert_array_equal(
            np.asarray(s1.vq_states[l].c_indices),
            np.asarray(s2.vq_states[l].c_indices),
        )
