"""Compiled-HLO collective audit for the sharded/DDP train steps.

Turns BASELINE.md's boundary-exchange analysis (codebook replication moves
~1 MB/step of batch-size-independent EMA traffic; the rejected exact-B'
feature exchange would move hundreds of MB) into properties the compiler is
held to:

- the multi-host DDP step's collectives are exactly {param-grad psum, VQ EMA
  psum, batch-sized c_indices update all-gather, BN/scalar psums} — every
  payload is bounded by an analytic per-category budget, and nothing
  graph-sized (feature table, edge arrays, c_indices table) ever rides a
  collective;
- the edge-sharded single-batch step (1-D data mesh) likewise never
  all-gathers the feature table; its collectives are batch-row aggregates
  and the same psums.

Measured ledger at this test's scale (2 shards, B_pad=128, 2 layers,
nb=4, M=8, D=4): all-reduce 7,292 B + all-gather 6,144 B per step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vq_gnn_tpu.parallel.mesh import make_mesh, shard_train_inputs
from vq_gnn_tpu.utils.hlo_audit import (
    collective_ledger,
    compiled_text,
    parse_collectives,
)

from test_ddp import build_two_shard_setup


def _tree_bytes(tree) -> int:
    return sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(tree)
        if hasattr(a, "size")
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_ddp_step_collective_budget():
    from vq_gnn_tpu.parallel.multihost import (
        make_ddp_step,
        shard_stacked_batch,
        stack_local_batches,
    )

    cfg, g, ms, state, X_dev, batches = build_two_shard_setup()
    n_shards = len(batches)
    stacked = stack_local_batches(batches)
    mesh = make_mesh(n_shards)
    repl = NamedSharding(mesh, P())
    state_s = jax.tree.map(lambda a: jax.device_put(a, repl), state)
    X_s = jax.device_put(X_dev, repl)
    batch_s = shard_stacked_batch(mesh, jax.tree.map(jnp.asarray, stacked))
    step = make_ddp_step(ms, cfg, mesh=mesh)  # arms the minimal-payload
    # c_indices update path (u8 assignments, once-per-step index gather)
    txt = compiled_text(
        step, state_s, X_s, batch_s,
        jnp.float32(1.0), jnp.float32(0.01), jnp.float32(1.0),
        jax.random.PRNGKey(2),
    )
    cols = parse_collectives(txt)
    assert cols, "no collectives found — sharding did not engage"

    # only psum-style all-reduces and the batch-sized c_indices update
    # all-gather are part of the design; a permute/all-to-all would mean a
    # different (unreviewed) communication pattern slipped in
    kinds = {c.op for c in cols}
    assert kinds <= {"all-reduce", "all-gather"}, kinds

    # ---- nothing graph-sized ever rides a collective ----
    # feature table [N+1, F], c_indices table [N+1, nb], edge arrays: if any
    # of these appear, codebook replication has silently regressed into a
    # feature/table exchange (the 963 MB/step design BASELINE.md rejected).
    table_elems = X_dev.size  # (N+1) * F
    cidx_elems = (g.num_nodes + 1) * ms.num_branches[0]
    edge_elems = int(np.asarray(batches[0].edges.ell_col).size)
    cap = min(table_elems, cidx_elems, edge_elems)
    for c in cols:
        for n in c.elements:
            assert n < cap, (
                f"graph-sized collective payload ({n} elems >= {cap}): "
                f"{c.line}"
            )

    # ---- per-category analytic budget (bytes/step) ----
    B_pad = int(np.asarray(batches[0].batch_idx).shape[0])
    nb, M, D = ms.num_branches[0], ms.vq.num_M, ms.num_D
    grad_budget = _tree_bytes(state.params)  # f32 grad psum, one tuple
    # per layer: sums [nb, M, 2D] + counts [nb, M] + feature-stat channels
    ema_budget = ms.num_layers * 4 * (nb * M * 2 * D + nb * M) * 2
    # per layer: u8 [n*B_pad, nb] packed assignments (M <= 256); the s32
    # indices + bool valid ride ONE constrained gather per step, not one
    # per layer (round-5 minimal-payload path, nn/vq.py rep_sharding)
    assign_bytes = nb * (1 if ms.vq.num_M <= 256 else 2)
    cidx_budget = (
        ms.num_layers * n_shards * B_pad * assign_bytes
        + n_shards * B_pad * (4 + 1)
    )
    misc_budget = 8192  # BN sync, loss/metric scalars, small psum fusions
    budget = grad_budget + ema_budget + cidx_budget + misc_budget

    ledger = collective_ledger(cols)
    total = sum(ledger.values())
    assert total <= budget, (ledger, budget)

    # the audit must not be vacuous: the EMA psum (a tuple containing the
    # [nb, M, 2D] sums) and the c_indices all-gather must both be present
    assert any(
        ("f32", (nb, M, 2 * D)) in c.shapes for c in cols
    ), "VQ EMA psum not found in compiled HLO"
    assert any(
        c.op == "all-gather" and ("u8", (n_shards * B_pad, nb)) in c.shapes
        for c in cols
    ), "packed (u8) c_indices batch update all-gather not found"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_edge_sharded_step_never_gathers_feature_table():
    """1-D data mesh (edge/row sharding): batch-row payloads (gathered x_B,
    aggregate partials) legitimately ride collectives under this layout, but
    the feature table, c_indices table, and edge arrays must not.  The graph
    is sized well above the batch so the two regimes are separable."""
    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
    from vq_gnn_tpu.nn.model import model_static
    from vq_gnn_tpu.sampler.samplers import BatchLoader
    from vq_gnn_tpu.train.loop import device_features
    from vq_gnn_tpu.train.state import init_train_state
    from vq_gnn_tpu.train.step import make_step_fns

    cfg = Config(
        dataset="synthetic",
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        skip=True,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        vq_update_mode="live",
    )
    g, c = synthetic_sbm(num_nodes=4000, num_features=16, seed=0)
    g, c, _ = prepare(g, cfg, c)
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    fns = make_step_fns(ms, cfg, multilabel=False)
    X_dev = device_features(g.x)
    windows, _ = next(iter(BatchLoader(g, cfg, train_flag=True)))
    batch = windows[0]

    mesh = make_mesh(8)
    state_s, X_s, batch_s = shard_train_inputs(mesh, state, X_dev, batch)
    txt = compiled_text(
        fns.train_step, state_s, X_s, batch_s,
        jnp.float32(1.0), jnp.float32(0.01), jnp.float32(1.0),
        jax.random.PRNGKey(3),
    )
    cols = parse_collectives(txt)
    assert cols, "no collectives found — sharding did not engage"

    table_elems = X_dev.size
    cidx_elems = (g.num_nodes + 1) * ms.num_branches[0]
    cap = min(table_elems, cidx_elems)
    S_pad, K = np.asarray(batch.edges.ell_col).shape
    edge_shapes = {(S_pad, K), (S_pad,), (S_pad * K,)}
    for col in cols:
        for n in col.elements:
            assert n < cap, (
                f"graph-sized collective payload ({n} elems >= {cap}): "
                f"{col.line}"
            )
        for _, dims in col.shapes:
            assert dims not in edge_shapes, (
                f"edge-array-shaped collective payload {dims}: {col.line}"
            )
