"""dropbranch — working static-shape semantics of the reference's broken flag.

The reference's --dropbranch (models.py v2:150-155, v1/models.py:312-318) is
unrunnable: the cat over a branch *subset* mismatches gnn_transform's fan-in
in both generations.  Our semantics (documented in ModelStatic.dropbranch):
per training step and layer, keep exactly int(nb*(1-p)) branches; dropped
branches contribute no codebook features, no gradient-recovery term, no
VQ/c_indices update, and (v1) a zeroed hidden slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.nn.model import layer_forward, model_static
from vq_gnn_tpu.nn.vq import vq_update
from vq_gnn_tpu.train.loop import NodeTrainer

BASE = dict(
    dataset="synthetic",
    num_layers=2,
    hidden_channels=16,
    num_D=4,
    num_M=8,
    batch_size=128,
    test_batch_size=256,
    epochs=1,
    pad_multiple_nodes=64,
    pad_multiple_edges=512,
    skip=True,
)


def build(cfg, n=400, seed=0):
    g, c = synthetic_sbm(num_nodes=n, num_features=16, num_classes=4, seed=seed)
    g, c, ci = prepare(g, cfg, c)
    return NodeTrainer(g, cfg, c, cluster_indices=ci)


def test_all_keep_mask_is_identity():
    """branch_keep = all-True must reproduce the unmasked layer exactly."""
    cfg = Config(conv_type="GCN", **BASE)
    tr = build(cfg)
    tr.run_init_sweep()
    batch = next(iter(tr.train_loader))[0][0]
    x_B = jnp.take(tr.X_dev, jnp.asarray(batch.batch_idx), axis=0)
    ms = tr.ms
    lp, st = tr.state.params[0], tr.state.vq_states[0]
    nb = ms.num_branches[0]
    out0, info0 = layer_forward(lp, st, ms, x_B, batch, None, 1.0, True)
    out1, info1 = layer_forward(
        lp, st, ms, x_B, batch, None, 1.0, True,
        branch_keep=jnp.ones((nb,), bool),
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=0, atol=0)
    assert float(info0) == float(info1)


def test_dropped_branch_vq_state_untouched():
    """vq_update with a keep mask must leave dropped branches' state
    (codebook, EMA, BN stats, c_indices row) bit-identical."""
    cfg = Config(conv_type="GCN", **BASE)
    tr = build(cfg)
    tr.run_init_sweep()
    ms = tr.ms
    st = tr.state.vq_states[0]
    nb = ms.num_branches[0]
    assert nb >= 2
    rng = jax.random.PRNGKey(3)
    B = 64
    Xb = jax.random.normal(rng, (nb, B, ms.num_D))
    Gb = jax.random.normal(jax.random.fold_in(rng, 1), (nb, B, ms.vq.grad_dim))
    bidx = jnp.arange(B, dtype=jnp.int32)
    keep = jnp.asarray([i % 2 == 0 for i in range(nb)])

    new, _ = vq_update(st, Xb, Gb, bidx, ms.vq, branch_keep=keep)
    ref, _ = vq_update(st, Xb, Gb, bidx, ms.vq)
    for name in (
        "embedding", "embedding_output", "ema_cluster_size", "ema_w",
        "bn_feat_mean", "bn_feat_var", "bn_grad_mean", "bn_grad_var",
    ):
        new_a, old_a, ref_a = (
            np.asarray(getattr(new, name)),
            np.asarray(getattr(st, name)),
            np.asarray(getattr(ref, name)),
        )
        for b in range(nb):
            if keep[b]:
                np.testing.assert_array_equal(new_a[b], ref_a[b], err_msg=name)
            else:
                np.testing.assert_array_equal(new_a[b], old_a[b], err_msg=name)
    ci_new = np.asarray(new.c_indices).T
    ci_old = np.asarray(st.c_indices).T
    ci_ref = np.asarray(ref.c_indices).T
    for b in range(nb):
        tgt = ci_ref if keep[b] else ci_old
        np.testing.assert_array_equal(ci_new[b], tgt[b])


def test_dropped_branch_kills_codebook_columns():
    """A dropped branch's codebook feature slice must not reach the conv:
    fo-row columns of that branch are zero in the conv input, so changing
    that branch's codebook must not change the layer output."""
    cfg = Config(conv_type="GCN", **BASE)
    tr = build(cfg)
    tr.run_init_sweep()
    batch = next(iter(tr.train_loader))[0][0]
    x_B = jnp.take(tr.X_dev, jnp.asarray(batch.batch_idx), axis=0)
    ms = tr.ms
    lp, st = tr.state.params[0], tr.state.vq_states[0]
    nb = ms.num_branches[0]
    keep = jnp.asarray([b != 0 for b in range(nb)])  # drop branch 0
    out0, info0 = layer_forward(lp, st, ms, x_B, batch, None, 1.0, True, branch_keep=keep)
    st_perturbed = st.replace(
        embedding_output=st.embedding_output.at[0].add(100.0)
    )
    out1, info1 = layer_forward(
        lp, st_perturbed, ms, x_B, batch, None, 1.0, True, branch_keep=keep
    )
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    assert float(info0) == float(info1)


@pytest.mark.parametrize("formulation", ["bbprime", "bm"])
def test_dropbranch_trains(formulation):
    cfg = Config(
        conv_type="GCN", vq_update_mode="live", dropbranch=0.5,
        formulation=formulation, lr=0.05, **BASE,
    )
    tr = build(cfg)
    tr.run_init_sweep()
    for epoch in range(1, 4):
        loss, _ = tr.train_epoch(epoch)
        assert np.isfinite(loss)
    res = tr.evaluate()
    assert all(0.0 <= r <= 1.0 for r in res)


def test_dropbranch_gat_trains():
    cfg = Config(conv_type="GAT", vq_update_mode="live", dropbranch=0.5, **BASE)
    tr = build(cfg)
    tr.run_init_sweep()
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)


def test_dropbranch_validation():
    with pytest.raises(ValueError):
        ms = model_static(Config(conv_type="GCN", dropbranch=0.99, **BASE), 16, 4)
