"""Checkpoint round-trip + resume-equivalence test."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from vq_gnn_tpu.train.loop import NodeTrainer


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = Config(
        dataset="synthetic",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=256,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        vq_update_mode="live",
    )
    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=8)
    g, c, _ = prepare(g, cfg, c)
    tr = NodeTrainer(g, cfg, c)
    tr.run_init_sweep()
    tr.train_epoch(1)

    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, tr.state, step=int(tr.state.step))

    tr2 = NodeTrainer(g, cfg, c)
    restored = restore_checkpoint(path, tr2.state)
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continued training from the restored state matches the original object
    tr2.state = restored
    tr2.rng = tr.rng
    r1 = tr.evaluate()
    r2 = tr2.evaluate()
    np.testing.assert_allclose(r1, r2)


def test_named_leaves_survive_field_addition(tmp_path):
    """Path-keyed restore is robust to pytree reordering: a template whose
    flatten ORDER differs but whose paths match restores correctly (the old
    order-based format would silently swap same-shaped leaves)."""
    from collections import OrderedDict

    path = os.path.join(tmp_path, "named.npz")
    a, b = np.arange(4.0), np.arange(4.0) * 10
    save_checkpoint(path, {"alpha": a, "beta": b})  # flattens sorted: a, b
    # OrderedDict flattens in insertion order: beta first — order-based
    # restore would swap the two same-shaped leaves, named restore must not
    out = restore_checkpoint(
        path, OrderedDict([("beta", np.zeros(4)), ("alpha", np.zeros(4))])
    )
    np.testing.assert_array_equal(out["alpha"], a)
    np.testing.assert_array_equal(out["beta"], b)


def test_named_restore_rejects_path_mismatch(tmp_path):
    path = os.path.join(tmp_path, "named.npz")
    save_checkpoint(path, {"alpha": np.zeros(4)})
    try:
        restore_checkpoint(path, {"gamma": np.zeros(4)})
    except ValueError as e:
        assert "gamma" in str(e) and "alpha" in str(e)
    else:
        raise AssertionError("mismatched paths must raise")


def test_legacy_order_archive_restores(tmp_path):
    """Round-1 flatten-order archives (leaf_<i> keys) still load."""
    path = os.path.join(tmp_path, "legacy.npz")
    leaves = [np.arange(3.0), np.ones((2, 2))]
    np.savez(path, **{f"leaf_{i}": a for i, a in enumerate(leaves)})
    out = restore_checkpoint(path, {"a": np.zeros(3), "b": np.zeros((2, 2))})
    np.testing.assert_array_equal(out["a"], leaves[0])
    np.testing.assert_array_equal(out["b"], leaves[1])


def test_fit_ckpt_resume(tmp_path):
    cfg = Config(
        dataset="synthetic",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=256,
        epochs=3,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
    )
    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=8)
    g, c, _ = prepare(g, cfg, c)
    tr = NodeTrainer(g, cfg, c)
    tr.fit(ckpt_dir=str(tmp_path), ckpt_every=1, verbose=False)
    # fresh trainer resumes past epoch 3 immediately (no epochs left)
    tr2 = NodeTrainer(g, cfg, c)
    tr2.fit(ckpt_dir=str(tmp_path), resume=True, verbose=False)
    r1 = tr.evaluate()
    r2 = tr2.evaluate()
    np.testing.assert_allclose(r1, r2)
