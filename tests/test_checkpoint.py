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
