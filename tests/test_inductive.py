"""Inductive (ppi-style) training/eval tests."""

import numpy as np

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare_inductive, synthetic_inductive
from vq_gnn_tpu.train.loop import NodeTrainer


def test_inductive_ppi_style():
    cfg = Config(
        dataset="synthetic",
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=0,
        skip=True,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
    )
    graphs, c = synthetic_inductive(num_nodes=300, multilabel=True, seed=0)
    train_g, val_g, test_g, c = prepare_inductive(graphs, cfg, c)
    tr = NodeTrainer(
        train_g, cfg, c, val_graph=val_g, test_graph=test_g
    )
    assert tr.multilabel
    tr.run_init_sweep()
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)
    res = tr.evaluate()
    assert len(res) == 3
    assert all(0.0 <= r <= 1.0 for r in res)


def test_inductive_stochastic_per_split_tables():
    """v1-inductive stochastic eval: batches smaller than the split graph,
    assignments recomputed into fresh per-split c tables."""
    cfg = Config(
        dataset="synthetic",
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=0,
        skip=True,
        pad_multiple_nodes=32,
        pad_multiple_edges=256,
    )
    graphs, c = synthetic_inductive(num_nodes=200, multilabel=True, seed=3)
    train_g, val_g, test_g, c = prepare_inductive(graphs, cfg, c)
    tr = NodeTrainer(train_g, cfg, c, val_graph=val_g, test_graph=test_g)
    tr.run_init_sweep()
    tr.train_epoch(1)
    outs = tr.evaluate_split_stochastic(val_g, batch_size=40)
    assert outs.shape[0] == val_g.num_nodes
    assert np.isfinite(outs).all()
