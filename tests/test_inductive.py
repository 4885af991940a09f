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


def test_inductive_npz_roundtrip(tmp_path):
    """A ppi-style converted archive (multi-graph block-diagonal splits,
    tools/convert_dataset.py:convert_inductive format) loads through
    get_inductive_data and trains end-to-end."""
    import dataclasses

    from vq_gnn_tpu.graph.datasets import get_inductive_data

    # fabricate the converter's output from synthetic per-split graph lists
    # (2 graphs merged per split, like PPI's 20/2/2)
    arrays = {"num_classes": 4}
    rng = np.random.RandomState(0)
    for split, sizes in [("train", (80, 60)), ("val", (50,)), ("test", (50,))]:
        eis, xs, ys = [], [], []
        off = 0
        for n in sizes:
            e = rng.randint(0, n, size=(2, 4 * n))
            eis.append(e + off)
            xs.append(rng.randn(n, 8).astype(np.float32))
            y = np.zeros((n, 4), np.float32)
            y[np.arange(n), rng.randint(0, 4, n)] = 1.0
            ys.append(y)
            off += n
        arrays[f"{split}_edge_index"] = np.concatenate(eis, axis=1)
        arrays[f"{split}_x"] = np.concatenate(xs)
        arrays[f"{split}_y"] = np.concatenate(ys)
    np.savez(tmp_path / "ppi.npz", **arrays)

    cfg = Config(
        dataset="ppi",
        data_root=str(tmp_path),
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=64,
        test_batch_size=0,
        skip=True,
        pad_multiple_nodes=32,
        pad_multiple_edges=256,
    )
    train_g, val_g, test_g, c = get_inductive_data(cfg)
    assert train_g.num_nodes == 140 and val_g.num_nodes == 50
    assert train_g.train_mask.all()
    tr = NodeTrainer(train_g, cfg, c, val_graph=val_g, test_graph=test_g)
    assert tr.multilabel
    tr.run_init_sweep()
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)
    res = tr.evaluate()
    assert len(res) == 3 and all(0.0 <= r <= 1.0 for r in res)

    # single-label variant (CLUSTER-style y: int per node)
    arrays2 = dict(arrays)
    for split in ("train", "val", "test"):
        arrays2[f"{split}_y"] = np.argmax(arrays[f"{split}_y"], axis=1).astype(
            np.int32
        )
    np.savez(tmp_path / "cluster.npz", **arrays2)
    cfg2 = dataclasses.replace(cfg, dataset="cluster")
    train_g, val_g, test_g, c = get_inductive_data(cfg2)
    tr2 = NodeTrainer(train_g, cfg2, c, val_graph=val_g, test_graph=test_g)
    assert not tr2.multilabel
    tr2.run_init_sweep()
    loss, _ = tr2.train_epoch(1)
    assert np.isfinite(loss)


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
