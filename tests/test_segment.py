"""Round-5 leak-fence machinery: segmentation resume equivalence, the
device-side batch cache, and the ce_only recovery gate.

The tunnel runtime retains ~100% of every host->device transfer in host
RSS (train/segment.py header; tools/leak_probe.py measurement), so long
runs segment via checkpoint + re-exec and deterministic loaders cache on
device.  These tests pin the correctness side: a segmented run must
reproduce the unsegmented run exactly, the cache must not change results,
and the ce_only gate must not change anything a ce_only run consumes.
"""

import os

import numpy as np
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import synthetic_sbm
from vq_gnn_tpu.train.parity import train_to_acc
from vq_gnn_tpu.train.segment import SegmentRestart


def graph_fn():
    return synthetic_sbm(
        num_nodes=800, num_classes=5, num_features=16, avg_degree=8, seed=3
    )


CFG = Config(
    dataset="synthetic",
    conv_type="GCN",
    num_layers=2,
    hidden_channels=16,
    num_D=4,
    num_M=16,
    sampler_type="cont",
    walk_length=3,
    batch_size=256,
    test_batch_size=800,
    vq_update_mode="live",
    lr=0.01,
    pad_multiple_nodes=256,
    pad_multiple_edges=2048,
    skip=True,
)


def test_segmented_run_matches_unsegmented(tmp_path):
    """Drive the segment save/restore path in-process: run 3 epochs whole,
    then 3 epochs with a forced mid-run segment + resume; eval histories
    must match exactly (state, RNG, sampler cursor all restored)."""
    ref = train_to_acc(graph_fn, CFG, epochs=3, eval_every=1)

    seg = str(tmp_path / "seg.npz")
    # leg 1: RSS ceiling of 0 MB forces a segment at epoch 1
    with pytest.raises(SegmentRestart):
        train_to_acc(
            graph_fn, CFG, epochs=3, eval_every=1, segment_path=seg,
            max_rss_mb=0.0,
        )
    assert os.path.exists(seg) and os.path.exists(seg + ".meta.json")
    # leg 2: resume with a sane ceiling and finish
    res = train_to_acc(
        graph_fn, CFG, epochs=3, eval_every=1, segment_path=seg,
        max_rss_mb=1e9,
    )
    for (e0, *r0), (e1, *r1) in zip(ref["history"], res["history"]):
        assert e0 == e1
        np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-6)
    assert res["test_at_best_valid"] == pytest.approx(
        ref["test_at_best_valid"], abs=1e-6
    )


def test_eval_cache_invariance(monkeypatch):
    """Cached device eval batches == streaming (VQ_GNN_EVAL_CACHE=off)."""
    monkeypatch.setenv("VQ_GNN_EVAL_CACHE", "off")
    off = train_to_acc(graph_fn, CFG, epochs=2, eval_every=1)
    monkeypatch.setenv("VQ_GNN_EVAL_CACHE", "on")
    on = train_to_acc(graph_fn, CFG, epochs=2, eval_every=1)
    for (e0, *r0), (e1, *r1) in zip(off["history"], on["history"]):
        np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-6)


def test_ce_only_gate_skips_recovery_without_changing_outputs():
    """ms.ce_only returns info_backward=0 from the bm exact-reverse path
    without touching out_B (the rev term feeds ONLY info): forward outputs
    must be identical, info must be 0."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vq_gnn_tpu.graph.datasets import prepare
    from vq_gnn_tpu.nn.model import layer_forward_bm, model_static, init_params
    from vq_gnn_tpu.nn.vq import init_vq_state
    from vq_gnn_tpu.sampler.samplers import BatchLoader

    cfg = dataclasses.replace(
        CFG, formulation="bm", conv_type="SAGE", recovery_flag=True,
        num_D=4, hidden_channels=8, batch_size=64, test_batch_size=256,
        pad_multiple_nodes=64, pad_multiple_edges=512,
    )
    g, c = graph_fn()
    g, c, _ = prepare(g, cfg, c)
    loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=0)
    windows, raw = next(iter(loader))
    batch, node_idx = windows[0], raw[0]
    x_pad = (
        jnp.zeros((batch.B_pad, g.num_features))
        .at[: len(node_idx)]
        .set(jnp.asarray(g.x[node_idx]))
    )

    def run(ce_only):
        ms = model_static(dataclasses.replace(cfg, ce_only=ce_only),
                          g.num_features, c)
        params = init_params(jax.random.PRNGKey(0), ms)
        vq = init_vq_state(jax.random.PRNGKey(1), ms.num_branches[0],
                           g.num_nodes, ms.vq)
        return layer_forward_bm(
            params[0], vq, ms, x_pad, batch, None, jnp.float32(1.0), True
        )

    out0, info0 = run(False)
    out1, info1 = run(True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-6, atol=1e-7)
    assert float(info1) == 0.0
