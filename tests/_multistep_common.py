"""Shared config/graph for the multi-step multi-process DDP test.

Imported both by the pytest process (for the single-process stacked replay)
and by the spawned workers (tests/test_multiprocess.py WORKER_MULTISTEP), so
the two runs are the same computation by construction.
"""

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import synthetic_sbm


def multistep_cfg_graph():
    cfg = Config(
        dataset="synthetic",
        conv_type="GCN",
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        # cont sampler -> multi-window batches (sliding window of 2 over a
        # 2-step walk), the reference reddit/collab shape
        sampler_type="cont",
        walk_length=2,
        cont_sliding_window=2,
        batch_size=100,  # rescaled to 50 per window by the loader
        test_batch_size=200,
        vq_update_mode="live",
        skip=True,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        # multi-host SPMD: identical static shapes on every process
        fixed_B_pad=128,
        fixed_Bp_pad=384,
        fixed_E_pad=8192,
    )
    g, c = synthetic_sbm(num_nodes=400, num_features=16, num_classes=4, seed=0)
    return cfg, (g, c)
