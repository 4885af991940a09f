"""Capture a jax.profiler trace of the training step (TPU).

    python tools/profile_step.py --trace-dir /tmp/vqgnn_trace

Open the trace with TensorBoard's profile plugin / Perfetto to see per-op
time: the ELL gathers, slot segment-sums, VQ distance GEMMs and the RMSprop
update. Mirrors bench.py's flagship workload.
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/vqgnn_trace")
    p.add_argument("--steps", type=int, default=5)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
    from vq_gnn_tpu.nn.model import model_static
    from vq_gnn_tpu.sampler.samplers import BatchLoader
    from vq_gnn_tpu.train.loop import device_features
    from vq_gnn_tpu.train.state import init_train_state
    from vq_gnn_tpu.train.step import make_step_fns

    import os
    form = os.environ.get("VQ_GNN_PROF_FORM", "bbprime")
    cfg = Config(
        dataset="arxiv", conv_type=os.environ.get("VQ_GNN_PROF_CONV", "GCN"),
        formulation=form, num_layers=3, hidden_channels=128,
        num_D=4,
        num_M=256 if form == "bbprime" else 1024,
        sampler_type="cluster" if form == "bbprime" else "cont",
        walk_length=3,
        num_parts=80,
        batch_size=40 if form == "bbprime" else 10000,
        skip=True, matmul_precision="default",
        vq_backend=os.environ.get("VQ_GNN_PROF_VQ_BACKEND", "xla_fast"),
        compute_dtype=os.environ.get("VQ_GNN_PROF_DTYPE", "float32"),
        ell_K=int(os.environ.get("VQ_GNN_PROF_K", "8")),
    )
    g, c = synthetic_sbm(num_nodes=169_343, num_classes=40, num_features=128,
                         avg_degree=13.7, seed=0)
    g, c, ci = prepare(g, cfg, c)
    jax.config.update("jax_default_matmul_precision", "default")
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    fns = make_step_fns(ms, cfg, multilabel=False)
    X_dev = device_features(g.x)
    windows, _ = next(iter(BatchLoader(g, cfg, train_flag=True, cluster_indices=ci)))
    batch = windows[0]
    args = (jnp.float32(1.0), jnp.float32(0.01), jnp.float32(1.0), jax.random.PRNGKey(1))

    state, m = fns.train_step(state, X_dev, batch, *args)
    jax.block_until_ready(m["loss"])

    with jax.profiler.trace(a.trace_dir):
        for _ in range(a.steps):
            state, m = fns.train_step(state, X_dev, batch, *args)
        jax.block_until_ready(m["loss"])
    print(f"trace written to {a.trace_dir}")


if __name__ == "__main__":
    main()
