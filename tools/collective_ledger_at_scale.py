"""Compile the BENCH-SHAPE DDP step and print its real collective ledger.

Round-5 verdict weak #5: the 17.3 MB/step c_indices figure in BASELINE.md
was an analytic extrapolation from the toy-scale audit.  This tool builds
the arxiv-scale DDP workload (the bench flagship config over 2 host
shards), compiles the step on a virtual CPU mesh (AOT — no execution, so
2 vCPUs suffice), and prints the per-category collective bytes the
compiler actually inserted.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_ledger_at_scale.py

Paste the JSON line into BASELINE.md's boundary-exchange table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import load_npz, prepare, synthetic_sbm
    from vq_gnn_tpu.graph.partition import permute_graph
    from vq_gnn_tpu.nn.model import model_static
    from vq_gnn_tpu.parallel.mesh import make_mesh
    from vq_gnn_tpu.parallel.multihost import (
        make_ddp_step,
        partition_hosts,
        shard_stacked_batch,
        stack_local_batches,
    )
    from vq_gnn_tpu.sampler.samplers import BatchLoader
    from vq_gnn_tpu.train.loop import device_features
    from vq_gnn_tpu.train.state import init_train_state
    from vq_gnn_tpu.utils.hlo_audit import (
        collective_ledger,
        compiled_text,
        parse_collectives,
    )

    # the bench flagship config (bench.py arxiv profile) over 2 host shards
    cfg = Config(
        dataset="arxiv", conv_type="GCN", num_layers=3, hidden_channels=128,
        num_D=4, num_M=256, sampler_type="cluster", num_parts=80,
        batch_size=20, vq_update_mode="live", warm_up_flag=True, skip=True,
        matmul_precision="default",
        # fixed pads: multi-host SPMD needs identical shapes per shard
        fixed_B_pad=45056, fixed_Bp_pad=81920, fixed_E_pad=1572864,
        vq_backend="xla_fast",  # CPU compile (no Mosaic)
    )
    cache = os.environ.get("VQ_GNN_BENCH_CACHE", "/tmp/bench_arxiv_sbm.npz")
    if os.path.exists(cache):
        g, c = load_npz(cache)
        print(f"loaded cached synthetic N={g.num_nodes}", file=sys.stderr)
    else:
        g, c = synthetic_sbm(num_nodes=169_343, num_classes=40,
                             num_features=128, avg_degree=13.7, seed=0)
    g, c, ci = prepare(g, cfg, c)
    perm, ptr = partition_hosts(g.adj, 2)
    g = permute_graph(g, perm)
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    X_dev = device_features(g.x)

    batches = []
    for h in range(2):
        nodes = np.arange(ptr[h], ptr[h + 1])
        loader = BatchLoader(
            g, cfg, train_flag=True, shuffle=False, seed=h,
            sampler_type="node",  # per-host node ranges (test_ddp pattern)
        )
        loader.prefetch = False
        b = loader._build(nodes[: cfg.fixed_B_pad - 512])
        batches.append(b)
    B_pad = batches[0].B_pad
    print(f"shard batch: B_pad={B_pad} Bp_pad={batches[0].Bp_pad}",
          file=sys.stderr)

    stacked = stack_local_batches(batches)
    mesh = make_mesh(2)
    repl = NamedSharding(mesh, P())
    state_s = jax.tree.map(lambda a: jax.device_put(a, repl), state)
    X_s = jax.device_put(X_dev, repl)
    batch_s = shard_stacked_batch(mesh, jax.tree.map(jnp.asarray, stacked))
    step = make_ddp_step(ms, cfg, mesh=mesh)
    print("compiling the DDP step at bench scale ...", file=sys.stderr)
    txt = compiled_text(
        step, state_s, X_s, batch_s,
        jnp.float32(1.0), jnp.float32(0.01), jnp.float32(1.0),
        jax.random.PRNGKey(2),
    )
    cols = parse_collectives(txt)
    ledger = collective_ledger(cols)
    gathers = [c for c in cols if c.op == "all-gather"]
    print("\nper-gather payloads:", file=sys.stderr)
    for cc in gathers:
        print(f"  {cc.shapes} = {cc.bytes} B", file=sys.stderr)
    nb = ms.num_branches[0]
    out = {
        "experiment": "collective_ledger_at_scale",
        "n_shards": 2,
        "B_pad_per_shard": B_pad,
        "num_M": ms.vq.num_M,
        "nb": nb,
        "ledger_bytes": ledger,
        "all_gather_MB": round(ledger.get("all-gather", 0) / 1e6, 3),
        "all_reduce_MB": round(ledger.get("all-reduce", 0) / 1e6, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
