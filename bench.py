"""Benchmark: edges/sec/chip for the fused SpMM+VQ training step.

Workload mirrors the reference's flagship config (README.md:19-22 — ogbn-arxiv
GCN, cluster sampler, 80 parts, 40-part batches, num_D=4, hidden 128, 3
layers) on an arxiv-scale synthetic graph (the container has no network
egress for the real OGB download; tools/convert_dataset.py builds the real
npz when data is available, and bench picks it up automatically).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against bench_anchor.json (this framework's first
recorded round-1 value — the reference repo publishes no numbers, SURVEY §6).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the (tunnel-remote)
    # compilation of the many small init programs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import load_npz, prepare, synthetic_sbm
    from vq_gnn_tpu.nn.model import model_static
    from vq_gnn_tpu.sampler.samplers import BatchLoader
    from vq_gnn_tpu.train.loop import device_features
    from vq_gnn_tpu.train.state import init_train_state
    from vq_gnn_tpu.train.step import make_step_fns

    formulation = os.environ.get("VQ_GNN_BENCH_FORM", "bbprime")
    # bm recovery kernel fold: the near-exact 'x2' default measured FASTER
    # than the bf16 'fast' mode (0.93M vs 0.87M edges/s bm GAT — the bf16
    # histogram's i1->bf16 converts cost more than the saved MXU pass)
    conv = os.environ.get("VQ_GNN_BENCH_CONV", "GCN")
    # VQ_GNN_BENCH_PROFILE=products: ogbn-products scale (2.45M nodes,
    # ~61M und. edges, 100 feats, 47 classes — reference misc.py:144-224
    # supports products through the same branch as arxiv).  Proves the
    # "scale up" claim past arxiv: host k-hop/ELL pipeline, [N+1, nb] int16
    # c_indices and HBM residency at 14x the node count.
    profile = os.environ.get("VQ_GNN_BENCH_PROFILE", "arxiv")
    if profile == "products":
        N_syn, deg_syn, feat_syn, cls_syn = 2_449_029, 50.0, 100, 47
        # 2 of 200 parts: B ~ 25k but E ~ 13M/step (products' degree is 4x
        # arxiv's and the 87% edge cut pulls a ~1.2M-node boundary) — the
        # [S*K, C] gathered block is the HBM limiter: 8 parts = 52M edges
        # = 29 GB f32, over the 16 GB chip; 2 parts fits at ~7 GB.
        parts_syn, batch_parts = 200, 2
    else:
        N_syn, deg_syn, feat_syn, cls_syn = 169_343, 13.7, 128, 40
        parts_syn, batch_parts = 80, 40
    # GAT defaults to bf16 streaming: halves the einsum/gather-block HBM
    # traffic and the merged cotangent gather (tools/gather_bench.py
    # one_bf16_130 27.3ms vs one_f32_130 29.7ms); accumulation stays f32.
    # GCN measured SLOWER in bf16 (26.8 vs 29.8M round 1), so it stays f32.
    default_dtype = "bfloat16" if conv == "GAT" else "float32"
    cfg = Config(
        dataset="arxiv",
        conv_type=conv,
        formulation=formulation,
        num_layers=3,
        hidden_channels=128,
        num_D=4,
        num_M=256 if formulation == "bbprime" else 1024,
        sampler_type="cluster" if formulation == "bbprime" else "cont",
        walk_length=3,
        num_parts=parts_syn,
        batch_size=batch_parts if formulation == "bbprime" else 10000,
        vq_update_mode=os.environ.get("VQ_GNN_BENCH_MODE", "live"),
        warm_up_flag=True,
        skip=True,
        matmul_precision="default",  # bench rides the MXU; VQ ops stay exact
        vq_backend=os.environ.get("VQ_GNN_BENCH_VQ_BACKEND", "pallas_fast"),
        spmm_backend=os.environ.get("VQ_GNN_BENCH_SPMM", "ell"),
        compute_dtype=os.environ.get("VQ_GNN_BENCH_DTYPE", default_dtype),
        ell_K=int(os.environ.get("VQ_GNN_BENCH_K", "8")),
        ell_Kt=int(os.environ.get("VQ_GNN_BENCH_KT", "0")),
    )

    path = os.path.join(cfg.data_root, f"{profile}.npz")
    # VQ_GNN_BENCH_CACHE: load-or-generate the synthetic graph at this npz
    # path (bench_sweep runs bench as fresh subprocesses; regenerating the
    # 169k-node SBM costs ~2-3 min of 2-vCPU time per run).  Distinct from
    # datasets/{profile}.npz, which is reserved for REAL converted data.
    cache = os.environ.get("VQ_GNN_BENCH_CACHE")
    # prepared-graph cache (products' normalize+partition is ~10 min of
    # 2-vCPU host time; round-4 verdict weak #4): keyed by everything
    # prepare() depends on, stores the normalized csr + the partition ptr
    prep_cache = None
    if cache:
        key = (
            f"{profile}.{cfg.formulation}.{cfg.conv_type}.p{cfg.num_parts}"
            f".D{cfg.num_D}.s{int(cfg.split)}"
        )
        prep_cache = f"{cache}.prepared.{key}.npz"
    g = c = None
    prepared = False
    if prep_cache and os.path.exists(prep_cache):
        import scipy.sparse as sp

        from vq_gnn_tpu.graph.partition import cluster_indices_from_ptr
        from vq_gnn_tpu.graph.store import HostGraph

        z = np.load(prep_cache, allow_pickle=False)
        if int(z["num_nodes"]) == N_syn:
            adj = sp.csr_matrix(
                (z["adj_data"], z["adj_indices"], z["adj_indptr"]),
                shape=(int(z["num_nodes"]), int(z["num_nodes"])),
            )
            opt = lambda k: z[k] if k in z.files else None
            g = HostGraph(
                adj=adj, x=z["x"], y=opt("y"),
                train_mask=opt("train_mask"), val_mask=opt("val_mask"),
                test_mask=opt("test_mask"), deg=opt("deg"),
                deg_inv=opt("deg_inv"),
            )
            c = int(z["num_classes"])
            cluster_indices = (
                cluster_indices_from_ptr(z["part_ptr"])
                if "part_ptr" in z.files else None
            )
            prepared = True
            log(f"loaded prepared cache {prep_cache}: N={g.num_nodes} "
                f"E={g.num_edges}")
        else:
            log(f"prepared cache {prep_cache} is stale (N mismatch) — ignoring")
    if prepared:
        pass  # prepared-cache hit skips generate + prepare below
    elif os.path.exists(path):
        g, c = load_npz(path)
        log(f"loaded {path}: N={g.num_nodes} E={g.num_edges}")
    elif cache and os.path.exists(cache):
        g, c = load_npz(cache)
        if g.num_nodes != N_syn:
            # profile-keyed guard: a stale cache from another profile (e.g.
            # arxiv-scale with VQ_GNN_BENCH_PROFILE=products still set)
            # would silently benchmark the wrong graph
            log(
                f"cache {cache} is N={g.num_nodes}, profile wants N={N_syn}"
                f" — regenerating (stale cache left untouched)"
            )
            g = c = cache = None
        else:
            log(f"loaded cached synthetic: N={g.num_nodes} E={g.num_edges}")
    if g is None:
        g, c = synthetic_sbm(
            num_nodes=N_syn,
            num_classes=cls_syn,
            num_features=feat_syn,
            avg_degree=deg_syn,
            seed=0,
        )
        log(f"synthetic {profile}-scale: N={g.num_nodes} E={g.num_edges}")
        if cache:
            import scipy.sparse as _sp  # noqa: F401  (HostGraph.adj is csr)

            coo = g.adj.tocoo()
            np.savez(
                cache,
                num_nodes=np.int64(g.num_nodes),
                edge_index=np.stack(
                    [coo.col.astype(np.int32), coo.row.astype(np.int32)]
                ),
                x=g.x,
                y=g.y,
                train_mask=g.train_mask,
                val_mask=g.val_mask,
                test_mask=g.test_mask,
                num_classes=np.int64(c),
            )
            log(f"cached synthetic graph at {cache}")
    if not prepared:
        g, c, cluster_indices = prepare(g, cfg, c)
        log(f"prepared: E(normalized)={g.num_edges}")
        if prep_cache:
            arrs = {
                "num_nodes": np.int64(g.num_nodes),
                "adj_data": g.adj.data, "adj_indices": g.adj.indices,
                "adj_indptr": g.adj.indptr, "x": g.x,
                "num_classes": np.int64(c),
            }
            for k in ("y", "train_mask", "val_mask", "test_mask", "deg",
                      "deg_inv"):
                v = getattr(g, k)
                if v is not None:
                    arrs[k] = v
            if cluster_indices is not None:
                # parts are contiguous aranges post-permute; rebuild ptr
                # from lengths (robust to empty parts)
                arrs["part_ptr"] = np.concatenate(
                    [[0], np.cumsum([len(ci) for ci in cluster_indices])]
                ).astype(np.int64)
            np.savez(prep_cache, **arrs)
            log(f"cached prepared graph at {prep_cache}")

    jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
    ms = model_static(cfg, g.num_features, c)
    state = init_train_state(jax.random.PRNGKey(0), ms, g.num_nodes)
    fns = make_step_fns(ms, cfg, multilabel=False)
    X_dev = device_features(g.x)

    loader = BatchLoader(g, cfg, train_flag=True, cluster_indices=cluster_indices)
    windows, _ = next(iter(loader))
    batch = windows[0]
    if batch.edges.tail_row is not None:
        e = batch.edges
        E_batch = int(np.asarray(e.head_val != 0).sum()) + int(
            np.asarray(e.tail_val != 0).sum()
        )
        cells = e.head_col.size + e.tail_col.size
        layout = (
            f"mixed-ELL K={cfg.ell_K}+{cfg.ell_Kt} Sh={e.head_rowc.shape[0]} "
            f"St2={e.tail_row.shape[0]} pad={1 - E_batch / cells:.1%}"
        )
    elif batch.edges.ell_val is not None:
        E_batch = int(np.asarray(batch.edges.ell_val != 0).sum())
        layout = (
            f"ELL K={cfg.ell_K} S_pad={batch.edges.ell_row.shape[0]} "
            f"St_pad={batch.edges.t_ell_row.shape[0]}"
        )
    else:
        E_batch = int(np.asarray(batch.edges.val != 0).sum())
        layout = f"E_pad={batch.edges.row.shape[0]}"
    log(
        f"batch: B={int(batch.num_B)} B_pad={batch.B_pad} Bp_pad={batch.Bp_pad} "
        f"E={E_batch} {layout}"
    )

    args = (
        jnp.float32(1.0),
        jnp.float32(0.01),
        jnp.float32(1.0),
        jax.random.PRNGKey(1),
    )

    # warm-up / compile
    t0 = time.time()
    state, metrics = fns.train_step(state, X_dev, batch, *args)
    jax.block_until_ready(metrics["loss"])
    log(f"compile+first step: {time.time() - t0:.1f}s loss={float(metrics['loss']):.4f}")

    steps = 20
    t0 = time.time()
    for _ in range(steps):
        state, metrics = fns.train_step(state, X_dev, batch, *args)
    jax.block_until_ready(metrics["loss"])
    dt = time.time() - t0
    eps = E_batch * steps / dt
    log(f"{steps} steps in {dt:.3f}s -> {eps/1e6:.2f}M edges/s/chip")
    # device memory footprint (the reference prints cuda.max_memory_allocated,
    # main_node.py v2:263)
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            log(
                f"device mem: in_use={stats.get('bytes_in_use', 0)/1e6:.0f}MB "
                f"peak={stats.get('peak_bytes_in_use', 0)/1e6:.0f}MB"
            )
    except Exception:
        pass

    # forward-only decomposition (stderr only)
    out = fns.eval_step(state, X_dev, batch)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fns.eval_step(state, X_dev, batch)
    jax.block_until_ready(out)
    log(f"eval fwd: {(time.time() - t0) / steps * 1000:.1f} ms")

    anchor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_anchor.json")
    vs = 1.0
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        if anchor.get("value"):
            vs = eps / anchor["value"]

    print(
        json.dumps(
            {
                "metric": "train_edges_per_sec_per_chip",
                "value": round(eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
