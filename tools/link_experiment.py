"""Collab-scale link-prediction evidence: edges/s bench + VQ-vs-exact
Hits@50 parity (round-5 verdict missing #3).

Shape mirrors the reference ogbl-collab GCN command
(``/root/reference/README.md:54-58``, ``vq_gnn_v2/main_link.py:43-244``):
N=235,868, cont sampler walk 15, batch 50,000, num-M 1024, num-D 4,
hidden 128, lr 3e-3, skip.  Zero-egress container -> synthetic SBM
stand-in at collab size/degree with an OGB-style edge split (train graph
excludes valid/test positives; 100k random negatives per eval split).

    python tools/link_experiment.py --bench              # edges/s row
    python tools/link_experiment.py --arms both          # Hits@50 parity
        [--epochs 60] [--exact-epochs 200] [--exact-lr 1e-2]
        [--segment-dir results/seg_link]                 # leak fence

Prints a result table and one JSON line; paste into BASELINE.md.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (jax before torch — CLAUDE.md)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_COLLAB = 235_868
DEG_COLLAB = 10.9  # 2 * 1.285M edges / N
FEAT_COLLAB = 128


def build_graph_and_split(seed=7, nodes=N_COLLAB):
    """Collab-scale latent dot-product graph + OGB-style split: valid/test
    positives are held OUT of the training adjacency (main_link.py v2: the
    message graph is the train split).  The SBM stand-in was measured
    structurally unrankable for link prediction (within-block pairs are
    exchangeable — exact control Hits@50 0.02% after 120 epochs);
    ``synthetic_dot_product`` makes links predictable from features
    (RDPG), matching what collab-style link prediction assumes."""
    import scipy.sparse as sp

    from vq_gnn_tpu.graph.datasets import synthetic_dot_product

    g, _ = synthetic_dot_product(
        num_nodes=nodes, num_features=FEAT_COLLAB,
        avg_degree=DEG_COLLAB, seed=seed,
    )
    scale = nodes / N_COLLAB
    rng = np.random.RandomState(seed)
    coo = g.adj.tocoo()
    upper = coo.row < coo.col
    pairs = np.stack([coo.row[upper], coo.col[upper]], 1)
    perm = rng.permutation(len(pairs))
    pairs = pairs[perm]
    n_test, n_valid = int(46_329 * scale), int(60_084 * scale)  # collab sizes
    test_pos = pairs[:n_test]
    valid_pos = pairs[n_test : n_test + n_valid]
    train_pos = pairs[n_test + n_valid :]
    rand = lambda n: np.stack(
        [rng.randint(0, g.num_nodes, n), rng.randint(0, g.num_nodes, n)], 1
    )
    from vq_gnn_tpu.train.link import SplitEdges

    n_neg = int(100_000 * scale)
    split = SplitEdges(
        train_pos=train_pos, valid_pos=valid_pos, valid_neg=rand(n_neg),
        test_pos=test_pos, test_neg=rand(n_neg),
    )
    # training adjacency = train positives only, symmetrized by hand (the
    # collab pipeline skips prepare()'s symmetrize, v2:283-284)
    r = np.concatenate([train_pos[:, 0], train_pos[:, 1]])
    c = np.concatenate([train_pos[:, 1], train_pos[:, 0]])
    g.adj = sp.csr_matrix(
        (np.ones(len(r), np.float32), (r, c)), shape=(g.num_nodes, g.num_nodes)
    )
    return g, split


def vq_config(conv, epochs):
    from vq_gnn_tpu.config import Config

    return Config(
        dataset="collab",
        conv_type=conv,
        num_layers=3,
        hidden_channels=128,
        num_D=4,
        num_M=1024,
        sampler_type="cont",
        walk_length=15,
        cont_sliding_window=1,
        batch_size=50_000 if conv != "GAT" else 20_000,
        test_batch_size=80_000,
        lr=3e-3,
        epochs=epochs,
        skip=True,
        warm_up=True,
        warm_up_epochs=5,
        warm_up_flag=True,
        vq_update_mode="live",
        matmul_precision="default",
        vq_backend="auto",
    )


def exact_cfg_from(cfg, num_nodes, lr, epochs):
    return dataclasses.replace(
        cfg,
        sampler_type="node",
        batch_size=num_nodes,
        test_batch_size=num_nodes,
        ce_only=True,
        vq_update_mode="reference",
        warm_up=False,
        lr=lr,
        epochs=epochs,
        exact_eval_train_edges=True,
    )


def run_arm(name, g, split, cfg, eval_every, segment_dir):
    from vq_gnn_tpu.graph.datasets import prepare
    from vq_gnn_tpu.train.link import LinkTrainer
    from vq_gnn_tpu.train.segment import SegmentRestart, reexec, rss_mb

    res_json = seg = None
    if segment_dir:
        os.makedirs(segment_dir, exist_ok=True)
        seg = os.path.join(segment_dir, f"{name}.npz")
        res_json = os.path.join(segment_dir, f"{name}.result.json")
        if os.path.exists(res_json):
            with open(res_json) as f:
                print(f"[{name}] cached result", flush=True)
                return json.load(f)
    g2, _, _ = prepare(g, cfg, 0, symmetrize_adj=False)
    tr = LinkTrainer(g2, cfg, split)
    print(f"[{name}] {cfg.conv_type}/{cfg.sampler_type} "
          f"batch={cfg.batch_size} epochs={cfg.epochs}", flush=True)
    try:
        stats = tr.fit(run=0, verbose=True, segment_path=seg,
                       eval_every=eval_every)
    except SegmentRestart as e:
        print(f"[segment] rss {rss_mb():.0f}MB at epoch {e.epoch} — re-exec",
              flush=True)
        reexec()
    out = {
        "highest_valid": stats["highest_valid"] / 100.0,
        "test_at_best_valid": stats["final_test"] / 100.0,
    }
    if res_json:
        with open(res_json, "w") as f:
            json.dump(out, f)
    return out


def bench(conv):
    """Time the jitted link train step on one collab-scale batch — the
    same methodology as bench.py (one batch re-stepped; edges/s/chip)."""
    from vq_gnn_tpu.graph.datasets import prepare
    from vq_gnn_tpu.train.link import LinkTrainer

    cfg = vq_config(conv, epochs=1)
    g, split = build_graph_and_split()
    g, _, _ = prepare(g, cfg, 0, symmetrize_adj=False)
    tr = LinkTrainer(g, cfg, split)
    windows, _ = next(iter(tr.train_loader))
    batch = windows[-1]
    E = int(np.asarray(batch.edges.ell_val != 0).sum()) if (
        batch.edges.ell_val is not None
    ) else int(np.asarray(batch.edges.val != 0).sum())
    args = (jnp.float32(1.0), jnp.float32(cfg.lr), jnp.float32(1.0),
            jax.random.PRNGKey(1))
    t0 = time.time()
    st, pp, pn, m = tr.step_fn(tr.state, tr.pred_params, tr.pred_nu,
                               tr.X_dev, batch, *args)
    jax.block_until_ready(m["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(m['loss']):.4f} E={E}", file=sys.stderr)
    n = 20
    t0 = time.time()
    for _ in range(n):
        st, pp, pn, m = tr.step_fn(st, pp, pn, tr.X_dev, batch, *args)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    eps = E * n / dt
    print(f"{n} steps in {dt:.3f}s -> {eps/1e6:.2f}M edges/s/chip",
          file=sys.stderr)
    print(json.dumps({
        "experiment": "link_bench",
        "conv": conv,
        "N": g.num_nodes,
        "edges_per_step": E,
        "edges_per_sec_per_chip": round(eps, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv", default="GCN", choices=["GCN", "SAGE", "GAT"])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--exact-epochs", type=int, default=200)
    ap.add_argument("--exact-lr", type=float, default=3e-3)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--arms", default="both", choices=["both", "vq", "exact"])
    ap.add_argument("--segment-dir", default=None)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nodes", type=int, default=N_COLLAB,
                    help="scale override (CPU smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.bench:
        bench(args.conv)
        return

    t0 = time.time()
    g, split = build_graph_and_split(nodes=args.nodes)
    cfg = vq_config(args.conv, args.epochs)
    if args.nodes != N_COLLAB:
        cfg = dataclasses.replace(
            cfg, batch_size=max(256, int(cfg.batch_size * args.nodes / N_COLLAB)),
            test_batch_size=max(512, int(cfg.test_batch_size * args.nodes / N_COLLAB)),
            num_M=64, pad_multiple_nodes=256, pad_multiple_edges=2048,
        )
    res = {}
    if args.arms in ("both", "exact"):
        ex = exact_cfg_from(cfg, g.num_nodes, args.exact_lr, args.exact_epochs)
        g2, split2 = build_graph_and_split(nodes=args.nodes)  # prepare() mutates
        res["exact"] = run_arm("exact", g2, split2, ex, args.eval_every,
                               args.segment_dir)
    if args.arms in ("both", "vq"):
        res["vq"] = run_arm("vq", g, split, cfg, args.eval_every,
                            args.segment_dir)
    dt = time.time() - t0
    print(f"\n== link parity @ collab-scale dot-product graph "
          f"N={N_COLLAB}, {args.conv}, {dt:.0f}s ==")
    for k, r in res.items():
        print(f"{k:8s} best-valid Hits@50 {r['highest_valid']:.4f}  "
              f"test@best {r['test_at_best_valid']:.4f}")
    out = {
        "experiment": "link_parity_hits50",
        "conv": args.conv,
        "epochs": args.epochs,
        "N": N_COLLAB,
        "seconds": round(dt, 1),
    }
    for k, r in res.items():
        out[f"{k}_test"] = r["test_at_best_valid"]
    if "exact" in res and "vq" in res:
        out["gap"] = res["exact"]["test_at_best_valid"] - res["vq"][
            "test_at_best_valid"
        ]
        print(f"gap (exact - vq): {out['gap']:+.4f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
