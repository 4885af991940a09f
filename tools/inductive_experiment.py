"""ppi-shape inductive evidence at M=4096 (round-5 verdict missing #4).

Shape mirrors the reference ppi GCN command
(``/root/reference/README.md:36-40``, ``vq_gnn_v1/main_node_inductive.py:
242-292``): hidden 256, num-M 4096, num-D 4, node sampler batch 30,000,
lr 3e-3, skip, multilabel micro-F1, per-split eval graphs.  Zero egress ->
synthetic inductive SBM stand-in at ppi size (train 45k / val+test 6k
nodes, 50 feats, 121 labels, avg degree 28).  M=4096 is 16x the codebook
every other perf figure was measured at — this is where the VQ-assign
GEMM and lookup scaling claims get tested.

    python tools/inductive_experiment.py --bench          # edges/s row
    python tools/inductive_experiment.py --arms both      # micro-F1 parity
        [--epochs 60] [--exact-epochs 200]
        [--segment-dir results/seg_ind]

Prints a result table and one JSON line; paste into BASELINE.md.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# real PPI: 44,906 train / 6,514 valid / 5,524 test nodes, 50 feats,
# 121 multilabel classes, avg degree ~28
N_TRAIN, N_VAL, N_TEST = 44_906, 6_514, 5_524
FEATS, CLASSES, DEG = 50, 121, 28.0


def build_graphs(seed=7, scale=1.0):
    from vq_gnn_tpu.graph.datasets import synthetic_sbm

    graphs = []
    for i, n in enumerate(
        [int(N_TRAIN * scale), int(N_VAL * scale), int(N_TEST * scale)]
    ):
        g, _ = synthetic_sbm(
            num_nodes=max(n, 64), num_classes=CLASSES, num_features=FEATS,
            avg_degree=DEG, multilabel=True, seed=seed + 101 * i,
            centroid_seed=seed,  # shared feature->label map across splits
        )
        g.train_mask = np.ones(g.num_nodes, dtype=bool)
        g.val_mask = g.test_mask = None
        graphs.append(g)
    return graphs


def vq_cfg(conv, epochs, scale=1.0):
    from vq_gnn_tpu.config import Config

    return Config(
        dataset="ppi",
        conv_type=conv,
        num_layers=3,
        hidden_channels=256,
        num_D=4,
        sampler_type="node",
        batch_size=max(256, int((30_000 if conv != "GAT" else 10_000) * scale)),
        test_batch_size=0,  # per-split full batches (reference ppi cmds)
        lr=3e-3,
        epochs=epochs,
        skip=True,
        warm_up=True,
        warm_up_epochs=5,
        warm_up_flag=True,
        vq_update_mode="live",
        matmul_precision="default",
        vq_backend="auto",
        # smoke-scale runs shrink the codebook too (M=4096 at full scale)
        num_M=4096 if scale >= 1.0 else max(64, int(4096 * scale * 4)),
    )


def make_trainer(cfg, graphs):
    from vq_gnn_tpu.graph.datasets import prepare_inductive
    from vq_gnn_tpu.train.loop import NodeTrainer

    tr_g, val_g, test_g, c = prepare_inductive(graphs, cfg, CLASSES)
    return NodeTrainer(
        tr_g, cfg, c, val_graph=val_g, test_graph=test_g, use_ogb_acc=False
    )


def run_arm(name, cfg, eval_every, segment_dir, seed, scale=1.0):
    from vq_gnn_tpu.train.segment import (
        SegmentRestart,
        load_segment,
        max_rss_mb_default,
        reexec,
        rss_mb,
        save_segment,
    )

    res_json = seg = None
    if segment_dir:
        os.makedirs(segment_dir, exist_ok=True)
        seg = os.path.join(segment_dir, f"{name}.npz")
        res_json = os.path.join(segment_dir, f"{name}.result.json")
        if os.path.exists(res_json):
            with open(res_json) as f:
                print(f"[{name}] cached result", flush=True)
                return json.load(f)
    tr = make_trainer(cfg, build_graphs(seed, scale))
    history = []
    start_epoch = 1
    sg = load_segment(seg, tr.state) if seg else None
    if sg is not None:
        tr.state, seg_epoch, history, rng, _ = sg[0], sg[1], sg[2], sg[3], sg[4]
        if rng is not None:
            tr.rng = jnp.asarray(np.asarray(rng, np.uint32))
        for h in history:
            tr.logger.add_result(0, h[2:5])
        tr.train_loader._epoch = seg_epoch
        start_epoch = seg_epoch + 1
        print(f"[{name}] [segment] resumed at epoch {start_epoch}", flush=True)
    else:
        tr.run_init_sweep()
    print(f"[{name}] {cfg.conv_type} M={cfg.num_M} batch={cfg.batch_size} "
          f"epochs={cfg.epochs}", flush=True)
    max_rss = max_rss_mb_default()
    t0 = time.time()
    for epoch in range(start_epoch, cfg.epochs + 1):
        loss, loss_cls = tr.train_epoch(epoch)
        if epoch % eval_every == 0 or epoch == cfg.epochs:
            f1_tr, f1_va, f1_te = tr.evaluate()
            tr.logger.add_result(0, (f1_tr, f1_va, f1_te))
            history.append((epoch, loss_cls, f1_tr, f1_va, f1_te))
            print(
                f"  epoch {epoch}: loss {loss_cls:.4f} f1 train {f1_tr:.4f} "
                f"valid {f1_va:.4f} test {f1_te:.4f} "
                f"[{time.time() - t0:.1f}s rss {rss_mb():.0f}MB]",
                flush=True,
            )
        if seg and epoch < cfg.epochs and rss_mb() > max_rss:
            save_segment(seg, tr.state, epoch, history,
                         rng=np.asarray(tr.rng))
            print(f"[segment] rss {rss_mb():.0f}MB at epoch {epoch} — "
                  f"re-exec", flush=True)
            reexec()
    stats = tr.logger.statistics(0)
    out = {
        "highest_valid": stats["highest_valid"] / 100.0,
        "test_at_best_valid": stats["final_test"] / 100.0,
    }
    if res_json:
        with open(res_json, "w") as f:
            json.dump(out, f)
    return out


def bench(conv, scale):
    """edges/s of the M=4096 train step — one batch re-stepped, bench.py
    methodology."""
    cfg = vq_cfg(conv, 1, scale)
    tr = make_trainer(cfg, build_graphs(7, scale))
    windows, _ = next(iter(tr.train_loader))
    batch = windows[0]
    E = int(np.asarray(batch.edges.ell_val != 0).sum()) if (
        batch.edges.ell_val is not None
    ) else int(np.asarray(batch.edges.val != 0).sum())
    args = (jnp.float32(1.0), jnp.float32(cfg.lr), jnp.float32(1.0),
            jax.random.PRNGKey(1))
    t0 = time.time()
    st, m = tr.fns.train_step(tr.state, tr.X_dev, batch, *args)
    jax.block_until_ready(m["loss"])
    print(f"compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(m['loss']):.4f} E={E} B_pad={batch.B_pad} "
          f"Bp_pad={batch.Bp_pad}", file=sys.stderr)
    n = 20
    t0 = time.time()
    for _ in range(n):
        st, m = tr.fns.train_step(st, tr.X_dev, batch, *args)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    eps = E * n / dt
    print(f"{n} steps in {dt:.3f}s -> {eps/1e6:.2f}M edges/s/chip",
          file=sys.stderr)
    print(json.dumps({
        "experiment": "inductive_bench",
        "conv": conv,
        "num_M": cfg.num_M,
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
    ap.add_argument("--scale", type=float, default=1.0,
                    help="graph-size scale (CPU smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.bench:
        bench(args.conv, args.scale)
        return

    t0 = time.time()
    res = {}
    if args.arms in ("both", "exact"):
        n_train = max(int(N_TRAIN * args.scale), 64)
        ex = dataclasses.replace(
            vq_cfg(args.conv, args.exact_epochs, args.scale),
            sampler_type="node",
            batch_size=n_train,
            ce_only=True,
            vq_update_mode="reference",
            warm_up=False,
            lr=args.exact_lr,
        )
        res["exact"] = run_arm("exact", ex, args.eval_every,
                               args.segment_dir, seed=7, scale=args.scale)
    if args.arms in ("both", "vq"):
        res["vq"] = run_arm(
            "vq", vq_cfg(args.conv, args.epochs, args.scale),
            args.eval_every, args.segment_dir, seed=7, scale=args.scale,
        )
    dt = time.time() - t0
    print(f"\n== inductive (ppi-shape) micro-F1 @ M=4096, {args.conv}, "
          f"{dt:.0f}s ==")
    for k, r in res.items():
        print(f"{k:8s} best-valid F1 {r['highest_valid']:.4f}  "
              f"test@best {r['test_at_best_valid']:.4f}")
    out = {
        "experiment": "inductive_parity_f1",
        "conv": args.conv,
        "num_M": 4096,
        "epochs": args.epochs,
        "seconds": round(dt, 1),
    }
    for k, r in res.items():
        out[f"{k}_test"] = r["test_at_best_valid"]
    if "exact" in res and "vq" in res:
        out["gap"] = (res["exact"]["test_at_best_valid"]
                      - res["vq"]["test_at_best_valid"])
        print(f"gap (exact - vq): {out['gap']:+.4f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
