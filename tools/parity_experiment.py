"""Arxiv-scale VQ-vs-exact convergence parity experiment.

Runs the paper's central claim (mini-batch VQ training == exact full-graph
training accuracy, arXiv:2110.14363) at ogbn-arxiv scale.  With no network
egress the graph is a 169,343-node synthetic SBM matched to arxiv's size and
degree profile; when ``datasets/arxiv.npz`` exists (built elsewhere with
``tools/convert_dataset.py`` — see REAL_DATA.md) the real graph is used
instead, and the VQ config is exactly the reference flagship command
(``/root/reference/README.md:19-22``: GCN, cluster sampler, 80 parts,
40-part batches, num_D=4, hidden 128, 3 layers).

Usage (TPU, ~10-30 min depending on tunnel bandwidth):
    python tools/parity_experiment.py [--conv GCN] [--epochs 60] [--nodes 169343]

Prints a result table and a JSON line; paste the table into BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (jax before torch/sklearn — CLAUDE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv", default="GCN", choices=["GCN", "SAGE", "GAT"])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--exact-epochs", type=int, default=None)
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--noise", type=float, default=4.0)
    # difficulty calibration (tools/calibrate_sbm.py, round-3): with all 128
    # dims informative the exact control saturates at 99.6% and ceiling
    # effects can hide a broken VQ path; 48 informative dims at noise 4.0
    # lands the exact control at ~73-80% — measured gap below the ceiling.
    ap.add_argument("--informative-dims", type=int, default=48)
    # 'bm' runs the v1 B+M formulation in the reference reddit shape
    # (/root/reference/README.md:72-88: cont sampler, walk 3, num-M 1024,
    # batch 10000, lr 1e-3, recovery, bn, no skip)
    ap.add_argument("--formulation", default="bbprime",
                    choices=["bbprime", "bm"])
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    ap.add_argument(
        "--exact-lr", type=float, default=None,
        help="tuned lr for the exact full-graph control (1 step/epoch; "
        "minibatch-tuned rates undertrain it — see train/parity.py)",
    )
    ap.add_argument(
        "--arms", default="both",
        choices=["both", "all", "mb", "exact", "exact_mb", "vq"],
        help="arm selection: 'both' = full-batch control + VQ; 'all' adds "
        "the convergence-matched exact mini-batch control (same batches/"
        "update count, in-batch edges only); single-arm values schedule "
        "long controls separately",
    )
    ap.add_argument(
        "--diag-log",
        default=None,
        help="JSONL path for per-eval VQ codebook-health records on the VQ "
        "arm (usage entropy/floor, assignment churn, codeword drift)",
    )
    ap.add_argument(
        "--segment-dir",
        default=None,
        help="arm leak segmentation: per-arm checkpoints + cached arm "
        "results in this dir; the process re-execs itself when host RSS "
        "crosses VQ_GNN_MAX_RSS_MB (train/segment.py — fences the tunnel "
        "runtime's per-transfer host retention)",
    )
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import load_npz, synthetic_sbm
    from vq_gnn_tpu.train.parity import parity_gap

    real = os.path.join("datasets", "arxiv.npz")

    def graph_fn():
        if os.path.exists(real):
            return load_npz(real)
        return synthetic_sbm(
            num_nodes=args.nodes,
            num_classes=40,
            num_features=128,
            avg_degree=13.7,
            homophily=0.7,
            feature_noise=args.noise,
            informative_dims=args.informative_dims,
            seed=7,
        )

    n = graph_fn()[0].num_nodes
    if args.formulation == "bm":
        # the reference reddit shape on the v1 mapper formulation
        cfg = Config(
            dataset="arxiv",
            conv_type=args.conv,
            formulation="bm",
            num_layers=3,
            hidden_channels=128,
            num_D=4,
            num_M=1024,
            sampler_type="cont",
            walk_length=3,
            cont_sliding_window=1,
            batch_size=10000,
            test_batch_size=n,
            recovery_flag=True,
            vq_update_mode="live",
            lr=1e-3,
            warm_up=True,
            warm_up_epochs=5,
            skip=False,
            matmul_precision="default",
            vq_backend="auto",
            # the bm shape averages ~1.5 edges/row over B+B' — K=8 slot-ELL
            # is ~83% padding there; K=2 measured 0.93M vs 0.54M edges/s on
            # the bm GAT bench (perf-only knob, grads oracle-tested)
            ell_K=2 if args.conv == "GAT" else 8,
        )
    else:
        # the reference arxiv flagship config (README.md:19-22), live VQ
        cfg = Config(
            dataset="arxiv",
            conv_type=args.conv,
            num_layers=3,
            hidden_channels=128,
            num_D=4,
            num_M=256,
            sampler_type="cluster",
            num_parts=80,
            batch_size=40,
            test_batch_size=n,
            vq_update_mode="live",
            lr=0.01,
            warm_up=True,
            warm_up_epochs=5,
            skip=True,
            matmul_precision="default",
            vq_backend="auto",
        )

    t0 = time.time()
    try:
        res = parity_gap(
            graph_fn,
            cfg,
            epochs=args.epochs,
            eval_every=args.eval_every,
            exact_epochs=args.exact_epochs,
            verbose=True,
            vq_diag_path=args.diag_log,
            exact_lr=args.exact_lr,
            arms=args.arms,
            segment_dir=args.segment_dir,
        )
    except Exception as e:
        from vq_gnn_tpu.train.segment import SegmentRestart, reexec, rss_mb

        if isinstance(e, SegmentRestart):
            print(
                f"[segment] rss {rss_mb():.0f}MB at epoch {e.epoch} — "
                f"re-exec to release tunnel transfer retention",
                flush=True,
            )
            reexec()  # does not return
        raise
    dt = time.time() - t0
    src = "real ogbn-arxiv" if os.path.exists(real) else f"synthetic SBM N={n}"

    print(f"\n== parity @ {src}, {args.conv}, {args.epochs} epochs, {dt:.0f}s ==")
    print(f"{'':16s}{'best valid':>12s}{'test@best':>12s}{'final test':>12s}")
    for k in ("exact", "exact_mb", "vq"):
        r = res.get(k)
        if r is None or k not in res:
            continue
        print(
            f"{k:16s}{r['best_valid']:>12.4f}{r['test_at_best_valid']:>12.4f}"
            f"{r['final_test']:>12.4f}"
        )
    print(f"gap (exact - vq): {res['gap']:+.4f}")
    if res.get("exact_mb") is not None:
        print(f"gap (exact_mb - vq): {res['gap_mb']:+.4f}")
    if os.path.exists(real):
        # real-data golden gate (REAL_DATA.md step 3): OGB full-graph GCN on
        # ogbn-arxiv ~71.7%, VQ-GNN parity claim ~1% -> floor 0.70
        floor = float(os.environ.get("VQ_GNN_REAL_MIN_ACC", "0.70"))
        ok = res["vq"]["test_at_best_valid"] >= floor
        print(
            f"real-data gate (vq test >= {floor:.2f}): "
            f"{'PASS' if ok else 'FAIL'}"
        )
    print(
        json.dumps(
            {
                "experiment": "vq_vs_exact_parity",
                "source": src,
                "conv": args.conv,
                "formulation": args.formulation,
                "epochs": args.epochs,
                "exact_test": None
                if res["exact"] is None
                else res["exact"]["test_at_best_valid"],
                "exact_mb_test": None
                if res.get("exact_mb") is None
                else res["exact_mb"]["test_at_best_valid"],
                "vq_test": None
                if res["vq"] is None
                else res["vq"]["test_at_best_valid"],
                "gap": res["gap"],
                "gap_mb": res.get("gap_mb"),
                "seconds": round(dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
