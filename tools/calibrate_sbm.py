"""Calibrate the arxiv-scale SBM difficulty (round-3 verdict task #1).

Trains ONLY the exact full-graph control arm for candidate
(informative_dims, feature_noise) settings and prints the landing accuracy.
Goal: exact lands 70-85% so the VQ-vs-exact parity gap is measured below the
ceiling (the round-2 table saturated at 99.6%).

    python tools/calibrate_sbm.py --nodes 40000 --epochs 40 \
        --settings 16:4.0 16:6.0 8:4.0
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (jax before torch/sklearn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--conv", default="GCN")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--settings", nargs="+", default=["16:4.0", "16:6.0", "8:4.0"],
        help="informative_dims:feature_noise pairs",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import synthetic_sbm
    from vq_gnn_tpu.train.parity import exact_config, train_to_acc

    for s in args.settings:
        dims, noise = s.split(":")
        dims, noise = int(dims), float(noise)

        def graph_fn():
            return synthetic_sbm(
                num_nodes=args.nodes,
                num_classes=40,
                num_features=128,
                avg_degree=13.7,
                homophily=0.7,
                feature_noise=noise,
                informative_dims=dims,
                seed=7,
            )

        cfg = exact_config(
            Config(
                dataset="arxiv",
                conv_type=args.conv,
                num_layers=3,
                hidden_channels=128,
                num_D=4,
                num_M=256,
                sampler_type="cluster",
                num_parts=80,
                batch_size=40,
                test_batch_size=args.nodes,
                lr=0.01,
                skip=True,
                matmul_precision="default",
                vq_backend="auto",
            ),
            args.nodes,
        )
        t0 = time.time()
        res = train_to_acc(graph_fn, cfg, epochs=args.epochs, eval_every=5)
        print(
            f"dims={dims:3d} noise={noise:4.1f}: exact test@best "
            f"{res['test_at_best_valid']:.4f} (best valid "
            f"{res['best_valid']:.4f}) [{time.time() - t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
