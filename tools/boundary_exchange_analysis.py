"""Quantify the multi-host boundary-exchange tradeoff (bytes/step).

The multi-host design (``parallel/multihost.py``) replaces cross-host B'
feature traffic with replicated codebooks: out-of-partition neighbors read
replicated codewords, and the only recurring DCN traffic is the psum of the
VQ EMA statistics (plus parameter-gradient psums that any DDP design pays).
The alternative — SURVEY §2.3's "boundary exchange" via ragged_all_to_all —
ships exact B' features forward and their gradients back every step.

This tool measures both on an actually partitioned graph: it partitions an
arxiv-scale SBM over H hosts with the same multilevel partitioner the
cluster sampler uses, builds each host's cluster batch, counts how many of
its B' boundary nodes live on remote hosts, and prints bytes/step for
(a) codebook replication (EMA psum) and (b) exact feature exchange
(forward features + backward gradients, per layer).  Host-side only — no
TPU needed.  Results -> BASELINE.md "Boundary exchange" table.

Usage: python tools/boundary_exchange_analysis.py [--nodes 169343] [--hosts 8]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--num-M", type=int, default=256)
    ap.add_argument("--num-D", type=int, default=4)
    ap.add_argument("--parts-per-host", type=int, default=10)
    ap.add_argument("--batch-parts", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
    from vq_gnn_tpu.graph.partition import (
        cluster_indices_from_ptr,
        partition_graph,
        permute_graph,
    )
    from vq_gnn_tpu.sampler.samplers import BatchLoader

    g, c = synthetic_sbm(
        num_nodes=args.nodes, num_classes=40, num_features=args.hidden,
        avg_degree=13.7, seed=0,
    )

    # host partition first (locality level 1), then per-host cluster parts
    # (level 2) — exactly the multihost layout (multihost.py:partition_hosts)
    from vq_gnn_tpu.graph.store import symmetrize

    g.adj = symmetrize(g.adj)
    perm, ptr = partition_graph(g.adj, args.hosts)
    g = permute_graph(g, perm)
    host_of = np.zeros(g.num_nodes, np.int32)
    for h in range(args.hosts):
        host_of[ptr[h] : ptr[h + 1]] = h

    cfg = Config(
        dataset="synthetic", conv_type="GCN", num_layers=args.layers,
        hidden_channels=args.hidden, num_D=args.num_D, num_M=args.num_M,
        sampler_type="cluster", num_parts=args.parts_per_host,
        batch_size=args.batch_parts, test_batch_size=args.nodes,
    )

    nb = args.hidden // args.num_D
    K = 2 * args.num_D
    # per-step EMA psum payload: counts [nb, M] + sums [nb, M, K] per layer
    # (the BN batch stats add nb*4*D more floats — negligible)
    ema_floats = args.layers * nb * args.num_M * (1 + K)
    ema_bytes = ema_floats * 4

    in_ch = args.hidden  # features padded to hidden width in the bench config
    rows = []
    tot_bp = tot_remote = 0
    for h in range(args.hosts):
        lo, hi = int(ptr[h]), int(ptr[h + 1])
        sub = g.adj[lo:hi, :][:, lo:hi]

        class _G:  # minimal HostGraph view for the loader
            adj = sub
            x = g.x[lo:hi]
            y = g.y[lo:hi]
            train_mask = None
            val_mask = None
            test_mask = None
            num_nodes = hi - lo
            num_edges = sub.nnz
            num_features = g.x.shape[1]
            deg_inv = None

            def coo(self):
                coo = sub.tocoo()
                return coo.row, coo.col, coo.data

        # NOTE: host-local sampling sees only host-local edges; the REMOTE
        # B' count is what the exchange design would fetch, measured from the
        # full graph: neighbors of the batch outside [lo, hi).
        p2, ptr2 = partition_graph(sub, args.parts_per_host)
        order = np.argsort(p2, kind="stable")  # local perm inverse unused;
        ci = cluster_indices_from_ptr(ptr2)
        batch_parts = ci[: args.batch_parts]
        local_nodes = np.concatenate([np.asarray(p) for p in batch_parts])
        gnodes = p2[local_nodes] + lo  # global ids of this host's batch

        # full-graph 1-hop neighborhood of the batch (csr over global graph)
        indptr, indices = g.adj.indptr, g.adj.indices
        nbrs = np.concatenate(
            [indices[indptr[n] : indptr[n + 1]] for n in gnodes]
        )
        bset = np.zeros(g.num_nodes, bool)
        bset[gnodes] = True
        fo = np.unique(nbrs[~bset[nbrs]])  # B' = 1-hop outside the batch
        remote = fo[host_of[fo] != h]
        tot_bp += len(fo)
        tot_remote += len(remote)
        rows.append((h, len(gnodes), len(fo), len(remote)))

    # exchange bytes/step: remote B' feature rows forward + gradient rows
    # back, per layer (layer l>0 exchanges hidden-width rows)
    fexch = 0
    for h, B, bp, rem in rows:
        fexch += rem * in_ch * 4 * 2 * args.layers
    print(f"{'host':>4}{'B':>10}{'|B1hop|':>10}{'remote':>10}{'remote%':>9}")
    for h, B, bp, rem in rows:
        print(f"{h:>4}{B:>10}{bp:>10}{rem:>10}{100*rem/max(bp,1):>8.1f}%")
    print(
        f"\ncodebook replication (current design): EMA psum = "
        f"{ema_bytes/1e6:.2f} MB/step (independent of batch/graph size)"
    )
    print(
        f"exact B' feature exchange (alternative): "
        f"{fexch/1e6:.1f} MB/step over DCN "
        f"({tot_remote}/{tot_bp} boundary nodes remote, "
        f"{args.layers} layers, fwd+bwd, {in_ch} ch)"
    )
    print(f"ratio: {fexch/ema_bytes:.0f}x")


if __name__ == "__main__":
    main()
