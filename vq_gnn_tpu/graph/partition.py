"""Graph partitioning for the cluster sampler.

The reference calls METIS through torch_sparse (``misc.py:93-112``) and then
permutes all node tensors so clusters are contiguous (``misc.py:114-130``).
We provide:

- ``partition_graph``: locality-preserving partitioning into ``num_parts``
  balanced contiguous parts.  Backends:
    * 'ml' / 'native' — C++ multilevel partitioner (METIS-style heavy-edge
      matching coarsening + BFS-grow + boundary refinement); the default
      when the shared library is available, and by far the best cut.
    * 'bfs'    — C++ single-level greedy BFS-grow (the old native method).
    * 'rcm'    — reverse-Cuthill-McKee ordering + equal chunking (scipy);
      deterministic fallback without the native library.
- ``permute_graph``: reorder all node tensors + adjacency by a permutation.

Returns (perm, ptr) with the reference's contract: ``perm`` sorts nodes by
cluster id, ``ptr[k]:ptr[k+1]`` are the node positions of cluster k.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from vq_gnn_tpu.graph.store import HostGraph


def _balanced_ptr(num_nodes: int, num_parts: int) -> np.ndarray:
    sizes = np.full(num_parts, num_nodes // num_parts, dtype=np.int64)
    sizes[: num_nodes % num_parts] += 1
    return np.concatenate([[0], np.cumsum(sizes)])


def partition_graph(
    adj: sp.csr_matrix, num_parts: int, method: str = "auto"
) -> Tuple[np.ndarray, np.ndarray]:
    num_nodes = adj.shape[0]
    if num_parts <= 1:
        return np.arange(num_nodes), np.array([0, num_nodes], dtype=np.int64)

    if method in ("auto", "native", "ml", "bfs"):
        try:
            from vq_gnn_tpu.native import lib as native_lib

            if native_lib.available():
                sym = adj.maximum(adj.T).tocsr()
                cluster = native_lib.partition(
                    sym, num_parts, method="bfs" if method == "bfs" else "ml"
                )
                perm = np.argsort(cluster, kind="stable")
                counts = np.bincount(cluster, minlength=num_parts)
                ptr = np.concatenate([[0], np.cumsum(counts)])
                return perm.astype(np.int64), ptr.astype(np.int64)
        except ImportError:
            pass
        if method != "auto":
            raise RuntimeError("native partitioner not available")

    # RCM gives a bandwidth-minimizing ordering; equal chunks of it are
    # contiguous low-cut clusters on mesh-like graphs.
    sym = adj.maximum(adj.T).tocsr()
    order = np.asarray(reverse_cuthill_mckee(sym, symmetric_mode=True), dtype=np.int64)
    ptr = _balanced_ptr(num_nodes, num_parts)
    return order, ptr


def permute_graph(graph: HostGraph, perm: np.ndarray) -> HostGraph:
    """Reorder node tensors and adjacency so perm[i] becomes node i
    (reference ``permute``, ``misc.py:114-130``)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))

    adj = graph.adj.tocoo()
    new_adj = sp.csr_matrix(
        (adj.data, (inv[adj.row], inv[adj.col])), shape=adj.shape
    )

    def _p(a):
        return None if a is None else np.asarray(a)[perm]

    return HostGraph(
        adj=new_adj,
        x=graph.x[perm],
        y=_p(graph.y),
        train_mask=_p(graph.train_mask),
        val_mask=_p(graph.val_mask),
        test_mask=_p(graph.test_mask),
        deg=_p(graph.deg),
        deg_inv=_p(graph.deg_inv),
    )


def cluster_labels(
    num_nodes: int, perm: np.ndarray, ptr: np.ndarray
) -> np.ndarray:
    """Per-node (pre-permutation numbering) cluster id from a (perm, ptr)."""
    labels_new = np.searchsorted(ptr, np.arange(num_nodes), side="right") - 1
    labels = np.empty(num_nodes, dtype=np.int64)
    labels[perm] = labels_new
    return labels


def edge_cut_stats(adj: sp.spmatrix, labels: np.ndarray) -> dict:
    """Partition quality: edge-cut fraction + the reference's only partition
    signal, the inter/intra cluster edge ratio (``dataloader.py v2:29-35``
    prints ``(total - intra) / intra``)."""
    coo = adj.tocoo()
    total = coo.nnz
    intra = int(np.count_nonzero(labels[coo.row] == labels[coo.col]))
    inter = total - intra
    return {
        "num_edges": total,
        "intra_edges": intra,
        "inter_edges": inter,
        "cut_fraction": inter / max(total, 1),
        "inter_over_intra": inter / max(intra, 1),
    }


def labels_from_cluster_indices(num_nodes: int, cluster_indices) -> np.ndarray:
    labels = np.full(num_nodes, -1, dtype=np.int64)
    for k, ids in enumerate(cluster_indices):
        labels[np.asarray(ids)] = k
    return labels


def cluster_indices_from_ptr(ptr: np.ndarray):
    """Node-index lists per cluster after permutation (``misc.py:194-199``)."""
    return [np.arange(ptr[i], ptr[i + 1], dtype=np.int64) for i in range(len(ptr) - 1)]
