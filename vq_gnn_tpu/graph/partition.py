"""Graph partitioning for the cluster sampler.

The reference calls METIS through torch_sparse (``misc.py:93-112``) and then
permutes all node tensors so clusters are contiguous (``misc.py:114-130``).
We provide:

- ``partition_graph``: locality-preserving partitioning into ``num_parts``
  balanced contiguous parts.  Backends:
    * 'native' — C++ greedy BFS-grow partitioner (vq_gnn_tpu/native), best
      cut quality of the built-ins; used when the shared library is available.
    * 'rcm'    — reverse-Cuthill-McKee ordering + equal chunking (scipy);
      deterministic, fast, decent locality.
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

    if method in ("auto", "native"):
        try:
            from vq_gnn_tpu.native import lib as native_lib

            if native_lib.available():
                cluster = native_lib.partition(adj, num_parts)
                perm = np.argsort(cluster, kind="stable")
                counts = np.bincount(cluster, minlength=num_parts)
                ptr = np.concatenate([[0], np.cumsum(counts)])
                return perm.astype(np.int64), ptr.astype(np.int64)
        except ImportError:
            pass
        if method == "native":
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


def cluster_indices_from_ptr(ptr: np.ndarray):
    """Node-index lists per cluster after permutation (``misc.py:194-199``)."""
    return [np.arange(ptr[i], ptr[i + 1], dtype=np.int64) for i in range(len(ptr) - 1)]
