from vq_gnn_tpu.graph.store import HostGraph, norm_adj, symmetrize
from vq_gnn_tpu.graph.partition import partition_graph, permute_graph

__all__ = ["HostGraph", "norm_adj", "symmetrize", "partition_graph", "permute_graph"]
