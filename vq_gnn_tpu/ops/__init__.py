from vq_gnn_tpu.ops.spmm import Edges, spmm
from vq_gnn_tpu.ops.gat import gat_edge_values, gat_ell_values
from vq_gnn_tpu.ops.vq_ops import nearest_codeword, assignment_stats

__all__ = [
    "Edges",
    "spmm",
    "gat_edge_values",
    "gat_ell_values",
    "nearest_codeword",
    "assignment_stats",
]
