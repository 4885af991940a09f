from vq_gnn_tpu.native import lib

__all__ = ["lib"]
