from vq_gnn_tpu.nn.vq import VQParams, VQState, init_vq_state, feature_update, vq_update, lookup

__all__ = [
    "VQParams",
    "VQState",
    "init_vq_state",
    "feature_update",
    "vq_update",
    "lookup",
]
