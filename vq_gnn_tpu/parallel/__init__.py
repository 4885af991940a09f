from vq_gnn_tpu.parallel.mesh import make_mesh, shard_train_inputs

__all__ = ["make_mesh", "shard_train_inputs"]
