from vq_gnn_tpu.sampler.batch import PaddedBatch, build_padded_batch
from vq_gnn_tpu.sampler.samplers import BatchLoader

__all__ = ["PaddedBatch", "build_padded_batch", "BatchLoader"]
