"""vq_gnn_tpu — a TPU-native framework for scaling GNNs with vector quantization.

Re-implements the capabilities of the VQ-GNN reference (NeurIPS 2021,
arXiv:2110.14363) as an idiomatic JAX/XLA/Pallas stack:

- ``graph``    host-side graph store, normalization, partitioning
- ``ops``      compute kernels (SpMM, GAT edge attention, VQ assignment)
- ``nn``       functional VQ state machine + LowRankGNN model
- ``sampler``  static-shape padded mini-batch pipelines
- ``train``    jitted train/eval steps, trainers, optimizers
- ``parallel`` device-mesh sharding utilities
"""

from vq_gnn_tpu.config import Config

__version__ = "0.1.0"
__all__ = ["Config", "__version__"]
