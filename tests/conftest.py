"""Test configuration: force an 8-device virtual CPU mesh.

This environment registers a TPU PJRT plugin at interpreter startup
(sitecustomize) that overrides JAX_PLATFORMS, so we must switch platforms via
jax.config *after* import.  Tests run on CPU for exact float32 math and an
8-device mesh; set VQ_GNN_TEST_TPU=1 to run on the real chip instead.

Import order note: always import jax before torch in this image — importing
torch first deadlocks jax's first computation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("VQ_GNN_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls everywhere (TPU would otherwise use bf16 MXU passes)
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
