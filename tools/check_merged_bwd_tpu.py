"""TPU compile/parity/timing check for the merged-gather GAT backward
(C=128, the driver workload width) — fused merged vs unfused XLA.

    python tools/check_merged_bwd_tpu.py [bf16]
"""

import importlib
import os
import sys
import time

import jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tools.check_fused_tpu import build  # noqa: E402


def run(fused, dtype):
    os.environ["VQ_GNN_ELL_FUSED"] = "auto" if fused else "off"
    gat_mod = importlib.import_module("vq_gnn_tpu.ops.gat")

    num_rows, E, K, C = 120_000, 1_500_000, 8, 128
    edges, x = build(num_rows, E, K, C, 0)
    x = x.astype(dtype)
    rng = np.random.default_rng(3)
    att_l = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.05)
    att_r = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.05)
    scale = jnp.float32(1.3)

    @jax.jit
    def gat(x, att_l, att_r):
        def loss(x, att_l, att_r):
            agg, rs = gat_mod.gat_conv_ell(edges, x, att_l, att_r, scale)
            y = agg / (rs + 1e-16)
            return jnp.sum(y * jnp.cos(jnp.arange(C)[None, :])), (agg, rs)

        (l, (agg, rs)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True
        )(x, att_l, att_r)
        return l, agg, rs, *grads

    res = jax.block_until_ready(gat(x, att_l, att_r))
    n, t0 = 10, time.perf_counter()
    for _ in range(n):
        r = gat(x, att_l, att_r)
    jax.block_until_ready(r)
    print(
        f"gat C=128 {dtype.__name__:8s} {'fused-merged' if fused else 'xla  '}: "
        f"{(time.perf_counter() - t0) / n * 1e3:.2f} ms",
        file=sys.stderr, flush=True,
    )
    return res


if __name__ == "__main__":
    dtype = jnp.bfloat16 if "bf16" in sys.argv[1:] else jnp.float32
    r1 = run(fused=False, dtype=dtype)
    r0 = run(fused=True, dtype=dtype)
    for i, (a, b) in enumerate(zip(r0, r1)):
        print(
            f"out[{i}] maxdiff:",
            float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
            "scale:", float(jnp.max(jnp.abs(b.astype(jnp.float32)))),
        )
