"""Gather-layout microbench ON THE REAL driver batch indices.

tools/gather_bench.py used uniform-random indices and mispredicted the real
step by large factors in both directions (locality + lane-width effects);
this builds the actual arxiv-profile cluster batch and times each candidate
of the GAT backward cotangent-transport design with the true t_ell_col /
t_from_f index arrays.

    python tools/gather_bench2.py        (TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
    from vq_gnn_tpu.sampler.samplers import BatchLoader

    cfg = Config(
        dataset="arxiv", conv_type="GAT", num_layers=3, hidden_channels=128,
        num_D=4, num_M=256, sampler_type="cluster", num_parts=80,
        batch_size=40, skip=True,
    )
    g, c = synthetic_sbm(
        num_nodes=169_343, num_classes=40, num_features=128,
        avg_degree=13.7, seed=0,
    )
    g, c, ci = prepare(g, cfg, c)
    loader = BatchLoader(g, cfg, train_flag=True, cluster_indices=ci)
    windows, _ = next(iter(loader))
    e = windows[0].edges
    R = e.num_rows
    St, K = e.t_ell_col.shape
    NK = St * K
    print(f"R={R} St={St} K={K} NK={NK}", flush=True)

    rng = np.random.default_rng(0)
    idx_t = e.t_ell_col.reshape(-1)  # [NK] cell-wise source rows (real)
    tff = e.t_from_f.reshape(-1)  # [NK] flat fwd positions (real)
    src128 = jnp.asarray(rng.standard_normal((R + 8, 128)).astype(np.float32))
    src2 = jnp.asarray(rng.standard_normal((R + 8, 2)).astype(np.float32))
    src130 = jnp.asarray(rng.standard_normal((R + 8, 130)).astype(np.float32))
    srcb130 = src130.astype(jnp.bfloat16)
    flat_ev = jnp.asarray(rng.standard_normal(NK + 1).astype(np.float32))
    vec = src2[:, 0]

    cases = {
        "row128_f32 (g_lo)": lambda: jnp.sum(
            jnp.take(src128, idx_t, axis=0, mode="clip")
        ),
        "row2_f32 (g_hi)": lambda: jnp.sum(
            jnp.take(src2, idx_t, axis=0, mode="clip")
        ),
        "row130_f32 (merged)": lambda: jnp.sum(
            jnp.take(src130, idx_t, axis=0, mode="clip")
        ),
        "row130_bf16 (merged)": lambda: jnp.sum(
            jnp.take(srcb130, idx_t, axis=0, mode="clip").astype(jnp.float32)
        ),
        "row128_bf16": lambda: jnp.sum(
            jnp.take(src128.astype(jnp.bfloat16), idx_t, axis=0, mode="clip")
            .astype(jnp.float32)
        ),
        "flat_permute (ev via t_from_f)": lambda: jnp.sum(
            jnp.take(flat_ev, tff, mode="fill", fill_value=0.0)
        ),
        "elem_gather (g_rs via t_ell_col)": lambda: jnp.sum(
            jnp.take(vec, idx_t, mode="clip")
        ),
    }
    for name, fn in cases.items():
        jfn = jax.jit(fn)
        print(f"{name:34s} {timeit(jfn):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
