"""TPU microbench: cotangent-gather layout candidates for the GAT backward.

The GAT fused backward currently issues TWO XLA row gathers per layer over
the transposed ELL cells (g_lo [N*K, C1] cotangent lanes + g_hi [N*K, W]
rowsum-cotangent/ar ride-along lanes) — STATUS.md names them the ~31 ms/step
bottleneck.  This measures the alternatives at the driver-workload shape
(St*K ~ 2.1M gathered rows, R = 120k source rows, C = 128):

  two_f32      g_lo f32 [R,128] + g_hi f32 [R,2]      (shipped round-2 path)
  one_f32_130  single f32 [R,130] source (pads to 256 lanes physically)
  one_f32_144  single f32 [R,144]
  two_bf16     both gathers from bf16 sources
  one_bf16_130 single bf16 [R,130]
  one_bf16_256 single bf16 [R,256] (2 bf16 per f32 lane budget)
  flat_elem    1-D element gather of N*K f32 (the t_from_f permutation)
  base_f32_128 single f32 [R,128] (lower bound: one row-gather)

Run:  python tools/gather_bench.py   (TPU; prints a ms table to stdout)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    R = 120_000
    NK = 2_100_224  # ~ driver workload St*K, multiple of 1024
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, NK).astype(np.int32))

    def src(w, dt):
        return jnp.asarray(rng.standard_normal((R, w)).astype(np.float32)).astype(dt)

    g128 = src(128, jnp.float32)
    g2 = src(2, jnp.float32)
    g130 = src(130, jnp.float32)
    g144 = src(144, jnp.float32)
    b128 = g128.astype(jnp.bfloat16)
    b2 = g2.astype(jnp.bfloat16)
    b130 = g130.astype(jnp.bfloat16)
    b256 = src(256, jnp.bfloat16)
    flat = src(1, jnp.float32)[:, 0]

    # consume with a cheap reduce so nothing is DCE'd; include the reduce in
    # every variant so the comparison is gather-vs-gather
    @jax.jit
    def two_f32(i):
        a = jnp.take(g128, i, axis=0, mode="clip")
        b = jnp.take(g2, i, axis=0, mode="clip")
        return jnp.sum(a) + jnp.sum(b)

    @jax.jit
    def one_f32_130(i):
        return jnp.sum(jnp.take(g130, i, axis=0, mode="clip"))

    @jax.jit
    def one_f32_144(i):
        return jnp.sum(jnp.take(g144, i, axis=0, mode="clip"))

    @jax.jit
    def two_bf16(i):
        a = jnp.take(b128, i, axis=0, mode="clip")
        b = jnp.take(b2, i, axis=0, mode="clip")
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))

    @jax.jit
    def one_bf16_130(i):
        return jnp.sum(jnp.take(b130, i, axis=0, mode="clip").astype(jnp.float32))

    @jax.jit
    def one_bf16_256(i):
        return jnp.sum(jnp.take(b256, i, axis=0, mode="clip").astype(jnp.float32))

    @jax.jit
    def flat_elem(i):
        return jnp.sum(jnp.take(flat, i, mode="clip"))

    @jax.jit
    def base_f32_128(i):
        return jnp.sum(jnp.take(g128, i, axis=0, mode="clip"))

    print(f"platform={jax.default_backend()} R={R} NK={NK}", flush=True)
    for name, fn in [
        ("base_f32_128", base_f32_128),
        ("two_f32", two_f32),
        ("one_f32_130", one_f32_130),
        ("one_f32_144", one_f32_144),
        ("two_bf16", two_bf16),
        ("one_bf16_130", one_bf16_130),
        ("one_bf16_256", one_bf16_256),
        ("flat_elem", flat_elem),
    ]:
        print(f"{name:14s} {timeit(fn, idx):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
