"""Host-RSS probe for the long-run transfer leak (round-4 gap #0 /
verdict round-5 task 2).

Repeatedly transfers fresh batch-sized host arrays to the device (the
training loop's per-batch pattern: jax.tree.map(jnp.asarray, batch)) and
runs a trivial jitted consumer, printing host RSS every few iterations.
Variants isolate which part leaks:

  transfer   fresh numpy -> jnp.asarray -> jitted add -> float() -> drop
  reuse      same numpy buffers re-transferred (rules out numpy alloc)
  noxfer     jitted step on device-resident arrays only (control)

Usage: python tools/leak_probe.py [iters] [variant]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    variant = sys.argv[2] if len(sys.argv) > 2 else "transfer"
    # ~30 MB of mixed arrays per "batch", mirroring a PaddedBatch transfer
    shapes = [
        ((86016, 8), np.int32),
        ((86016, 8), np.float32),
        ((264192, 8), np.int32),
        ((264192,), np.float32),
        ((86016, 128), np.float32),
    ]
    nbytes = sum(np.prod(s) * np.dtype(d).itemsize for s, d in shapes)
    print(f"variant={variant} iters={iters} bytes/iter={nbytes/1e6:.1f}MB", flush=True)

    @jax.jit
    def step(args):
        return sum(jnp.sum(a.astype(jnp.float32)) for a in args)

    fixed_np = [np.ones(s, d) for s, d in shapes]
    dev = [jnp.asarray(a) for a in fixed_np]
    float(step(dev))  # compile
    print(f"iter 0 rss={rss_mb():.1f}MB", flush=True)
    t0 = time.time()
    for i in range(1, iters + 1):
        if variant == "noxfer":
            args = dev
        elif variant == "reuse":
            args = [jnp.asarray(a) for a in fixed_np]
        else:  # transfer: fresh numpy each time, like a new batch
            args = [np.random.default_rng(i).integers(0, 2, s).astype(d)
                    if np.issubdtype(d, np.integer) else
                    np.random.default_rng(i).random(s, np.float32)
                    for s, d in shapes]
            args = [jnp.asarray(a) for a in args]
        float(step(args))
        del args
        if i % 10 == 0:
            print(f"iter {i} rss={rss_mb():.1f}MB t={time.time()-t0:.1f}s", flush=True)
    print(f"final rss={rss_mb():.1f}MB", flush=True)


if __name__ == "__main__":
    main()
