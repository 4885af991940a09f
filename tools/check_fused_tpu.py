"""TPU smoke/parity check for the fused ELL aggregate kernel.

Runs the slot-ELL GCN spmm and the fused GAT conv (fwd + grads) twice —
fused kernel vs unfused XLA path (VQ_GNN_ELL_FUSED toggled via reload) —
and prints max deviations + timings.
"""

import importlib
import os
import sys
import time

import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def build(num_rows, E, K, C, seed):
    spmm_mod = importlib.import_module("vq_gnn_tpu.ops.spmm")

    rng = np.random.default_rng(seed)
    row = np.sort(rng.integers(0, num_rows, E))
    col = rng.integers(0, num_rows, E)
    val = (np.abs(rng.standard_normal(E)) + 0.05).astype(np.float32) * 0.1
    er, ec, evl = spmm_mod.build_ell_host(row, col, val, num_rows, K)
    S = len(er)
    S_pad = ((S + 511) // 512) * 512
    er = np.concatenate([er, np.full(S_pad - S, num_rows, np.int32)])
    ec = np.concatenate([ec, np.full((S_pad - S, K), num_rows, np.int32)])
    evl = np.concatenate([evl, np.zeros((S_pad - S, K), np.float32)])
    # transposed layout for the backward
    tr, tc, tv = spmm_mod.build_ell_host(
        np.sort(col), row[np.argsort(col, kind="stable")],
        val[np.argsort(col, kind="stable")], num_rows, K,
    )
    St = len(tr)
    St_pad = ((St + 511) // 512) * 512
    tr = np.concatenate([tr, np.full(St_pad - St, num_rows, np.int32)])
    tc = np.concatenate([tc, np.full((St_pad - St, K), num_rows, np.int32)])
    tv = np.concatenate([tv, np.zeros((St_pad - St, K), np.float32)])
    edges = spmm_mod.Edges(
        ell_row=jnp.asarray(er), ell_col=jnp.asarray(ec), ell_val=jnp.asarray(evl),
        t_ell_row=jnp.asarray(tr), t_ell_col=jnp.asarray(tc),
        t_ell_val=jnp.asarray(tv),
        num_rows=num_rows, dense_rows=True,
    )
    x = jnp.asarray(rng.standard_normal((num_rows, C)).astype(np.float32))
    return edges, x


def run(fused):
    os.environ["VQ_GNN_ELL_FUSED"] = "auto" if fused else "off"
    spmm_mod = importlib.import_module("vq_gnn_tpu.ops.spmm")
    gat_mod = importlib.import_module("vq_gnn_tpu.ops.gat")

    num_rows, E, K, C = 120_000, 1_500_000, 8, 256
    edges, x = build(num_rows, E, K, C, 0)
    rng = np.random.default_rng(3)
    att_l = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.05)
    att_r = jnp.asarray(rng.standard_normal(C + 1).astype(np.float32) * 0.05)
    scale = jnp.float32(1.3)

    @jax.jit
    def gcn(x):
        return spmm_mod.spmm(edges, x)

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

    out_g = jax.block_until_ready(gcn(x))
    res = jax.block_until_ready(gat(x, att_l, att_r))

    for name, fn, args in (("gcn", gcn, (x,)), ("gat", gat, (x, att_l, att_r))):
        n, t0 = 10, time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        print(f"{name} {'fused' if fused else 'xla  '}: "
              f"{(time.perf_counter() - t0) / n * 1e3:.2f} ms", file=sys.stderr)
    return out_g, res


if __name__ == "__main__":
    g1, r1 = run(fused=False)
    g0, r0 = run(fused=True)
    print("gcn maxdiff:", float(jnp.max(jnp.abs(g0 - g1))))
    for i, (a, b) in enumerate(zip(r0, r1)):
        print(f"gat out[{i}] maxdiff:", float(jnp.max(jnp.abs(a - b))),
              "scale:", float(jnp.max(jnp.abs(b))))
