"""VQ assignment primitives: nearest-codeword search + cluster statistics.

Reference hot loop (``vq_gnn_v2/vq.py:229-256``): dense distance GEMM
``[B, K] x [K, M]`` + argmin, then a one-hot GEMM for per-cluster sums.  Both
map straight onto the MXU; masked variants handle padded batch rows.  A fused
Pallas kernel (distance -> argmin -> stats in one VMEM pass) can be slotted in
behind the same interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Assignments and EMA statistics always run at exact-f32 precision, even when
# the model path uses single-pass bf16 MXU matmuls: wrong nearest-codeword
# argmins corrupt c_indices state, and the EMA divides by small cluster sizes.
_EXACT = jax.lax.Precision.HIGHEST


def nearest_codeword(
    xn: jnp.ndarray, emb: jnp.ndarray, fast: bool = False
) -> jnp.ndarray:
    """argmin_m ||xn_b - emb_m||^2 via the expanded-square distance GEMM.

    xn: [B, K], emb: [M, K] -> [B] int32.  ``fast`` streams the [B, M]
    distance matrix in bf16 (halves the argmin's HBM traffic — profiled at
    ~22ms/step f32 at B=85k); near-tie assignments may flip, so parity modes
    keep f32.
    """
    if fast:
        d = jnp.sum(emb**2, axis=1)[None, :].astype(jnp.bfloat16) - 2.0 * jnp.dot(
            xn, emb.T, preferred_element_type=jnp.bfloat16
        )
        return jnp.argmin(d, axis=1).astype(jnp.int32)
    d = (
        jnp.sum(xn**2, axis=1, keepdims=True)
        + jnp.sum(emb**2, axis=1)[None, :]
        - 2.0 * jnp.dot(
            xn, emb.T, preferred_element_type=jnp.float32, precision=_EXACT
        )
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def assignment_stats(
    xn: jnp.ndarray, idx: jnp.ndarray, num_M: int, valid=None, fast: bool = False
):
    """Per-cluster (counts [M], sums [M, K]) via a one-hot GEMM (MXU).

    Measured on TPU v5e this beats the segment-sum formulation ~2x at
    B=85k/M=256 despite materializing the [B, M] one-hot: the MXU streams,
    scatters serialize.  Padded rows (``valid == False``) contribute nothing.

    ``fast`` streams the one-hot (and the xn operand) in bf16: 0/1 and the
    validity mask are exact in bf16 and accumulation stays f32, so the only
    approximation is bf16 rounding of xn entries in the cluster sums
    (~1e-3 relative), which the 0.01-per-step EMA smooths away.  Halves the
    HBM round-trip of the [B, M] one-hot — the dominant cost at B~85k.
    """
    stream = jnp.bfloat16 if fast else xn.dtype
    onehot = (idx[:, None] == jnp.arange(num_M, dtype=jnp.int32)[None, :]).astype(
        stream
    )
    if valid is not None:
        onehot = onehot * valid.astype(stream)[:, None]
    counts = jnp.sum(onehot, axis=0, dtype=jnp.float32)
    sums = jnp.dot(
        onehot.T,
        xn.astype(stream),
        preferred_element_type=jnp.float32,
        precision=None if fast else _EXACT,
    )
    return counts, sums.astype(jnp.float32)


def assign_stats_scan(
    xn: jnp.ndarray, emb: jnp.ndarray, valid=None, chunk: int = 8192
):
    """Fused assignment + stats via lax.scan over row chunks.

    Avoids materializing the [B, M] distance and one-hot matrices in HBM
    (the XLA lowering's main cost at B~85k): each iteration's [chunk, M]
    tiles live only inside the loop body, and (counts, sums) accumulate in
    the carry.  Pure XLA — the same fusion the Pallas kernel targets.
    """
    B, K = xn.shape
    M = emb.shape[0]
    n_chunks = -(-B // chunk)
    B_pad = n_chunks * chunk
    if valid is None:
        valid = jnp.ones(B, dtype=bool)
    if B_pad != B:
        xn = jnp.pad(xn, ((0, B_pad - B), (0, 0)))
        valid = jnp.pad(valid, (0, B_pad - B))
    xc = xn.reshape(n_chunks, chunk, K)
    vc = valid.reshape(n_chunks, chunk).astype(xn.dtype)
    e2 = jnp.sum(emb * emb, axis=1)[None, :]
    col = jnp.arange(M, dtype=jnp.int32)[None, :]

    def body(carry, inp):
        counts, sums = carry
        x, v = inp
        # ||x||^2 is per-row constant: argmin unaffected, skip it
        d = e2 - 2.0 * jnp.dot(
            x, emb.T, preferred_element_type=jnp.float32, precision=_EXACT
        )
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        onehot = (idx[:, None] == col).astype(x.dtype) * v[:, None]
        counts = counts + jnp.sum(onehot, axis=0)
        sums = sums + jax.lax.dot_general(
            onehot,
            x,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_EXACT,
        )
        return (counts, sums), idx

    (counts, sums), idxs = jax.lax.scan(
        body,
        (jnp.zeros(M, jnp.float32), jnp.zeros((M, K), jnp.float32)),
        (xc, vc),
    )
    return idxs.reshape(B_pad)[:B], counts, sums


def masked_mean_var(x: jnp.ndarray, valid=None, ddof: int = 0):
    """Column mean/variance over valid rows. Matches torch semantics:
    ddof=0 (biased) for BatchNorm normalization, ddof=1 (unbiased) for
    running-stat updates and seeding (``vq.py:208-220``)."""
    if valid is None:
        n = jnp.float32(x.shape[0])
        mean = jnp.mean(x, axis=0)
        var = jnp.sum((x - mean[None, :]) ** 2, axis=0) / jnp.maximum(n - ddof, 1.0)
        return mean, var
    v = valid.astype(x.dtype)[:, None]
    n = jnp.maximum(jnp.sum(v), 1.0)
    mean = jnp.sum(x * v, axis=0) / n
    var = jnp.sum(((x - mean[None, :]) ** 2) * v, axis=0) / jnp.maximum(n - ddof, 1.0)
    return mean, var
