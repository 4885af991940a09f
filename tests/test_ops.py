"""Kernel-layer unit tests: SpMM (+VJP) and GAT edge values vs dense refs."""

import numpy as np
import jax
import jax.numpy as jnp

from vq_gnn_tpu.ops.spmm import make_edges, spmm
from vq_gnn_tpu.ops.gat import attention_logits, explosion_scale, gat_edge_values


def random_coo(rng, n_rows, n_cols, nnz):
    row = rng.randint(0, n_rows, nnz).astype(np.int32)
    col = rng.randint(0, n_cols, nnz).astype(np.int32)
    val = rng.randn(nnz).astype(np.float32)
    return row, col, val


def dense_of(row, col, val, n_rows, n_cols):
    A = np.zeros((n_rows, n_cols), np.float32)
    np.add.at(A, (row, col), val)
    return A


def test_spmm_matches_dense():
    rng = np.random.RandomState(0)
    n, m, nnz, d = 50, 40, 300, 16
    row, col, val = random_coo(rng, n, m, nnz)
    x = rng.randn(m, d).astype(np.float32)
    edges = make_edges(row, col, val, n)
    out = spmm(edges, jnp.asarray(x))
    expected = dense_of(row, col, val, n, m) @ x
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_spmm_padding_sentinels():
    rng = np.random.RandomState(1)
    n, nnz, d = 30, 100, 8
    row, col, val = random_coo(rng, n, n, nnz)
    x = rng.randn(n, d).astype(np.float32)
    # pad with sentinel edges row=col=n, val=0
    PAD = 17
    rowp = np.concatenate([row, np.full(PAD, n, np.int32)])
    colp = np.concatenate([col, np.full(PAD, n, np.int32)])
    valp = np.concatenate([val, np.zeros(PAD, np.float32)])
    out = spmm(make_edges(rowp, colp, valp, n), jnp.asarray(x))
    ref = spmm(make_edges(row, col, val, n), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_spmm_vjp_dx_and_dval():
    rng = np.random.RandomState(2)
    n, m, nnz, d = 20, 25, 120, 4
    row, col, val = random_coo(rng, n, m, nnz)
    x = rng.randn(m, d).astype(np.float32)
    edges = make_edges(row, col, val, n)
    A = dense_of(np.asarray(edges.row), np.asarray(edges.col), np.asarray(edges.val), n, m)

    def f_x(xx):
        return jnp.sum(spmm(edges, xx) ** 2)

    gx = jax.grad(f_x)(jnp.asarray(x))
    out = A @ x
    expected_gx = A.T @ (2 * out)
    np.testing.assert_allclose(np.asarray(gx), expected_gx, rtol=1e-4, atol=1e-4)

    def f_v(v):
        e = edges.replace(val=v)
        return jnp.sum(spmm(e, jnp.asarray(x)) ** 2)

    gv = jax.grad(f_v)(edges.val)
    g_out = 2 * out
    expected_gv = np.sum(
        g_out[np.asarray(edges.row)] * x[np.asarray(edges.col)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(gv), expected_gv, rtol=1e-4, atol=1e-4)


def test_spmm_without_tperm():
    rng = np.random.RandomState(3)
    n, nnz, d = 15, 60, 4
    row, col, val = random_coo(rng, n, n, nnz)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    e1 = make_edges(row, col, val, n, with_transpose=True)
    e2 = make_edges(row, col, val, n, with_transpose=False)
    g1 = jax.grad(lambda xx: jnp.sum(spmm(e1, xx) ** 3))(x)
    g2 = jax.grad(lambda xx: jnp.sum(spmm(e2, xx) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def make_ell_edges(row, col, val, n, K=4):
    from vq_gnn_tpu.ops.spmm import Edges, build_ell_host

    order = np.argsort(row, kind="stable")
    r, c, v = row[order], col[order], val[order]
    er, ec, ev = build_ell_host(r, c, v, n, K)
    to = np.argsort(c, kind="stable")
    tr, tc, tv = build_ell_host(c[to], r[to], v[to], n, K)
    return Edges(
        ell_row=jnp.asarray(er),
        ell_col=jnp.asarray(ec),
        ell_val=jnp.asarray(ev),
        t_ell_row=jnp.asarray(tr),
        t_ell_col=jnp.asarray(tc),
        t_ell_val=jnp.asarray(tv),
        num_rows=n,
    )


def test_ell_spmm_matches_coo():
    rng = np.random.RandomState(7)
    n, nnz, d = 40, 250, 8
    row, col, val = random_coo(rng, n, n, nnz)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    coo = make_edges(row, col, val, n)
    ell = make_ell_edges(row, col, val, n, K=4)
    np.testing.assert_allclose(
        np.asarray(spmm(ell, x)), np.asarray(spmm(coo, x)), rtol=1e-5, atol=1e-5
    )


def test_ell_spmm_vjp():
    rng = np.random.RandomState(8)
    n, nnz, d = 30, 150, 4
    row, col, val = random_coo(rng, n, n, nnz)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    coo = make_edges(row, col, val, n)
    ell = make_ell_edges(row, col, val, n, K=4)

    g1 = jax.grad(lambda xx: jnp.sum(spmm(coo, xx) ** 3))(x)
    g2 = jax.grad(lambda xx: jnp.sum(spmm(ell, xx) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)

    # d ell_val (the GAT path): compare against COO dval via the slot mapping
    def f_ell(v):
        return jnp.sum(spmm(ell.replace(ell_val=v), x) ** 2)

    gv_ell = np.asarray(jax.grad(f_ell)(ell.ell_val))

    def f_coo(v):
        return jnp.sum(spmm(coo.replace(val=v), x) ** 2)

    gv_coo = np.asarray(jax.grad(f_coo)(coo.val))
    # rebuild the slot layout from the COO dval and compare (real slots only)
    from vq_gnn_tpu.ops.spmm import build_ell_host

    er, ec, emap = build_ell_host(
        np.asarray(coo.row), np.asarray(coo.col), gv_coo, n, 4
    )
    mask = np.asarray(ell.ell_val) != 0
    np.testing.assert_allclose(gv_ell[mask], emap[mask], rtol=1e-4, atol=1e-4)


def test_gat_edge_values_dense():
    """exp(leaky_relu(a_l[src] + a_r[dst])) * A_val, with the explosion scale."""
    rng = np.random.RandomState(4)
    n, nnz, c = 12, 40, 5
    row, col, val = random_coo(rng, n, n, nnz)
    val = np.abs(val)
    x = rng.randn(n, c).astype(np.float32)
    att_l = rng.randn(c).astype(np.float32)
    att_r = rng.randn(c).astype(np.float32)

    al, ar = attention_logits(jnp.asarray(x), jnp.asarray(att_l), jnp.asarray(att_r))
    scale = explosion_scale(al, ar)
    ev = gat_edge_values(
        jnp.asarray(row), jnp.asarray(col), jnp.asarray(val), al / scale, ar / scale
    )

    al_np, ar_np = x @ att_l, x @ att_r
    s = np.sqrt(np.max(al_np) ** 2 + 1) * np.sqrt(np.max(ar_np) ** 2 + 1)
    a = (al_np[col] + ar_np[row]) / s
    a = np.where(a >= 0, a, 0.2 * a)
    expected = np.exp(a) * val
    np.testing.assert_allclose(np.asarray(ev), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(scale), s, rtol=1e-6)
