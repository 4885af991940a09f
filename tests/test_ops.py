"""Kernel-layer unit tests: SpMM (+VJP) and GAT edge values vs dense refs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def make_ell_edges(row, col, val, n, K=4, S_pad=0, St_pad=0, with_maps=False):
    from vq_gnn_tpu.ops.spmm import Edges, build_ell_host, ell_positions

    order = np.argsort(row, kind="stable")
    r, c, v = row[order], col[order], val[order]
    er, ec, ev = build_ell_host(r, c, v, n, K, S_pad)
    to = np.argsort(c, kind="stable")
    tr, tc, tv = build_ell_host(c[to], r[to], v[to], n, K, St_pad)
    t_from_f = f_from_t = None
    if with_maps:
        S_tot, St_tot = er.shape[0], tr.shape[0]
        f_pos = ell_positions(r, K)
        t_pos = ell_positions(c[to], K)
        t_from_f = np.full(St_tot * K, S_tot * K, np.int32)
        t_from_f[t_pos] = f_pos[to]
        f_from_t = np.full(S_tot * K, St_tot * K, np.int32)
        f_from_t[f_pos[to]] = t_pos
        t_from_f = jnp.asarray(t_from_f.reshape(St_tot, K))
        f_from_t = jnp.asarray(f_from_t.reshape(S_tot, K))
    return Edges(
        ell_row=jnp.asarray(er),
        ell_col=jnp.asarray(ec),
        ell_val=jnp.asarray(ev),
        t_ell_row=jnp.asarray(tr),
        t_ell_col=jnp.asarray(tc),
        t_ell_val=jnp.asarray(tv),
        t_from_f=t_from_f,
        f_from_t=f_from_t,
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


def make_mixed_edges(row, col, val, n, K=4, Kt=2, b_rows=0):
    from vq_gnn_tpu.ops.spmm import Edges, build_mixed_ell_host

    order = np.argsort(row, kind="stable")
    r, c, v = row[order], col[order], val[order]
    deg = np.bincount(r, minlength=n)
    degc = np.bincount(c, minlength=n)
    Sh = max(int((deg // K).sum()), 1)
    St2 = int(np.maximum((deg % K + Kt - 1) // Kt, 1).sum())
    hrc, hc, hv, hinv, trow, tcol, tval, h_base, t_base, hrg = (
        build_mixed_ell_host(r, c, v, n, K, Kt, Sh, St2)
    )
    to = np.argsort(c, kind="stable")
    tSh = max(int((degc // K).sum()), 1)
    tSt2 = int(np.maximum((degc % K + Kt - 1) // Kt, 1).sum())
    thrc, thc, thv, thinv, ttrow, ttcol, ttval, th_base, tt_base, thrg = (
        build_mixed_ell_host(c[to], r[to], v[to], n, K, Kt, tSh, tSt2)
    )
    e = Edges(
        head_rowc=jnp.asarray(hrc), head_col=jnp.asarray(hc),
        head_val=jnp.asarray(hv), head_inv=jnp.asarray(hinv),
        head_rowg=jnp.asarray(hrg),
        tail_row=jnp.asarray(trow), tail_col=jnp.asarray(tcol),
        tail_val=jnp.asarray(tval),
        t_head_rowc=jnp.asarray(thrc), t_head_col=jnp.asarray(thc),
        t_head_val=jnp.asarray(thv), t_head_inv=jnp.asarray(thinv),
        t_head_rowg=jnp.asarray(thrg),
        t_tail_row=jnp.asarray(ttrow), t_tail_col=jnp.asarray(ttcol),
        t_tail_val=jnp.asarray(ttval),
        num_rows=n, dense_rows=True,
    )
    if b_rows:
        e = e.replace(
            b_rows=b_rows,
            t_head_b_slots=int(th_base[b_rows]),
            t_tail_b_slots=int(tt_base[b_rows]),
        )
    return e


@pytest.mark.parametrize("K,Kt", [(4, 2), (8, 2), (4, 1)])
def test_mixed_ell_spmm_matches_coo(K, Kt):
    rng = np.random.RandomState(11)
    n, nnz, d = 40, 260, 8
    row, col, val = random_coo(rng, n, n, nnz)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    coo = make_edges(row, col, val, n)
    mixed = make_mixed_edges(row, col, val, n, K=K, Kt=Kt)
    np.testing.assert_allclose(
        np.asarray(spmm(mixed, x)), np.asarray(spmm(coo, x)), rtol=1e-5, atol=1e-5
    )
    g1 = jax.grad(lambda xx: jnp.sum(spmm(coo, xx) ** 3))(x)
    g2 = jax.grad(lambda xx: jnp.sum(spmm(mixed, xx) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_mixed_ell_backward_truncation():
    """With b_rows set, dx is exact below b_rows and zero above (the
    codebook-lookup dead-cotangent contract)."""
    rng = np.random.RandomState(12)
    n, nnz, d, b_rows = 48, 300, 4, 32
    row, col, val = random_coo(rng, n, n, nnz)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    full = make_mixed_edges(row, col, val, n, K=4, Kt=2)
    trunc = make_mixed_edges(row, col, val, n, K=4, Kt=2, b_rows=b_rows)
    g_full = np.asarray(jax.grad(lambda xx: jnp.sum(spmm(full, xx) ** 3))(x))
    g_tr = np.asarray(jax.grad(lambda xx: jnp.sum(spmm(trunc, xx) ** 3))(x))
    np.testing.assert_allclose(g_tr[:b_rows], g_full[:b_rows], rtol=1e-4, atol=1e-4)
    assert (g_tr[b_rows:] == 0).all()


def test_gat_conv_mixed_matches_single_k():
    """The fused GAT conv over the mixed-K layout == single-K: same
    (agg, rowsum) primals and same gradients wrt x/att/scale."""
    from vq_gnn_tpu.ops.gat import gat_conv_ell

    rng = np.random.RandomState(13)
    n, nnz, c = 40, 260, 8
    row, col, val = random_coo(rng, n, n, nnz)
    val = np.abs(val)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    att_l = jnp.asarray(rng.randn(c + 1).astype(np.float32))
    att_r = jnp.asarray(rng.randn(c + 1).astype(np.float32))
    scale = jnp.float32(3.0)

    single = make_ell_edges(row, col, val, n, K=4)
    mixed = make_mixed_edges(row, col, val, n, K=4, Kt=2)

    def run(e, xx, al, ar, s):
        agg, rs = gat_conv_ell(e, xx, al, ar, s)
        return agg, rs

    a1, r1 = run(single, x, att_l, att_r, scale)
    a2, r2 = run(mixed, x, att_l, att_r, scale)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=2e-5, atol=2e-5)

    def loss(e, xx, al, ar, s):
        agg, rs = gat_conv_ell(e, xx, al, ar, s)
        return jnp.sum((agg / (rs + 1e-16)) ** 2)

    g1 = jax.grad(loss, argnums=(1, 2, 3, 4))(single, x, att_l, att_r, scale)
    g2 = jax.grad(loss, argnums=(1, 2, 3, 4))(mixed, x, att_l, att_r, scale)
    for a, b, name in zip(g1, g2, ["dx", "d_attl", "d_attr", "d_scale"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=name
        )


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

def test_gat_ell_values_fused_matches_unfused():
    """Fused gat_ell_values == two gat_edge_values passes, fwd and grads."""
    from vq_gnn_tpu.ops.gat import gat_ell_values
    from vq_gnn_tpu.ops.spmm import ell_rowsum

    rng = np.random.RandomState(11)
    n, nnz, d = 30, 180, 8
    row, col, val = random_coo(rng, n, n, nnz)
    val = np.abs(val)
    # padded slot counts exercise the fill sentinels of the position maps
    e = make_ell_edges(row, col, val, n, K=4, S_pad=96, St_pad=104, with_maps=True)
    al = jnp.asarray(rng.randn(n).astype(np.float32))
    ar = jnp.asarray(rng.randn(n).astype(np.float32))
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))

    ev_f, ev_t_f = gat_ell_values(e, al, ar)
    ev_u = gat_edge_values(e.ell_row[:, None], e.ell_col, e.ell_val, al, ar)
    ev_t_u = gat_edge_values(e.t_ell_col, e.t_ell_row[:, None], e.t_ell_val, al, ar)
    # padding cells: unfused has exp(garbage)*0 = 0, fused fill = 0
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ev_t_f), np.asarray(ev_t_u), rtol=1e-6)

    # gradient parity through the full GAT aggregation (spmm + rowsum), wrt
    # the logits AND the features (dx flows through the transposed values)
    def loss(fused):
        def f(al_, ar_, x_):
            if fused:
                ev, ev_t = gat_ell_values(e, al_, ar_)
            else:
                ev = gat_edge_values(e.ell_row[:, None], e.ell_col, e.ell_val, al_, ar_)
                ev_t = gat_edge_values(e.t_ell_col, e.t_ell_row[:, None], e.t_ell_val, al_, ar_)
            ea = e.replace(ell_val=ev, t_ell_val=ev_t)
            agg = spmm(ea, x_)
            nrm = ell_rowsum(ea, ev)
            return jnp.sum((agg / (nrm + 1e-16)) ** 2)
        return f

    g_f = jax.grad(loss(True), argnums=(0, 1, 2))(al, ar, x)
    g_u = jax.grad(loss(False), argnums=(0, 1, 2))(al, ar, x)
    for a, b in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

def test_gat_conv_ell_matches_unfused():
    """Fused gat_conv_ell == explicit logits + gat_edge_values + spmm + rowsum,
    forward and gradients wrt (x, att_l, att_r, scale)."""
    from vq_gnn_tpu.ops.gat import gat_conv_ell
    from vq_gnn_tpu.ops.spmm import ell_rowsum

    rng = np.random.RandomState(13)
    n, nnz, c = 30, 180, 8
    row, col, val = random_coo(rng, n, n, nnz)
    val = np.abs(val)
    e = make_ell_edges(row, col, val, n, K=4, S_pad=96, St_pad=104, with_maps=True)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    att_l = jnp.asarray(rng.randn(c + 1).astype(np.float32))
    att_r = jnp.asarray(rng.randn(c + 1).astype(np.float32))
    scale = jnp.float32(1.7)

    def unfused(x_, attl_, attr_, scale_):
        al = (x_ @ attl_[:c] + attl_[c]) / scale_
        ar = (x_ @ attr_[:c] + attr_[c]) / scale_
        ev = gat_edge_values(e.ell_row[:, None], e.ell_col, e.ell_val, al, ar)
        ev_t = gat_edge_values(e.t_ell_col, e.t_ell_row[:, None], e.t_ell_val, al, ar)
        ea = e.replace(ell_val=ev, t_ell_val=ev_t)
        return spmm(ea, x_), ell_rowsum(ea, ev)

    agg_f, rs_f = gat_conv_ell(e, x, att_l, att_r, scale)
    agg_u, rs_u = unfused(x, att_l, att_r, scale)
    np.testing.assert_allclose(np.asarray(agg_f), np.asarray(agg_u), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs_f), np.asarray(rs_u), rtol=1e-5, atol=1e-5)

    # scalar loss exercising both outputs like the model (normalized output)
    def loss(fn):
        def f(x_, attl_, attr_, scale_):
            agg, rs = fn(x_, attl_, attr_, scale_)
            return jnp.sum((agg / (rs + 1e-16)) ** 2) + jnp.sum(agg[n // 2 :] * 0.3)
        return f

    g_f = jax.grad(loss(lambda *a: gat_conv_ell(e, *a)), argnums=(0, 1, 2, 3))(
        x, att_l, att_r, scale
    )
    g_u = jax.grad(loss(unfused), argnums=(0, 1, 2, 3))(x, att_l, att_r, scale)
    for a, b in zip(g_f, g_u):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_spmm_backward_truncation():
    """With b_rows/t_b_slots set, the VJP equals the full VJP on rows
    < b_rows and is exactly zero above (the bbprime dead-cotangent
    contract); forward unchanged."""
    rng = np.random.RandomState(5)
    n, nnz, c, b_rows = 40, 200, 8, 24
    row, col, val = random_coo(rng, n, n, nnz)
    e = make_ell_edges(row, col, val, n, K=4, S_pad=96, St_pad=96)
    x = jnp.asarray(rng.randn(n, c).astype(np.float32))
    g = jnp.asarray(rng.randn(n, c).astype(np.float32))

    tb = int((np.asarray(e.t_ell_row) < b_rows).sum())
    tb = (tb + 7) // 8 * 8
    et = e.replace(b_rows=b_rows, t_b_slots=tb)

    out_full, vjp_full = jax.vjp(lambda x_: spmm(e, x_), x)
    out_trunc, vjp_trunc = jax.vjp(lambda x_: spmm(et, x_), x)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_trunc))
    (dx_f,) = vjp_full(g)
    (dx_t,) = vjp_trunc(g)
    np.testing.assert_allclose(
        np.asarray(dx_t[:b_rows]), np.asarray(dx_f[:b_rows]), rtol=1e-6, atol=1e-6
    )
    assert np.all(np.asarray(dx_t[b_rows:]) == 0.0)
