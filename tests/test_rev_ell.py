"""rev-ELL fused recovery kernel (ops/pallas_rev.py) correctness.

The kernel replaces the XLA [nb, M*B_pad] scatter grid of the v1 non-GCN
recovery (nn/model.py:_bm_exact_reverse_info) — the measured bm GAT floor.
These tests pin: the host builder's slot/schedule layout against a dense
grid oracle, the kernel (interpret mode) against the XLA grid path for
values AND gradients, bucket-padding invariance, and the end-to-end
layer_forward_bm dispatch equivalence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vq_gnn_tpu.ops.pallas_rev import build_rev_ell, pad_rev_ell, rev_tb


def _rand_rev(rng, B_rows, num_N, R, dup_frac=0.3):
    rr = rng.integers(0, B_rows, R)
    rc = rng.integers(0, num_N, R)
    rv = rng.normal(size=R).astype(np.float32)
    nd = int(R * dup_frac)
    # duplicate (row, col) pairs with opposite-sign values: the mapper's
    # reverse-add + raw-A-subtract pattern the static coalesce must sum
    rr = np.concatenate([rr, rr[:nd]])
    rc = np.concatenate([rc, rc[:nd]])
    rv = np.concatenate([rv, -0.5 * rv[:nd]])
    return rr, rc, rv


def _dense_grid(rr, rc, rv, c_row, M, B_pad):
    """Oracle [M, B_pad] coalesced cell grid for one branch."""
    S = np.zeros((M, B_pad))
    for r, cg, v in zip(rr, rc, rv):
        S[c_row[cg], r] += v
    return np.maximum(S, 0.0)


def test_rev_ell_builder_covers_cells():
    rng = np.random.default_rng(3)
    B_pad, num_N, M = 64, 500, 16
    rr, rc, rv = _rand_rev(rng, 50, num_N, 400)
    d = build_rev_ell(rr, rc, rv, B_pad, num_N, K=8, T_s=128, TB=rev_tb(B_pad))
    c_row = rng.integers(0, M, num_N + 1)
    ref = _dense_grid(rr, rc, rv, c_row, M, B_pad)
    # rebuild the grid from slots
    got = np.zeros((M, B_pad))
    srow = d["slot_row"][:, 0]
    for s in range(d["slot_col"].shape[0]):
        for k in range(d["slot_col"].shape[1]):
            if d["slot_val"][s, k] != 0.0:
                got[c_row[d["slot_col"][s, k]], srow[s]] += d["slot_val"][s, k]
    np.testing.assert_allclose(np.maximum(got, 0), ref, rtol=1e-5, atol=1e-6)
    # schedule invariants: every tile appears, exactly one finalize each
    n_tiles = B_pad // rev_tb(B_pad)
    fin_tiles = d["tile_of"][(d["flags"] & 4) != 0]
    assert sorted(fin_tiles.tolist()) == list(range(n_tiles))


def _kernel_and_ref(B_pad, num_N, M, nb, Dg, R, seed, pad_extra=0):
    """Build kernel+XLA closures over the same random problem."""
    rng = np.random.default_rng(seed)
    rr, rc, rv = _rand_rev(rng, B_pad - B_pad // 4, num_N, R)
    K, T_s, TB = 8, 128, rev_tb(B_pad)
    d = build_rev_ell(rr, rc, rv, B_pad, num_N, K=K, T_s=T_s, TB=TB)
    S, P = d["slot_row"].shape[0], d["tile_of"].shape[0]
    S_pad = ((S + T_s - 1) // T_s) * T_s + pad_extra * T_s
    P_pad = ((P + 127) // 128) * 128 + pad_extra * 128
    d = pad_rev_ell(d, S_pad, P_pad, B_pad, num_N, T_s=T_s, TB=TB)

    c_tab = rng.integers(0, M, (num_N + 1, nb)).astype(np.int16)
    gbar = rng.normal(size=(nb, M, Dg)).astype(np.float32)

    def ref(xb, al, arcb):
        def one(c_row, gb, x_b, al_b, arcb_b):
            c = jnp.take(c_row, jnp.asarray(rc), mode="clip").astype(jnp.int32)
            cell = c * B_pad + jnp.asarray(rr.astype(np.int32))
            Sg = jax.ops.segment_sum(
                jnp.asarray(rv), cell, num_segments=M * B_pad
            )
            Sg = jax.nn.relu(Sg).reshape(M, B_pad)
            a = al_b[None, :] + arcb_b[:, None]
            Sg = Sg * jnp.exp(jax.nn.leaky_relu(a, 0.2))
            return jnp.sum(jnp.dot(Sg, x_b) * gb)

        return jax.vmap(one)(
            jnp.asarray(c_tab.T.astype(np.int32)), jnp.asarray(gbar), xb, al,
            arcb,
        )

    def kern(xb, al, arcb):
        from vq_gnn_tpu.ops.pallas_rev import rev_recovery_info

        Dp = 8
        c_flat = jnp.take(
            jnp.asarray(c_tab), jnp.asarray(d["slot_col"].reshape(-1)),
            axis=0, mode="clip",
        ).astype(jnp.int32)
        c_slots = c_flat  # gather-natural [S*K, nb]
        xbp = jnp.pad(xb, ((0, 0), (0, 0), (0, Dp - Dg)))
        gT = jnp.pad(
            jnp.transpose(jnp.asarray(gbar), (0, 2, 1)),
            ((0, 0), (0, Dp - Dg), (0, 0)),
        )
        return rev_recovery_info(
            c_slots, jnp.asarray(d["slot_val"]), jnp.asarray(d["slot_row"]),
            jnp.asarray(d["tile_of"]), jnp.asarray(d["blk_of"]),
            jnp.asarray(d["flags"]), xbp, al[:, :, None], arcb, gT,
            T_s, TB, "x2", True,  # interpret mode on CPU
        )

    xb = jnp.asarray(rng.normal(size=(nb, B_pad, Dg)).astype(np.float32))
    al = jnp.asarray(0.1 * rng.normal(size=(nb, B_pad)).astype(np.float32))
    arcb = jnp.asarray(0.1 * rng.normal(size=(nb, M)).astype(np.float32))
    return ref, kern, (xb, al, arcb)


def test_rev_kernel_matches_xla_grid():
    ref, kern, args = _kernel_and_ref(
        B_pad=256, num_N=3000, M=32, nb=2, Dg=5, R=900, seed=0
    )
    r, k = np.asarray(ref(*args)), np.asarray(kern(*args))
    np.testing.assert_allclose(k, r, rtol=5e-4, atol=5e-4)
    # gradients of a weighted sum (distinct per-branch cotangents)
    w = jnp.arange(1.0, args[0].shape[0] + 1)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * w), argnums=(0, 1, 2))(*args)
    gk = jax.grad(lambda *a: jnp.sum(kern(*a) * w), argnums=(0, 1, 2))(*args)
    for a, b in zip(gr, gk):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=5e-4 * max(1.0, np.abs(a).max())
        )


def test_rev_kernel_bucket_padding_invariance():
    _, kern0, args = _kernel_and_ref(
        B_pad=128, num_N=1000, M=16, nb=2, Dg=3, R=300, seed=1
    )
    _, kern1, _ = _kernel_and_ref(
        B_pad=128, num_N=1000, M=16, nb=2, Dg=3, R=300, seed=1, pad_extra=2
    )
    np.testing.assert_allclose(
        np.asarray(kern0(*args)), np.asarray(kern1(*args)), rtol=1e-5,
        atol=1e-6,
    )


def test_rev_kernel_empty_reverse_list():
    # degenerate: no reverse edges at all -> zero info, all tiles scheduled
    d = build_rev_ell(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.float32),
        64, 100, K=8, T_s=128, TB=rev_tb(64),
    )
    assert (d["flags"] & 2 == 0).all()  # nothing live
    fin_tiles = d["tile_of"][(d["flags"] & 4) != 0]
    assert sorted(fin_tiles.tolist()) == list(range(64 // rev_tb(64)))


@pytest.mark.parametrize("conv_type", ["SAGE", "GAT"])
def test_bm_layer_kernel_matches_xla_dispatch(conv_type, monkeypatch):
    """layer_forward_bm end-to-end: fused dispatch (interpret) == XLA grid,
    values and parameter gradients, on a real loader batch."""
    from vq_gnn_tpu.config import Config
    from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
    from vq_gnn_tpu.nn.model import layer_forward_bm, model_static, init_params
    from vq_gnn_tpu.nn.vq import init_vq_state
    from vq_gnn_tpu.sampler.samplers import BatchLoader

    D, nb, M = 2, 2, 8
    cfg = Config(
        dataset="synthetic", formulation="bm", conv_type=conv_type,
        recovery_flag=True, num_layers=2, hidden_channels=4, num_D=D,
        num_M=M, batch_size=16, test_batch_size=60, pad_multiple_nodes=16,
        pad_multiple_edges=64, warm_up_flag=True, skip=True,
    )
    g, c_ = synthetic_sbm(num_nodes=60, num_features=4, num_classes=3, seed=4)
    g, c_, _ = prepare(g, cfg, c_)
    ms = model_static(cfg, g.num_features, 3)
    params = init_params(jax.random.PRNGKey(0), ms)
    vq = init_vq_state(jax.random.PRNGKey(1), nb, g.num_nodes, ms.vq)
    vq = vq.replace(
        embedding_output=jax.random.normal(
            jax.random.PRNGKey(2), vq.embedding_output.shape
        )
    )
    loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=0)
    windows, raw = next(iter(loader))
    batch, node_idx = windows[0], raw[0]
    assert batch.rev_slot_row is not None  # loader built the rev-ELL layout
    x_pad = (
        jnp.zeros((batch.B_pad, g.num_features))
        .at[: len(node_idx)]
        .set(jnp.asarray(g.x[node_idx]))
    )

    def run(lp):
        out, info = layer_forward_bm(
            lp, vq, ms, x_pad, batch, None, jnp.float32(0.7), True
        )
        return out, info

    def loss(lp):
        out, info = run(lp)
        return jnp.sum(out**2) * 1e-2 + info

    monkeypatch.setenv("VQ_GNN_REV", "off")
    out_x, info_x = run(params[0])
    g_x = jax.grad(loss)(params[0])
    monkeypatch.setenv("VQ_GNN_REV", "auto")
    monkeypatch.setenv("VQ_GNN_ELL_FUSED", "interpret")
    out_k, info_k = run(params[0])
    g_k = jax.grad(loss)(params[0])

    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(info_k), float(info_x), rtol=2e-4,
                               atol=2e-4)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_x), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(g_k), key=lambda t: str(t[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=5e-4,
            atol=5e-4 * max(1.0, float(np.abs(np.asarray(va)).max())),
            err_msg=str(ka),
        )
