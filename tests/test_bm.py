"""v1 "B+M" formulation parity: dense mapper oracle vs the per-edge layer.

The oracle builds the reference mapper's (B+M)^2 matrix literally
(``vq_gnn_v1/utils/dataloader.py:144-192``): codeword-mapped neighbor columns,
reverse rows, recovery add/subtract, coalesce + keep-positive, deg_inv
self-loops, GCN to_symmetric — then runs the dense conv
(``vq_gnn_v1/models.py:143-233``) including GAT per-branch attention with the
explosion scale.  The framework's layer must match on out_B and info_backward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.nn.model import layer_forward_bm, model_static, init_params
from vq_gnn_tpu.nn.vq import init_vq_state
from vq_gnn_tpu.sampler.samplers import BatchLoader


def dense_mapper(adj, c, num_M, conv_type, batch_idx, deg_inv, recovery, train):
    """Reference mapper as dense numpy."""
    N = adj.shape[0]
    B = len(batch_idx)
    dim = B + num_M
    Mat = np.zeros((dim, dim), np.float64)
    A = adj.toarray().astype(np.float64)
    in_batch = np.zeros(N, bool)
    in_batch[batch_idx] = True

    # A_BN with columns mapped to codeword rows
    for bi, i in enumerate(batch_idx):
        for j in np.nonzero(A[i])[0]:
            Mat[bi, B + c[j]] += A[i, j]
    # reverse rows (non-GCN, train): A_NB = deg*A*deg_inv on reversed edges
    deg = 1.0 / np.where(deg_inv > 0, deg_inv, np.inf)
    if conv_type != "GCN" and train:
        for bi, i in enumerate(batch_idx):
            for j in np.nonzero(A[i])[0]:
                Mat[B + c[j], bi] += A[i, j] * deg[i] * deg_inv[j]
    # recovery: add exact A_BB, subtract its codeword-mapped copy
    if recovery and train:
        for bi, i in enumerate(batch_idx):
            for bj, j in enumerate(batch_idx):
                if A[i, j] != 0:
                    Mat[bi, bj] += A[i, j]
                    Mat[bi, B + c[j]] -= A[i, j]
                    if conv_type != "GCN":
                        # reference subtracts the RAW A_BB value on the
                        # reverse side (v1/utils/dataloader.py:162-168), NOT
                        # the reverse-normalized one — the mismatch is why
                        # the per-cell positive clamp is live
                        Mat[B + c[i], bj] -= A[i, j]
    # coalesce + keep strictly positive
    Mat = np.where(Mat > 1e-12, Mat, 0.0)
    # self-loops value deg_inv (mapper 182-185)
    if conv_type != "SAGE":
        for bi, i in enumerate(batch_idx):
            Mat[bi, bi] += deg_inv[i]
    if conv_type == "GCN":
        Mat = Mat + Mat.T
    return Mat


def dense_v1_layer(Mat, X_B, X_bar, G_bar, warm, conv_type, att=None):
    """Dense v1 per-branch conv + info_backward (v1/models.py:166-233)."""
    B = X_B.shape[0]
    X_in = np.concatenate([X_B, X_bar * warm], axis=0)
    if conv_type == "GAT":
        X_in = np.concatenate([X_in, np.ones((X_in.shape[0], 1))], axis=1)
        att_l, att_r = att
        al, ar = X_in @ att_l, X_in @ att_r
        scale = np.sqrt(al.max() ** 2 + 1) * np.sqrt(ar.max() ** 2 + 1)
        al, ar = al / scale, ar / scale
        a = al[None, :] + ar[:, None]  # alpha(row r, col c) = al[c] + ar[r]
        a = np.where(a >= 0, a, 0.2 * a)
        W = np.exp(a) * Mat
        out = W @ X_in
    else:
        out = Mat @ X_in
    out_B, out_M = out[:B], out[B:]
    info = float((out_M * G_bar * warm).sum())
    if conv_type == "GAT":
        out_B = out_B[:, :-1] / (out_B[:, -1:] + 1e-16)
    return out_B, info


@pytest.mark.parametrize("conv_type", ["GCN", "SAGE", "GAT"])
@pytest.mark.parametrize("recovery", [True, False])
def test_bm_layer_matches_dense_mapper(conv_type, recovery):
    D, nb, M = 2, 2, 4
    cfg = Config(
        dataset="synthetic",
        formulation="bm",
        conv_type=conv_type,
        recovery_flag=recovery,
        num_layers=2,
        hidden_channels=4,
        num_D=D,
        num_M=M,
        batch_size=8,
        test_batch_size=30,
        pad_multiple_nodes=8,
        pad_multiple_edges=64,
        warm_up_flag=True,
        skip=True,
    )
    g, c_ = synthetic_sbm(num_nodes=30, num_features=4, num_classes=3, seed=4)
    g, c_, _ = prepare(g, cfg, c_)
    ms = model_static(cfg, g.num_features, 3)

    rng = jax.random.PRNGKey(0)
    params = init_params(rng, ms)
    vq = init_vq_state(jax.random.PRNGKey(1), nb, g.num_nodes, ms.vq)
    # give the codebook a non-trivial de-normalized table
    emb_out = jax.random.normal(
        jax.random.PRNGKey(2), vq.embedding_output.shape
    )
    vq = vq.replace(embedding_output=emb_out)

    loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=0)
    windows, raw = next(iter(loader))
    batch, node_idx = windows[0], raw[0]
    B = len(node_idx)

    warm = 0.7
    x = jnp.asarray(g.x[node_idx])
    x_pad = jnp.zeros((batch.B_pad, g.num_features)).at[:B].set(x)
    out, info = layer_forward_bm(
        params[0], vq, ms, x_pad, batch, None, jnp.float32(warm), True
    )

    # dense oracle, branch by branch
    c_all = np.asarray(vq.c_indices)[: g.num_nodes, :].T  # [nb, N]
    Dg = D + (1 if ms.vq.add_flag else 0)
    outs, info_ref = [], 0.0
    for b in range(nb):
        Mat = dense_mapper(
            g.adj, c_all[b], M, conv_type, node_idx, g.deg_inv, recovery, True
        )
        X_B_b = np.asarray(x)[:, b * D : (b + 1) * D]
        table = np.asarray(emb_out[b])
        X_bar = table[:, :D]
        G_bar = table[:, D:]
        att = None
        if conv_type == "GAT":
            att = (
                np.asarray(params[0]["att_l"][b]),
                np.asarray(params[0]["att_r"][b]),
            )
        o_b, i_b = dense_v1_layer(Mat, X_B_b, X_bar, G_bar, warm, conv_type, att)
        outs.append(o_b)
        info_ref += i_b
    out_B_ref = np.concatenate(outs, axis=1)
    lp = params[0]
    expected = out_B_ref @ np.asarray(lp["gnn_transform"]["w"]) + np.asarray(
        lp["gnn_transform"]["b"]
    )
    if conv_type == "SAGE":
        expected = expected + np.asarray(x) @ np.asarray(
            lp["fc_sage"]["w"]
        ) + np.asarray(lp["fc_sage"]["b"])
    expected = expected + np.asarray(x) @ np.asarray(
        lp["linear_skip"]["w"]
    ) + np.asarray(lp["linear_skip"]["b"])

    np.testing.assert_allclose(
        np.asarray(out)[:B], expected, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(float(info), info_ref, rtol=2e-4, atol=2e-4)


def test_bm_e2e_training():
    cfg = Config(
        dataset="synthetic",
        formulation="bm",
        conv_type="GCN",
        sampler_type="cont",
        walk_length=2,
        num_layers=2,
        hidden_channels=16,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=256,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        vq_update_mode="live",
        lr=0.01,
    )
    from vq_gnn_tpu.train.loop import NodeTrainer

    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=5)
    g, c, _ = prepare(g, cfg, c)
    tr = NodeTrainer(g, cfg, c)
    tr.run_init_sweep()
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)
    res = tr.evaluate()
    assert all(0.0 <= r <= 1.0 for r in res)


def test_bm_mixed_ell_matches_single_k():
    """bm formulation (GCN, cont sampler) with the mixed-K layout == single-K:
    the bm spmm rides the same mixed families as bbprime (only GAT-bm is
    gated to single-K, its per-branch gat_ell_values needs ell_* slots)."""
    from vq_gnn_tpu.train.loop import NodeTrainer

    losses, cidx = {}, {}
    for kt in (0, 2):
        cfg = Config(
            dataset="synthetic",
            formulation="bm",
            conv_type="GCN",
            sampler_type="cont",
            walk_length=2,
            num_layers=2,
            hidden_channels=16,
            num_D=4,
            num_M=8,
            batch_size=128,
            test_batch_size=256,
            pad_multiple_nodes=64,
            pad_multiple_edges=512,
            vq_update_mode="live",
            lr=0.01,
            ell_Kt=kt,
        )
        g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=5)
        g, c, _ = prepare(g, cfg, c)
        tr = NodeTrainer(g, cfg, c)
        tr.run_init_sweep()
        losses[kt], _ = tr.train_epoch(1)
        cidx[kt] = [np.asarray(s.c_indices) for s in tr.state.vq_states]
    np.testing.assert_allclose(losses[0], losses[2], rtol=1e-5)
    for a, b in zip(cidx[0], cidx[2]):
        assert (a == b).mean() > 0.999, "assignments diverged"


def test_bm_gat_e2e():
    cfg = Config(
        dataset="synthetic",
        formulation="bm",
        conv_type="GAT",
        num_layers=2,
        hidden_channels=8,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=256,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        vq_update_mode="live",
    )
    from vq_gnn_tpu.train.loop import NodeTrainer

    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=6)
    g, c, _ = prepare(g, cfg, c)
    tr = NodeTrainer(g, cfg, c)
    tr.run_init_sweep()
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)


def test_bm_transformer_branch_e2e():
    """v1 transformer_flag: parallel global-attention branch trains."""
    cfg = Config(
        dataset="synthetic",
        formulation="bm",
        conv_type="GCN",
        transformer_flag=True,
        num_layers=2,
        hidden_channels=8,
        num_D=4,
        num_M=8,
        batch_size=128,
        test_batch_size=256,
        pad_multiple_nodes=64,
        pad_multiple_edges=512,
        vq_update_mode="live",
    )
    from vq_gnn_tpu.train.loop import NodeTrainer

    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=7)
    g, c, _ = prepare(g, cfg, c)
    tr = NodeTrainer(g, cfg, c)
    tr.run_init_sweep()
    assert tr.state.vq_states_tr is not None
    emb0 = [np.asarray(s.embedding) for s in tr.state.vq_states_tr]
    loss, _ = tr.train_epoch(1)
    assert np.isfinite(loss)
    # live mode must update the transformer codebooks too
    changed = any(
        not np.array_equal(np.asarray(s.embedding), e0)
        for s, e0 in zip(tr.state.vq_states_tr, emb0)
    )
    assert changed
    res = tr.evaluate()
    assert all(0.0 <= r <= 1.0 for r in res)


@pytest.mark.parametrize("recovery", [True, False])
def test_bm_gat_ell_grads_match_coo(recovery):
    """The branch-folded ELL GAT layer (gat_conv_ell_mh) must match the COO
    per-branch vmap path in VALUE and GRADIENTS (params, x, probe, codebook)
    — both recovery modes, so the bm_rev and fo info_backward paths are hit."""
    D, nb, M = 2, 3, 4
    outs = {}
    for backend in ("ell", "coo"):
        cfg = Config(
            dataset="synthetic",
            formulation="bm",
            conv_type="GAT",
            recovery_flag=recovery,
            num_layers=2,
            hidden_channels=D * nb,
            num_D=D,
            num_M=M,
            batch_size=16,
            test_batch_size=40,
            pad_multiple_nodes=8,
            pad_multiple_edges=64,
            warm_up_flag=True,
            skip=True,
            spmm_backend=backend,
        )
        g, c_ = synthetic_sbm(num_nodes=40, num_features=D * nb, num_classes=3, seed=9)
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
        B = len(node_idx)
        x_pad = (
            jnp.zeros((batch.B_pad, g.num_features))
            .at[:B]
            .set(jnp.asarray(g.x[node_idx]))
        )
        probe0 = jnp.zeros((nb, batch.B_pad, D + 1))

        def loss_fn(lp, xp, emb, pr):
            out, info = layer_forward_bm(
                lp, vq.replace(embedding_output=emb), ms, xp, batch, pr,
                jnp.float32(0.7), True,
            )
            return jnp.sum(out**2) + info

        val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            params[0], x_pad, vq.embedding_output, probe0
        )
        outs[backend] = (val, grads)

    va, ga = outs["ell"]
    vb, gb = outs["coo"]
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-4)
    fa, fb = jax.tree.leaves(ga), jax.tree.leaves(gb)
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


@pytest.mark.parametrize("conv", ["GCN", "SAGE"])
def test_bm_spmm_ell_grads_match_coo_truncation_disabled(conv):
    """The dead-cotangent contract for the non-GAT bm spmm (model.py
    layer_forward_bm): with Edges.b_rows truncation DISABLED the ELL path
    must match COO on every gradient including the codebook embeddings;
    with the shipped truncation, d_emb through the spmm is intentionally
    zero (codebooks are EMA-updated, never gradient-trained) while all
    params/x/probe gradients are untouched."""
    D, nb, M = 2, 3, 4
    outs = {}
    for backend, truncate in (("ell", False), ("ell", True), ("coo", False)):
        cfg = Config(
            dataset="synthetic",
            formulation="bm",
            conv_type=conv,
            recovery_flag=False,
            num_layers=2,
            hidden_channels=D * nb,
            num_D=D,
            num_M=M,
            batch_size=96,
            test_batch_size=300,
            pad_multiple_nodes=8,
            pad_multiple_edges=64,
            warm_up_flag=True,
            skip=True,
            spmm_backend=backend,
        )
        g, c_ = synthetic_sbm(num_nodes=300, num_features=D * nb, num_classes=3, seed=9)
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
        if backend == "ell" and truncate:
            # the assert below is only meaningful when the bucket-quantized
            # prefix bound actually truncates (tb < St); guard non-vacuity
            tb = batch.edges.t_b_slots
            assert 0 < tb < batch.edges.t_ell_row.shape[0], (
                tb, batch.edges.t_ell_row.shape,
            )
        if not truncate and backend == "ell":
            batch = batch.replace(
                edges=batch.edges.replace(b_rows=0, t_b_slots=0)
            )
        B = len(node_idx)
        x_pad = (
            jnp.zeros((batch.B_pad, g.num_features))
            .at[:B]
            .set(jnp.asarray(g.x[node_idx]))
        )
        probe0 = jnp.zeros((batch.B_pad, D * nb))  # non-GAT: added to x_out

        def loss_fn(lp, xp, emb, pr):
            out, info = layer_forward_bm(
                lp, vq.replace(embedding_output=emb), ms, xp, batch, pr,
                jnp.float32(0.7), True,
            )
            return jnp.sum(out**2) + info

        val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
            params[0], x_pad, vq.embedding_output, probe0
        )
        outs[(backend, truncate)] = (val, grads)

    v_full, g_full = outs[("ell", False)]
    v_coo, g_coo = outs[("coo", False)]
    np.testing.assert_allclose(float(v_full), float(v_coo), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_coo)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )
    # shipped truncation: identical on params/x/probe, zero on d_emb via spmm
    v_tr, g_tr = outs[("ell", True)]
    np.testing.assert_allclose(float(v_tr), float(v_full), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(g_tr[0]), jax.tree.leaves(g_full[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g_tr[1]), np.asarray(g_full[1]), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_tr[3]), np.asarray(g_full[3]), rtol=5e-4, atol=5e-5
    )
    assert float(np.abs(np.asarray(g_tr[2])).sum()) == 0.0, (
        "truncated spmm should zero the codebook-embedding cotangent"
    )
