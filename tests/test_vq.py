"""VQ core parity tests: jax functional transitions vs the torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vq_gnn_tpu.nn.vq import (
    VQParams,
    feature_update,
    init_vq_state,
    lookup,
    vq_update,
)
from tests.torch_oracle import OracleVQ


def make_state_and_oracles(p: VQParams, nb: int, num_N: int, seed=0):
    state = init_vq_state(jax.random.PRNGKey(seed), nb, num_N, p)
    oracles = [
        OracleVQ(
            np.asarray(state.embedding[b]),
            np.asarray(state.ema_w[b]),
            p.num_D,
            grad_scale=p.grad_scale,
            warm_up=p.warm_up_flag,
            momentum=p.momentum,
            epsilon=p.epsilon,
            decay=p.decay,
            add_flag=p.add_flag,
        )
        for b in range(nb)
    ]
    return state, oracles


def check_close(a, b, tol=2e-5, name=""):
    a, b = np.asarray(a), np.asarray(b)
    np.testing.assert_allclose(a, b, rtol=tol, atol=tol, err_msg=name)


@pytest.mark.parametrize("warm_up", [True, False])
def test_feature_update_matches_oracle(warm_up):
    p = VQParams(num_M=8, num_D=4, warm_up_flag=warm_up)
    nb, B, N = 3, 256, 500
    state, oracles = make_state_and_oracles(p, nb, N)
    rng = np.random.RandomState(1)

    for step in range(3):
        X = rng.randn(nb, B, p.num_D).astype(np.float32) * (1 + step)
        idxs = rng.choice(N, size=B, replace=False)
        state, idx = feature_update(state, jnp.asarray(X), jnp.asarray(idxs), p)
        for b, o in enumerate(oracles):
            oidx = o.feature_update(X[b])
            np.testing.assert_array_equal(np.asarray(idx[b]), oidx.numpy())
            check_close(state.embedding[b, :, : p.num_D], o.emb[:, : p.num_D], name="emb")
            check_close(state.ema_cluster_size[b], o.size, name="size")
            check_close(
                state.embedding_output[b, :, : p.num_D], o.out[:, : p.num_D], name="out"
            )
            np.testing.assert_array_equal(
                np.asarray(state.c_indices)[idxs, b], oidx.numpy().astype(np.int16)
            )


@pytest.mark.parametrize(
    "grad_scale,add_flag", [((1.0, 1.0), False), ((2.0, 0.5), True), ((0.0, 1.0), False)]
)
def test_vq_update_matches_oracle(grad_scale, add_flag):
    p = VQParams(
        num_M=8, num_D=4, warm_up_flag=True, grad_scale=grad_scale, add_flag=add_flag
    )
    nb, B, N = 2, 256, 300
    state, oracles = make_state_and_oracles(p, nb, N, seed=3)
    rng = np.random.RandomState(2)

    for step in range(3):
        X = rng.randn(nb, B, p.num_D).astype(np.float32)
        G = rng.randn(nb, B, p.grad_dim).astype(np.float32) * 1e-3
        idxs = rng.choice(N, size=B, replace=False)
        state, idx = vq_update(
            state, jnp.asarray(X), jnp.asarray(G), jnp.asarray(idxs), p
        )
        assert not bool(state.bad_init)
        for b, o in enumerate(oracles):
            oidx = o.update(X[b], G[b])
            assert not o.bad
            np.testing.assert_array_equal(np.asarray(idx[b]), oidx.numpy())
            check_close(state.embedding[b], o.emb, name="emb")
            check_close(state.embedding_output[b], o.out, tol=5e-4, name="out")
            check_close(state.bn_grad_mean[b], o.bng.running_mean, name="gmean")
            check_close(state.bn_grad_var[b], o.bng.running_var, name="gvar")


def test_padding_invariance():
    """Padded rows (valid=False, dustbin ids) must not change any state."""
    p = VQParams(num_M=8, num_D=4, warm_up_flag=True)
    nb, B, N, PAD = 2, 128, 300, 37
    state0, _ = make_state_and_oracles(p, nb, N, seed=5)
    rng = np.random.RandomState(3)
    X = rng.randn(nb, B, p.num_D).astype(np.float32)
    G = rng.randn(nb, B, p.grad_dim).astype(np.float32)
    idxs = rng.choice(N, size=B, replace=False)

    s_ref, _ = vq_update(state0, jnp.asarray(X), jnp.asarray(G), jnp.asarray(idxs), p)

    Xp = np.concatenate([X, rng.randn(nb, PAD, p.num_D).astype(np.float32)], axis=1)
    Gp = np.concatenate([G, rng.randn(nb, PAD, p.grad_dim).astype(np.float32)], axis=1)
    idxp = np.concatenate([idxs, np.full(PAD, N)])
    valid = np.concatenate([np.ones(B, bool), np.zeros(PAD, bool)])
    s_pad, _ = vq_update(
        state0,
        jnp.asarray(Xp),
        jnp.asarray(Gp),
        jnp.asarray(idxp),
        p,
        valid=jnp.asarray(valid),
    )

    for field in ("embedding", "embedding_output", "ema_cluster_size", "ema_w"):
        check_close(getattr(s_pad, field), getattr(s_ref, field), name=field)
    np.testing.assert_array_equal(
        np.asarray(s_pad.c_indices)[:N, :], np.asarray(s_ref.c_indices)[:N, :]
    )


def test_bad_init_flag():
    """warm_up=False with an unused cluster on the first EMA step collapses."""
    p = VQParams(num_M=64, num_D=2, warm_up_flag=False)
    state, _ = make_state_and_oracles(p, 1, 100, seed=7)
    X = np.zeros((1, 8, 2), np.float32)  # 8 rows can hit at most 8 of 64 clusters
    G = np.zeros((1, 8, 2), np.float32)
    state, _ = vq_update(state, jnp.asarray(X), jnp.asarray(G), jnp.arange(8), p)
    assert bool(state.bad_init)


def test_lookup_layout():
    p = VQParams(num_M=8, num_D=4)
    nb, N = 3, 50
    state, _ = make_state_and_oracles(p, nb, N, seed=9)
    rng = np.random.RandomState(4)
    emb_out = rng.randn(nb, p.num_M, p.total_dim).astype(np.float32)
    state = state.replace(embedding_output=jnp.asarray(emb_out))
    ids = jnp.asarray([3, 7, 7, 10])
    feats, grads = lookup(state, ids, p)
    assert feats.shape == (4, nb * p.num_D) and grads.shape == (4, nb * p.num_D)
    c = np.asarray(state.c_indices).T  # [nb, N+1]
    for j, node in enumerate([3, 7, 7, 10]):
        for b in range(nb):
            np.testing.assert_allclose(
                np.asarray(feats)[j, b * 4 : (b + 1) * 4],
                emb_out[b, c[b, node], :4],
            )
            np.testing.assert_allclose(
                np.asarray(grads)[j, b * 4 : (b + 1) * 4],
                emb_out[b, c[b, node], 4:],
            )
