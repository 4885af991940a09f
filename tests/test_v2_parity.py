"""v2 (B+B') per-layer parity vs a dense numpy oracle.

The oracle implements the reference LowRankGNNLayer forward literally
(``vq_gnn_v2/models.py:144-231``): codebook feature/grad lookup for B' rows,
dense adjacency aggregation over the [B || B'] subset, GAT unnormalized-exp
attention with Tricks 1+2, ones-column normalization, info_backward, output
transform (+fc_sage/+skip).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.nn.model import init_params, layer_forward, model_static
from vq_gnn_tpu.nn.vq import init_vq_state
from vq_gnn_tpu.sampler.samplers import BatchLoader


def dense_v2_layer(A_sub, B, x, x_fo, grad_fo, lp, conv_type, warm, skip):
    """A_sub: [dim, dim] dense local adjacency (train edge set)."""
    x_input = np.concatenate([x, x_fo], axis=0)
    if conv_type == "GAT":
        x_input = np.concatenate([x_input, np.ones((x_input.shape[0], 1))], axis=1)
        al = x_input @ np.asarray(lp["att_l"])
        ar = x_input @ np.asarray(lp["att_r"])
        scale = np.sqrt(al.max() ** 2 + 1) * np.sqrt(ar.max() ** 2 + 1)
        al, ar = al / scale, ar / scale
        a = al[None, :] + ar[:, None]
        a = np.where(a >= 0, a, 0.2 * a)
        W = np.exp(a) * A_sub
        out = W @ x_input
    else:
        out = A_sub @ x_input
    out_B, out_fo = out[:B], out[B:]
    if conv_type == "GAT":
        out_B = out_B[:, :-1] / (out_B[:, -1:] + 1e-16)
        out_fo = out_fo[:, :-1]
    info = float((out_fo * grad_fo).sum() * warm)
    y = out_B @ np.asarray(lp["gnn_transform"]["w"]) + np.asarray(
        lp["gnn_transform"]["b"]
    )
    if conv_type == "SAGE":
        y = y + x @ np.asarray(lp["fc_sage"]["w"]) + np.asarray(lp["fc_sage"]["b"])
    if skip:
        y = y + x @ np.asarray(lp["linear_skip"]["w"]) + np.asarray(
            lp["linear_skip"]["b"]
        )
    return y, info


@pytest.mark.parametrize("conv_type", ["GCN", "SAGE", "GAT"])
def test_v2_layer_matches_dense(conv_type):
    D, nb, M = 2, 2, 4
    cfg = Config(
        dataset="synthetic",
        conv_type=conv_type,
        num_layers=2,
        hidden_channels=4,
        num_D=D,
        num_M=M,
        batch_size=10,
        test_batch_size=40,
        pad_multiple_nodes=8,
        pad_multiple_edges=64,
        skip=True,
    )
    g, c = synthetic_sbm(num_nodes=40, num_features=4, num_classes=3, seed=11)
    g, c, _ = prepare(g, cfg, c)
    ms = model_static(cfg, g.num_features, 3)
    params = init_params(jax.random.PRNGKey(0), ms)
    vq = init_vq_state(jax.random.PRNGKey(1), nb, g.num_nodes, ms.vq)
    emb_out = jax.random.normal(jax.random.PRNGKey(2), vq.embedding_output.shape)
    vq = vq.replace(embedding_output=emb_out)

    loader = BatchLoader(g, cfg, train_flag=True, shuffle=False, seed=0)
    windows, raw = next(iter(loader))
    batch, node_idx = windows[0], raw[0]
    B = len(node_idx)
    fo_ids = np.asarray(batch.fo_ids)[np.asarray(batch.valid_fo)]
    warm = 0.8

    x = np.asarray(g.x[node_idx])
    x_pad = jnp.zeros((batch.B_pad, g.num_features)).at[:B].set(jnp.asarray(x))
    out, info = layer_forward(
        params[0], vq, ms, x_pad, batch, None, jnp.float32(warm), True
    )

    # oracle: codebook lookups + dense local adjacency over [B || B']
    c_all = np.asarray(vq.c_indices).T  # [nb, N+1]
    table = np.asarray(emb_out)
    x_fo = np.concatenate(
        [table[b, c_all[b, fo_ids], :D] for b in range(nb)], axis=1
    )
    grad_fo = np.concatenate(
        [table[b, c_all[b, fo_ids], D:] for b in range(nb)], axis=1
    )
    subset = np.concatenate([node_idx, fo_ids])
    A_sub = g.adj.toarray()[np.ix_(subset, subset)]

    y, info_ref = dense_v2_layer(
        A_sub, B, x, x_fo, grad_fo, params[0], conv_type, warm, True
    )
    np.testing.assert_allclose(np.asarray(out)[:B], y, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(info), info_ref, rtol=3e-4, atol=3e-4)
