"""Sampler tests: k-hop subgraph semantics, padding, native-vs-numpy parity."""

import numpy as np
import pytest

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.datasets import prepare, synthetic_sbm
from vq_gnn_tpu.sampler.samplers import BatchLoader, k_hop_subgraph, random_walk


@pytest.fixture(scope="module")
def small_graph():
    cfg = Config(dataset="synthetic", sampler_type="node", num_D=4,
                 pad_multiple_nodes=64, pad_multiple_edges=256)
    g, c = synthetic_sbm(num_nodes=300, num_features=16, seed=1)
    g, c, _ = prepare(g, cfg, c)
    return g, c, cfg


def csr_arrays(g):
    csr = g.adj.tocsr()
    csr.sort_indices()
    return csr.indptr.astype(np.int64), csr.indices.astype(np.int64), csr.data.astype(np.float32)


def test_khop_train_semantics(small_graph):
    g, _, _ = small_graph
    rowptr, col, val = csr_arrays(g)
    batch = np.array([5, 17, 3, 250])
    fo, er, ec, ev = k_hop_subgraph(rowptr, col, val, batch, g.num_nodes, True)

    # boundary = exact 1-hop neighbors minus batch
    nbrs = set()
    for b in batch:
        nbrs.update(col[rowptr[b] : rowptr[b + 1]].tolist())
    expected_fo = sorted(nbrs - set(batch.tolist()))
    np.testing.assert_array_equal(np.sort(fo), expected_fo)

    # all edges among subset present, with correct values
    subset = np.concatenate([batch, fo])
    pos = {int(v): i for i, v in enumerate(subset)}
    expected = {}
    A = g.adj.tocsr()
    for v in subset:
        r0, r1 = rowptr[v], rowptr[v + 1]
        for e in range(r0, r1):
            u = col[e]
            if int(u) in pos:
                expected[(pos[int(v)], pos[int(u)])] = val[e]
    got = {(int(r), int(c)): float(x) for r, c, x in zip(er, ec, ev)}
    assert got.keys() == expected.keys()
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-6


def test_khop_eval_rows_only(small_graph):
    g, _, _ = small_graph
    rowptr, col, val = csr_arrays(g)
    batch = np.array([10, 40, 99])
    fo, er, ec, ev = k_hop_subgraph(rowptr, col, val, batch, g.num_nodes, False)
    # only batch rows
    assert (er < len(batch)).all()
    # each batch row has exactly its full degree
    counts = np.bincount(er, minlength=len(batch))
    deg = rowptr[batch + 1] - rowptr[batch]
    np.testing.assert_array_equal(counts, deg)


def test_native_matches_numpy(small_graph):
    from vq_gnn_tpu.native import lib as native_lib

    if not native_lib.available():
        pytest.skip("native lib not built")
    g, _, _ = small_graph
    rowptr, col, val = csr_arrays(g)
    batch = np.array([1, 2, 3, 150, 7])
    for train_flag in (True, False):
        nf, ner, nec, nev = native_lib.khop(rowptr, col, val, g.num_nodes, batch, train_flag)
        # numpy fallback (bypass native dispatch by calling internals)
        import vq_gnn_tpu.sampler.samplers as S

        orig = S._native
        S._native = lambda: None
        try:
            pf, per, pec, pev = k_hop_subgraph(rowptr, col, val, batch, g.num_nodes, train_flag)
        finally:
            S._native = orig
        np.testing.assert_array_equal(nf, pf)
        key = lambda r, c: np.lexsort((c, r))
        ka, kb = key(ner, nec), key(per, pec)
        np.testing.assert_array_equal(ner[ka], per[kb])
        np.testing.assert_array_equal(nec[ka], pec[kb])
        np.testing.assert_allclose(nev[ka], pev[kb], rtol=1e-6)


def test_loader_padding_and_coverage(small_graph):
    g, c, cfg = small_graph
    loader = BatchLoader(g, cfg, batch_size=100, train_flag=False, shuffle=False)
    seen = []
    for windows, raw in loader:
        b = windows[0]
        B = int(b.num_B)
        assert b.batch_idx.shape[0] % cfg.pad_multiple_nodes == 0
        assert bool(b.valid_B[:B].all()) and not bool(b.valid_B[B:].any())
        seen.append(np.asarray(b.batch_idx[:B]))
    np.testing.assert_array_equal(np.concatenate(seen), np.arange(g.num_nodes))


def test_random_walk_valid_steps(small_graph):
    g, _, _ = small_graph
    rowptr, col, _ = csr_arrays(g)
    rng = np.random.RandomState(0)
    starts = np.arange(50)
    walks = random_walk(rowptr, col, starts, 4, rng)
    assert walks.shape == (50, 5)
    for i in range(50):
        for s in range(4):
            v, u = walks[i, s], walks[i, s + 1]
            nbrs = col[rowptr[v] : rowptr[v + 1]]
            assert (u in nbrs) or (len(nbrs) == 0 and u == v)


def test_native_ell_build_matches_numpy():
    from vq_gnn_tpu.native import lib as native_lib
    from vq_gnn_tpu.ops.spmm import build_ell_host

    if not native_lib.available():
        pytest.skip("native lib not built")
    rng = np.random.RandomState(5)
    E, n, K = 500, 60, 4
    row = np.sort(rng.randint(0, n, E))
    col = rng.randint(0, n, E).astype(np.int64)
    val = rng.randn(E).astype(np.float32)
    deg = np.bincount(row, minlength=n)
    S = int(((deg + K - 1) // K).sum())
    nr, nc, nv = native_lib.build_ell(row, col, val, n, K, S + 7)
    # numpy path (S_pad=0 forces the fallback)
    pr, pc, pv = build_ell_host(row, col, val, n, K, 0)
    np.testing.assert_array_equal(nr[:S], pr[:S])
    np.testing.assert_array_equal(nc[:S], pc[:S])
    np.testing.assert_allclose(nv[:S], pv[:S])
    assert (nr[S:] == n).all() and (nv[S:] == 0).all()


def test_prefetcher_propagates_errors(small_graph):
    g, c, cfg = small_graph
    loader = BatchLoader(g, cfg, batch_size=100, train_flag=False, shuffle=False)

    def boom(idx):
        raise RuntimeError("producer boom")

    loader._build = boom
    with pytest.raises(RuntimeError, match="producer boom"):
        for _ in loader:
            pass


def test_host_pipeline_scale():
    """Host-side batch build at 500k nodes stays correct (and fast via C++)."""
    import time

    cfg = Config(dataset="synthetic", sampler_type="node", num_D=4,
                 pad_multiple_nodes=4096, pad_multiple_edges=16384)
    g, c = synthetic_sbm(num_nodes=500_000, num_features=8, avg_degree=8, seed=2)
    g, c, _ = prepare(g, cfg, c)
    loader = BatchLoader(g, cfg, batch_size=50_000, train_flag=True, shuffle=False)
    loader.prefetch = False
    t0 = time.time()
    b = loader._build(np.arange(50_000))
    dt = time.time() - t0
    assert int(b.num_B) == 50_000
    assert b.edges.ell_row is not None
    # C++ path keeps this comfortably in seconds on 2 vCPUs
    assert dt < 30, dt
