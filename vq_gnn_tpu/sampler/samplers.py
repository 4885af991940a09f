"""Mini-batch samplers — host-side schedule construction.

Reproduces the reference ``OurDataLoader`` semantics
(``vq_gnn_v2/dataloader.py:11-148``):

- samplers: node / edge / rw / cont / cluster, with the per-sampler
  effective-batch-size rescaling (lines 40-47);
- ``cont``: sliding-window random-walk chains — repeat x3, walk 1 step,
  unique, truncate to batch (lines 76-88); multi-window batches skip the
  optimizer step on window 0 (``main_node.py v2:113-116``, handled by the
  trainer via ``len(windows) > 1``);
- 1-hop subgraph extraction with the [B || B'] subset layout; train batches
  keep *all* edges among the subset (incl. B'-B' edges), eval batches keep
  only rows of B (lines 131-138).

Each yielded window is a static-shape :class:`PaddedBatch`.  The heavy
per-batch work (neighbor expansion, relabel) is vectorized numpy over CSR;
the C++ native kernel is used when built.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Sequence

import numpy as np

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.store import HostGraph
from vq_gnn_tpu.sampler.batch import PaddedBatch, build_padded_batch, round_up


def _native():
    try:
        from vq_gnn_tpu.native import lib as native_lib

        return native_lib if native_lib.available() else None
    except ImportError:
        return None


def random_walk(rowptr, col, starts, length, rng) -> np.ndarray:
    """torch_cluster-style uniform random walk on CSR; [len(starts), length+1].

    A node with no neighbors stays put (torch_cluster semantics).
    """
    nl = _native()
    if nl is not None:
        return nl.random_walk(rowptr, col, starts, length, rng.randint(0, 2**31))
    n = len(starts)
    out = np.empty((n, length + 1), dtype=np.int64)
    out[:, 0] = starts
    cur = np.asarray(starts, dtype=np.int64)
    for step in range(length):
        deg = rowptr[cur + 1] - rowptr[cur]
        r = rng.randint(0, np.maximum(deg, 1))
        nxt = col[rowptr[cur] + r]
        cur = np.where(deg > 0, nxt, cur)
        out[:, step + 1] = cur
    return out


def k_hop_subgraph(rowptr, col, val, node_idx, num_N, train_flag: bool):
    """1-hop subgraph with [B || B'] layout (``dataloader.py v2:98-148``).

    Returns (fo_ids, e_row, e_col, e_val) in compact local numbering where
    batch node i -> i and boundary j -> B + j.
    """
    node_idx = np.asarray(node_idx, dtype=np.int64)
    B = len(node_idx)

    nl = _native()
    if nl is not None:
        return nl.khop(rowptr, col, val, num_N, node_idx, train_flag)

    # neighbor expansion: all cols of batch rows
    starts, ends = rowptr[node_idx], rowptr[node_idx + 1]
    counts = ends - starts
    gather = np.repeat(starts - np.cumsum(counts) + counts, counts) + np.arange(
        counts.sum()
    )
    nbr = col[gather]

    in_batch = np.zeros(num_N, dtype=bool)
    in_batch[node_idx] = True
    fo_ids = np.unique(nbr[~in_batch[nbr]])

    pos = np.full(num_N, -1, dtype=np.int64)
    pos[node_idx] = np.arange(B)
    pos[fo_ids] = B + np.arange(len(fo_ids))

    if train_flag:
        # all edges among subset: enumerate rows of subset, keep cols in subset
        subset = np.concatenate([node_idx, fo_ids])
        s_starts, s_ends = rowptr[subset], rowptr[subset + 1]
        s_counts = s_ends - s_starts
        s_gather = np.repeat(
            s_starts - np.cumsum(s_counts) + s_counts, s_counts
        ) + np.arange(s_counts.sum())
        rows_g = np.repeat(subset, s_counts)
        cols_g = col[s_gather]
        vals_g = val[s_gather]
        keep = pos[cols_g] >= 0
        e_row, e_col, e_val = pos[rows_g[keep]], pos[cols_g[keep]], vals_g[keep]
    else:
        # eval: only batch rows receive messages (dataloader.py v2:136-138)
        rows_g = np.repeat(node_idx, counts)
        e_row, e_col, e_val = pos[rows_g], pos[nbr], val[gather]

    return fo_ids, e_row, e_col, e_val


def bm_subgraph(
    rowptr,
    col,
    val,
    deg,
    deg_inv,
    node_idx,
    num_N,
    conv_type: str,
    recovery_flag: bool,
    train_flag: bool,
    exact_minibatch: bool = False,
):
    """v1 "B+M" formulation edge sets, per-edge equivalent of the mapper
    (``vq_gnn_v1/utils/dataloader.py:144-192``).

    The mapper builds a (B+M)x(B+M) matrix whose (i, codeword m) cell sums
    A(i,j) over out-of-batch neighbors j with c[j]=m (the in-batch part is
    subtracted back out under recovery and handled exactly, and the coalesce
    "keep positive" step only drops exact zeros since A_BB's values equal
    A_BN's on the same edges).  Because both the linear convs and the GAT
    attention (whose logits depend only on the codeword row) are invariant to
    splitting a cell into its constituent edges, we emit per-edge lists in
    the same [B || B'] local layout as the v2 path, with v1 values:

    - B rows:  in-batch edges exact (GCN doubled by mapper's to_symmetric),
      out-of-batch edges A(i,j) routed through the neighbor's codeword
      feature; self-loops value deg_inv (GCN doubled; SAGE none).
      Without recovery every neighbor (in-batch too) routes via codewords.
    - B' rows (train only): (j <- i in B), GCN value A(i,j) (symmetrized
      transpose), else the reverse-normalized A(i,j)*deg[i]*deg_inv[j]
      (v1/utils/dataloader.py:76-83, 153-154).  These rows feed
      info_backward; per-codeword aggregation is recovered by the lookup
      identity sum_m out_M[m]*g[m] == sum_j out_fo[j]*g[c[j]].
    """
    node_idx = np.asarray(node_idx, dtype=np.int64)
    B = len(node_idx)

    in_batch = np.zeros(num_N, dtype=bool)
    in_batch[node_idx] = True

    if exact_minibatch:
        # convergence-matched control (Config.exact_minibatch): exact A_BB
        # + self-loops only — no codeword columns, no reverse rows, no
        # recovery.  Same batches/update count as the VQ arm; isolates the
        # quantization cost.
        starts, ends = rowptr[node_idx], rowptr[node_idx + 1]
        counts = ends - starts
        gather = np.repeat(
            starts - np.cumsum(counts) + counts, counts
        ) + np.arange(counts.sum())
        rows_g = np.repeat(node_idx, counts)
        cols_g = col[gather]
        vals_g = val[gather]
        sel = in_batch[cols_g]
        pos = np.full(num_N, -1, dtype=np.int64)
        pos[node_idx] = np.arange(B)
        gcn_mult = 2.0 if conv_type == "GCN" else 1.0
        er_l = [pos[rows_g[sel]]]
        ec_l = [pos[cols_g[sel]]]
        ev_l = [vals_g[sel] * gcn_mult]
        if conv_type != "SAGE":
            er_l.append(np.arange(B))
            ec_l.append(np.arange(B))
            ev_l.append(deg_inv[node_idx].astype(np.float32) * gcn_mult)
        return (
            np.zeros(0, np.int64),
            np.concatenate(er_l),
            np.concatenate(ec_l),
            np.concatenate(ev_l).astype(np.float32),
            None,
        )

    starts, ends = rowptr[node_idx], rowptr[node_idx + 1]
    counts = ends - starts
    gather = np.repeat(starts - np.cumsum(counts) + counts, counts) + np.arange(
        counts.sum()
    )
    rows_g = np.repeat(node_idx, counts)  # global batch row per edge
    cols_g = col[gather]
    vals_g = val[gather]
    nbr_out = ~in_batch[cols_g]

    if recovery_flag and train_flag:
        fo_ids = np.unique(cols_g[nbr_out])
    else:
        fo_ids = np.unique(cols_g)  # every neighbor routes via its codeword

    pos = np.full(num_N, -1, dtype=np.int64)
    pos[node_idx] = np.arange(B)
    fo_pos = np.full(num_N, -1, dtype=np.int64)
    fo_pos[fo_ids] = B + np.arange(len(fo_ids))

    er_list, ec_list, ev_list = [], [], []
    rev = None

    gcn_mult = 2.0 if conv_type == "GCN" else 1.0
    if recovery_flag and train_flag:
        # exact in-batch edges
        sel = ~nbr_out
        er_list.append(pos[rows_g[sel]])
        ec_list.append(pos[cols_g[sel]])
        ev_list.append(vals_g[sel] * gcn_mult)
        # out-of-batch via codewords
        er_list.append(pos[rows_g[nbr_out]])
        ec_list.append(fo_pos[cols_g[nbr_out]])
        ev_list.append(vals_g[nbr_out])
        rev_sel = nbr_out
    else:
        er_list.append(pos[rows_g])
        ec_list.append(fo_pos[cols_g])
        ev_list.append(vals_g)
        rev_sel = slice(None)

    # self-loops (mapper lines 182-185; GCN doubled by to_symmetric)
    if conv_type != "SAGE":
        er_list.append(np.arange(B))
        ec_list.append(np.arange(B))
        ev_list.append(deg_inv[node_idx].astype(np.float32) * gcn_mult)

    if train_flag:
        if conv_type != "GCN" and recovery_flag:
            # The mapper's reverse side adds deg*A*deg_inv on ALL neighbor
            # edges but subtracts the RAW A on in-batch ones (reversed row
            # codeword, v1/utils/dataloader.py:153-168) — the mismatch makes
            # the per-cell positive clamp live, so we ship the raw per-edge
            # inputs and build the [M, B] cell matrix on device.
            rv_all = (vals_g * deg[rows_g] * deg_inv[cols_g]).astype(np.float32)
            sel_in = ~nbr_out
            rev = (
                np.concatenate([pos[rows_g], pos[cols_g[sel_in]]]).astype(np.int64),
                np.concatenate([cols_g, rows_g[sel_in]]).astype(np.int64),
                np.concatenate([rv_all, -vals_g[sel_in]]).astype(np.float32),
            )
        else:
            # B'-row reverse edges (exactly per-edge reducible)
            rj = cols_g[rev_sel]
            ri = rows_g[rev_sel]
            if conv_type == "GCN":
                rv = vals_g[rev_sel]
            else:
                rv = (vals_g[rev_sel] * deg[ri] * deg_inv[rj]).astype(np.float32)
            er_list.append(fo_pos[rj])
            ec_list.append(pos[ri])
            ev_list.append(rv)

    er = np.concatenate(er_list)
    ec = np.concatenate(ec_list)
    ev = np.concatenate(ev_list).astype(np.float32)
    return fo_ids, er, ec, ev, rev


class BatchLoader:
    """Epoch iterator yielding lists of PaddedBatch windows."""

    def __init__(
        self,
        graph: HostGraph,
        cfg: Config,
        batch_size: Optional[int] = None,
        train_flag: bool = True,
        sampler_type: Optional[str] = None,
        cluster_indices: Optional[Sequence[np.ndarray]] = None,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        with_link_edges: bool = False,
        node_range: Optional[tuple] = None,
    ):
        self.with_link_edges = with_link_edges
        # multi-host data parallelism: each process samples batch SEEDS from
        # its own node partition [lo, hi) (parallel/multihost.py contract);
        # walks/neighbor expansion may still leave the partition — those
        # nodes enter as B' codebook lookups, which is exactly the design
        # (the codebook replaces cross-host feature traffic).
        self.node_range = node_range
        self._L_bucket = 0
        self.graph = graph
        self.cfg = cfg
        self.train_flag = train_flag
        self.sampler_type = sampler_type or (cfg.sampler_type if train_flag else "node")
        self.cluster_indices = cluster_indices
        self.shuffle = train_flag if shuffle is None else shuffle
        self.seed = seed
        self.N = graph.num_nodes

        csr = graph.adj.tocsr()
        csr.sort_indices()
        self.rowptr = csr.indptr.astype(np.int64)
        self.col = csr.indices.astype(np.int64)
        self.val = csr.data.astype(np.float32)

        requested = batch_size if batch_size is not None else (
            cfg.batch_size if train_flag else cfg.test_batch_size
        )
        if requested <= 0:
            requested = self.N
        self.requested_batch_size = requested
        # effective batch rescaling (dataloader.py v2:40-47)
        st, wl = self.sampler_type, cfg.walk_length
        if st == "edge":
            self.batch_size = requested // 2
        elif st == "rw":
            self.batch_size = requested // (wl + 1)
        elif st == "cont":
            self.batch_size = requested // cfg.cont_sliding_window
        else:
            self.batch_size = requested

        if st == "cluster" and cluster_indices is None:
            raise ValueError("cluster sampler needs cluster_indices")
        if st == "cluster" and node_range is not None:
            raise ValueError(
                "node_range with the cluster sampler: partition hosts by "
                "clusters instead (give each process its own cluster_indices)"
            )
        if st == "cluster" and train_flag:
            # the reference's partition-quality print (dataloader.py v2:29-35)
            # plus the edge-cut fraction, on stderr
            from vq_gnn_tpu.graph.partition import (
                edge_cut_stats,
                labels_from_cluster_indices,
            )

            labels = labels_from_cluster_indices(self.N, cluster_indices)
            s = edge_cut_stats(graph.adj, labels)
            print(
                f"inter over intra: {s['inter_over_intra']:.4f} "
                f"(edge cut {100 * s['cut_fraction']:.2f}% of "
                f"{s['num_edges']} edges, {len(cluster_indices)} parts)",
                file=sys.stderr,
            )

        self._epoch = 0
        # pad-size high-water marks (keeps the jit cache small & monotone)
        self._B_bucket = 0
        self._Bp_bucket = 0
        self._E_bucket = 0
        self._S_bucket = 0
        self._St_bucket = 0

    # ---- batch index generation (one epoch) ----
    def _node_batches(self, rng) -> List[List[np.ndarray]]:
        st = self.sampler_type
        if st == "cluster":
            order = (
                rng.permutation(len(self.cluster_indices))
                if self.shuffle
                else np.arange(len(self.cluster_indices))
            )
            groups = [
                order[i : i + self.batch_size]
                for i in range(0, len(order), self.batch_size)
            ]
            return [
                [np.concatenate([self.cluster_indices[c] for c in g])] for g in groups
            ]

        if self.node_range is not None:
            lo, hi = self.node_range
            pool = np.arange(lo, hi)
        else:
            pool = np.arange(self.N)
        ids = rng.permutation(pool) if self.shuffle else pool
        chunks = [
            ids[i : i + self.batch_size]
            for i in range(0, len(pool), self.batch_size)
        ]
        out = []
        for idx in chunks:
            if st == "node":
                out.append([idx])
            elif st == "edge":
                walks = random_walk(self.rowptr, self.col, idx, 1, rng)
                out.append([np.unique(walks.reshape(-1))])
            elif st == "rw":
                walks = random_walk(
                    self.rowptr, self.col, idx, self.cfg.walk_length, rng
                )
                out.append([np.unique(walks.reshape(-1))])
            elif st == "cont":
                windows = [idx]
                cur = idx
                for _ in range(self.cfg.walk_length):
                    tripled = np.concatenate([cur] * 3)
                    stepped = random_walk(self.rowptr, self.col, tripled, 1, rng)[:, 1]
                    cur = np.unique(stepped)[: self.batch_size]
                    windows.append(cur)
                w = self.cfg.cont_sliding_window
                if w > 1:
                    windows = [
                        np.unique(np.concatenate(windows[i : i + w]))
                        for i in range(len(windows) - w + 1)
                    ]
                out.append(windows)
            else:
                raise ValueError("Sampler type not supported!")
        return out

    def _pad_sizes(self, B, Bp, E):
        cfg = self.cfg
        if cfg.fixed_B_pad:  # multi-host: identical static shapes everywhere
            return cfg.fixed_B_pad, cfg.fixed_Bp_pad, cfg.fixed_E_pad
        mn, me = cfg.pad_multiple_nodes, cfg.pad_multiple_edges
        self._B_bucket = max(self._B_bucket, round_up(B, mn))
        self._Bp_bucket = max(self._Bp_bucket, round_up(max(Bp, 1), mn))
        self._E_bucket = max(self._E_bucket, round_up(max(E, 1), me))
        return self._B_bucket, self._Bp_bucket, self._E_bucket

    def _mixed_slot_pads(self, er, K, Kt, dim_pad, attr):
        """(Sh_pad, St2_pad) for the mixed-K families (head full K-slots,
        dense Kt tail) — monotone high-water buckets like _slot_pad."""
        ms = max(self.cfg.pad_multiple_edges // K, 64)
        mst = max(self.cfg.pad_multiple_edges // Kt, 64)
        if self.cfg.fixed_B_pad:
            dim = self.cfg.fixed_B_pad + self.cfg.fixed_Bp_pad
            sh = round_up(self.cfg.fixed_E_pad // K + 1, ms)
            st = round_up(dim + self.cfg.fixed_E_pad // Kt + 1, mst)
            return sh, st
        deg = np.bincount(er, minlength=dim_pad)
        Sh = int((deg // K).sum())
        St2 = int(np.maximum((deg % K + Kt - 1) // Kt, 1).sum())
        b = getattr(self, attr, (0, 0))
        bucket = (
            max(b[0], round_up(max(Sh, 1), ms)),
            max(b[1], round_up(max(St2, 1), mst)),
        )
        setattr(self, attr, bucket)
        return bucket

    def _slot_pad(self, er, K, dim_pad, attr):
        ms = max(self.cfg.pad_multiple_edges // K, 64)
        if self.cfg.fixed_B_pad:
            # multi-host: deterministic upper bound so every process agrees
            # (E/K full slots + at most one partial/empty slot per row)
            bound = self.cfg.fixed_E_pad // K + self.cfg.fixed_B_pad + self.cfg.fixed_Bp_pad + 1
            return round_up(bound, ms)
        # dense-rows ELL: every one of the dim_pad local rows owns >= 1 slot
        deg = np.bincount(er, minlength=dim_pad)
        nnz_rows = int((deg > 0).sum())
        S = int(((deg + K - 1) // K).sum()) + (dim_pad - nnz_rows)
        bucket = max(getattr(self, attr), round_up(max(S, 1), ms))
        setattr(self, attr, bucket)
        return bucket

    def _build(self, node_idx: np.ndarray) -> PaddedBatch:
        g = self.graph
        rev = None
        if self.cfg.formulation == "bm":
            fo_ids, er, ec, ev, rev = bm_subgraph(
                self.rowptr,
                self.col,
                self.val,
                g.deg,
                g.deg_inv,
                node_idx,
                self.N,
                self.cfg.conv_type,
                self.cfg.recovery_flag,
                self.train_flag,
                exact_minibatch=self.cfg.exact_minibatch,
            )
        else:
            fo_ids, er, ec, ev = k_hop_subgraph(
                self.rowptr, self.col, self.val, node_idx, self.N, self.train_flag
            )
        B_pad, Bp_pad, E_pad = self._pad_sizes(len(node_idx), len(fo_ids), len(er))
        ell_K = S_pad = St_pad = ell_Kt = 0
        mixed_pads = None
        # mixed-K: plain spmm convs AND the fused GAT kernel (both recompute
        # the transposed side from scratch, so no cross-layout maps needed).
        # The bm GAT branch rides gat_conv_ell_mh, whose backward mirrors the
        # per-cell d_a through f_from_t — a map only the single-K ELL builder
        # produces — so the exclusion here is load-bearing: dropping it would
        # send bm GAT to the COO fallback, which crashes under the ell
        # backend (e.row is None).
        use_mixed = (
            self.cfg.spmm_backend == "ell"
            and self.cfg.ell_Kt > 0
            and not (self.cfg.conv_type == "GAT" and self.cfg.formulation == "bm")
        )
        if use_mixed:
            ell_K, ell_Kt = self.cfg.ell_K, self.cfg.ell_Kt
            dim_pad = B_pad + Bp_pad
            sh, st2 = self._mixed_slot_pads(er, ell_K, ell_Kt, dim_pad, "_Sm_bucket")
            tsh, tst2 = self._mixed_slot_pads(ec, ell_K, ell_Kt, dim_pad, "_Stm_bucket")
            mixed_pads = (sh, st2, tsh, tst2)
        elif self.cfg.spmm_backend == "ell":
            ell_K = self.cfg.ell_K
            dim_pad = B_pad + Bp_pad
            S_pad = self._slot_pad(er, ell_K, dim_pad, "_S_bucket")
            St_pad = self._slot_pad(ec, ell_K, dim_pad, "_St_bucket")
        L_pad = 0
        if self.with_link_edges:
            n_link = int(((er < len(node_idx)) & (ec < len(node_idx))).sum())
            self._L_bucket = max(self._L_bucket, round_up(max(n_link, 1), 1024))
            L_pad = self._L_bucket
        if not hasattr(self, "_tb_bucket"):
            self._tb_bucket = {
                "multiple": max(self.cfg.pad_multiple_edges // max(self.cfg.ell_K, 1), 64)
            }
        # backward truncation: x rows >= B_pad are codebook lookups in BOTH
        # formulations (bbprime fo-ids and bm per-neighbor codeword rows) —
        # their spmm cotangent flows only into the non-differentiated
        # vq_state, so the VJP can skip the >= B_pad transposed slots.  The
        # bm GAT branch rides gat_conv_ell_mh, which computes the exact full
        # VJP regardless (d_al/d_ar of codeword rows ARE live there).
        # Multi-host fixed-pad runs keep the exact full VJP.
        use_tb = (
            self.cfg.spmm_backend == "ell"
            and not self.cfg.fixed_B_pad
            and self.train_flag
        )
        return build_padded_batch(
            node_idx,
            fo_ids,
            er,
            ec,
            ev,
            self.N,
            B_pad,
            Bp_pad,
            E_pad,
            y=None if g.y is None else g.y[node_idx],
            train_mask=None if g.train_mask is None else g.train_mask[node_idx],
            deg_inv_B=None if g.deg_inv is None else g.deg_inv[node_idx],
            with_link_edges=self.with_link_edges,
            L_pad=L_pad,
            ell_K=ell_K,
            S_pad=S_pad,
            St_pad=St_pad,
            bm_rev=rev,
            R_pad=self._rev_pad(rev),
            t_b_bucket=self._tb_bucket if use_tb else None,
            ell_Kt=ell_Kt,
            mixed_pads=mixed_pads,
            rev_ell_bucket=self._rev_ell_bucket(rev),
        )

    def _rev_ell_bucket(self, rev):
        # rev-ELL kernel layout only under the ell backend (the COO fallback
        # keeps the XLA grid path, which its tests pin)
        if rev is None or self.cfg.spmm_backend != "ell":
            return None
        if not hasattr(self, "_revell_bucket"):
            self._revell_bucket = {}
        return self._revell_bucket

    def _rev_pad(self, rev):
        if rev is None:
            return 0
        if not hasattr(self, "_R_bucket"):
            self._R_bucket = 0
        self._R_bucket = max(
            self._R_bucket, round_up(max(len(rev[0]), 1), self.cfg.pad_multiple_edges)
        )
        return self._R_bucket

    def _epoch_iter(self):
        rng = np.random.RandomState((self.seed + self._epoch * 9973) % (2**31))
        self._epoch += 1
        for windows in self._node_batches(rng):
            yield [self._build(idx) for idx in windows], windows

    @staticmethod
    def _to_device(item):
        """Device placement happens in the CONSUMER thread: issuing transfers
        from the producer thread races main-thread TPU work and deadlocks the
        single-chip runtime in this environment."""
        import jax
        import jax.numpy as jnp

        windows, raw = item
        return [jax.tree.map(jnp.asarray, w) for w in windows], raw

    def __iter__(self):
        if not getattr(self, "prefetch", True):
            for item in self._epoch_iter():
                yield self._to_device(item)
            return
        # background thread overlaps host-side subgraph/ELL construction with
        # the device step (the reference's DataLoader num_workers analogue)
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        DONE = object()
        err = []

        def producer():
            try:
                for item in self._epoch_iter():
                    q.put(item)
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is DONE:
                break
            yield self._to_device(item)
        t.join()
        if err:
            raise err[0]
