"""Static-shape padded mini-batches.

XLA compiles one program per shape, so every batch is padded to bucketed
sizes: batch nodes to ``B_pad``, 1-hop boundary nodes to ``Bp_pad``, edges to
``E_pad``.  Padding conventions (enforced here, relied on everywhere):

- padded node slots carry the **dustbin id N** (features row N is zero, VQ
  scatters land in the dustbin row of ``c_indices``);
- padded edges are sentinels ``row = col = dim_pad, val = 0``;
- boolean masks ``valid_B`` / ``valid_fo`` gate all batch statistics.

Local node numbering inside a batch: batch nodes occupy [0, B_pad) (real ones
first), boundary (B') nodes occupy [B_pad, B_pad + Bp_pad).  This mirrors the
reference's ``subset = [B || B']`` layout (``dataloader.py v2:119-128``) with
static offsets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from vq_gnn_tpu.ops.spmm import Edges


class PaddedBatch(struct.PyTreeNode):
    batch_idx: jnp.ndarray  # [B_pad] int32 global node ids (pad -> N)
    fo_ids: jnp.ndarray  # [Bp_pad] int32 global 1-hop boundary ids (pad -> N)
    valid_B: jnp.ndarray  # [B_pad] bool
    valid_fo: jnp.ndarray  # [Bp_pad] bool
    edges: Edges  # local numbering, num_rows = B_pad + Bp_pad
    num_B: jnp.ndarray  # scalar int32 (actual batch size)
    y: Optional[jnp.ndarray] = None  # [B_pad] int32 or [B_pad, C] float32
    train_mask: Optional[jnp.ndarray] = None  # [B_pad] bool
    # v1 "B+M" formulation: deg_inv of batch rows for mapper self-loops
    deg_inv_B: Optional[jnp.ndarray] = None
    # link prediction: in-batch positive edges, local indices < B
    # (reference prepare_batch_input_link, misc.py:88-91)
    link_src: Optional[jnp.ndarray] = None  # [L_pad] int32
    link_dst: Optional[jnp.ndarray] = None  # [L_pad] int32
    link_mask: Optional[jnp.ndarray] = None  # [L_pad] bool
    # v1 non-GCN recovery: per-edge inputs of the exact codeword-row (M-row)
    # cell matrix relu(sum rv - sum A) (v1/utils/dataloader.py:153-180).
    # rev_col is the GLOBAL neighbor id (codeword looked up per branch on
    # device); padding entries have val 0.
    bm_rev_row: Optional[jnp.ndarray] = None  # [R_pad] int32 local batch row
    bm_rev_col: Optional[jnp.ndarray] = None  # [R_pad] int32 global neighbor
    bm_rev_val: Optional[jnp.ndarray] = None  # [R_pad] f32 (rv or -A)
    # rev-ELL layout of the same reverse list (ops/pallas_rev.py): sorted +
    # (row, col)-coalesced K-wide row slots plus the packed (tile, chunk)
    # schedule for the fused recovery kernel.  Built alongside the flat
    # arrays under the ell backend; flat stays for the XLA fallback/oracle.
    rev_slot_col: Optional[jnp.ndarray] = None  # [S_pad, K] int32 global
    rev_slot_val: Optional[jnp.ndarray] = None  # [S_pad, K] f32
    rev_slot_row: Optional[jnp.ndarray] = None  # [S_pad, 1] int32 ascending
    rev_tile_of: Optional[jnp.ndarray] = None  # [P] int32
    rev_blk_of: Optional[jnp.ndarray] = None  # [P] int32
    rev_flags: Optional[jnp.ndarray] = None  # [P] int32 (first|live|fin)

    @property
    def B_pad(self) -> int:
        return self.batch_idx.shape[0]

    @property
    def Bp_pad(self) -> int:
        return self.fo_ids.shape[0]


def round_up(n: int, multiple: int) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def build_padded_batch(
    node_idx: np.ndarray,
    fo_ids: np.ndarray,
    edge_row: np.ndarray,  # local indices: batch rows < len(node_idx),
    edge_col: np.ndarray,  # boundary ids offset by len(node_idx)
    edge_val: np.ndarray,
    num_N: int,
    B_pad: int,
    Bp_pad: int,
    E_pad: int,
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    deg_inv_B: Optional[np.ndarray] = None,
    with_transpose: bool = True,
    with_link_edges: bool = False,
    L_pad: int = 0,
    ell_K: int = 0,
    S_pad: int = 0,
    St_pad: int = 0,
    bm_rev=None,
    R_pad: int = 0,
    t_b_bucket: Optional[dict] = None,
    ell_Kt: int = 0,
    mixed_pads: Optional[tuple] = None,  # (Sh, St2, tSh, tSt2)
    rev_ell_bucket: Optional[dict] = None,  # monotone {"S":..., "P":...}
) -> PaddedBatch:
    """Pad a host-built subgraph batch to static shapes.

    Inputs use a compact local numbering where boundary node j is
    ``len(node_idx) + j``; this function shifts boundary indices to the
    static offset ``B_pad`` and pads everything.
    """
    B, Bp, E = len(node_idx), len(fo_ids), len(edge_row)
    if B > B_pad or Bp > Bp_pad or E > E_pad:
        raise ValueError(
            f"batch exceeds pad sizes: B={B}/{B_pad} Bp={Bp}/{Bp_pad} E={E}/{E_pad}"
        )
    dim_pad = B_pad + Bp_pad

    def pad_ids(ids, size):
        out = np.full(size, num_N, np.int32)
        out[: len(ids)] = ids
        return out

    # shift boundary-local indices from B to B_pad
    def shift(a):
        a = np.asarray(a, np.int64)
        return np.where(a >= B, a - B + B_pad, a).astype(np.int32)

    r, c = shift(edge_row), shift(edge_col)
    v = np.asarray(edge_val, np.float32)
    order = np.argsort(r, kind="stable")
    rs, cs, vs = r[order], c[order], v[order]

    if ell_Kt > 0:
        # mixed-K slot-ELL: full K-wide head slots (compact rows) + Kt-wide
        # dense tail — ~28% fewer gathered cells than single-K at K=8
        from vq_gnn_tpu.ops.spmm import build_mixed_ell_host

        Sh_pad, St2_pad, tSh_pad, tSt2_pad = mixed_pads
        hrc, hc, hv, hinv, trow, tcol, tval, h_base, t_base, hrg = (
            build_mixed_ell_host(rs, cs, vs, dim_pad, ell_K, ell_Kt, Sh_pad, St2_pad)
        )
        t_order = np.argsort(cs, kind="stable")
        thrc, thc, thv, thinv, ttrow, ttcol, ttval, th_base, tt_base, thrg = (
            build_mixed_ell_host(
                cs[t_order], rs[t_order], vs[t_order], dim_pad, ell_K, ell_Kt,
                tSh_pad, tSt2_pad,
            )
        )
        edges = Edges(
            head_rowc=np.asarray(hrc), head_col=np.asarray(hc),
            head_val=np.asarray(hv), head_inv=np.asarray(hinv),
            head_rowg=np.asarray(hrg),
            tail_row=np.asarray(trow), tail_col=np.asarray(tcol),
            tail_val=np.asarray(tval),
            t_head_rowc=np.asarray(thrc), t_head_col=np.asarray(thc),
            t_head_val=np.asarray(thv), t_head_inv=np.asarray(thinv),
            t_head_rowg=np.asarray(thrg),
            t_tail_row=np.asarray(ttrow), t_tail_col=np.asarray(ttcol),
            t_tail_val=np.asarray(ttval),
            num_rows=dim_pad,
            dense_rows=True,
        )
        if t_b_bucket is not None:
            # per-family truncation prefixes (slots with global row < B_pad);
            # monotone buckets keep the static shapes stable across batches
            ms = max(t_b_bucket.get("multiple", 2048), 64)
            for key, bound, cap in (
                ("vh", int(th_base[B_pad]), tSh_pad),
                ("vt", int(tt_base[B_pad]), tSt2_pad),
            ):
                b = ((bound + ms - 1) // ms) * ms
                t_b_bucket[key] = max(t_b_bucket.get(key, 0), b)
            tbh = min(t_b_bucket["vh"], tSh_pad)
            tbt = min(t_b_bucket["vt"], tSt2_pad)
            if tbt < tSt2_pad or tbh < tSh_pad:
                edges = edges.replace(
                    b_rows=B_pad, t_head_b_slots=tbh, t_tail_b_slots=tbt
                )
    elif ell_K > 0:
        # slot-ELL (primary TPU layout) for forward and transposed graphs
        from vq_gnn_tpu.ops.spmm import build_ell_host

        er_, ec_, ev_ = build_ell_host(rs, cs, vs, dim_pad, ell_K, S_pad)
        t_order = np.argsort(cs, kind="stable")
        tr_, tc_, tv_ = build_ell_host(
            cs[t_order], rs[t_order], vs[t_order], dim_pad, ell_K, St_pad
        )
        # position maps between the two layouts (same edges), so attention
        # values computed in the forward layout can be mirrored into the
        # transposed one with a single gather (sentinel -> mode='fill' zero)
        from vq_gnn_tpu.ops.spmm import ell_positions

        f_pos = ell_positions(rs, ell_K, dim_pad)
        t_pos = ell_positions(cs[t_order], ell_K, dim_pad)
        t_from_f = np.full(St_pad * ell_K, S_pad * ell_K, np.int32)
        t_from_f[t_pos] = f_pos[t_order]
        f_from_t = np.full(S_pad * ell_K, St_pad * ell_K, np.int32)
        f_from_t[f_pos[t_order]] = t_pos
        edges = Edges(
            ell_row=np.asarray(er_),
            ell_col=np.asarray(ec_),
            ell_val=np.asarray(ev_),
            t_ell_row=np.asarray(tr_),
            t_ell_col=np.asarray(tc_),
            t_ell_val=np.asarray(tv_),
            t_from_f=np.asarray(t_from_f.reshape(St_pad, ell_K)),
            f_from_t=np.asarray(f_from_t.reshape(S_pad, ell_K)),
            num_rows=dim_pad,
            dense_rows=True,  # build_ell_host gives every row >= 1 slot
        )
        if t_b_bucket is not None:
            # backward-truncation bound: x rows >= B_pad are codebook
            # lookups with dead cotangents (see Edges.b_rows); the bound is
            # a monotone bucket so static shapes stay stable across batches
            ms = max(t_b_bucket.get("multiple", 2048), 64)
            tb = int((np.asarray(tr_) < B_pad).sum())
            tb = ((tb + ms - 1) // ms) * ms
            t_b_bucket["v"] = max(t_b_bucket.get("v", 0), tb)
            tb = min(t_b_bucket["v"], St_pad)
            if tb < St_pad:
                edges = edges.replace(b_rows=B_pad, t_b_slots=tb)
    else:
        row = np.full(E_pad, dim_pad, np.int32)
        col = np.full(E_pad, dim_pad, np.int32)
        val = np.zeros(E_pad, np.float32)
        row[:E], col[:E], val[:E] = rs, cs, vs
        tperm = (
            np.argsort(col, kind="stable").astype(np.int32) if with_transpose else None
        )
        edges = Edges(
            row=np.asarray(row),
            col=np.asarray(col),
            val=np.asarray(val),
            tperm=None if tperm is None else np.asarray(tperm),
            num_rows=dim_pad,
        )

    valid_B = np.zeros(B_pad, bool)
    valid_B[:B] = True
    valid_fo = np.zeros(Bp_pad, bool)
    valid_fo[:Bp] = True

    def pad_rows(a, fill=0):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.full((B_pad,) + a.shape[1:], fill, a.dtype)
        out[:B] = a
        return out

    link_src = link_dst = link_mask = None
    if with_link_edges:
        # in-batch positive edges: both local endpoints < B (misc.py:88-91)
        e_row = np.asarray(edge_row, np.int64)
        e_col = np.asarray(edge_col, np.int64)
        sel = (e_row < B) & (e_col < B)
        ls, ld = e_row[sel], e_col[sel]
        if L_pad <= 0:
            L_pad = round_up(max(len(ls), 1), 1024)
        if len(ls) > L_pad:
            raise ValueError(f"link edges {len(ls)} exceed L_pad={L_pad}")
        link_src = np.zeros(L_pad, np.int32)
        link_dst = np.zeros(L_pad, np.int32)
        link_mask = np.zeros(L_pad, bool)
        link_src[: len(ls)], link_dst[: len(ld)] = ls, ld
        link_mask[: len(ls)] = True
        link_src = np.asarray(link_src)
        link_dst = np.asarray(link_dst)
        link_mask = np.asarray(link_mask)

    return PaddedBatch(
        batch_idx=np.asarray(pad_ids(node_idx, B_pad)),
        fo_ids=np.asarray(pad_ids(fo_ids, Bp_pad)),
        valid_B=np.asarray(valid_B),
        valid_fo=np.asarray(valid_fo),
        edges=edges,
        num_B=np.asarray(B, jnp.int32),
        y=None if y is None else np.asarray(pad_rows(y)),
        train_mask=None if train_mask is None else np.asarray(pad_rows(train_mask, False)),
        deg_inv_B=None if deg_inv_B is None else np.asarray(pad_rows(deg_inv_B, 0.0)),
        link_src=link_src,
        link_dst=link_dst,
        link_mask=link_mask,
        **_pad_bm_rev(bm_rev, R_pad, num_N),
        **_build_rev_ell_fields(bm_rev, rev_ell_bucket, B_pad, num_N),
    )


# rev-ELL tunables (ops/pallas_rev.py kernel shape constants)
REV_K, REV_TS, REV_TB = 8, 256, 256


def _build_rev_ell_fields(bm_rev, bucket, B_pad, num_N):
    if bm_rev is None or bucket is None:
        return {}
    from vq_gnn_tpu.ops.pallas_rev import build_rev_ell, pad_rev_ell, rev_tb

    rr, rc, rv = bm_rev
    tb = rev_tb(B_pad, REV_TB)
    d = build_rev_ell(rr, rc, rv, B_pad, num_N, K=REV_K, T_s=REV_TS, TB=tb)
    S = d["slot_row"].shape[0]
    P = d["tile_of"].shape[0]
    bucket["S"] = max(bucket.get("S", 0), round_up(S, 8 * REV_TS))
    bucket["P"] = max(bucket.get("P", 0), round_up(P, 64))
    d = pad_rev_ell(
        d, bucket["S"], bucket["P"], B_pad, num_N, T_s=REV_TS, TB=tb
    )
    return dict(
        rev_slot_col=np.asarray(d["slot_col"]),
        rev_slot_val=np.asarray(d["slot_val"]),
        rev_slot_row=np.asarray(d["slot_row"]),
        rev_tile_of=np.asarray(d["tile_of"]),
        rev_blk_of=np.asarray(d["blk_of"]),
        rev_flags=np.asarray(d["flags"]),
    )


def _pad_bm_rev(bm_rev, R_pad, num_N):
    if bm_rev is None:
        return {}
    rr, rc, rv = bm_rev
    if len(rr) > R_pad:
        raise ValueError(f"rev edges {len(rr)} exceed R_pad={R_pad}")
    row = np.zeros(R_pad, np.int32)
    colg = np.full(R_pad, num_N, np.int32)
    val = np.zeros(R_pad, np.float32)
    row[: len(rr)] = rr
    colg[: len(rc)] = rc
    val[: len(rv)] = rv
    return dict(
        bm_rev_row=np.asarray(row),
        bm_rev_col=np.asarray(colg),
        bm_rev_val=np.asarray(val),
    )
