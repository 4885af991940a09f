"""Configuration for the VQ-GNN TPU framework.

Mirrors the reference CLI surface (``vq_gnn_v2/utils/parser.py:3-68`` and the
v1 variant) as a typed dataclass, plus TPU-specific knobs that have no
reference counterpart (mesh shape, padding buckets, kernel backends).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- model (reference: --num-layers/--hidden-channels/--conv-type/...) ----
    num_layers: int = 3
    hidden_channels: int = 128
    conv_type: str = "GCN"  # GCN | SAGE | GAT
    skip: bool = False
    act: str = "leaky_gelu"  # relu | elu | leaky_gelu
    bn_flag: bool = True
    dropout: float = 0.0
    alpha_dropout_flag: bool = False
    dropbranch: float = 0.0
    transformer_flag: bool = False

    # ---- VQ (reference: --num-M/--num-D/--grad-scale/--momentum/...) ----
    num_M: int = 256
    num_D: int = 4
    grad_scale: Tuple[float, float] = (1.0, 1.0)
    momentum: float = 0.1  # grad-BN running-stat momentum
    commitment_cost: float = 0.0
    ema_decay: float = 0.99
    ema_epsilon: float = 1e-24
    warm_up_flag: bool = True  # Laplace smoothing of EMA cluster sizes
    kmeans_init: bool = False
    kmeans_iter: int = 100
    split: bool = True
    ema_flag: bool = True

    # vq_update_mode selects hook semantics (no reference flag — see SURVEY):
    #   'reference' — reproduce vq_gnn_v2 as shipped: grad hooks are registered on
    #                 unused tensor slices (models.py v2:181-185) and never fire, so
    #                 codebooks/c_indices freeze after the init sweep and
    #                 info_backward == 0 during training.
    #   'live'      — the paper-intended semantics (and vq_gnn_v1 behavior): each
    #                 step captures dL/d(out_B) per branch, runs the joint
    #                 feature+grad EMA codebook update, and rewrites c_indices;
    #                 the update is visible to the NEXT batch (hook timing).
    vq_update_mode: str = "live"

    # formulation selects the mini-batch message-passing formulation:
    #   'bbprime' — v2 "B + B'": batch extended by exact 1-hop neighbors whose
    #               features are looked up from the codebook (models.py v2:144-231).
    #   'bm'      — v1 "B + M": out-of-batch neighbors remapped to codeword rows
    #               of a synthetic (B+M)x(B+M) adjacency (v1/utils/dataloader.py:144-192).
    formulation: str = "bbprime"
    recovery_flag: bool = True  # v1 mapper exact-in-batch recovery term

    # ---- sampler (reference: --sampler-type/--num-parts/--walk-length/...) ----
    sampler_type: str = "node"  # node | edge | rw | cont | cluster
    batch_size: int = 10000
    test_batch_size: int = 60000
    num_parts: int = 1
    walk_length: int = 5
    cont_sliding_window: int = 1

    # ---- training (reference: --lr/--epochs/--warm-up/--sche/...) ----
    lr: float = 0.01
    epochs: int = 500
    warm_up: bool = True
    warm_up_epochs: float = 0.0
    sche: bool = False
    clip: Optional[Sequence[float]] = None
    ce_only: bool = False
    # exact-control evaluation: build eval batches with the TRAIN-time edge
    # construction.  The reference's eval path routes every message through
    # the codeword of its source (v1 mapper with A_BB=None at eval,
    # dataloader.py:70-73; v2 k-hop eval rows) — correct for a trained
    # codebook, meaningless for the parity experiment's exact control whose
    # codebooks are frozen at init.  With full-graph batches the train-time
    # construction has every edge in-batch-exact, so the control never
    # touches a codebook.  Only valid when batches cover the whole graph.
    exact_eval_train_edges: bool = False
    # convergence-matched mini-batch control (round-5): same sampler, same
    # batches, same update count as the VQ arm, but messages ride ONLY the
    # exact in-batch edges (A_BB + self-loops) — no codeword routing, no
    # recovery term, codebooks untouched.  Isolates the quantization cost
    # at equal optimization budget (the full-batch control takes 1 step
    # per epoch and plateaus optimizer-limited; see train/parity.py).
    exact_minibatch: bool = False
    runs: int = 1
    log_steps: int = 1
    seed: int = 0

    # ---- data ----
    dataset: str = "arxiv"
    data_root: str = "./datasets"

    # ---- TPU-specific (no reference counterpart) ----
    # Padding bucket granularity for B' and edge counts (static XLA shapes).
    pad_multiple_nodes: int = 4096
    pad_multiple_edges: int = 16384
    # Kernel backend for the sparse aggregate:
    #   'ell' — slot-ELL gather layout with transpose-ELL backward (fastest)
    #   'coo' — row-sorted COO gather+segment_sum
    spmm_backend: str = "ell"
    # Edges per ELL slot (K). Swept on v5e at arxiv scale: K=8 beats 4 and 16
    # (13.17M vs 12.20M/12.64M edges/s) — padding waste vs slot-count balance.
    ell_K: int = 8
    # Mixed-K tail width (0 = single-K layout, the measured default). When
    # > 0, each row's edges split into full K-wide HEAD slots (compact rows,
    # folded back by one gather) + a dense Kt-wide TAIL; cuts K=8 slot
    # padding 27% -> 7.5% at arxiv degree profile but total slot-rows never
    # decrease, and on TPU the aggregate is slot-row bound: measured SLOWER
    # for both GCN (29.7 -> 28.3M edges/s) and GAT (12.1 -> 9.6M) — see
    # BASELINE.md "Mixed-K ELL". Kept as a tested option for other degree
    # profiles. All convs except GAT-bm (per-branch gat_ell_values is
    # single-layout).
    ell_Kt: int = 0
    # VQ assignment/lookup backend. 'auto' resolves by platform at
    # model-build time: 'pallas_fast' on TPU (the bench default), 'xla'
    # elsewhere. Explicit values: xla | xla_fast | scan | pallas |
    # pallas_fast ('xla'/'pallas' are the exact-parity backends).
    vq_backend: str = "auto"
    # Compute dtype for the aggregate/matmul path. f32 keeps reference parity;
    # bf16 rides the MXU at full rate.
    compute_dtype: str = "float32"
    # Default matmul precision for f32 matmuls: 'highest' = exact f32
    # (multi-pass bf16 on the MXU), 'default' = single-pass bf16 (fastest,
    # ~1e-3 relative error).  VQ assignment/EMA always runs 'highest'.
    matmul_precision: str = "highest"
    # Device mesh: (data,) axis size; 0 = use all local devices.
    mesh_data: int = 0
    # Fixed pad sizes (0 = adaptive high-water buckets). Multi-host SPMD
    # requires identical static shapes on every process, so set these there.
    fixed_B_pad: int = 0
    fixed_Bp_pad: int = 0
    fixed_E_pad: int = 0

    def __post_init__(self):
        if self.conv_type not in ("GCN", "SAGE", "GAT"):
            raise ValueError(f"conv_type {self.conv_type!r} not supported")
        if self.act not in ("relu", "elu", "leaky_gelu"):
            raise ValueError("Activation not supported!")
        if self.sampler_type not in ("node", "edge", "rw", "cont", "cluster"):
            raise ValueError("Sampler type not supported!")
        if self.vq_update_mode not in ("reference", "live"):
            raise ValueError("vq_update_mode must be 'reference' or 'live'")
        if self.formulation not in ("bbprime", "bm"):
            raise ValueError("formulation must be 'bbprime' or 'bm'")
        if self.num_M > 32767:
            # c_indices is int16 (reference models.py v2:27-28)
            raise ValueError("num_M must fit int16 (<= 32767)")
        if self.hidden_channels % self.num_D != 0:
            raise ValueError("Cannot fully split hidden features")


def num_branches(channels: int, num_D: int) -> int:
    if channels % num_D != 0:
        raise ValueError("Cannot fully split")
    return channels // num_D
