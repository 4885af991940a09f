"""Node-classification trainer — the reference ``main_node.py`` loop.

Orchestration (SURVEY §3.1/§3.2): layerwise codebook init sweep over the test
loader, per-epoch training with warm-up rate and the manual linear lr ramp,
stochastic batched evaluation, best-by-valid logging.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.store import HostGraph
from vq_gnn_tpu.nn.model import ModelStatic, model_static
from vq_gnn_tpu.sampler.samplers import BatchLoader
from vq_gnn_tpu.train.state import TrainState, init_train_state
from vq_gnn_tpu.train.step import make_step_fns
from vq_gnn_tpu.utils.logger import AverageValueMeter, Logger
from vq_gnn_tpu.utils.metrics import accuracy, micro_f1


def device_features(x: np.ndarray) -> jnp.ndarray:
    """[N+1, F] feature table with a zero dustbin row for padded slots."""
    return jnp.asarray(np.concatenate([x, np.zeros((1, x.shape[1]), x.dtype)]))


def iter_cached(cache: dict, name: str, loader):
    """Iterate a DETERMINISTIC loader through a device-side batch cache.
    The first pass materializes and (if under the size cap) retains the
    device-placed batches; later passes skip the host rebuild AND the
    tunnel transfer (which leaks ~100% of every transferred byte into host
    RSS — train/segment.py).  VQ_GNN_EVAL_CACHE=off restores streaming."""
    import os

    cached = cache.get(name)
    if cached is not None:
        return cached
    items = list(loader)
    if os.environ.get("VQ_GNN_EVAL_CACHE", "on") != "off":
        cap_mb = float(os.environ.get("VQ_GNN_EVAL_CACHE_MB", "6000"))
        nbytes = 0
        for windows, _ in items:
            for leaf in jax.tree.leaves(windows):
                nbytes += getattr(leaf, "nbytes", 0)
        if nbytes / 1e6 <= cap_mb:
            cache[name] = items
    return items


class NodeTrainer:
    def __init__(
        self,
        graph: HostGraph,
        cfg: Config,
        num_classes: int,
        cluster_indices=None,
        use_ogb_acc: Optional[bool] = None,
        val_graph: Optional[HostGraph] = None,
        test_graph: Optional[HostGraph] = None,
    ):
        # inductive datasets (ppi/cluster): separate val/test graphs, each
        # evaluated as ONE full batch so B' is empty and the codebooks are
        # bypassed (reference main_node.py v2:158-171, 191-200, 276-281)
        self.val_graph, self.test_graph = val_graph, test_graph
        self.inductive = val_graph is not None
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
        try:  # persistent compile cache (tunnel-remote compiles are slow)
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
        self.graph = graph
        self.cfg = cfg
        self.multilabel = graph.y is not None and graph.y.ndim > 1 and graph.y.shape[1] > 1
        self.ms: ModelStatic = model_static(cfg, graph.num_features, num_classes)
        self.X_dev = device_features(graph.x)
        self.use_ogb_acc = (
            use_ogb_acc if use_ogb_acc is not None else not self.multilabel
        )

        if cfg.exact_eval_train_edges and 0 < cfg.test_batch_size < graph.num_nodes:
            # precondition (Config docstring): only valid when eval batches
            # cover the whole graph — partial batches would silently route
            # out-of-batch messages through frozen codebooks
            raise ValueError(
                "exact_eval_train_edges requires full-graph eval batches "
                f"(test_batch_size {cfg.test_batch_size} < num_nodes "
                f"{graph.num_nodes})"
            )
        self.train_loader = BatchLoader(
            graph, cfg, train_flag=True, cluster_indices=cluster_indices, seed=cfg.seed
        )
        test_sampler = "cluster" if cluster_indices is not None else "node"
        self.test_loader = BatchLoader(
            graph,
            cfg,
            # exact parity control: eval through train-time edge construction
            # (full-graph batches -> every edge exact, no codebook routing;
            # see Config.exact_eval_train_edges)
            train_flag=cfg.exact_eval_train_edges,
            sampler_type=test_sampler,
            cluster_indices=cluster_indices,
            batch_size=cfg.test_batch_size,
            shuffle=False,
            seed=cfg.seed + 1,
        )

        self.fns = make_step_fns(self.ms, cfg, self.multilabel)
        self.state: TrainState = init_train_state(
            jax.random.PRNGKey(cfg.seed), self.ms, graph.num_nodes
        )
        self.rng = jax.random.PRNGKey(cfg.seed + 17)
        self.logger = Logger(cfg.runs, cfg)
        # device-side batch cache for DETERMINISTIC loaders: the tunnel
        # runtime retains ~100% of every host->device transfer in host RSS
        # (train/segment.py), so re-transferring identical bytes each epoch
        # both leaks and pays the 0.5-20 MB/s tunnel again.  The eval
        # loaders always qualify (shuffle=False); the train loader
        # qualifies only for the exact full-graph control (one batch = the
        # whole graph, order-invariant math).  VQ_GNN_EVAL_CACHE=off
        # restores streaming.
        self._batch_cache = {}
        self._cache_train = (
            cfg.sampler_type == "node" and cfg.batch_size >= graph.num_nodes
        )

        if self.inductive:
            self._split_loaders = {}
            for name, gr in (
                ("train", graph),
                ("val", val_graph),
                ("test", test_graph),
            ):
                self._split_loaders[name] = (
                    BatchLoader(
                        gr,
                        cfg,
                        train_flag=False,
                        sampler_type="node",
                        batch_size=gr.num_nodes,
                        shuffle=False,
                        seed=cfg.seed + 3,
                    ),
                    device_features(gr.x),
                    gr,
                )

    def _iter_cached(self, name: str, loader):
        return iter_cached(self._batch_cache, name, loader)

    # ---- layerwise codebook bootstrap (main_node.py v2:17-37) ----
    def run_init_sweep(self, verbose: bool = False):
        for layer_idx in range(1, self.ms.num_layers + 1):
            if verbose:
                print(f"init sweep layer {layer_idx}")
            step = self.fns.init_step_for(layer_idx)
            for windows, _ in self._iter_cached("test", self.test_loader):
                batch = windows[0]
                new_vq, new_tr = step(
                    self.state.vq_states,
                    self.state.vq_states_tr or [],
                    self.state.params,
                    self.X_dev,
                    batch,
                )
                self.state = self.state.replace(
                    vq_states=new_vq, vq_states_tr=new_tr or None
                )

    def warm_up_rate(self, epoch: int) -> float:
        cfg = self.cfg
        if cfg.warm_up and epoch <= cfg.warm_up_epochs:
            return epoch / cfg.warm_up_epochs
        return 1.0

    def lr_at(self, epoch: int) -> float:
        cfg = self.cfg
        if cfg.sche:
            return cfg.lr * epoch / 200 if epoch < 200 else cfg.lr
        return cfg.lr

    # ---- one training epoch (main_node.py v2:39-122) ----
    def train_epoch(self, epoch: int, verbose: bool = False):
        cfg = self.cfg
        loss_meter, loss_cls_meter = AverageValueMeter(), AverageValueMeter()
        wur = self.warm_up_rate(epoch)
        lr = self.lr_at(epoch)
        have_train_mask = self.graph.train_mask is not None

        train_iter = (
            self._iter_cached("train", self.train_loader)
            if self._cache_train
            else self.train_loader
        )
        for windows, raw_idx in train_iter:
            for j, batch in enumerate(windows):
                if have_train_mask:
                    n_train = int(self.graph.train_mask[raw_idx[j]].sum())
                    if n_train <= 0:  # skip unlabeled batches (v2:60-63)
                        continue
                do_opt = 0.0 if (len(windows) > 1 and j == 0) else 1.0
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self.fns.train_step(
                    self.state,
                    self.X_dev,
                    batch,
                    jnp.float32(wur),
                    jnp.float32(lr),
                    jnp.float32(do_opt),
                    sub,
                )
                loss_meter.add(float(metrics["loss"]))
                loss_cls_meter.add(float(metrics["loss_cls"]))
                if bool(metrics["bad_init"]):
                    raise ValueError("Bad Init!")
                if verbose:
                    print(
                        f"batch window {j}: loss {float(metrics['loss']):.4f} "
                        f"acc {float(metrics['train_acc']):.4f}"
                    )
        return loss_meter.value()[0], loss_cls_meter.value()[0]

    # ---- stochastic batched evaluation (main_node.py v2:125-156) ----
    def predict_all(self) -> np.ndarray:
        outs = []
        for windows, raw_idx in self._iter_cached("test", self.test_loader):
            batch = windows[0]
            out = self.fns.eval_step(self.state, self.X_dev, batch)
            outs.append(np.asarray(out)[: len(raw_idx[0])])
        return np.concatenate(outs, axis=0)

    def evaluate(self):
        if self.inductive:
            results = []
            for name in ("train", "val", "test"):
                loader, X_dev, gr = self._split_loaders[name]
                outs = []
                for windows, raw in self._iter_cached(f"split_{name}", loader):
                    out = self.fns.eval_step(self.state, X_dev, windows[0])
                    outs.append(np.asarray(out)[: len(raw[0])])
                outs = np.concatenate(outs, axis=0)
                results.append(micro_f1(outs, gr.y))
            return tuple(results)
        outs = self.predict_all()
        g = self.graph
        metric = accuracy if self.use_ogb_acc else micro_f1
        if self.use_ogb_acc and g.y.ndim > 1:
            y = g.y.reshape(-1)
        else:
            y = g.y
        return (
            metric(outs, y, g.train_mask),
            metric(outs, y, g.val_mask),
            metric(outs, y, g.test_mask),
        )

    # ---- exact full-graph inference (codebooks bypassed) ----
    def full_graph_predict(self) -> np.ndarray:
        """v1 ``LowRankGNN.inference`` (v1/models.py:486-504): one plain conv
        stack over the whole normalized adjacency with the learned weights."""
        from vq_gnn_tpu.nn.model import full_graph_inference
        from vq_gnn_tpu.ops.spmm import make_edges

        row, col, val = self.graph.coo()
        edges = make_edges(row, col, val, self.graph.num_nodes)
        out = full_graph_inference(
            self.state.params,
            self.state.bn_state,
            self.ms,
            jnp.asarray(self.graph.x),
            edges,
        )
        return np.asarray(out)

    # ---- optional MiniBatchKMeans codebook seeding (reference --kmeans-init,
    # v1/models.py:147-159) ----
    def seed_kmeans(self):
        from vq_gnn_tpu.nn.vq import feature_kmeans_init
        from vq_gnn_tpu.train.step import _branch_view

        windows, raw = next(iter(self.test_loader))
        batch = windows[0]
        x = jnp.take(self.X_dev, batch.batch_idx, axis=0)
        from vq_gnn_tpu.nn.model import model_forward

        for l in range(self.ms.num_layers):
            nb = self.ms.num_branches[l]
            if l > 0:
                x_l, _, _, _ = model_forward(
                    self.state.params,
                    self.state.vq_states,
                    self.state.bn_state,
                    self.ms,
                    x,
                    batch,
                    num_layers_to_run=l,
                    with_bn_act=False,
                )
            else:
                x_l = x
            B = int(batch.num_B)
            Xb = np.asarray(_branch_view(x_l, nb, self.ms.num_D))[:, :B]
            new_state = feature_kmeans_init(
                self.state.vq_states[l], Xb, np.asarray(batch.batch_idx)[:B], self.ms.vq
            )
            vq = list(self.state.vq_states)
            vq[l] = new_state
            self.state = self.state.replace(vq_states=vq)

    # ---- inductive stochastic eval with per-split c tables ----
    def evaluate_split_stochastic(self, graph: HostGraph, batch_size: int):
        """v1-inductive-style eval on another graph: assignments recomputed
        per batch into a fresh per-split codeword table (SURVEY §3.3)."""
        import jax.numpy as jnp

        loader = BatchLoader(
            graph,
            self.cfg,
            train_flag=False,
            sampler_type="node",
            batch_size=batch_size,
            shuffle=False,
            seed=self.cfg.seed + 7,
        )
        X_dev = device_features(graph.x)
        c_tables = [
            jnp.zeros(
                (graph.num_nodes + 1, self.ms.num_branches[l]), jnp.int16
            )
            for l in range(self.ms.num_layers)
        ]
        outs = []
        for windows, raw in loader:
            out, c_tables = self.fns.eval_assign_step(
                self.state, c_tables, X_dev, windows[0]
            )
            outs.append(np.asarray(out)[: len(raw[0])])
        return np.concatenate(outs, axis=0)

    # ---- full run (main_node.py v2:233-308) ----
    def fit(
        self,
        run: int = 0,
        verbose: bool = True,
        ckpt_dir: Optional[str] = None,
        ckpt_every: int = 50,
        resume: bool = False,
    ):
        cfg = self.cfg
        from vq_gnn_tpu.train.checkpoint import (
            load_step,
            restore_checkpoint,
            save_checkpoint,
        )

        ckpt_path = None
        start_epoch = 1
        if ckpt_dir:
            import os

            ckpt_path = os.path.join(ckpt_dir, f"run{run}.npz")
            if resume and os.path.exists(ckpt_path):
                self.state = restore_checkpoint(ckpt_path, self.state)
                start_epoch = load_step(ckpt_path) + 1  # stored epoch number
                if verbose:
                    print(f"resumed from {ckpt_path} at epoch {start_epoch}")
        if start_epoch == 1:
            if cfg.kmeans_init:
                self.seed_kmeans()
            self.run_init_sweep(verbose=verbose)
            if verbose:
                print("init done")
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.time()
            loss, loss_cls = self.train_epoch(epoch)
            result = self.evaluate()
            self.logger.add_result(run, result)
            if ckpt_path and epoch % ckpt_every == 0:
                save_checkpoint(ckpt_path, self.state, step=epoch)
            if verbose and epoch % cfg.log_steps == 0:
                tr, va, te = result
                print(
                    f"Run: {run + 1}, Epoch: {epoch}, Loss: {loss:.4f}, "
                    f"Loss Cls: {loss_cls:.4f}, Train: {100 * tr:.2f}%, "
                    f"Valid: {100 * va:.2f}%, Test: {100 * te:.2f}% "
                    f"[{time.time() - t0:.1f}s]"
                )
                if getattr(self, "vq_diagnostics", False):
                    self.print_vq_diagnostics(epoch)
        return self.logger.statistics(run)

    def print_vq_diagnostics(self, epoch: int):
        """Per-layer VQ health (the reference's exp_log catalogue,
        utils/logger.py:89-232)."""
        from vq_gnn_tpu.utils.diagnostics import codebook_stats

        for l, s in enumerate(self.state.vq_states):
            st = codebook_stats(s, self.ms.vq)
            print(
                f"  [vq L{l}] eff_codewords="
                f"{np.mean(st['effective_codewords']):.1f}/{self.ms.vq.num_M} "
                f"size_min={st['cluster_size_min'].min():.3g} "
                f"feat_std={np.mean(st['feat_std_per_dim']):.3f} "
                f"grad_std={np.mean(st['grad_std_per_dim']):.3f}"
            )
