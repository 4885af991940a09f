"""Link prediction — the reference ``main_link.py`` subsystem (C16).

- :func:`init_predictor` / :func:`predictor_forward`: the LinkPredictor MLP
  head on ``x_i * x_j`` -> sigmoid (``main_link.py v2:18-41``)
- :class:`LinkTrainer`: training with in-batch positive edges + uniform
  in-batch negative resampling and logistic loss (``main_link.py v2:43-99``),
  per-layer gradient clipping (84-88), Hits@K / MRR evaluation over cached
  stochastic embeddings (126-244).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vq_gnn_tpu.config import Config
from vq_gnn_tpu.graph.store import HostGraph
from vq_gnn_tpu.nn.model import ModelStatic, model_forward, model_static, zero_probes, _linear_init
from vq_gnn_tpu.nn.vq import vq_update
from vq_gnn_tpu.sampler.samplers import BatchLoader
from vq_gnn_tpu.train.loop import device_features
from vq_gnn_tpu.train.optim import init_rmsprop, rmsprop_update
from vq_gnn_tpu.train.state import TrainState, init_train_state
from vq_gnn_tpu.train.step import _branch_view
from vq_gnn_tpu.utils.logger import Logger
from vq_gnn_tpu.utils.metrics import hits_at_k, mrr


# ---------------- LinkPredictor MLP ----------------
def init_predictor(rng, in_channels, hidden_channels, out_channels, num_layers):
    """in -> hidden, (num_layers-2) x hidden -> hidden, hidden -> out
    (``main_link.py v2:18-28``)."""
    keys = jax.random.split(rng, num_layers)
    dims = [in_channels] + [hidden_channels] * (num_layers - 1) + [out_channels]
    return [
        _linear_init(keys[i], dims[i], dims[i + 1]) for i in range(num_layers)
    ]


def predictor_forward(pp, x_i, x_j, dropout_p=0.0, training=False, rng=None):
    x = x_i * x_j
    for lin in pp[:-1]:
        x = x @ lin["w"] + lin["b"]
        x = jax.nn.relu(x)
        if training and dropout_p > 0:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_p, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_p), 0.0)
    x = x @ pp[-1]["w"] + pp[-1]["b"]
    return jax.nn.sigmoid(x)


def make_link_step(ms: ModelStatic, cfg: Config):
    live = cfg.vq_update_mode == "live"
    D = ms.num_D
    clip = cfg.clip

    @partial(jax.jit, donate_argnums=(0, 1))
    def link_train_step(state: TrainState, pred_params, pred_nu, X_dev, batch,
                        warm_up_rate, lr, do_opt_step, rng):
        probes = zero_probes(ms, batch.B_pad)
        rng, r_neg, r_drop = jax.random.split(rng, 3)
        # uniform in-batch negative dst (main_link.py v2:66-69)
        dst_neg = jax.random.randint(
            r_neg, batch.link_src.shape, 0, jnp.maximum(batch.num_B, 1)
        )
        # dropbranch keep masks (see step.py train_step)
        branch_masks = None
        if ms.dropbranch > 0:
            rng, kd = jax.random.split(rng)
            branch_masks = []
            for nb in ms.num_branches:
                kd, sub = jax.random.split(kd)
                kept = int(nb * (1.0 - ms.dropbranch))
                perm = jax.random.permutation(sub, nb)
                branch_masks.append(jnp.zeros((nb,), bool).at[perm[:kept]].set(True))

        def loss_fn(params, pred_params, probes):
            x_B = jnp.take(X_dev, batch.batch_idx, axis=0)
            out, info_b, layer_inputs, new_bn = model_forward(
                params, state.vq_states, state.bn_state, ms, x_B, batch,
                probes=probes, warm_up_rate=warm_up_rate, training=True, rng=rng,
                vq_states_tr=state.vq_states_tr, branch_masks=branch_masks,
            )
            src = jnp.take(out, batch.link_src, axis=0)
            dst = jnp.take(out, batch.link_dst, axis=0)
            neg = jnp.take(out, dst_neg, axis=0)
            m = batch.link_mask.astype(out.dtype)
            n = jnp.maximum(jnp.sum(m), 1.0)
            pos_out = predictor_forward(pred_params, src, dst, cfg.dropout, True, r_drop)[:, 0]
            neg_out = predictor_forward(pred_params, src, neg, cfg.dropout, True, r_drop)[:, 0]
            # clamp, not "+1e-15" (reference main_link.py v2:64,69): under
            # XLA's excess-precision reassociation `1 - out + 1e-15` folds
            # to `(1+1e-15) - out` == exact 0 at sigmoid saturation ->
            # log(0) = -inf poisons the run.  max() is the same value in
            # f32 and cannot be reassociated away.
            pos_loss = -jnp.sum(jnp.log(jnp.maximum(pos_out, 1e-15)) * m) / n
            neg_loss = -jnp.sum(
                jnp.log(jnp.maximum(1.0 - neg_out, 1e-15)) * m
            ) / n
            loss_pre = pos_loss + neg_loss
            loss = loss_pre if cfg.ce_only else loss_pre + info_b
            return loss, (layer_inputs, new_bn, loss_pre)

        (loss, aux), (g_params, g_pred, g_probes) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, pred_params, probes)
        layer_inputs, new_bn, loss_pre = aux

        if clip is not None:
            # per-layer clip of gnn_transform (+ GAT attention) grads
            # (main_link.py v2:84-88)
            from vq_gnn_tpu.train.optim import clip_grads_by_norm

            for l in range(ms.num_layers):
                g_params[l]["gnn_transform"] = clip_grads_by_norm(
                    g_params[l]["gnn_transform"], clip[0]
                )
                if ms.conv_type == "GAT" and len(clip) > 1:
                    att = {"att_l": g_params[l]["att_l"], "att_r": g_params[l]["att_r"]}
                    att = clip_grads_by_norm(att, clip[1])
                    g_params[l]["att_l"], g_params[l]["att_r"] = att["att_l"], att["att_r"]

        new_params, new_nu = rmsprop_update(state.params, g_params, state.opt_nu, lr, do_opt_step)
        new_pred, new_pred_nu = rmsprop_update(pred_params, g_pred, pred_nu, lr, do_opt_step)

        new_vq = list(state.vq_states)
        if live:
            for l in range(ms.num_layers):
                nb = ms.num_branches[l]
                Xb = _branch_view(jax.lax.stop_gradient(layer_inputs[l]), nb, D)
                Gb = _branch_view(g_probes[l][:, : nb * D], nb, D)
                new_vq[l], _ = vq_update(
                    new_vq[l], Xb, Gb, batch.batch_idx, ms.vq, valid=batch.valid_B,
                    branch_keep=None if branch_masks is None else branch_masks[l],
                )

        metrics = {
            "loss": loss,
            "loss_pre": loss_pre,
            "bad_init": jnp.any(jnp.stack([s.bad_init for s in new_vq])),
        }
        new_state = TrainState(
            params=new_params, vq_states=new_vq, bn_state=new_bn,
            opt_nu=new_nu, step=state.step + 1,
            vq_states_tr=state.vq_states_tr,
        )
        return new_state, new_pred, new_pred_nu, metrics

    @jax.jit
    def score_pairs(pred_params, h, src, dst):
        return predictor_forward(
            pred_params, jnp.take(h, src, axis=0), jnp.take(h, dst, axis=0)
        )[:, 0]

    return link_train_step, score_pairs


@dataclasses.dataclass
class SplitEdges:
    """OGB link split: arrays of [n, 2] positive edges and negatives."""

    train_pos: np.ndarray
    valid_pos: np.ndarray
    valid_neg: np.ndarray
    test_pos: np.ndarray
    test_neg: np.ndarray
    # citation2-style: per-source negative lists [n, k] (None for collab)
    neg_per_source: bool = False


class LinkTrainer:
    """collab/citation2-style trainer (``main_link.py v2:248-415``)."""

    def __init__(self, graph: HostGraph, cfg: Config, split: SplitEdges):
        jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)
        self.graph, self.cfg, self.split = graph, cfg, split
        self.ms = model_static(cfg, graph.num_features, cfg.hidden_channels)
        self.X_dev = device_features(graph.x)
        rng = jax.random.PRNGKey(cfg.seed)
        k1, k2 = jax.random.split(rng)
        self.state = init_train_state(k1, self.ms, graph.num_nodes)
        self.pred_params = init_predictor(
            k2, cfg.hidden_channels, cfg.hidden_channels, 1, cfg.num_layers
        )
        self.pred_nu = init_rmsprop(self.pred_params)
        if cfg.exact_eval_train_edges and 0 < cfg.test_batch_size < graph.num_nodes:
            raise ValueError(
                "exact_eval_train_edges requires full-graph eval batches "
                f"(test_batch_size {cfg.test_batch_size} < num_nodes "
                f"{graph.num_nodes})"
            )
        self.train_loader = BatchLoader(
            graph, cfg, train_flag=True, seed=cfg.seed, with_link_edges=True
        )
        self.test_loader = BatchLoader(
            graph, cfg,
            # exact parity control: full-graph eval through the train-time
            # edge construction (see Config.exact_eval_train_edges)
            train_flag=cfg.exact_eval_train_edges,
            sampler_type="node",
            batch_size=cfg.test_batch_size, shuffle=False, seed=cfg.seed + 1,
            with_link_edges=True,
        )
        self._batch_cache = {}
        # the exact control's single full-graph train batch is
        # deterministic — cache it on device (see train/loop.py)
        self._cache_train = (
            cfg.sampler_type == "node" and cfg.batch_size >= graph.num_nodes
        )
        self.step_fn, self.score_fn = make_link_step(self.ms, cfg)
        from vq_gnn_tpu.train.step import make_step_fns

        self.fns = make_step_fns(self.ms, cfg, multilabel=False)
        self.rng = jax.random.PRNGKey(cfg.seed + 29)
        self.logger = Logger(cfg.runs, cfg)

    def _iter_cached(self, name, loader):
        from vq_gnn_tpu.train.loop import iter_cached

        return iter_cached(self._batch_cache, name, loader)

    def run_init_sweep(self):
        for layer_idx in range(1, self.ms.num_layers + 1):
            step = self.fns.init_step_for(layer_idx)
            for windows, _ in self._iter_cached("test", self.test_loader):
                new_vq, new_tr = step(
                    self.state.vq_states,
                    self.state.vq_states_tr or [],
                    self.state.params,
                    self.X_dev,
                    windows[0],
                )
                self.state = self.state.replace(
                    vq_states=new_vq, vq_states_tr=new_tr or None
                )

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        wur = (
            epoch / cfg.warm_up_epochs
            if cfg.warm_up and epoch <= cfg.warm_up_epochs
            else 1.0
        )
        lr = cfg.lr * epoch / 200 if (cfg.sche and epoch < 200) else cfg.lr
        losses = []
        train_iter = (
            self._iter_cached("train", self.train_loader)
            if self._cache_train
            else self.train_loader
        )
        for windows, _ in train_iter:
            for j, batch in enumerate(windows):
                do_opt = 0.0 if (len(windows) > 1 and j == 0) else 1.0
                self.rng, sub = jax.random.split(self.rng)
                self.state, self.pred_params, self.pred_nu, metrics = self.step_fn(
                    self.state, self.pred_params, self.pred_nu, self.X_dev, batch,
                    jnp.float32(wur), jnp.float32(lr), jnp.float32(do_opt), sub,
                )
                if bool(metrics["bad_init"]):
                    raise ValueError("Bad Init!")
                losses.append(float(metrics["loss_pre"]))
        return float(np.mean(losses)) if losses else float("nan")

    def embeddings(self) -> jnp.ndarray:
        outs = []
        for windows, raw in self._iter_cached("test", self.test_loader):
            out = self.fns.eval_step(self.state, self.X_dev, windows[0])
            outs.append(np.asarray(out)[: len(raw[0])])
        return jnp.asarray(np.concatenate(outs, axis=0))

    def _scores(self, h, edges: np.ndarray, chunk=65536) -> np.ndarray:
        out = []
        for i in range(0, len(edges), chunk):
            e = edges[i : i + chunk]
            out.append(
                np.asarray(
                    self.score_fn(self.pred_params, h, jnp.asarray(e[:, 0]), jnp.asarray(e[:, 1]))
                )
            )
        return np.concatenate(out) if out else np.empty(0, np.float32)

    def evaluate_hits(self, k: int = 50):
        """ogbl-collab protocol (``main_link.py v2:171-244``): train hits are
        computed against the VALID negatives (reference line 230-233)."""
        h = self.embeddings()
        s = self.split
        pos_train = self._scores(h, s.train_pos)
        pos_valid = self._scores(h, s.valid_pos)
        neg_valid = self._scores(h, s.valid_neg)
        pos_test = self._scores(h, s.test_pos)
        neg_test = self._scores(h, s.test_neg)
        return (
            hits_at_k(pos_train, neg_valid, k),
            hits_at_k(pos_valid, neg_valid, k),
            hits_at_k(pos_test, neg_test, k),
        )

    def evaluate_mrr(self):
        """ogbl-citation2 protocol: per-source negatives (``v2:126-169``)."""
        h = self.embeddings()
        s = self.split

        def split_mrr(pos, negs):
            p = self._scores(h, pos)
            n = self._scores(
                h,
                np.stack(
                    [np.repeat(pos[:, 0], negs.shape[1]), negs.reshape(-1)], axis=1
                ),
            ).reshape(len(pos), -1)
            return mrr(p, n)

        return (
            split_mrr(s.train_pos, s.valid_neg),
            split_mrr(s.valid_pos, s.valid_neg),
            split_mrr(s.test_pos, s.test_neg),
        )

    def _ckpt_tree(self):
        """Full resumable state: GNN train state + predictor params/opt."""
        return {
            "state": self.state,
            "pred_params": self.pred_params,
            "pred_nu": self.pred_nu,
        }

    def fit(
        self,
        run: int = 0,
        verbose: bool = True,
        ckpt_dir: Optional[str] = None,
        ckpt_every: int = 50,
        resume: bool = False,
        segment_path: Optional[str] = None,
        eval_every: int = 1,
    ):
        """``segment_path`` arms leak segmentation (train/segment.py): save
        + SegmentRestart when host RSS crosses the ceiling; the restarted
        process resumes mid-stream with logger history intact."""
        cfg = self.cfg
        from vq_gnn_tpu.train.checkpoint import (
            load_step,
            restore_checkpoint,
            save_checkpoint,
        )
        from vq_gnn_tpu.train.segment import (
            SegmentRestart,
            load_segment,
            max_rss_mb_default,
            rss_mb,
            save_segment,
        )
        import time as _time

        ckpt_path = None
        start_epoch = 1
        history = []
        if segment_path:
            seg = load_segment(segment_path, self._ckpt_tree())
            if seg is not None:
                restored, seg_epoch, history, rng, _ = seg
                self.state = restored["state"]
                self.pred_params = restored["pred_params"]
                self.pred_nu = restored["pred_nu"]
                if rng is not None:
                    self.rng = jnp.asarray(np.asarray(rng, np.uint32))
                for h in history:
                    self.logger.add_result(run, h[2:5])
                self.train_loader._epoch = seg_epoch
                start_epoch = seg_epoch + 1
                if verbose:
                    print(f"[segment] resumed at epoch {start_epoch}",
                          flush=True)
        elif ckpt_dir:
            import os

            ckpt_path = os.path.join(ckpt_dir, f"link_run{run}.npz")
            if resume and os.path.exists(ckpt_path):
                tmpl = self._ckpt_tree()
                restored = restore_checkpoint(ckpt_path, tmpl)
                self.state = restored["state"]
                self.pred_params = restored["pred_params"]
                self.pred_nu = restored["pred_nu"]
                start_epoch = load_step(ckpt_path) + 1
                if verbose:
                    print(f"resumed from {ckpt_path} at epoch {start_epoch}")
        if start_epoch == 1:
            self.run_init_sweep()
        max_rss = max_rss_mb_default()
        t0 = _time.time()
        for epoch in range(start_epoch, cfg.epochs + 1):
            loss = self.train_epoch(epoch)
            if ckpt_path and epoch % ckpt_every == 0:
                save_checkpoint(ckpt_path, self._ckpt_tree(), step=epoch)
            if epoch % eval_every == 0 or epoch == cfg.epochs:
                result = (
                    self.evaluate_mrr()
                    if self.split.neg_per_source
                    else self.evaluate_hits()
                )
                self.logger.add_result(run, result)
                history.append((epoch, loss) + tuple(map(float, result)))
                if verbose and epoch % cfg.log_steps == 0:
                    tr, va, te = result
                    print(
                        f"Run: {run + 1}, Epoch: {epoch}, Loss: {loss:.4f}, "
                        f"Train: {100 * tr:.2f}%, Valid: {100 * va:.2f}%, "
                        f"Test: {100 * te:.2f}% "
                        f"[{_time.time() - t0:.1f}s rss {rss_mb():.0f}MB]",
                        flush=True,
                    )
            if segment_path and epoch < cfg.epochs and rss_mb() > max_rss:
                save_segment(
                    segment_path, self._ckpt_tree(), epoch, history,
                    rng=np.asarray(self.rng),
                )
                raise SegmentRestart(segment_path, epoch)
        return self.logger.statistics(run)
