"""Independent torch oracle for the reference VQ semantics.

Used only by tests: a compact pure-torch implementation of the behaviors
described in SURVEY.md §0/§2 (reference ``vq_gnn_v2/vq.py:60-279``), using real
``torch.nn.BatchNorm1d`` modules so our functional BN re-derivation is checked
against torch itself, and dense matmuls instead of any sparse library.
"""

import torch
import torch.nn.functional as F

LAPLACE = 1e-5
BN_FEAT_EPS = 1e-5


class OracleVQ:
    """Single-branch EMA vector quantizer with torch BN running stats."""

    def __init__(
        self,
        embedding,
        ema_w,
        num_D,
        grad_scale=(1.0, 1.0),
        warm_up=False,
        momentum=0.1,
        epsilon=1e-24,
        decay=0.99,
        add_flag=False,
    ):
        self.emb = torch.as_tensor(embedding).clone()
        self.ema_w = torch.as_tensor(ema_w).clone()
        self.M, self.K = self.emb.shape
        self.D = num_D
        self.Dg = num_D + (1 if add_flag else 0)
        self.size = torch.zeros(self.M)
        self.out = torch.zeros_like(self.emb)
        self.gs = grad_scale
        self.warm_up = warm_up
        self.eps = epsilon
        self.decay = decay
        self.add_flag = add_flag
        self.bnf = torch.nn.BatchNorm1d(num_D, affine=False)
        self.bng = torch.nn.BatchNorm1d(self.Dg, affine=False, eps=epsilon, momentum=momentum)
        self.bnf.train()
        self.bng.train()
        self.bn_inited = False
        self.bad = False

    def _ema_size(self, onehot):
        self.size = self.size * self.decay + (1 - self.decay) * onehot.sum(0)
        if self.warm_up:
            n = self.size.sum()
            self.size = (self.size + LAPLACE) / (n + self.M * LAPLACE) * n
        if (self.size == 0).any():
            self.bad = True

    def _assign(self, xn, emb):
        d = (xn**2).sum(1, keepdim=True) + (emb**2).sum(1) - 2 * xn @ emb.t()
        idx = d.argmin(1)
        return idx, F.one_hot(idx, self.M).float()

    def feature_update(self, X_B):
        xn = self.bnf(torch.as_tensor(X_B))
        idx, onehot = self._assign(xn, self.emb[:, : self.D])
        self._ema_size(onehot)
        self.ema_w[:, : self.D] = (
            self.ema_w[:, : self.D] * self.decay + (1 - self.decay) * (onehot.t() @ xn)
        )
        self.emb[:, : self.D] = self.ema_w[:, : self.D] / self.size.unsqueeze(1)
        std = (self.bnf.running_var + BN_FEAT_EPS).sqrt()
        self.out[:, : self.D] = self.emb[:, : self.D] * std + self.bnf.running_mean
        return idx

    def update(self, X_B, grad):
        X_B, grad = torch.as_tensor(X_B), torch.as_tensor(grad)
        if not self.bn_inited:
            self.bnf.running_mean.data = X_B.mean(0)
            self.bnf.running_var.data = X_B.var(0)
            self.bng.running_mean.data = grad.mean(0)
            self.bng.running_var.data = grad.var(0)
            self.bn_inited = True
        xn = torch.cat([self.bnf(X_B), self.bng(grad)], dim=1)
        xn[:, self.D : 2 * self.D] *= self.gs[0]
        if self.add_flag:
            xn[:, 2 * self.D] *= self.gs[1]
        idx, onehot = self._assign(xn, self.emb)
        self._ema_size(onehot)
        self.ema_w = self.ema_w * self.decay + (1 - self.decay) * (onehot.t() @ xn)
        self.emb = self.ema_w / self.size.unsqueeze(1)

        out = self.emb.clone()
        out[:, self.D : 2 * self.D] /= self.gs[0] + self.eps
        if self.add_flag:
            out[:, 2 * self.D] /= self.gs[1] + self.eps
        rv = torch.cat([self.bnf.running_var + BN_FEAT_EPS, self.bng.running_var + self.eps])
        rm = torch.cat([self.bnf.running_mean, self.bng.running_mean])
        self.out = out * rv.sqrt() + rm
        if self.gs[0] == 0:
            self.out[:, self.D :] = 0
        return idx
