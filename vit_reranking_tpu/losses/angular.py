"""Angular loss combined with n-pair (reference criteria/angular.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .common import Criterion, masked_sum_exp


class AngularLoss(Criterion):
    ALLOWED_MINING_OPS = ["npair"]
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "angular"

    def __init__(self, opt, batchminer):
        self.tan_margin = float(np.tan(np.pi / 180 * getattr(opt, "loss_angular_alpha", 45.0)))
        self.lam = getattr(opt, "loss_angular_npair_ang_weight", 2.0)
        self.l2_weight = getattr(opt, "loss_angular_npair_l2", 0.005)
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        tup = self.batchminer(key, batch, labels)
        a, p = batch[tup.anchor], batch[tup.positive]

        def norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        na, np_, nall = norm(a), norm(p), norm(batch)
        t2 = self.tan_margin**2
        term1 = 4.0 * t2 * jnp.einsum("ic,jc->ij", na + np_, nall)
        term2 = 2.0 * (1.0 + t2) * jnp.sum(na * np_, -1, keepdims=True)
        inner_ang = term1 - term2
        v = tup.valid.astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(v), 1.0)
        ang = jnp.sum(jnp.log1p(masked_sum_exp(inner_ang, tup.negative_mask)) * v) / nv

        inner_np = jnp.einsum("ic,jc->ij", a, batch) - jnp.sum(a * p, -1, keepdims=True)
        inner_np = jnp.clip(inner_np, -50.0, 50.0)
        npair = jnp.sum(jnp.log1p(masked_sum_exp(inner_np, tup.negative_mask)) * v) / nv

        return npair + self.lam * ang + self.l2_weight * jnp.mean(jnp.linalg.norm(batch, axis=1))
