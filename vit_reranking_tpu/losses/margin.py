"""Margin loss with trainable per-class boundary beta — the canonical baseline
(reference criteria/margin.py:11-73).  The per-triplet Python loop becomes one
gathered batch computation."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, pair_norm

ALL_MINERS = [
    "random", "semihard", "softhard", "distance", "rho_distance",
    "npair", "parametric", "lifted", "random_distance", "intra_random",
]


class MarginLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = True
    name = "margin"

    def __init__(self, opt, batchminer):
        self.n_classes = opt.n_classes
        self.margin = getattr(opt, "loss_margin_margin", 0.2)
        self.nu = getattr(opt, "loss_margin_nu", 0.0)
        self.beta_constant = getattr(opt, "loss_margin_beta_constant", False)
        self.beta_val = getattr(opt, "loss_margin_beta", 1.2)
        self.lr = getattr(opt, "loss_margin_beta_lr", 0.0005)
        self.batchminer = batchminer

    def init_params(self, rng):
        if self.beta_constant:
            return {}
        return {"beta": jnp.full((self.n_classes,), self.beta_val, jnp.float32)}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        trip = self.batchminer(key, batch, labels)
        a = batch[trip.anchor]
        p = batch[trip.positive]
        n = batch[trip.negative]

        d_ap = pair_norm(a, p, eps=1e-8)
        d_an = pair_norm(a, n, eps=1e-8)

        if self.beta_constant:
            beta = self.beta_val
        else:
            beta = params["beta"][labels[trip.anchor]]

        pos_loss = jax.nn.relu(d_ap - beta + self.margin)
        neg_loss = jax.nn.relu(beta - d_an + self.margin)
        v = trip.valid.astype(jnp.float32)
        pair_count = jnp.sum(((pos_loss > 0) | (neg_loss > 0)).astype(jnp.float32) * v)
        total = jnp.sum((pos_loss + neg_loss) * v)
        loss = jnp.where(pair_count == 0.0, total, total / jnp.maximum(pair_count, 1.0))
        if self.nu:
            loss = loss + self.nu * jnp.sum(jnp.abs(params["beta"]))
        return loss
