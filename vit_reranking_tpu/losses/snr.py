"""Signal-to-noise-ratio triplet loss (reference criteria/snr.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion
from .margin import ALL_MINERS


class SNRLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "snr"

    def __init__(self, opt, batchminer):
        self.margin = getattr(opt, "loss_snr_margin", 0.2)
        self.reg_lambda = getattr(opt, "loss_snr_reg_lambda", 0.005)
        if batchminer.name == "distance":
            self.reg_lambda = 0.0
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        trip = self.batchminer(key, batch, labels)
        a, p, n = batch[trip.anchor], batch[trip.positive], batch[trip.negative]
        var = lambda x: jnp.var(x, axis=1)
        pos_snr = var(a - p) / var(a)
        neg_snr = var(a - n) / var(a)
        h = jax.nn.relu(pos_snr - neg_snr + self.margin)
        h = jnp.where(trip.valid, h, 0.0)
        snr_loss = jnp.sum(h) / jnp.maximum(jnp.sum((h > 0).astype(jnp.float32)), 1.0)
        reg = jnp.mean(jnp.abs(jnp.sum(a, axis=1)))
        return snr_loss + self.reg_lambda * reg
