"""Contrastive loss over mined triplets (reference criteria/contrastive.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, masked_mean, pair_norm
from .margin import ALL_MINERS


class ContrastiveLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "contrastive"

    def __init__(self, opt, batchminer):
        self.pos_margin = getattr(opt, "loss_contrastive_pos_margin", 0.0)
        self.neg_margin = getattr(opt, "loss_contrastive_neg_margin", 1.0)
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        trip = self.batchminer(key, batch, labels)
        a, p, n = batch[trip.anchor], batch[trip.positive], batch[trip.negative]
        pos = masked_mean(jax.nn.relu(pair_norm(a, p) - self.pos_margin), trip.valid)
        neg = masked_mean(jax.nn.relu(self.neg_margin - pair_norm(a, n)), trip.valid)
        return pos + neg
