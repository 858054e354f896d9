"""Plain triplet loss on squared distances (reference criteria/triplet.py:24-33
— note the reference uses squared sums, no sqrt)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, masked_mean
from .margin import ALL_MINERS


class TripletLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "triplet"

    def __init__(self, opt, batchminer):
        self.margin = getattr(opt, "loss_triplet_margin", 0.2)
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        trip = self.batchminer(key, batch, labels)
        a, p, n = batch[trip.anchor], batch[trip.positive], batch[trip.negative]
        d = jax.nn.relu(
            jnp.sum((a - p) ** 2, -1) - jnp.sum((a - n) ** 2, -1) + self.margin
        )
        return masked_mean(d, trip.valid)
