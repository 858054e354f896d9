"""Quadruplet loss (reference criteria/quadruplet.py).  Keeps the reference's
quirk of drawing the fourth element as a *batch index* j where the j-th
triplet's negative differs from triplet i's negative."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, masked_mean, pair_norm
from .margin import ALL_MINERS
from ..miners.common import uniform_choice


class QuadrupletLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "quadruplet"

    def __init__(self, opt, batchminer):
        self.alpha1 = getattr(opt, "loss_quadruplet_margin_alpha_1", 0.2)
        self.alpha2 = getattr(opt, "loss_quadruplet_margin_alpha_2", 0.2)
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        k1, k2 = jax.random.split(key)
        trip = self.batchminer(k1, batch, labels)
        a, p, n = batch[trip.anchor], batch[trip.positive], batch[trip.negative]

        diff_neg = trip.negative[:, None] != trip.negative[None, :]
        fourth = uniform_choice(k2, diff_neg)
        f = batch[fourth]

        tl = jax.nn.relu(pair_norm(a, p) - pair_norm(a, n) + self.alpha1)
        ql = jax.nn.relu(pair_norm(a, p) - pair_norm(n, f) + self.alpha2)
        return masked_mean(tl, trip.valid) + masked_mean(ql, trip.valid)
