"""Lifted-structure loss (reference criteria/lifted.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, masked_mean


class LiftedLoss(Criterion):
    ALLOWED_MINING_OPS = ["lifted"]
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "lifted"

    def __init__(self, opt, batchminer):
        self.margin = getattr(opt, "loss_lifted_neg_margin", 1.0)
        self.l2_weight = getattr(opt, "loss_lifted_l2", 0.005)
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        tup = self.batchminer(key, batch, labels)
        a = batch[tup.anchor]
        d = jnp.sqrt(
            jnp.maximum(
                jnp.sum(a**2, -1)[:, None]
                + jnp.sum(batch**2, -1)[None, :]
                - 2.0 * jnp.einsum("ic,jc->ij", a, batch),
                1e-12,
            )
        )
        neg_inf = -jnp.inf
        pos_term = jax.scipy.special.logsumexp(
            jnp.where(tup.positive_mask, d, neg_inf), axis=1
        )
        neg_term = jax.scipy.special.logsumexp(
            jnp.where(tup.negative_mask, self.margin - d, neg_inf), axis=1
        )
        loss = masked_mean(jax.nn.relu(pos_term + neg_term), tup.valid)
        return loss + self.l2_weight * jnp.mean(jnp.linalg.norm(batch, axis=1))
