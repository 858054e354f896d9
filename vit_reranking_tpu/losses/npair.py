"""N-Pair loss (reference criteria/npair.py)."""

from __future__ import annotations

import jax.numpy as jnp

from .common import Criterion, masked_sum_exp


class NPairLoss(Criterion):
    ALLOWED_MINING_OPS = ["npair"]
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = False
    name = "npair"

    def __init__(self, opt, batchminer):
        self.l2_weight = getattr(opt, "loss_npair_l2", 0.005)
        self.arch = getattr(opt, "arch", "")
        self.batchminer = batchminer

    def __call__(self, params, batch, labels, key=None, **kwargs):
        tup = self.batchminer(key, batch, labels)
        if "bninception" in self.arch:
            batch = batch / 4.0
        a = batch[tup.anchor]  # (B, C)
        p = batch[tup.positive]
        # inner[i, j] = a_i . (x_j - p_i) over negative set j
        inner = jnp.einsum("ic,jc->ij", a, batch) - jnp.sum(a * p, -1, keepdims=True)
        v = tup.valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(v), 1.0)
        per_anchor = jnp.log1p(masked_sum_exp(inner, tup.negative_mask))
        loss = jnp.sum(per_anchor * v) / n_valid
        # the reference adds the embed-norm term once per anchor / len(anchors)
        loss = loss + self.l2_weight * jnp.mean(jnp.linalg.norm(batch, axis=1))
        return loss
