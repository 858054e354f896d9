"""Multi-similarity loss (reference criteria/multisimilarity.py:11-56),
vectorized with per-anchor masks instead of the reference's Python loop."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, masked_sum_exp


class MultisimilarityLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = False
    name = "multisimilarity"

    def __init__(self, opt):
        self.pos_weight = getattr(opt, "loss_multisimilarity_pos_weight", 2.0)
        self.neg_weight = getattr(opt, "loss_multisimilarity_neg_weight", 40.0)
        self.margin = getattr(opt, "loss_multisimilarity_margin", 0.1)
        self.thresh = getattr(opt, "loss_multisimilarity_thresh", 0.5)

    def loss_from_similarity(self, similarity, labels, valid=None):
        B = similarity.shape[0]
        eye = jnp.eye(B, dtype=bool)
        same = labels[:, None] == labels[None, :]
        pos = same & ~eye
        neg = ~same
        if valid is not None:
            # exclude invalid (e.g. NaN-OT) pairs from both sets, mirroring the
            # reference's per-anchor NaN filtering (multisimilarity_diml.py:108-110)
            pos = pos & valid
            neg = neg & valid
            similarity = jnp.where(valid, similarity, 0.0)

        inf = jnp.float32(jnp.inf)
        min_pos = jnp.min(jnp.where(pos, similarity, inf), axis=-1)
        max_neg = jnp.max(jnp.where(neg, similarity, -inf), axis=-1)

        neg_keep = neg & ((similarity + self.margin) > min_pos[:, None])
        pos_keep = pos & ((similarity - self.margin) < max_neg[:, None])
        anchor_ok = jnp.any(neg_keep, axis=-1) & jnp.any(pos_keep, axis=-1)

        pos_term = (1.0 / self.pos_weight) * jnp.log1p(
            masked_sum_exp(-self.pos_weight * (similarity - self.thresh), pos_keep)
        )
        neg_term = (1.0 / self.neg_weight) * jnp.log1p(
            masked_sum_exp(self.neg_weight * (similarity - self.thresh), neg_keep)
        )
        total = jnp.where(anchor_ok, pos_term + neg_term, 0.0)
        n = jnp.sum(anchor_ok.astype(jnp.float32))
        return jnp.sum(total) / jnp.maximum(n, 1.0)

    def __call__(self, params, batch, labels, key=None, **kwargs):
        similarity = jnp.einsum(
            "ic,jc->ij", batch, batch,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        return self.loss_from_similarity(similarity, labels)
