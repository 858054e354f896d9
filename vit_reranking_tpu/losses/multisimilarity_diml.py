"""Multi-similarity loss over OT structural similarities of all BxB feature-map
pairs (reference criteria/multisimilarity_diml.py:95-99)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .diml_ot import pair_wise_ot_similarity
from .margin_diml import _to_cr
from .multisimilarity import MultisimilarityLoss


class MultisimilarityDIMLLoss(MultisimilarityLoss):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = False
    name = "multisimilarity_diml"

    def __init__(self, opt):
        super().__init__(opt)
        self.use_uniform = getattr(opt, "use_uniform", False)
        self.pair_block = 4096  # cap per-call pair batch to bound memory

    def __call__(self, params, batch, labels, key=None, **kwargs):
        feats = _to_cr(batch)  # (B, C, R)
        B = feats.shape[0]
        xi = jnp.repeat(jnp.arange(B), B)
        yi = jnp.tile(jnp.arange(B), B)
        sim = pair_wise_ot_similarity(
            feats[xi], feats[yi], use_uniform=self.use_uniform
        ).reshape(B, B)
        # NaN pairs are excluded from the MS masks (the reference filters them)
        return self.loss_from_similarity(sim, labels, valid=jnp.isfinite(sim))
