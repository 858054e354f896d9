"""Semi-hard negative mining (reference batchminer/semihard.py:13-47):
negatives with d(a,p) < d(a,n) < d(a,p) + margin; uniform fallback over all
negatives when none violate."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, pdist, uniform_choice


class BatchMiner:
    name = "semihard"

    def __init__(self, opt=None):
        loss = getattr(opt, "loss", "triplet")
        self.margin = getattr(opt, f"loss_{loss}_margin", 0.2)

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kp, kn = jax.random.split(key)
        d = pdist(jax.lax.stop_gradient(batch))

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        neg = ~same
        pos_mask = same & ~eye
        valid = jnp.any(pos_mask, axis=-1)

        positive = uniform_choice(kp, jnp.where(valid[:, None], pos_mask, eye))
        d_ap = jnp.take_along_axis(d, positive[:, None], axis=1)[:, 0]

        semi = neg & (d > d_ap[:, None]) & (d < d_ap[:, None] + self.margin)
        use_semi = jnp.any(semi, axis=-1)
        mask = jnp.where(use_semi[:, None], semi, neg)
        negative = uniform_choice(kn, mask)

        anchor = jnp.arange(B, dtype=jnp.int32)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
