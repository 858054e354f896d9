"""Soft-hard mining (reference batchminer/softhard.py:13-54): positives harder
than the easiest negative, negatives harder than the hardest positive; uniform
fallbacks."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, pdist, uniform_choice


class BatchMiner:
    name = "softhard"

    def __init__(self, opt=None):
        pass

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kp, kn = jax.random.split(key)
        d = pdist(jax.lax.stop_gradient(batch))

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        neg = ~same
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)

        inf = jnp.float32(jnp.inf)
        max_pos_d = jnp.max(jnp.where(pos, d, -inf), axis=-1)
        min_neg_d = jnp.min(jnp.where(neg, d, inf), axis=-1)

        hard_neg = neg & (d < max_pos_d[:, None])
        hard_pos = pos & (d > min_neg_d[:, None])

        pmask = jnp.where(jnp.any(hard_pos, axis=-1)[:, None], hard_pos, pos)
        nmask = jnp.where(jnp.any(hard_neg, axis=-1)[:, None], hard_neg, neg)
        pmask = jnp.where(valid[:, None], pmask, eye)

        positive = uniform_choice(kp, pmask)
        negative = uniform_choice(kn, nmask)
        anchor = jnp.arange(B, dtype=jnp.int32)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
