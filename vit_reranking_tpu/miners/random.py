"""Random triplet mining (reference batchminer/random.py): anchors uniform
over valid indices, positives uniform in-class, negatives uniform out-of-class.

Deviation: the reference enumerates every possible triplet and samples B
without replacement; we sample per-slot (with replacement over anchors), which
matches the marginal distribution up to replacement effects."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, uniform_choice


class BatchMiner:
    name = "random"

    def __init__(self, opt=None):
        pass

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        ka, kp, kn = jax.random.split(key, 3)
        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        has_pos = jnp.any(pos, axis=-1)

        anchor = uniform_choice(ka, jnp.broadcast_to(has_pos[None, :], (B, B)))
        pos_rows = pos[anchor]
        neg_rows = ~same[anchor]
        positive = uniform_choice(kp, pos_rows)
        negative = uniform_choice(kn, neg_rows)
        valid = has_pos[anchor] & jnp.any(neg_rows, axis=-1)
        return Triplets(anchor.astype(jnp.int32), positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
