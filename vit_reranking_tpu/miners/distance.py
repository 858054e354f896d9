"""Distance-weighted negative sampling — the canonical miner.

Reference batchminer/distance.py:13-73: negatives drawn from the inverse
unit-sphere distance distribution, positives uniformly from the anchor's
class.  Vectorized: one batched categorical per batch instead of a per-anchor
numpy loop (GPU->CPU sync per anchor in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, inverse_sphere_log_q, pdist, uniform_choice


class BatchMiner:
    name = "distance"

    def __init__(self, opt=None):
        self.lower_cutoff = getattr(opt, "miner_distance_lower_cutoff", 0.5)
        self.upper_cutoff = getattr(opt, "miner_distance_upper_cutoff", 1.4)
        self.dim = 128  # hardcoded in the reference (distance.py:20)

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kp, kn = jax.random.split(key)
        d = jnp.maximum(pdist(jax.lax.stop_gradient(batch)), self.lower_cutoff)

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)

        log_q = inverse_sphere_log_q(d, same, dim=self.dim)
        negative = jax.random.categorical(kn, log_q, axis=-1)

        # positives: uniform over same-class (self excluded when another exists)
        pos_mask = same & ~eye
        has_other = jnp.any(pos_mask, axis=-1)
        pos_mask = jnp.where(has_other[:, None], pos_mask, eye)
        positive = uniform_choice(kp, pos_mask)

        anchor = jnp.arange(B, dtype=jnp.int32)
        # reference appends a triplet whenever sum(pos) > 0, which is always
        # (self counts); valid simply tracks the degenerate self-positive case
        valid = jnp.ones((B,), bool)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
