"""Distance mining over randomly permuted labels (reference
batchminer/random_distance.py): labels are shuffled before mining, decoupling
the sampled structure from the true classes."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, inverse_sphere_log_q, pdist, uniform_choice


class BatchMiner:
    name = "random_distance"

    def __init__(self, opt=None):
        self.lower_cutoff = getattr(opt, "miner_distance_lower_cutoff", 0.5)
        self.dim = 128

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        ks, kp, kn = jax.random.split(key, 3)
        labels = jax.random.permutation(ks, labels)
        d = jnp.maximum(pdist(jax.lax.stop_gradient(batch)), self.lower_cutoff)

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)

        log_q = inverse_sphere_log_q(d, same, dim=self.dim)
        negative = jax.random.categorical(kn, log_q, axis=-1)
        positive = uniform_choice(kp, jnp.where(valid[:, None], pos, eye))
        anchor = jnp.arange(B, dtype=jnp.int32)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
