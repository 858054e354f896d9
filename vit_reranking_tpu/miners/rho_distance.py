"""Rho-regularized distance mining (reference batchminer/rho_distance.py):
distance-weighted triplets, but with probability ``cp`` the triplet becomes
(i, i, random positive) — pushing apart same-class pairs (spectrum
regularization)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, inverse_sphere_log_q, pdist, uniform_choice


class BatchMiner:
    name = "rho_distance"

    def __init__(self, opt=None):
        self.lower_cutoff = getattr(opt, "miner_rho_distance_lower_cutoff", 0.5)
        self.upper_cutoff = getattr(opt, "miner_rho_distance_upper_cutoff", 1.4)
        self.contrastive_p = getattr(opt, "miner_rho_distance_cp", 0.2)
        self.dim = 128

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kb, kp, kn, kq = jax.random.split(key, 4)
        d = jnp.maximum(pdist(jax.lax.stop_gradient(batch)), self.lower_cutoff)

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)
        anchor = jnp.arange(B, dtype=jnp.int32)

        use_contr = jax.random.bernoulli(kb, self.contrastive_p, (B,))

        # contrastive branch: positive = anchor itself, negative = a same-class other
        contr_neg = uniform_choice(kq, jnp.where(valid[:, None], pos, eye))

        # distance branch
        log_q = inverse_sphere_log_q(d, same, dim=self.dim)
        dist_neg = jax.random.categorical(kn, log_q, axis=-1)
        dist_pos = uniform_choice(kp, jnp.where(valid[:, None], pos, eye))

        positive = jnp.where(use_contr, anchor, dist_pos)
        negative = jnp.where(use_contr, contr_neg, dist_neg)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
