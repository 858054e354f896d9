"""Intra-class random mining (reference batchminer/intra_random.py): pick a
class per slot, then a/p/n all from that class with replacement."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Triplets, uniform_choice


class BatchMiner:
    name = "intra_random"

    def __init__(self, opt=None):
        pass

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kc, ka, kp, kn = jax.random.split(key, 4)
        # choose a class per slot: uniform over *present classes* — emulate by
        # sampling a representative index uniformly over unique first-occurrences
        first_occ = jnp.zeros((B,), bool).at[
            jnp.argmax(labels[:, None] == labels[None, :], axis=1)
        ].set(True)
        rep = uniform_choice(kc, jnp.broadcast_to(first_occ[None, :], (B, B)))
        cls = labels[rep]
        members = labels[None, :] == cls[:, None]
        anchor = uniform_choice(ka, members)
        positive = uniform_choice(kp, members)
        negative = uniform_choice(kn, members)
        valid = jnp.any(members, axis=-1)
        return Triplets(anchor.astype(jnp.int32), positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
