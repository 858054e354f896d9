"""N-pair mining (reference batchminer/npair.py): one positive per anchor, the
negative *set* is everything except anchor and positive."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import TupleSets, uniform_choice


class BatchMiner:
    name = "npair"

    def __init__(self, opt=None):
        pass

    def __call__(self, key, batch, labels) -> TupleSets:
        B = batch.shape[0]
        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)
        positive = uniform_choice(key, jnp.where(valid[:, None], pos, eye))
        anchor = jnp.arange(B, dtype=jnp.int32)
        neg_mask = ~eye & ~(jnp.arange(B)[None, :] == positive[:, None])
        return TupleSets(anchor, positive.astype(jnp.int32), pos, neg_mask, valid)
