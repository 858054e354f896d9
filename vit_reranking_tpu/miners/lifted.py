"""Lifted-structure mining (reference batchminer/lifted.py): per-anchor
positive set = same class minus self; negative set = the complement."""

from __future__ import annotations

import jax.numpy as jnp

from .common import TupleSets


class BatchMiner:
    name = "lifted"

    def __init__(self, opt=None):
        pass

    def __call__(self, key, batch, labels) -> TupleSets:
        B = batch.shape[0]
        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)
        neg = ~same
        anchor = jnp.arange(B, dtype=jnp.int32)
        return TupleSets(anchor, anchor, pos, neg, valid)
