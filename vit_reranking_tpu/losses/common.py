"""Shared loss utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sum(mask.astype(jnp.float32))
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(n, 1.0)


def masked_sum_exp(x: jnp.ndarray, mask: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """sum(exp(x)) over masked entries (no max-subtraction: mirrors the
    reference's raw exp sums, e.g. multisimilarity.py, npair.py)."""
    return jnp.sum(jnp.where(mask, jnp.exp(x), 0.0), axis=axis)


def pair_norm(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-wise euclidean distance ||a - b|| with eps inside the sqrt.

    The eps keeps the gradient finite at coincident pairs (torch's norm
    defines the subgradient there as 0; jnp.sqrt would give inf)."""
    return jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1) + eps)


class Criterion:
    """Base criterion: a pure callable with optional learnable parameters.

    Mirrors the reference's module-level wiring flags
    (criteria/__init__.py:16-62).  ``init_params`` returns the loss's
    learnable pytree (empty by default); the training engine folds it into the
    optimized state with ``lr`` as the parameter-group learning rate.
    """

    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = False
    name = "base"
    lr = None

    def init_params(self, rng):
        return {}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        raise NotImplementedError
