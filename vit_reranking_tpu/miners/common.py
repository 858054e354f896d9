"""Shared miner utilities: distance matrices, masked categorical sampling."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Triplets(NamedTuple):
    """Index triplets (anchor, positive, negative) with a validity mask.

    Equivalent payload to the reference's ``[[a, p, n], ...]`` lists
    (batchminer/distance.py:43); ``valid`` marks anchors that had an eligible
    positive (always length B so shapes stay static under jit).
    """

    anchor: jnp.ndarray
    positive: jnp.ndarray
    negative: jnp.ndarray
    valid: jnp.ndarray


class TupleSets(NamedTuple):
    """For npair/lifted miners: per-anchor positive/negative *sets* as masks."""

    anchor: jnp.ndarray  # (B,)
    positive: jnp.ndarray  # (B,) single positive (npair) or unused
    positive_mask: jnp.ndarray  # (B, B) bool
    negative_mask: jnp.ndarray  # (B, B) bool
    valid: jnp.ndarray  # (B,)


def pdist(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Euclidean distance matrix, reference batchminer/distance.py:69-73:
    sqrt(clamp(|a|^2 + |b|^2 - 2ab, min=eps))."""
    prod = jnp.einsum(
        "ic,jc->ij", x, x,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    sq = jnp.diagonal(prod)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * prod, eps)
    return jnp.sqrt(d2)


def masked_categorical(key, log_probs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row categorical draw restricted to ``mask`` (B, N). Rows with an
    empty mask return index 0 (caller must gate on validity)."""
    neg_inf = jnp.float32(-jnp.inf)
    logits = jnp.where(mask, log_probs, neg_inf)
    safe = jnp.where(jnp.any(mask, axis=-1, keepdims=True), logits, 0.0)
    return jax.random.categorical(key, safe, axis=-1)


def uniform_choice(key, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniform draw from each row's True entries."""
    return masked_categorical(key, jnp.zeros_like(mask, jnp.float32), mask)


def inverse_sphere_log_q(
    dists: jnp.ndarray, same_label: jnp.ndarray, dim: int = 128
) -> jnp.ndarray:
    """log of the inverse unit-sphere distance distribution
    (reference batchminer/distance.py:51-66).  ``dim`` is hardcoded to 128 in
    the reference regardless of the true embedding dim — kept as the default.
    Returns per-row normalized log-probabilities with same-label entries at -inf.
    """
    d = dists
    # guard the log argument: d can exceed 2.0 by float error on normalized
    # embeddings, which would NaN (the reference would crash there too)
    log_q = (2.0 - dim) * jnp.log(d) - ((dim - 3) / 2.0) * jnp.log(
        jnp.maximum(1.0 - 0.25 * d**2, 1e-45)
    )
    log_q = jnp.where(same_label, 0.0, log_q)
    log_q = log_q - jnp.max(log_q, axis=-1, keepdims=True)
    return jnp.where(same_label, -jnp.inf, log_q)
