"""Training-time OT machinery shared by the *_diml structural losses
(reference criteria/margin_diml.py:50-125, multisimilarity_diml.py:30-93,
utilities/cross.py:96-132)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.sinkhorn import sinkhorn

_EPS = 1e-5
_P = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _norm(x, axis):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def training_cross_attention(x, y, x_mean, y_mean, use_inverse: bool = False):
    """Marginals from batch-paired cross attention (margin_diml.py:56-67).

    x, y: (B, C, R); x_mean, y_mean: (B, C).  Note the training variant's
    `use_inverse` is `1 - att` (the exp form is commented out in the
    reference).
    """
    att = jax.nn.relu(jnp.einsum("nc,ncr->nr", x_mean, y, **_P))
    if use_inverse:
        att = 1.0 - att
    u = att / (jnp.sum(att, axis=1, keepdims=True) + _EPS)
    att = jax.nn.relu(jnp.einsum("nc,ncr->nr", y_mean, x, **_P))
    if use_inverse:
        att = 1.0 - att
    v = att / (jnp.sum(att, axis=1, keepdims=True) + _EPS)
    return u, v


def pair_wise_wdist(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mean: Optional[jnp.ndarray] = None,
    y_mean: Optional[jnp.ndarray] = None,
    is_positive: bool = True,
    use_uniform: bool = False,
    use_inverse: bool = False,
    eps: float = 0.05,
    iters: int = 100,
) -> jnp.ndarray:
    """OT-weighted pairwise patch L2 distance (margin_diml.py:69-108).

    x, y: (B, C, R) per-patch features.  The OT plan is computed under
    stop_gradient (the reference wraps it in no_grad); negatives use T = ones.
    Returns (dist_patch + dist_global) / 2 per pair; NaN plans yield NaN here —
    callers mask them out (the reference skips those triplets).
    """
    B, C, R = x.shape
    if x_mean is None:
        x_mean = jnp.mean(x, axis=2)
    if y_mean is None:
        y_mean = jnp.mean(y, axis=2)

    x = _norm(x, axis=1)
    y = _norm(y, axis=1)
    x_mean = _norm(x_mean, axis=1)
    y_mean = _norm(y_mean, axis=1)

    diff = x[:, :, :, None] - y[:, :, None, :]  # (B, C, Rx, Ry)
    dist1 = jnp.sqrt(jnp.sum(diff**2, axis=1) + 1e-6)  # (B, Rx, Ry)
    dist2 = jnp.sqrt(jnp.sum((x_mean - y_mean) ** 2, axis=1) + 1e-6)  # (B,)

    sim = jnp.einsum("bcs,bcm->bsm", x, y, **_P)

    if use_uniform:
        u = jnp.full((B, R), 1.0 / R, jnp.float32)
        v = jnp.full((B, R), 1.0 / R, jnp.float32)
    else:
        u, v = training_cross_attention(x, y, x_mean, y_mean, use_inverse)

    if is_positive:
        K = jnp.exp(-(1.0 - sim) / eps)
        # plan under stop_gradient; marginal order (v, u) follows the
        # reference exactly (margin_diml.py:97 "maybe wrong order" comment)
        T = jax.lax.stop_gradient(
            sinkhorn(jax.lax.stop_gradient(K), v, u, iters=iters)
        )
    else:
        T = jnp.ones_like(sim)

    d1 = jnp.sum(T * dist1, axis=(1, 2))
    return (d1 + dist2) / 2.0


def pair_wise_ot_similarity(
    x: jnp.ndarray,
    y: jnp.ndarray,
    use_uniform: bool = False,
    eps: float = 0.05,
    iters: int = 100,
) -> jnp.ndarray:
    """OT-weighted pairwise patch similarity (multisimilarity_diml.py:50-76):
    sim = sum(T * (S_patch + S_global)/2)."""
    B, C, R = x.shape
    x_mean = _norm(jnp.mean(x, axis=2), axis=1)
    y_mean = _norm(jnp.mean(y, axis=2), axis=1)
    x = _norm(x, axis=1)
    y = _norm(y, axis=1)

    if use_uniform:
        u = jnp.full((B, R), 1.0 / R, jnp.float32)
        v = jnp.full((B, R), 1.0 / R, jnp.float32)
    else:
        u, v = training_cross_attention(x, y, x_mean, y_mean)

    sim1 = jnp.einsum("bcs,bcm->bsm", x, y, **_P)
    sim2 = jnp.einsum("bc,bc->b", x_mean, y_mean, **_P)[:, None, None]

    K = jnp.exp(-(1.0 - sim1) / eps)
    T = jax.lax.stop_gradient(sinkhorn(jax.lax.stop_gradient(K), u, v, iters=iters))
    return jnp.sum(T * (sim1 + sim2) / 2.0, axis=(1, 2))
