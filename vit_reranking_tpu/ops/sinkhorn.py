"""Entropic Sinkhorn optimal transport, batched and XLA-compiled.

TPU-native re-design of the reference OT core (reference: utilities/diml.py:42-75).
The reference runs a Python loop with a data-dependent early break
(``mean|r - r0| < 0.1``); under XLA everything must be a fixed trip count, so the
early break becomes a *freeze mask*: once a batch instance's mean residual drops
below the threshold its scaling vectors stop updating.  This reproduces the
reference's early-exit semantics exactly (the reference keeps the r, c computed on
the breaking iteration), while remaining a static program.

Shapes follow a trailing-matrix convention: ``K (..., M, N)``, ``u (..., M)``,
``v (..., N)``.  The convergence residual is averaged over everything but the
leading batch dims covered by ``vmap`` — when called per query on a (topk, R, R)
stack, the mean runs over the whole stack, matching the reference's per-query
``.mean()`` over its batch of gallery candidates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _matvec(K: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """K @ x over trailing dims: (..., M, N) x (..., N) -> (..., M)."""
    return jnp.einsum("...mn,...n->...m", K, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _matvec_t(K: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """K^T @ x over trailing dims: (..., M, N) x (..., M) -> (..., N)."""
    return jnp.einsum("...mn,...m->...n", K, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("iters", "thresh", "return_scalings"))
def sinkhorn(
    K: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    iters: int = 100,
    thresh: float = 1e-1,
    return_scalings: bool = False,
):
    """Row/column scaling iterations; returns the transport plan T = diag(r) K diag(c).

    Semantics match reference utilities/diml.py:42-54: r, c start at ones;
    ``r = u / (K c)``; ``c = v / (K^T r)``; stop updating once
    ``mean|r - r_prev| < thresh``.  Pass ``thresh=0.0`` to always run the full
    ``iters`` iterations (useful for the Pallas fast path which has no mask).
    """
    K = K.astype(jnp.float32)
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)

    r0 = jnp.ones_like(u)
    c0 = jnp.ones_like(v)
    done0 = jnp.zeros((), dtype=bool)

    def body(_, carry):
        r, c, done = carry
        r_new = jnp.where(done, r, u / _matvec(K, c))
        c_new = jnp.where(done, c, v / _matvec_t(K, r_new))
        err = jnp.mean(jnp.abs(r_new - r))
        done = jnp.logical_or(done, err < thresh)
        return r_new, c_new, done

    r, c, _ = jax.lax.fori_loop(0, iters, body, (r0, c0, done0))
    T = r[..., :, None] * K * c[..., None, :]
    if return_scalings:
        return T, (r, c)
    return T


@functools.partial(jax.jit, static_argnames=("iters", "thresh"))
def sinkhorn_partial(
    K: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    ot_part: float | jnp.ndarray = 0.1,
    iters: int = 100,
    thresh: float = 1e-1,
) -> jnp.ndarray:
    """Partial OT via one dummy dustbin row + column carrying mass ``1 - ot_part``.

    Mirrors reference utilities/diml.py:56-75: the extended kernel gets value
    ``1 - ot_part`` in the dustbin row/column and 0 in the corner, and the
    extended marginals append ``1 - ot_part``.  Returns the *extended*
    (M+1, N+1) plan; callers crop ``T[..., :M, :N]``.
    """
    K = K.astype(jnp.float32)
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    *batch, m, n = K.shape
    bin_mass = jnp.asarray(1.0 - ot_part, dtype=jnp.float32)

    u_ext = jnp.concatenate([u, jnp.broadcast_to(bin_mass, (*batch, 1))], axis=-1)
    v_ext = jnp.concatenate([v, jnp.broadcast_to(bin_mass, (*batch, 1))], axis=-1)
    right = jnp.broadcast_to(bin_mass, (*batch, m, 1))
    bottom = jnp.broadcast_to(bin_mass, (*batch, 1, n))
    corner = jnp.zeros((*batch, 1, 1), dtype=jnp.float32)
    K_ext = jnp.concatenate(
        [
            jnp.concatenate([K, right], axis=-1),
            jnp.concatenate([bottom, corner], axis=-1),
        ],
        axis=-2,
    )
    return sinkhorn(K_ext, u_ext, v_ext, iters=iters, thresh=thresh)


def sinkhorn_plan_from_scores(
    S: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    ot_temp: float = 0.05,
    ot_part: float = 1.0,
    iters: int = 100,
    thresh: float = 1e-1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cost = 1 - S, kernel = exp(-cost / ot_temp), then (partial) Sinkhorn.

    Returns ``(T, T_ext)`` where T is cropped to S's shape and T_ext is the
    extended plan when ``ot_part < 1`` (otherwise T_ext is T).  This is the
    shared stage-1 recipe of every ``calc_similarity*`` variant
    (reference utilities/diml.py:101-139).
    """
    K = jnp.exp(-(1.0 - S.astype(jnp.float32)) / ot_temp)
    if ot_part > 0.999:
        T = sinkhorn(K, u, v, iters=iters, thresh=thresh)
        return T, T
    T_ext = sinkhorn_partial(K, u, v, ot_part=ot_part, iters=iters, thresh=thresh)
    m, n = S.shape[-2], S.shape[-1]
    return T_ext[..., :m, :n], T_ext
