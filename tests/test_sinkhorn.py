"""Sinkhorn OT kernel tests: convergence, marginal satisfaction, early-exit
parity with a straightforward numpy loop oracle, partial-OT mass conservation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_reranking_tpu.ops import sinkhorn, sinkhorn_partial


def np_sinkhorn(K, u, v, iters=100, thresh=1e-1):
    """Oracle: plain numpy loop with the reference's early-break rule."""
    r = np.ones_like(u)
    c = np.ones_like(v)
    for _ in range(iters):
        r0 = r
        r = u / np.einsum("...mn,...n->...m", K, c)
        c = v / np.einsum("...mn,...m->...n", K, r)
        if np.mean(np.abs(r - r0)) < thresh:
            break
    return r[..., :, None] * K * c[..., None, :]


def rand_problem(rng, b=4, m=7, n=7):
    S = rng.uniform(-1, 1, (b, m, n)).astype(np.float32)
    K = np.exp(-(1 - S) / 0.05).astype(np.float32)
    u = rng.uniform(0.1, 1.0, (b, m)).astype(np.float32)
    v = rng.uniform(0.1, 1.0, (b, n)).astype(np.float32)
    u /= u.sum(-1, keepdims=True)
    v /= v.sum(-1, keepdims=True)
    return K, u, v


def test_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    K, u, v = rand_problem(rng)
    T = np.asarray(sinkhorn(jnp.asarray(K), jnp.asarray(u), jnp.asarray(v)))
    T_ref = np_sinkhorn(K, u, v)
    np.testing.assert_allclose(T, T_ref, rtol=1e-4, atol=1e-6)


def test_early_exit_freeze_matches_break():
    # with a loose threshold the oracle breaks after few iterations; the XLA
    # freeze-mask version must land on the same plan, not keep iterating
    rng = np.random.default_rng(1)
    K, u, v = rand_problem(rng, b=2)
    T = np.asarray(sinkhorn(jnp.asarray(K), jnp.asarray(u), jnp.asarray(v), thresh=0.5))
    T_ref = np_sinkhorn(K, u, v, thresh=0.5)
    np.testing.assert_allclose(T, T_ref, rtol=1e-4, atol=1e-6)


def test_marginals_satisfied_at_convergence():
    rng = np.random.default_rng(2)
    K, u, v = rand_problem(rng, b=3, m=49, n=49)
    T = np.asarray(
        sinkhorn(jnp.asarray(K), jnp.asarray(u), jnp.asarray(v), iters=300, thresh=0.0)
    )
    np.testing.assert_allclose(T.sum(-1), u, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(T.sum(-2), v, rtol=1e-3, atol=1e-4)


def test_partial_ot_mass_conservation():
    rng = np.random.default_rng(3)
    K, u, v = rand_problem(rng, b=2, m=5, n=5)
    ot_part = 0.7
    T_ext = np.asarray(
        sinkhorn_partial(
            jnp.asarray(K), jnp.asarray(u), jnp.asarray(v), ot_part=ot_part, iters=300, thresh=0.0
        )
    )
    assert T_ext.shape == (2, 6, 6)
    # extended marginals: rows sum to [u, 1-ot_part], cols to [v, 1-ot_part]
    np.testing.assert_allclose(T_ext.sum(-1)[:, :-1], u, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(T_ext.sum(-1)[:, -1], 1 - ot_part, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(T_ext.sum(-2)[:, :-1], v, rtol=1e-3, atol=1e-4)
    # interior plan carries ~ot_part of the unit mass
    interior = T_ext[:, :-1, :-1].sum((-2, -1))
    np.testing.assert_allclose(interior, ot_part, atol=2e-2)


def test_vmap_per_query_isolation():
    # each vmapped instance gets its own early-exit mask
    rng = np.random.default_rng(4)
    K1, u1, v1 = rand_problem(rng, b=3)
    K2, u2, v2 = rand_problem(rng, b=3)
    batched = jax.vmap(lambda K, u, v: sinkhorn(K, u, v, thresh=0.3))(
        jnp.stack([K1, K2]), jnp.stack([u1, u2]), jnp.stack([v1, v2])
    )
    solo_1 = sinkhorn(jnp.asarray(K1), jnp.asarray(u1), jnp.asarray(v1), thresh=0.3)
    solo_2 = sinkhorn(jnp.asarray(K2), jnp.asarray(u2), jnp.asarray(v2), thresh=0.3)
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(solo_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(solo_2), rtol=1e-5)
