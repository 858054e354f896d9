"""On-device k-means (Lloyd iterations) — replaces faiss.Kmeans for NetVLAD
centroid initialization (reference training_tools/get_clusters.py:90-91,
SURVEY.md section 2.10)."""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jnp.ndarray, k: int, key: jax.Array, iters: int = 25
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd's algorithm.  x (N, D) -> (centroids (k, D), assignments (N,)).

    Empty clusters are re-seeded to the points farthest from their current
    centroid (standard faiss-style fixup)."""
    N, D = x.shape

    # k-means++ seeding: next seed drawn proportional to squared distance
    # from the chosen set (plain random init merges nearby true clusters)
    def seed_body(i, carry):
        cents, key = carry
        d = (
            jnp.sum(x * x, 1)[:, None]
            + jnp.sum(cents * cents, 1)[None, :]
            - 2.0 * jnp.einsum("nd,kd->nk", x, cents, preferred_element_type=jnp.float32)
        )
        valid = jnp.arange(k)[None, :] < i
        dmin = jnp.min(jnp.where(valid, d, jnp.inf), axis=1)
        key, sub = jax.random.split(key)
        logits = jnp.log(jnp.maximum(dmin, 1e-12))
        nxt = jax.random.categorical(sub, logits)
        return cents.at[i].set(x[nxt]), key

    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, N)]
    cents0 = jnp.zeros((k, D), x.dtype).at[0].set(first)
    cents0, key = jax.lax.fori_loop(1, k, seed_body, (cents0, key))

    def assign(cents):
        d = (
            jnp.sum(x * x, 1)[:, None]
            + jnp.sum(cents * cents, 1)[None, :]
            - 2.0 * jnp.einsum("nd,kd->nk", x, cents, preferred_element_type=jnp.float32)
        )
        return jnp.argmin(d, axis=1), d

    def body(i, cents):
        a, d = assign(cents)
        one_hot = jax.nn.one_hot(a, k, dtype=jnp.float32)  # (N, k)
        counts = jnp.sum(one_hot, axis=0)  # (k,)
        sums = jnp.einsum("nk,nd->kd", one_hot, x, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # re-seed empty clusters with the globally worst-fit points
        worst = jnp.argsort(-jnp.min(d, axis=1))[:k]
        new = jnp.where(counts[:, None] > 0, new, x[worst])
        return new

    cents = jax.lax.fori_loop(0, iters, body, cents0)
    a, _ = assign(cents)
    return cents, a


def get_clusters(
    descriptors: np.ndarray, num_clusters: int = 64, niter: int = 25, seed: int = 0
) -> np.ndarray:
    """faiss.Kmeans-style helper: fit on a descriptor sample, return centroids
    (consumed by models.netvlad.netvlad_init_from_clusters)."""
    cents, _ = kmeans(
        jnp.asarray(descriptors, jnp.float32), num_clusters,
        jax.random.PRNGKey(seed), iters=niter,
    )
    return np.asarray(cents)
