"""Blocked pairwise similarity + streaming top-k.

TPU-native replacement for faiss ``IndexFlatL2/IP`` brute-force search and the
reference's full N x N materialization (reference evaluation/__init__.py:86-88,
train_baseline.py:275-278, training_tools/val.py:134-137).  The gallery axis is
processed in device-resident tiles with an on-the-fly ``lax.top_k`` merge, so
SOP-scale galleries (60k) never materialize an N x N matrix; the query axis
shards trivially over the data mesh axis.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _scores_block(queries, gallery_block, metric):
    if metric == "ip":
        return jnp.einsum(
            "qc,nc->qn", queries, gallery_block, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
    if metric == "l2":
        # negative squared L2 so that "larger is better" uniformly
        qn = jnp.sum(queries * queries, axis=-1, keepdims=True)
        gn = jnp.sum(gallery_block * gallery_block, axis=-1)
        ip = jnp.einsum("qc,nc->qn", queries, gallery_block, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        return -(qn + gn[None, :] - 2.0 * ip)
    raise ValueError(f"unknown metric {metric}")


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_size", "mask_self", "approx", "recall_target"),
)
def pairwise_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    metric: str = "ip",
    block_size: int = 8192,
    mask_self: bool = False,
    query_offset: int | jnp.ndarray = 0,
    approx: bool = False,
    recall_target: float = 0.99,
    n_valid: int | jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k of a (Q, N) score matrix computed in gallery tiles.

    Args:
      queries: (Q, C); gallery: (N, C).  N is padded up to a multiple of
        block_size internally (padded entries score -inf).
      metric: "ip" (cosine/inner-product on pre-normalized embeddings) or "l2"
        (returns negative squared distance).
      mask_self: if True, gallery index ``query_offset + q`` is masked to -100
        for query q (self-retrieval exclusion, eval_cvt_diml.py:327).
      n_valid: treat only the first ``n_valid`` gallery rows as real (may be
        traced); rows past it score -inf BEFORE selection.  Used by the
        sharded wrapper, where externally padded rows must not displace real
        candidates from a shard's head.
      approx: per-block selection via TPU ``lax.approx_max_k`` (the MIPS
        bucketed-reduction hardware path) instead of exact ``lax.top_k``; the
        cross-block merge stays exact, so only the per-block top-k boundary
        is approximate.  Default False — the faiss-``IndexFlat`` parity
        contract (SURVEY.md 2.10) is exact search.  Measured on a v5e at SOP
        scale (60480 x 60480, k=128): exact 5.9 s, approx 2.4 s with
        empirical recall 1.0000 at ``recall_target=0.99``.

    Returns (values (Q, k), indices (Q, k)) sorted descending.
    """
    Q, C = queries.shape
    N = gallery.shape[0]
    nblocks = -(-N // block_size)
    pad = nblocks * block_size - N
    if pad:
        gallery = jnp.concatenate(
            [gallery, jnp.zeros((pad, C), gallery.dtype)], axis=0
        )

    neg_inf = jnp.float32(-jnp.inf)
    init_vals = jnp.full((Q, k), neg_inf, jnp.float32)
    init_inds = jnp.zeros((Q, k), jnp.int32)
    qids = jnp.arange(Q, dtype=jnp.int32) + query_offset
    nv = N if n_valid is None else jnp.minimum(n_valid, N)

    def body(b, carry):
        vals, inds = carry
        start = b * block_size
        blk = jax.lax.dynamic_slice_in_dim(gallery, start, block_size, axis=0)
        s = _scores_block(queries, blk, metric)
        gidx = start + jnp.arange(block_size, dtype=jnp.int32)
        valid = gidx < nv
        s = jnp.where(valid[None, :], s, neg_inf)
        if mask_self:
            s = jnp.where(gidx[None, :] == qids[:, None], -100.0, s)
        if approx:
            # select within the fresh block on the fast path, then merge the
            # two already-small sorted heads exactly (2k wide)
            kb = min(k, block_size)
            bv, bsel = jax.lax.approx_max_k(s, kb, recall_target=recall_target)
            bi = jnp.take_along_axis(
                jnp.broadcast_to(gidx[None, :], s.shape), bsel, axis=1
            )
            cat_vals = jnp.concatenate([vals, bv], axis=1)
            cat_inds = jnp.concatenate([inds, bi], axis=1)
        else:
            cat_vals = jnp.concatenate([vals, s], axis=1)
            cat_inds = jnp.concatenate(
                [inds, jnp.broadcast_to(gidx[None, :], s.shape)], axis=1
            )
        new_vals, sel = jax.lax.top_k(cat_vals, k)
        new_inds = jnp.take_along_axis(cat_inds, sel, axis=1)
        return new_vals, new_inds

    vals, inds = jax.lax.fori_loop(0, nblocks, body, (init_vals, init_inds))
    return vals, inds


@functools.partial(jax.jit, static_argnames=("mask_self",))
def similarity_matrix(
    queries: jnp.ndarray, gallery: jnp.ndarray, mask_self: bool = False
) -> jnp.ndarray:
    """Full (Q, N) cosine/IP score matrix with optional self-masking (-100)."""
    s = jnp.einsum("qc,nc->qn", queries, gallery, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    if mask_self:
        Q, N = s.shape
        s = jnp.where(jnp.eye(N, dtype=bool)[:Q], -100.0, s)
    return s
