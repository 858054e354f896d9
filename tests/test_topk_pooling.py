"""Blocked top-k vs dense argsort; pooling/resize vs torch oracles."""

import numpy as np
import jax.numpy as jnp
import torch

from vit_reranking_tpu.ops import (
    adaptive_avg_pool2d,
    grid_resize_tokens,
    pairwise_topk,
    similarity_matrix,
    upsample_bilinear_ac,
)


def test_pairwise_topk_matches_dense():
    rng = np.random.default_rng(0)
    Q, N, C, k = 13, 257, 8, 10
    q = rng.standard_normal((Q, C)).astype(np.float32)
    g = rng.standard_normal((N, C)).astype(np.float32)
    vals, inds = pairwise_topk(jnp.asarray(q), jnp.asarray(g), k=k, block_size=64)
    dense = q @ g.T
    ref_inds = np.argsort(-dense, axis=1)[:, :k]
    ref_vals = np.take_along_axis(dense, ref_inds, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-5)
    # indices can differ on exact ties only; values must match


def test_pairwise_topk_l2_and_self_mask():
    rng = np.random.default_rng(1)
    N, C = 50, 4
    g = rng.standard_normal((N, C)).astype(np.float32)
    vals, inds = pairwise_topk(jnp.asarray(g), jnp.asarray(g), k=1, metric="ip", mask_self=True)
    # with self-masking, top-1 is never the query itself (unless duplicates)
    assert not np.any(np.asarray(inds)[:, 0] == np.arange(N))
    vals2, inds2 = pairwise_topk(jnp.asarray(g), jnp.asarray(g), k=1, metric="l2")
    # without masking, nearest in L2 is self (distance 0 -> score 0 is max)
    assert np.all(np.asarray(inds2)[:, 0] == np.arange(N))


def test_similarity_matrix_self_mask():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((6, 3)).astype(np.float32)
    s = np.asarray(similarity_matrix(jnp.asarray(x), jnp.asarray(x), mask_self=True))
    assert np.all(np.diag(s) == -100.0)


def test_adaptive_pool_matches_torch():
    rng = np.random.default_rng(3)
    for in_size, out in [(14, 7), (7, 4), (49, 7), (10, 3)]:
        x = rng.standard_normal((2, 5, in_size, in_size)).astype(np.float32)
        ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out))
        ref = torch.nn.AdaptiveAvgPool2d(out)(torch.tensor(x)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bilinear_ac_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 7, 7)).astype(np.float32)
    ours = np.asarray(upsample_bilinear_ac(jnp.asarray(x), 16))
    ref = torch.nn.Upsample(size=16, mode="bilinear", align_corners=True)(
        torch.tensor(x)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_grid_resize_tokens_non_divisible():
    # the 7 % grid != 0 path: upsample to 4*grid then pool (eval_diml.py:90-96)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 7, 7)).astype(np.float32)
    ours = np.asarray(grid_resize_tokens(jnp.asarray(x), 4))
    up = torch.nn.Upsample(size=16, mode="bilinear", align_corners=True)(torch.tensor(x))
    ref = torch.nn.AdaptiveAvgPool2d(4)(up).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pairwise_topk_approx_mode():
    # approx=True routes per-block selection through lax.approx_max_k with an
    # exact cross-block merge; at small scale (and on CPU, where approx_max_k
    # lowers to exact sort) results must equal the exact path
    from vit_reranking_tpu.ops.topk import pairwise_topk

    rng = np.random.default_rng(7)
    emb = rng.standard_normal((96, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    e = jnp.asarray(emb)
    v0, i0 = pairwise_topk(e, e, k=10, mask_self=True, block_size=32)
    v1, i1 = pairwise_topk(e, e, k=10, mask_self=True, block_size=32, approx=True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
