"""Deterministic spatial resampling as static matrix contractions.

PyTorch's ``AdaptiveAvgPool2d`` and ``Upsample(bilinear, align_corners=True)``
appear throughout the reference's rerank path (grid resizing of token maps,
rollout pooling: evaluation/eval_cvt_diml.py:54-70,119,228-234).  On TPU both
are best expressed as separable (out, in) weight matrices applied with einsum —
fully static, fuse into neighbouring matmuls, and hit the MXU for free.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """P[i, j] = 1/len(window_i) if j in window_i, matching torch AdaptiveAvgPool."""
    P = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        P[i, start:end] = 1.0 / (end - start)
    return P


@functools.lru_cache(maxsize=64)
def _bilinear_ac_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Align-corners bilinear interpolation matrix (torch Upsample semantics)."""
    W = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        W[0, 0] = 1.0
        return W
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        x = i * scale
        lo = int(np.floor(x))
        hi = min(lo + 1, in_size - 1)
        frac = x - lo
        W[i, lo] += 1.0 - frac
        W[i, hi] += frac
    return W


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """x (..., H, W) -> (..., h, w), torch.nn.AdaptiveAvgPool2d semantics."""
    h, w = (output_size, output_size) if isinstance(output_size, int) else output_size
    H, W = x.shape[-2], x.shape[-1]
    Ph = jnp.asarray(_adaptive_pool_matrix(H, h))
    Pw = jnp.asarray(_adaptive_pool_matrix(W, w))
    x = jnp.einsum("hH,...HW->...hW", Ph, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("wW,...HW->...Hw", Pw, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return x


def upsample_bilinear_ac(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """x (..., H, W) -> (..., h, w), torch Upsample(bilinear, align_corners=True)."""
    h, w = (output_size, output_size) if isinstance(output_size, int) else output_size
    H, W = x.shape[-2], x.shape[-1]
    Wh = jnp.asarray(_bilinear_ac_matrix(H, h))
    Ww = jnp.asarray(_bilinear_ac_matrix(W, w))
    x = jnp.einsum("hH,...HW->...hW", Wh, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("wW,...HW->...Hw", Ww, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return x


def grid_resize_tokens(feat: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Resize a (..., C, H, W) token map to (..., C, grid, grid).

    Mirrors the reference's eval-time rule (evaluation/eval_diml.py:90-96,
    eval_cvt_diml.py:228-234): plain adaptive pool when the source divides
    evenly into the grid, otherwise bilinear-upsample to 4*grid first.
    """
    H = feat.shape[-1]
    if H == grid:
        return feat
    if H % grid == 0:
        return adaptive_avg_pool2d(feat, grid)
    up = upsample_bilinear_ac(feat, grid * 4)
    return adaptive_avg_pool2d(up, grid)
