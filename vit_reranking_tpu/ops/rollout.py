"""Attention rollout: per-block filtering/pooling + cumulative joint attention.

TPU-native re-design of reference evaluation/eval_cvt_diml.py:54-146.  The
reference materializes every block's raw (T x T) attention map on the host and
loops in Python; here each block's map is filtered and pooled to the target
grid *inside the compiled forward* (a (B, 49, 49) tensor per block instead of
(B, heads, 3136, 3136)), and the cumulative matmul chain runs as a lax.scan.

Known quirk in the reference NOT replicated by default: its discard step
(`new_attn[:, indices_y, indices_x] = 0`, eval_cvt_diml.py:91-97) zeroes the
*union* of every batch element's lowest-10% indices in all elements
(cross-batch advanced indexing).  The correct per-sample behavior is the
default here; pass ``compat_crossbatch=True`` for bit-faithful emulation.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pooling import adaptive_avg_pool2d


def _filter_threshold_kernel(x_ref, o_ref, *, k, n_valid, iters):
    """Per-row exact-kth-smallest threshold + zeroing, all VMEM-resident.

    The XLA bisection path re-reads the full (B, Tq*Tk) map from HBM on every
    one of its 40 counting passes (12.6 GB of traffic at CvT stage-0 shapes,
    ~30 ms/batch on a v5e); here one grid step owns one row in VMEM and runs
    the identical bisection there, so HBM sees the row exactly twice (read +
    filtered write).  Arithmetic is bit-identical to the XLA path: same
    min/max seeds, same ``mid = 0.5 (lo + hi)``, counts are exact small
    integers in f32, so thresholds — and hence the rollout parity tests —
    match bit-for-bit.
    """
    x = x_ref[0]  # (Ns, 128)
    if n_valid < x.shape[0] * 128:
        # rows pad up to a lane multiple; exclude the tail from everything
        sub = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        valid = (sub * 128 + lane) < n_valid
        big = jnp.asarray(jnp.inf, x.dtype)
        xv = jnp.where(valid, x, big)
        hi_src = jnp.where(valid, x, -big)
    else:
        xv = x
        hi_src = x
    lo0 = jnp.min(jnp.min(xv, axis=1, keepdims=True), axis=0, keepdims=True)
    hi0 = jnp.max(jnp.max(hi_src, axis=1, keepdims=True), axis=0, keepdims=True)
    kf = jnp.float32(k)

    def body(_, carry):
        lo, hi = carry  # (1, 1) each
        mid = 0.5 * (lo + hi)
        below = (xv <= mid).astype(jnp.float32)
        count = jnp.sum(jnp.sum(below, axis=1, keepdims=True), axis=0, keepdims=True)
        pred = count < kf
        lo = jnp.where(pred, mid, lo)
        hi = jnp.where(pred, hi, mid)
        return lo, hi

    _, kth = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    o_ref[0] = jnp.where(xv <= kth, 0.0, x)


@functools.partial(jax.jit, static_argnames=("k", "iters", "interpret"))
def filter_threshold_pallas(
    flat: jnp.ndarray, k: int, iters: int = 40, interpret: bool = False
) -> jnp.ndarray:
    """Zero the ``k`` smallest entries of each row of ``flat`` (B, N).

    Fast path for :func:`filter_attention_map` on TPU; produces bit-identical
    output to its XLA value-bisection branch (see kernel docstring).
    """
    B, N = flat.shape
    pad = (-N) % 128
    x = flat.astype(jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    Ns = (N + pad) // 128
    x = x.reshape(B, Ns, 128)
    out = pl.pallas_call(
        functools.partial(_filter_threshold_kernel, k=k, n_valid=N, iters=iters),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Ns, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Ns, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ns, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * Ns * 128 * (iters + 2),
            bytes_accessed=2 * B * Ns * 128 * 4,
            transcendentals=0,
        ),
        # one row (Ns, 128) in + out + the bisection's count mask must sit in
        # VMEM at once; the 16 MB default scoped limit is too small at CvT
        # stage-0 shapes (19208 x 128 f32 = 9.8 MB per buffer)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
    out = out.reshape(B, Ns * 128)
    return out[:, :N] if pad else out


def filter_attention_map(
    raw_attn: jnp.ndarray,
    discard_ratio: float = 0.1,
    head_fusion: str = "min",
    compat_crossbatch: bool = False,
) -> jnp.ndarray:
    """Head-fuse then zero the lowest ``discard_ratio`` of entries per map.

    Args:
      raw_attn: (B, heads, T, T) attention probabilities.
    Returns: (B, T, T).
    """
    if head_fusion == "mean":
        fused = jnp.mean(raw_attn, axis=1)
    elif head_fusion == "max":
        fused = jnp.max(raw_attn, axis=1)
    elif head_fusion == "min":
        fused = jnp.min(raw_attn, axis=1)
    else:
        raise ValueError(f"head fusion type not supported: {head_fusion}")

    # maps can be rectangular: q is unpooled, k/v are stride-2 pooled
    B, Tq, Tk = fused.shape
    k = int(Tq * Tk * discard_ratio)
    if k == 0:
        return fused
    flat = fused.reshape(B, Tq * Tk)
    # value of the k-th smallest entry per sample; zero everything <= it.
    # For large maps (stage-0: 3136x784) an exact top_k sorts millions of
    # entries per image and dominates the whole rollout extraction; a value
    # bisection finds the same threshold in ~40 counting passes (exact for
    # f32 up to ties, which are measure-zero on softmax outputs).
    if flat.shape[1] <= 65536:
        kth = -jax.lax.top_k(-flat, k)[0][:, -1]
    elif not compat_crossbatch and jax.default_backend() == "tpu":
        # VMEM-resident Pallas bisection: one HBM pass instead of 40,
        # bit-identical thresholds (see filter_threshold_pallas).
        return filter_threshold_pallas(flat, k).reshape(B, Tq, Tk)
    else:
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            count = jnp.sum((flat <= mid[:, None]).astype(jnp.int32), axis=1)
            lo = jnp.where(count < k, mid, lo)
            hi = jnp.where(count < k, hi, mid)
            return lo, hi

        lo0 = jnp.min(flat, axis=1)
        hi0 = jnp.max(flat, axis=1)
        _, kth = jax.lax.fori_loop(0, 40, body, (lo0, hi0))
    if compat_crossbatch:
        # reference quirk: every sample is masked with the union of all
        # samples' discard sets
        drop = flat <= kth[:, None]  # (B, Tq*Tk) per-sample masks
        union = jnp.any(drop, axis=0, keepdims=True)
        flat = jnp.where(union, 0.0, flat)
    else:
        flat = jnp.where(flat <= kth[:, None], 0.0, flat)
    return flat.reshape(B, Tq, Tk)


def resize_attn_map(attn: jnp.ndarray, grid: int, has_cls: bool) -> jnp.ndarray:
    """Pool a (B, T, T) token-token map to (B, grid^2, grid^2).

    Mirrors reference eval_cvt_diml.py:54-70: drop the cls row/col, pool the
    key axis spatially, transpose, pool the query axis, final transpose.
    """
    if has_cls:
        attn = attn[:, 1:, 1:]
    B, H, W = attn.shape
    s = int(round(W**0.5))
    new_size = grid * grid
    attn = attn.reshape(B, H, s, s)
    if s > grid:
        attn = adaptive_avg_pool2d(attn, grid)
    attn = attn.reshape(B, H, new_size).transpose(0, 2, 1)
    sh = int(round(H**0.5))
    attn = attn.reshape(B, new_size, sh, sh)
    if sh > grid:
        attn = adaptive_avg_pool2d(attn, grid)
    attn = attn.reshape(B, new_size, new_size).transpose(0, 2, 1)
    return attn


def block_rollout_map(
    probs: jnp.ndarray,
    grid: int,
    has_cls: bool,
    discard_ratio: float = 0.1,
    head_fusion: str = "min",
) -> jnp.ndarray:
    """One block's contribution: filter + pool (called inside the forward)."""
    return resize_attn_map(
        filter_attention_map(probs, discard_ratio, head_fusion), grid, has_cls
    )


def attention_rollout(
    attn_mats: jnp.ndarray, use_res: bool = True, keep_all_layers: bool = False
) -> jnp.ndarray:
    """Joint attention via cumulative matmul over layers.

    Args:
      attn_mats: (L, B, G, G) per-block pooled maps (G = grid^2).
    Returns (B, G, G) final joint attention (or (L, B, G, G) if
    ``keep_all_layers``), matching eval_cvt_diml.py:132-140.
    """
    if use_res:
        G = attn_mats.shape[-1]
        attn_mats = attn_mats + jnp.eye(G, dtype=attn_mats.dtype)
        attn_mats = attn_mats / jnp.sum(attn_mats, axis=-1, keepdims=True)

    def step(carry, A):
        joint = jnp.einsum(
            "bij,bjk->bik", A, carry,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        return joint, joint

    init = attn_mats[0]
    last, all_joints = jax.lax.scan(step, init, attn_mats[1:])
    if keep_all_layers:
        return jnp.concatenate([init[None], all_joints], axis=0)
    return last


def rollout_saliency(attn_mats: jnp.ndarray, use_res: bool = True) -> jnp.ndarray:
    """Per-image saliency: final joint attention averaged over rows
    (reference eval_cvt_diml.py:255-256 `rollout[-1].mean(1)`).  (L,B,G,G) -> (B,G)."""
    return jnp.mean(attention_rollout(attn_mats, use_res=use_res), axis=1)
