"""Swin-T backbone (Flax): windowed attention with relative position bias,
shifted windows, patch merging.

From-scratch implementation of the `swin_tiny_patch4_window7_224` topology
consumed by the reference (architectures/swin.py:13-61): patch 4, dims
96/192/384/768, depths 2/2/6/2, heads 3/6/12/24, window 7.  The wrapper
exposes the final 7x7x768 token map after the trunk LayerNorm — the Swin
rerank path pools it to the DIML grid (reference eval_swin_diml.py:183-195).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import DropPath, Mlp, l2norm, trunc_normal_init


@functools.lru_cache(maxsize=8)
def _relative_position_index(window: int) -> np.ndarray:
    """(W^2, W^2) indices into the (2W-1)^2 bias table (standard Swin)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """(nW, W^2, W^2) additive mask for shifted windows (0 or -100)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(H // window, window, W // window, window)
    wins = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] != wins[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x, window):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def window_reverse(wins, window, H, W):
    B = wins.shape[0] // ((H // window) * (W // window))
    x = wins.reshape(B, H // window, W // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


# Window-resident fused attention (ops/swin_attention_pallas.py): packs many
# independent 49-token window attentions per grid step; the (.., T, T)
# score/probability tensor (lane-padded 49 -> 128 by XLA, ~2.6x inflation)
# never touches HBM in either direction; the relative-position-bias gradient
# is emitted in-kernel.  Applies off the ret_attn path (Swin has no
# attention-probability consumer) for stages with >= 4 windows (stage 3's
# global attention stays on XLA — grid overhead dominates at nW=1).
# SWIN_WINDOW_ATTENTION=1/0 overrides (measurement runs flip it without
# edits).
import os as _os

USE_SWIN_WINDOW_KERNEL = _os.environ.get("SWIN_WINDOW_ATTENTION", "0") == "1"

# flat_proj: run the qkv/proj Denses in FLAT (B, L, C) token space instead of
# the windowed (B*nW, 49, C) layout.  The window row count T=49 is not a
# sublane multiple (bf16 tiles are (16, 128)), so windowed matmul operands
# carry a 49 -> 64 pad (+30% rows) or a relayout before every qkv/proj matmul
# x 12 blocks x fwd+bwd; rolls and window partition are token PERMUTATIONS,
# so they commute with per-token Denses bit-exactly and the projections can
# run on the unpadded flat layout (L = 3136/784/196/49, all 8-multiples).
# Parameter tree is unchanged (qkv/proj stay inside WindowAttention).
# SWIN_FLAT_PROJ=1 opts in (measurement A/B in scripts/profile_swin_stages.py;
# default follows the measured verdict).
USE_SWIN_FLAT_PROJ = _os.environ.get("SWIN_FLAT_PROJ", "0") == "1"

# SWIN_REMAT: rematerialize SwinBlocks in the backward pass.  The bs=64
# fwd+bwd moves 79 GB logical at ~90% of peak HBM bandwidth while the MXU
# sits at ~8% (test_results/profile_swin_r5.log) — the step is BYTES-bound,
# so trading recompute FLOPs for saved-residual traffic is the natural
# lever (the r3 CvT remat negative was measured on a compute-bound step;
# different regime).  Values:
#   "0"    off (save every intermediate — XLA default)
#   "1"    full per-block remat (save only block inputs)
#   "dots" jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
#          keep Dense/MLP matmul outputs, recompute elementwise/layout ops
#          and the batched attention einsums (the lane-padded (…,49,49)
#          score/prob tensors are never saved for bwd)
# Measured A/B in scripts/profile_swin_stages.py --parts remat; the
# training default follows the verdict.
SWIN_REMAT = _os.environ.get("SWIN_REMAT", "0")


def _block_cls():
    """SwinBlock, optionally wrapped in nn.remat per SWIN_REMAT (read at
    trace time so tests/measurement scripts can flip the module global)."""
    if SWIN_REMAT == "0":
        return SwinBlock
    policy = (
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if SWIN_REMAT == "dots" else None
    )
    return nn.remat(SwinBlock, static_argnums=(2, 3, 4), policy=policy)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    # narrow_sm: attention scores + softmax follow the compute dtype instead
    # of pinning f32 (models/cvt.py recipe — halves the probability tensor's
    # HBM traffic in bf16 mode).  The rel-pos bias table and shift mask cast
    # to the score dtype; the -100 shift mask and softmax are bf16-safe.
    # No attention-PROBABILITY consumer exists in the Swin path (no ret_attn:
    # only the output tokens leave this module), so unconditional narrowing
    # is safe; if a rollout/CAM-style consumer is ever added, mirror
    # models/cvt.py's `and not ret_attn` gate (see models/vit.py).
    narrow_sm: bool = False
    dtype: Any = jnp.float32
    # flat_proj: caller passes the PRE-ROLLED spatial tensor (B, H, W, C) and
    # gets back (B, H, W, C); qkv/proj Denses run on the flat (B, H*W, C)
    # layout (no 49-row sublane pad), the window partition/reverse moves the
    # qkv tensor / attention output instead (see USE_SWIN_FLAT_PROJ).
    flat_proj: bool = False

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False, n_windows: int = 1):
        if self.flat_proj:
            B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        if self.flat_proj:
            # per-token Dense commutes with the roll/partition permutations
            # bit-exactly; run it on the unpadded flat rows
            qkv = nn.Dense(
                self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv"
            )(x.reshape(B, H * W, C))
            qkv = window_partition(qkv.reshape(B, H, W, 3 * self.dim), self.window)
            Bw, T, _ = qkv.shape
        else:
            Bw, T, C = x.shape
            qkv = nn.Dense(
                self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv"
            )(x)
        qkv = qkv.reshape(Bw, T, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(T, T, self.num_heads)

        if USE_SWIN_WINDOW_KERNEL and jax.default_backend() == "tpu":
            from ..ops.swin_attention_pallas import swin_attention

            out = swin_attention(
                q, k, v, bias.transpose(2, 0, 1), mask, hd**-0.5,
                n_windows=n_windows,
            )
            if out is not None:
                out = out.transpose(0, 2, 1, 3).reshape(Bw, T, self.dim)
                return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        narrow = self.narrow_sm and self.dtype != jnp.float32
        attn = (
            jnp.einsum(
                "bhtd,bhsd->bhts", q, k,
                preferred_element_type=None if narrow else jnp.float32,
            )
            * hd**-0.5
        )
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, self.num_heads, T, T)
            attn = attn + mask[None, :, None, :, :].astype(attn.dtype)
            attn = attn.reshape(Bw, self.num_heads, T, T)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, T, self.dim)
        if self.flat_proj:
            out = window_reverse(out, self.window, H, W).reshape(B, H * W, C)
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return out.reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        B, L, C = x.shape
        # official Swin rule: when the resolution does not exceed the window,
        # attention is global — clamp the window and disable the shift
        window = min(self.window, H, W)
        shift = 0 if min(H, W) <= self.window else self.shift
        res = x
        # f32 LayerNorms + bf16-capable attention/MLP (cvt.py mixed recipe)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        y = y.astype(self.dtype).reshape(B, H, W, C)
        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(H, W, window, shift))
        else:
            mask = None
        flat_proj = USE_SWIN_FLAT_PROJ and not USE_SWIN_WINDOW_KERNEL
        if flat_proj:
            y = WindowAttention(
                self.dim, self.num_heads, window, narrow_sm=self.narrow_sm,
                dtype=self.dtype, flat_proj=True, name="attn"
            )(y, mask, train, n_windows=(H // window) * (W // window))
        else:
            wins = window_partition(y, window)
            wins = WindowAttention(
                self.dim, self.num_heads, window, narrow_sm=self.narrow_sm,
                dtype=self.dtype, name="attn"
            )(wins, mask, train, n_windows=(H // window) * (W // window))
            y = window_reverse(wins, window, H, W)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        x = res + DropPath(self.drop_path, name="dp1")(y.reshape(B, L, C), train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        # exact erf GELU (timm Swin); flax nn.gelu defaults to tanh approx
        y = Mlp(
            int(self.dim * self.mlp_ratio), self.dim,
            act=lambda t: nn.gelu(t, approximate=False),
            dtype=self.dtype, name="mlp",
        )(y.astype(self.dtype), train)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction"
        )(x.astype(self.dtype))


class SwinNetwork(nn.Module):
    """Swin-T retrieval wrapper (reference architectures/swin.py:13-61)."""

    embed_dim: int = 128
    normalize: bool = True
    dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch: int = 4
    drop_path_rate: float = 0.2
    narrow_sm: bool = False  # bf16 attention softmax (see WindowAttention)
    dtype: Any = jnp.float32  # activation compute dtype (bf16 = mixed)

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        B = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=self.dtype, name="patch_embed_proj",
        )(x)
        _, H, W, _ = x.shape
        x = x.reshape(B, H * W, self.dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_embed_norm")(x)
        x = x.astype(self.dtype)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        b = 0
        dim = self.dim
        block_cls = _block_cls()
        for li, depth in enumerate(self.depths):
            for bi in range(depth):
                x = block_cls(
                    dim,
                    self.num_heads[li],
                    window=self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    drop_path=float(dpr[b]),
                    narrow_sm=self.narrow_sm,
                    dtype=self.dtype,
                    name=f"layer{li}_block{bi}",
                )(x, H, W, train)
                b += 1
            if li < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"layer{li}_downsample")(x, H, W)
                H, W, dim = H // 2, W // 2, dim * 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)  # (B, 49, 768)
        x = x.astype(jnp.float32)  # head + rerank features in f32
        no_avg_feat = x
        enc_out = jnp.mean(x, axis=1)
        head = nn.Dense(self.embed_dim, name="head")
        out = head(enc_out)
        if self.normalize:
            out = l2norm(out)
        # Swin rerank projects the token map through the head before pooling
        # to the DIML grid (reference eval_swin_diml.py:183-195)
        return out, (enc_out, no_avg_feat), {"head_tokens": head(no_avg_feat)}
