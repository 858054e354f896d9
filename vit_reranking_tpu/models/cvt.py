"""CvT-13 (Convolutional Vision Transformer) in Flax — the primary backbone.

From-scratch TPU-native implementation of the architecture specified at
reference architectures/cvt.py:651-675 (spec dict) and :82-500 (modules):
3 stages, conv patch embedding (7/3/3 kernels, 4/2/2 strides), depthwise-conv
+ BN q/k/v projections with stride-2 pooled K/V, cls token only in stage 2,
QuickGELU MLPs, fp32 LayerNorms, attention scale = full-dim ** -0.5
(reference cvt.py:105 — NOT per-head).

Differences from the reference by design:
  * NHWC layout end to end (TPU-native; torch checkpoints are converted).
  * Attention-rollout maps are filtered + pooled to the target grid *inside*
    the forward pass (ops/rollout.py), so the (B, heads, T, T) probabilities
    of stage 0/1 never leave the compiled program — the reference instead
    hauls every raw map to host (eval_cvt_diml.py:120-128).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.rollout import block_rollout_map
from ..ops.pooling import adaptive_avg_pool2d
from .common import DropPath, LayerNormFp32, Mlp, l2norm, quick_gelu, trunc_normal_init


@dataclass(frozen=True)
class CvTSpec:
    """CvT-13 stage spec (reference cvt.py:651-675, hardcoded there too)."""

    patch_size: Sequence[int] = (7, 3, 3)
    patch_stride: Sequence[int] = (4, 2, 2)
    patch_padding: Sequence[int] = (2, 1, 1)
    dim_embed: Sequence[int] = (64, 192, 384)
    num_heads: Sequence[int] = (1, 3, 6)
    depth: Sequence[int] = (1, 2, 10)
    mlp_ratio: Sequence[float] = (4.0, 4.0, 4.0)
    qkv_bias: Sequence[bool] = (True, True, True)
    cls_token: Sequence[bool] = (False, False, True)
    drop_rate: Sequence[float] = (0.0, 0.0, 0.0)
    attn_drop_rate: Sequence[float] = (0.0, 0.0, 0.0)
    drop_path_rate: Sequence[float] = (0.0, 0.0, 0.1)
    kernel_qkv: Sequence[int] = (3, 3, 3)
    padding_kv: Sequence[int] = (1, 1, 1)
    stride_kv: Sequence[int] = (2, 2, 2)
    padding_q: Sequence[int] = (1, 1, 1)
    stride_q: Sequence[int] = (1, 1, 1)

    @property
    def num_stages(self) -> int:
        return len(self.depth)


CVT13_SPEC = CvTSpec()


# Opt-in: route cls-token-free stages' attention through the Pallas TPU
# flash kernel shipped with JAX (jax.experimental.pallas.ops.tpu
# .flash_attention) instead of materializing the (T, T_kv) probability
# matrix (stage 0 at the canonical recipe: (112, 1, 3136, 784) f32 = 1.1 GB
# per materialization).  Measured on the v5e (scripts/ablate_stage_cost.py,
# bf16 bs=112): stage-0 fwd+bwd 69.6 ms flash vs 44.7 ms materializing — the
# 128-padding (3136->3200 q, 784->896 kv) plus the kernel's f32 internals
# LOSE to XLA's fused softmax at CvT's small head counts, so this stays OFF
# by default and exists as a memory-headroom knob (larger batch/resolution
# where the 1.1 GB materialization OOMs before it slows).  ret_attn
# (rollout) always uses the materializing path — rollout needs the probs.
USE_FLASH_ATTENTION = False

# KV-resident fused attention (ops/attention_pallas.py): unlike the generic
# flash kernel above, it exploits CvT's tiny kv sequences (784x64 / 196x64 —
# the whole kv block lives in VMEM) to run attention in ONE pass per q block
# with plain softmax and a custom VJP that accumulates dK/dV in VMEM — the
# (T, T_kv) probability tensor never touches HBM in either direction.
# Applies to cls-free stages (0/1) with attn_drop == 0; rollout/ret_attn
# keeps the materializing path (it needs the probabilities).  ON by default
# since round 4: cvt_attention itself gates on probability-tensor size
# (KV_RESIDENT_MIN_SCORES — wins stage 0 only, returns None for stage 1),
# and the gated full train step measures 61.8 -> 58.8 ms (1903 img/s) with
# fwd 5e-5 / grad 2.4e-4 parity vs the XLA softmax path
# (test_results/kvres_attention_r4.log, tpu_mosaic_tests_r4.log).
# CVT_KV_ATTENTION=1/0 overrides (measurement runs flip it without edits).
import os as _os

USE_KV_RESIDENT_ATTENTION = _os.environ.get("CVT_KV_ATTENTION", "1") == "1"

def _block128(n: int, cap: int = 512) -> int:
    """Largest multiple of 128 <= cap dividing n (n must be a multiple of
    128; the kernel requires 128-multiple blocks)."""
    b = (min(n, cap) // 128) * 128
    while b > 128 and n % b:
        b -= 128
    return max(b, 128)


def _flash_attention(q, k, v, scale):
    """Shipped Pallas TPU flash kernel over CvT's uneven token counts: both
    sequence axes pad to multiples of 128 with segment ids masking the pad
    (q tokens 3136/784, kv 784/196 at 224px — neither is 128-aligned)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, T, D = q.shape
    Tk = k.shape[2]
    Tp = -(-T // 128) * 128
    Tkp = -(-Tk // 128) * 128
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Tkp != Tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0)))
    seg = None
    if Tp != T or Tkp != Tk:
        qi = (jnp.arange(Tp) < T).astype(jnp.int32)[None].repeat(B, 0)
        ki = (jnp.arange(Tkp) < Tk).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=qi, kv=ki)
    bq = _block128(Tp)
    bk = _block128(Tkp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_q_dkv=bq,
        block_k_dkv=bk, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(q, k, v, segment_ids=seg, sm_scale=scale, block_sizes=bs)
    return out[:, :, :T, :]


class ConvProj(nn.Module):
    """Depthwise conv + BN projection used for q/k/v (reference cvt.py:131-151).

    Input/output: (B, H, W, C) -> (B, T', C) flattened tokens.
    """

    dim: int
    kernel: int
    stride: int
    padding: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.dim,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            feature_group_count=self.dim,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn"
        )(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class CvTAttention(nn.Module):
    """Multi-head attention with conv-projected q/k/v (reference cvt.py:82-220)."""

    dim: int
    num_heads: int
    qkv_bias: bool
    kernel: int
    stride_q: int
    stride_kv: int
    padding_q: int
    padding_kv: int
    with_cls_token: bool
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # narrow_sm: let the attention scores + softmax follow the compute dtype
    # instead of pinning f32 via preferred_element_type.  In bf16 mode this
    # halves the HBM traffic of the (T, T_kv) probability materialization —
    # the stage-0/1 bottleneck at canonical shapes — at ~3e-3 softmax error
    # (MXU accumulation is unchanged; only the stored scores/probs narrow).
    # Measured on the v5e (scripts/profile_train_step.py --bf16 --bf16sm,
    # bs=112/224px): full train step 69.8 -> 61.8 ms.  No effect in f32 or
    # when ret_attn needs the f32 probabilities for rollout.
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h: int, w: int, train: bool = False, ret_attn: bool = False):
        B, T, C = x.shape
        if self.with_cls_token:
            cls_tok, tokens = x[:, :1], x[:, 1:]
        else:
            cls_tok, tokens = None, x
        spatial = tokens.reshape(B, h, w, C)

        q = ConvProj(self.dim, self.kernel, self.stride_q, self.padding_q,
                     dtype=self.dtype, name="conv_proj_q")(spatial, train)
        k = ConvProj(self.dim, self.kernel, self.stride_kv, self.padding_kv,
                     dtype=self.dtype, name="conv_proj_k")(spatial, train)
        v = ConvProj(self.dim, self.kernel, self.stride_kv, self.padding_kv,
                     dtype=self.dtype, name="conv_proj_v")(spatial, train)
        if cls_tok is not None:
            q = jnp.concatenate([cls_tok, q], axis=1)
            k = jnp.concatenate([cls_tok, k], axis=1)
            v = jnp.concatenate([cls_tok, v], axis=1)

        proj = lambda name: nn.Dense(
            self.dim, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(),
            dtype=self.dtype, name=name
        )
        hd = self.dim // self.num_heads
        q = proj("proj_q")(q).reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = proj("proj_k")(k).reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = proj("proj_v")(v).reshape(B, -1, self.num_heads, hd).transpose(0, 2, 1, 3)

        # scale uses the FULL dim, not head dim (reference cvt.py:105)
        scale = self.dim**-0.5
        if (
            USE_KV_RESIDENT_ATTENTION
            and not ret_attn
            and cls_tok is None
            and self.attn_drop == 0.0
            and jax.default_backend() == "tpu"
        ):
            from ..ops.attention_pallas import cvt_attention

            out = cvt_attention(q, k, v, scale)
            if out is not None:
                out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim)
                out = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                               dtype=self.dtype, name="proj")(out)
                out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
                return out, None
        if (
            USE_FLASH_ATTENTION
            and not ret_attn
            and cls_tok is None
            and self.attn_drop == 0.0
            and jax.default_backend() == "tpu"
        ):
            out = _flash_attention(q, k, v, scale)
            out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim)
            out = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                           dtype=self.dtype, name="proj")(out)
            out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
            return out, None
        narrow_sm = self.narrow_sm and not ret_attn and self.dtype != jnp.float32
        attn_score = (
            jnp.einsum(
                "bhlk,bhtk->bhlt", q, k,
                preferred_element_type=None if narrow_sm else jnp.float32,
            )
            * scale
        )
        attn = jax.nn.softmax(attn_score, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        weights = attn if ret_attn else None

        out = jnp.einsum("bhlt,bhtv->bhlv", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim)
        out = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                       dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out, weights


class CvTBlock(nn.Module):
    """Pre-norm transformer block (reference cvt.py:297-344)."""

    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    drop_path: float
    kernel: int
    stride_q: int
    stride_kv: int
    padding_q: int
    padding_kv: int
    with_cls_token: bool
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h, w, train: bool = False, ret_attn: bool = False):
        res = x
        y = LayerNormFp32(name="norm1")(x)
        attn_out, weights = CvTAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            kernel=self.kernel,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            padding_q=self.padding_q,
            padding_kv=self.padding_kv,
            with_cls_token=self.with_cls_token,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            narrow_sm=self.narrow_sm,
            dtype=self.dtype,
            name="attn",
        )(y, h, w, train, ret_attn)
        x = res + DropPath(self.drop_path, name="drop_path1")(attn_out, train)
        y = LayerNormFp32(name="norm2")(x)
        y = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            act=quick_gelu,
            dropout=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(y, train)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, train)
        return x, weights


class CvTStage(nn.Module):
    """Conv embed + blocks (reference VisionTransformer, cvt.py:382-500).

    ``remat`` wraps each block in jax.checkpoint (rematerialisation), trading
    recompute for activation memory — lets batch sizes scale well past the
    reference's 112 on one chip.  ``dtype`` selects the activation compute
    dtype (bf16 halves HBM traffic; params stay f32, LayerNorms and attention
    softmax stay f32 via LayerNormFp32 / preferred_element_type)."""

    spec: CvTSpec
    index: int
    rollout_grid: int = 7
    remat: bool = False
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        i = self.index
        s = self.spec
        x = x.astype(self.dtype)
        p = s.patch_size[i]
        x = nn.Conv(
            s.dim_embed[i],
            (p, p),
            strides=(s.patch_stride[i], s.patch_stride[i]),
            padding=[(s.patch_padding[i], s.patch_padding[i])] * 2,
            dtype=self.dtype,
            name="patch_embed_proj",
        )(x)
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = LayerNormFp32(name="patch_embed_norm")(tokens)

        with_cls = s.cls_token[i]
        if with_cls:
            cls = self.param("cls_token", trunc_normal_init(), (1, 1, C))
            tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)

        tokens = nn.Dropout(s.drop_rate[i], deterministic=not train)(tokens)

        depth = s.depth[i]
        import numpy as np

        dpr = [float(r) for r in np.linspace(0.0, s.drop_path_rate[i], depth)]
        rollout_maps = []
        block_cls = nn.remat(CvTBlock, static_argnums=(2, 3, 4, 5)) if self.remat else CvTBlock
        for j in range(depth):
            tokens, weights = block_cls(
                dim=C,
                num_heads=s.num_heads[i],
                mlp_ratio=s.mlp_ratio[i],
                qkv_bias=s.qkv_bias[i],
                drop=s.drop_rate[i],
                attn_drop=s.attn_drop_rate[i],
                drop_path=dpr[j],
                kernel=s.kernel_qkv[i],
                stride_q=s.stride_q[i],
                stride_kv=s.stride_kv[i],
                padding_q=s.padding_q[i],
                padding_kv=s.padding_kv[i],
                with_cls_token=with_cls,
                narrow_sm=self.narrow_sm,
                dtype=self.dtype,
                name=f"block{j}",
            )(tokens, H, W, train, ret_attn)
            if ret_attn:
                # filter + pool to grid in-forward (never materialize all raw maps)
                rollout_maps.append(
                    block_rollout_map(weights, self.rollout_grid, has_cls=with_cls)
                )

        cls_out = None
        if with_cls:
            cls_out, tokens = tokens[:, :1], tokens[:, 1:]
        x = tokens.reshape(B, H, W, C)
        return x, cls_out, rollout_maps


class ConvolutionalVisionTransformer(nn.Module):
    """3-stage CvT trunk (reference cvt.py:503-648)."""

    spec: CvTSpec = CVT13_SPEC
    rollout_grid: int = 7
    remat: bool = False
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        rollout_maps: List[jnp.ndarray] = []
        cls_tokens = None
        for i in range(self.spec.num_stages):
            x, cls_tokens, maps = CvTStage(
                self.spec, i, rollout_grid=self.rollout_grid, remat=self.remat,
                narrow_sm=self.narrow_sm, dtype=self.dtype, name=f"stage{i}"
            )(x, train, ret_attn)
            rollout_maps.extend(maps)
        return x, cls_tokens, rollout_maps


class CvTNetwork(nn.Module):
    """Retrieval wrapper (reference cvt.Network, cvt.py:678-749).

    Returns ``(embed, (enc_out, no_avg_feat), aux)`` where no_avg_feat is the
    LayerNorm'd token map (B, H*W, C) and aux carries the per-block pooled
    rollout maps when ``ret_attn``.
    """

    embed_dim: int = 128
    num_classes: int = 0  # >0: ImageNet classifier head instead of embed head
    normalize: bool = True
    rollout_grid: int = 7
    remat: bool = False
    narrow_sm: bool = False
    dtype: Any = jnp.float32
    spec: CvTSpec = CVT13_SPEC

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        trunk = ConvolutionalVisionTransformer(
            self.spec, rollout_grid=self.rollout_grid, remat=self.remat,
            narrow_sm=self.narrow_sm, dtype=self.dtype, name="trunk"
        )
        tokens_hw, cls_tok, rollout_maps = trunk(x, train, ret_attn)
        B, H, W, C = tokens_hw.shape
        tokens_hw = tokens_hw.astype(jnp.float32)
        cls_tok = cls_tok.astype(jnp.float32)

        norm = LayerNormFp32(name="norm")
        no_avg_feat = norm(tokens_hw.reshape(B, H * W, C))
        cls_norm = norm(cls_tok)
        enc_out = jnp.squeeze(cls_norm, axis=1)

        out_dim = self.num_classes if self.num_classes > 0 else self.embed_dim
        head = nn.Dense(out_dim, kernel_init=trunc_normal_init(), name="head")
        x = head(enc_out)
        if self.normalize:
            x = l2norm(x, axis=-1)

        aux: Dict[str, Any] = {}
        if ret_attn:
            aux["rollout_maps"] = jnp.stack(rollout_maps)  # (L, B, G, G)
        # eval path needs head-projected token maps (eval_cvt_diml.py:269-276)
        aux["head_tokens"] = head(no_avg_feat)  # (B, H*W, out_dim)
        return x, (enc_out, no_avg_feat), aux


class CvTFPNetwork(nn.Module):
    """Multi-stage FPN pooling variant (reference cvt.FPNetwork,
    cvt.py:752-816): every stage's token map is pooled to 7x7, channel-
    concatenated (64+192+384=640), globally averaged, and projected."""

    embed_dim: int = 128
    normalize: bool = True
    spec: CvTSpec = CVT13_SPEC

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        stage_maps = []
        cls_tokens = None
        for i in range(self.spec.num_stages):
            x, cls_tokens, _ = CvTStage(self.spec, i, name=f"stage{i}")(x, train, False)
            stage_maps.append(x)  # (B, H_i, W_i, C_i)

        pooled = []
        for m in stage_maps:
            mm = m.transpose(0, 3, 1, 2)  # (B, C, H, W)
            if mm.shape[-1] != 7:
                mm = adaptive_avg_pool2d(mm, 7)
            pooled.append(mm)
        ys = jnp.concatenate(pooled, axis=1)  # (B, 640, 7, 7)
        gap = jnp.mean(ys, axis=(2, 3))  # (B, 640)
        out = nn.Dense(self.embed_dim, kernel_init=trunc_normal_init(), name="head")(gap)
        if self.normalize:
            out = l2norm(out)
        B = ys.shape[0]
        tokens = ys.reshape(B, ys.shape[1], -1).transpose(0, 2, 1)  # (B, 49, 640)
        return out, (gap, tokens), {}


class CvTDIML(nn.Module):
    """Structural (per-patch embedding) variant (reference cvt.DIML, cvt.py:820-900).

    Returns ``(per_feat, (global_enc, no_avg_feat), aux)`` with
    per_feat (B, grid, grid, embed_dim) per-patch embeddings from a 1x1-conv
    head, and global_enc the same head applied to the cls token.
    """

    embed_dim: int = 128
    grid_size: int = 7
    normalize: bool = False
    rollout_grid: int = 7
    remat: bool = False
    narrow_sm: bool = False
    dtype: Any = jnp.float32
    spec: CvTSpec = CVT13_SPEC

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        trunk = ConvolutionalVisionTransformer(
            self.spec, rollout_grid=self.rollout_grid, remat=self.remat,
            narrow_sm=self.narrow_sm, dtype=self.dtype, name="trunk"
        )
        tokens_hw, cls_tok, rollout_maps = trunk(x, train, ret_attn)
        B, H, W, C = tokens_hw.shape
        # per-patch head + structural loss stay f32 (parity-critical OT)
        tokens_hw = tokens_hw.astype(jnp.float32)
        cls_tok = cls_tok.astype(jnp.float32)

        norm = LayerNormFp32(name="norm")
        tokens = norm(tokens_hw.reshape(B, H * W, C))
        no_avg_feat = tokens.reshape(B, H, W, C)
        if H != self.grid_size:
            no_avg_feat = adaptive_avg_pool2d(
                no_avg_feat.transpose(0, 3, 1, 2), self.grid_size
            ).transpose(0, 2, 3, 1)

        # 1x1 conv == Dense over the channel axis
        last_linear = nn.Dense(self.embed_dim, name="last_linear")
        per_feat = last_linear(no_avg_feat)  # (B, g, g, D)

        cls_norm = norm(cls_tok)  # (B, 1, C)
        global_enc = last_linear(cls_norm)[:, 0]  # (B, D)

        aux: Dict[str, Any] = {}
        if ret_attn:
            aux["rollout_maps"] = jnp.stack(rollout_maps)
        return per_feat, (global_enc, no_avg_feat), aux
