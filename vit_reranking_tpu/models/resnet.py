"""ResNet-50 backbone (Flax) + DIML per-patch variant + GeM retrieval variant.

From-scratch NHWC implementation matching torchvision/pretrainedmodels
topology so ImageNet checkpoints convert directly.  Contracts mirror the
reference wrappers:
  * ResNet50Network  -> (embed, (enc_out, layer4_map)) (reference
    architectures/resnet50.py:35-50)
  * ResNet50DIML     -> per-patch conv head (reference resnet50_diml.py:25-41)
  * IRResNet (GeM)   -> (whitened descriptor, layer4_map) for place
    recognition (reference resnet50.py:87-110)
`frozen` in the arch string freezes all BatchNorms: we express that as
use_running_average=True during training for BN (matching the reference's
module.eval() trick, resnet50.py:23-26).

``dtype`` selects the trunk's activation compute dtype (bf16 halves the
conv HBM traffic on TPU; parameters stay f32).  Flax BatchNorm computes
batch statistics in f32 regardless of ``dtype`` (flax _compute_stats
upcasts), so bf16 normalization is numerically safe; the embedding heads,
GeM pooling, and every returned tensor (embed, enc_out, token map) are
cast back to f32 so downstream mining/loss/OT math is dtype-stable.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import l2norm


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_frozen,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name,
        )
        conv = lambda *a, **kw: nn.Conv(*a, dtype=self.dtype, **kw)
        residual = x
        y = conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            residual = conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Trunk(nn.Module):
    """conv1..layer4; returns the (B, 7, 7, 2048) feature map (f32)."""

    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=(not train) or self.bn_frozen,
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (blocks, feats, stride) in enumerate(
            [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
        ):
            for bi in range(blocks):
                x = Bottleneck(
                    feats,
                    strides=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    bn_frozen=self.bn_frozen,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
        # downstream heads / pooling / OT math are dtype-stable in f32
        return x.astype(jnp.float32)


class ResNet50Network(nn.Module):
    """Retrieval wrapper (reference resnet50.Network)."""

    embed_dim: int = 128
    normalize: bool = True
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        feat = ResNet50Trunk(
            bn_frozen=self.bn_frozen, dtype=self.dtype, name="trunk"
        )(x, train)
        enc_out = jnp.mean(feat, axis=(1, 2))  # (B, 2048)
        x = nn.Dense(self.embed_dim, name="last_linear")(enc_out)
        if self.normalize:
            x = l2norm(x)
        # token map exposed as (B, HW, C) to match the transformer contract
        B, H, W, C = feat.shape
        return x, (enc_out, feat.reshape(B, H * W, C)), {}


class ResNet50DIML(nn.Module):
    """Per-patch embedding head: 1x1 conv on the 7x7 map
    (reference resnet50_diml.py:25,41)."""

    embed_dim: int = 128
    normalize: bool = False
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        feat = ResNet50Trunk(
            bn_frozen=self.bn_frozen, dtype=self.dtype, name="trunk"
        )(x, train)
        last = nn.Dense(self.embed_dim, name="last_linear")  # 1x1 conv == Dense
        per_feat = last(feat)  # (B, 7, 7, D)
        # reference returns the UNprojected 2048-d pooled feature as enc_out
        # (resnet50_diml.py:43-45)
        enc_out = jnp.mean(feat, axis=(1, 2))
        B, H, W, C = feat.shape
        return per_feat, (enc_out, feat.reshape(B, H * W, C)), {}


class IRResNet(nn.Module):
    """GeM pooling + whitening retrieval net (reference resnet50.py:87-110)."""

    embed_dim: int = 128
    gem_p_init: float = 3.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        feat = ResNet50Trunk(dtype=self.dtype, name="trunk")(x, train)  # (B, H, W, 2048)
        p = self.param("gem_p", lambda *_: jnp.ones((1,)) * self.gem_p_init)
        pooled = jnp.mean(jnp.clip(feat, self.eps, None) ** p, axis=(1, 2)) ** (1.0 / p)
        o = pooled / (jnp.linalg.norm(pooled, axis=1, keepdims=True) + self.eps)
        o = nn.Dense(self.embed_dim, name="whiten")(o)
        o = o / (jnp.linalg.norm(o, axis=1, keepdims=True) + self.eps)
        B, H, W, C = feat.shape
        return o, (pooled, feat.reshape(B, H * W, C)), {}
