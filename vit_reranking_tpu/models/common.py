"""Shared model building blocks (Flax).

Forward contract for every backbone (reference architectures/cvt.py:735-749,
resnet50.py:35-50, vit.py:45-60, swin.py:43-61):

    model.apply(vars, x, train=...) -> (embedding, (enc_out, token_map), aux)

  * embedding: (B, embed_dim) global embedding (L2-normalized when the arch
    string contains `normalize`)
  * enc_out:   (B, feat_dim) pre-head global feature
  * token_map: spatial/patch features (backbone-specific layout, documented
    per model)
  * aux: dict with optional extras (e.g. pooled attention maps for rollout)

Inputs are NHWC float32 images (ImageNet-normalized); the data layer handles
the NCHW->NHWC transpose so the compute path stays in TPU-native layout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) (reference architectures/cvt.py:53-55)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNormFp32(nn.Module):
    """LayerNorm computed in fp32 regardless of input dtype
    (reference architectures/cvt.py:44-50)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32, name="ln")(
            x.astype(jnp.float32)
        )
        return y.astype(orig)


class Mlp(nn.Module):
    """Two-layer MLP with configurable activation (reference cvt.py:58-79)."""

    hidden_features: int
    out_features: int
    act: Callable = quick_gelu
    dropout: float = 0.0
    dtype: Any = None  # None = promote (f32); pass bf16 for mixed compute

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_features, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.out_features, kernel_init=trunc_normal_init(),
                     dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
