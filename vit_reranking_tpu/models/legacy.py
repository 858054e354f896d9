"""Legacy RevisitDML baseline backbones: DenseNet-169/201, GoogLeNet,
BN-Inception (reference architectures/densenet.py, googlenet.py,
bninception.py) — same ``(embed, (enc_out, feature_map))`` contract.

Topologies mirror the exact pretrained sources the reference loads, so the
torch->JAX converters (core/convert.py) can map real checkpoints:

  * DenseNet: torchvision densenet169/201 (reference densenet.py:14-43
    loads torchvision models + ImageNet state dicts).
  * GoogLeNet: torchvision googlenet (reference googlenet.py:17) — including
    torchvision's quirks: the "5x5" branch is actually a single 3x3 conv,
    BatchNorm eps=1e-3 inside BasicConv2d, and the pretrained model's
    ``transform_input`` channel rescaling.
  * BN-Inception: the pretrainedmodels ``bninception`` Caffe translation
    (reference bninception.py:13) — flat layer naming
    (``inception_3a_double_3x3_1`` etc.), conv biases kept, avg-pool branch
    in most blocks (max in 5b), and stride-2 reduction blocks 3c/4e without
    the 1x1 branch.  ``double`` in the arch string adds max pooling to the
    global average pool (bninception.py:31-40).

``dtype`` selects the trunk's activation compute dtype (same recipe as
models/resnet.py: bf16 convs/BN with f32 batch statistics and f32 params;
the pooled feature, embedding head, and returned tensors stay f32)."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import l2norm


def _bn(train: bool, frozen: bool, name: str, eps: float = 1e-5,
        dtype=jnp.float32):
    # flax BatchNorm keeps batch statistics in f32 regardless of ``dtype``
    # (_compute_stats upcasts), so bf16 normalization compute is safe
    return nn.BatchNorm(
        use_running_average=(not train) or frozen, momentum=0.9, epsilon=eps,
        dtype=dtype, name=name,
    )


# ---------------------------------------------------------------- DenseNet


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        y = _bn(train, self.bn_frozen, "norm1", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(y)
        y = _bn(train, self.bn_frozen, "norm2", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetNetwork(nn.Module):
    """DenseNet-169 (block config 6/12/32/32, growth 32) or -201 (6/12/48/32)."""

    embed_dim: int = 128
    normalize: bool = True
    block_config: Sequence[int] = (6, 12, 32, 32)
    growth: int = 32
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f, dt = self.bn_frozen, self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=dt, name="conv0")(x)
        x = nn.relu(_bn(train, f, "norm0", dtype=dt)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        feats = 64
        for bi, layers in enumerate(self.block_config):
            for li in range(layers):
                x = DenseLayer(self.growth, bn_frozen=f, dtype=dt,
                               name=f"block{bi}_layer{li}")(x, train)
            feats += layers * self.growth
            if bi < len(self.block_config) - 1:
                x = nn.relu(_bn(train, f, f"transition{bi}_norm", dtype=dt)(x))
                feats //= 2
                x = nn.Conv(feats, (1, 1), use_bias=False, dtype=dt,
                            name=f"transition{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = _bn(train, f, "norm5", dtype=dt)(x)
        x = nn.relu(x).astype(jnp.float32)
        B, H, W, C = x.shape
        enc = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(enc)
        if self.normalize:
            out = l2norm(out)
        return out, (enc, x.reshape(B, H * W, C)), {}


# ---------------------------------------------------------------- GoogLeNet
# torchvision googlenet topology (reference googlenet.py:17 wraps
# torchvision.models.googlenet(pretrained=True))


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: bias-free conv + BatchNorm(eps=1e-3) + relu,
    submodules named conv/bn so converted state dicts map path-for-path."""

    feats: int
    k: int
    stride: int = 1
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.feats, (self.k, self.k), strides=(self.stride, self.stride),
            padding=[(self.k // 2, self.k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = _bn(train, self.bn_frozen, "bn", eps=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class TVInception(nn.Module):
    """torchvision Inception module: 1x1 / 1x1-3x3 / 1x1-3x3 / pool-1x1.
    NB torchvision's "5x5" branch (branch3) is a single 3x3 conv — a known
    deviation from the paper that its pretrained weights bake in."""

    c1: int
    c3r: int
    c3: int
    c5r: int
    c5: int
    cp: int
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        f, dt = self.bn_frozen, self.dtype
        b1 = BasicConv2d(self.c1, 1, bn_frozen=f, dtype=dt, name="branch1")(x, train)
        b2 = BasicConv2d(self.c3r, 1, bn_frozen=f, dtype=dt, name="branch2_0")(x, train)
        b2 = BasicConv2d(self.c3, 3, bn_frozen=f, dtype=dt, name="branch2_1")(b2, train)
        b3 = BasicConv2d(self.c5r, 1, bn_frozen=f, dtype=dt, name="branch3_0")(x, train)
        b3 = BasicConv2d(self.c5, 3, bn_frozen=f, dtype=dt, name="branch3_1")(b3, train)
        bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        bp = BasicConv2d(self.cp, 1, bn_frozen=f, dtype=dt, name="branch4_1")(bp, train)
        return jnp.concatenate([b1, b2, b3, bp], axis=-1)


_GOOGLENET_CFG = [
    # (name, c1, c3r, c3, c5r, c5, cp, downsample_after)
    ("inception3a", 64, 96, 128, 16, 32, 32, False),
    ("inception3b", 128, 128, 192, 32, 96, 64, True),
    ("inception4a", 192, 96, 208, 16, 48, 64, False),
    ("inception4b", 160, 112, 224, 24, 64, 64, False),
    ("inception4c", 128, 128, 256, 24, 64, 64, False),
    ("inception4d", 112, 144, 288, 32, 64, 64, False),
    ("inception4e", 256, 160, 320, 32, 128, 128, True),
    ("inception5a", 256, 160, 320, 32, 128, 128, False),
    ("inception5b", 384, 192, 384, 48, 128, 128, False),
]

# torchvision GoogLeNet.__init__(transform_input=True) channel rescaling
# applied by the pretrained model the reference wraps
_TI_SCALE = (0.229 / 0.5, 0.224 / 0.5, 0.225 / 0.5)
_TI_SHIFT = ((0.485 - 0.5) / 0.5, (0.456 - 0.5) / 0.5, (0.406 - 0.5) / 0.5)


class GoogLeNetNetwork(nn.Module):
    """torchvision GoogLeNet returning the shared 3-tuple contract (the
    reference wrapper googlenet.py:22-27 returns the embedding only)."""

    embed_dim: int = 128
    normalize: bool = True
    bn_frozen: bool = False
    transform_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f, dt = self.bn_frozen, self.dtype
        if self.transform_input:
            x = x * jnp.asarray(_TI_SCALE, x.dtype) + jnp.asarray(_TI_SHIFT, x.dtype)
        x = x.astype(dt)
        x = BasicConv2d(64, 7, stride=2, bn_frozen=f, dtype=dt, name="conv1")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        x = BasicConv2d(64, 1, bn_frozen=f, dtype=dt, name="conv2")(x, train)
        x = BasicConv2d(192, 3, bn_frozen=f, dtype=dt, name="conv3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        for name, c1, c3r, c3, c5r, c5, cp, down in _GOOGLENET_CFG:
            x = TVInception(c1, c3r, c3, c5r, c5, cp, bn_frozen=f, dtype=dt,
                            name=name)(x, train)
            if down:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        x = x.astype(jnp.float32)
        B, H, W, C = x.shape
        enc = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(enc)
        if self.normalize:
            out = l2norm(out)
        return out, (enc, x.reshape(B, H * W, C)), {}


# ------------------------------------------------------------- BN-Inception
# pretrainedmodels bninception topology (Caffe translation of Ioffe &
# Szegedy's BN-Inception); layer names match its flat state-dict keys.


class _CBR(nn.Module):
    """BN-Inception conv (WITH bias, unlike torchvision) + BN + relu.  Each
    instance is named after its pretrainedmodels layer (e.g.
    ``inception_3a_1x1``) with inner modules conv/bn."""

    feats: int
    k: int
    stride: int = 1
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(
            self.feats, (self.k, self.k), strides=(self.stride, self.stride),
            padding=[(self.k // 2, self.k // 2)] * 2, use_bias=True,
            dtype=self.dtype, name="conv",
        )(x)
        x = _bn(train, self.bn_frozen, "bn", dtype=self.dtype)(x)
        return nn.relu(x)


_BNINC_CFG = [
    # (name, c1, c3r, c3, d3r, d3, cp, pool, stride)  — c1/cp == 0 marks the
    # stride-2 reduction blocks (no 1x1 or pool-proj branch, max pool pass)
    ("3a", 64, 64, 64, 64, 96, 32, "avg", 1),
    ("3b", 64, 64, 96, 64, 96, 64, "avg", 1),
    ("3c", 0, 128, 160, 64, 96, 0, "max", 2),
    ("4a", 224, 64, 96, 96, 128, 128, "avg", 1),
    ("4b", 192, 96, 128, 96, 128, 128, "avg", 1),
    ("4c", 160, 128, 160, 128, 160, 96, "avg", 1),
    ("4d", 96, 128, 192, 160, 192, 96, "avg", 1),
    ("4e", 0, 128, 192, 192, 256, 0, "max", 2),
    ("5a", 352, 192, 320, 160, 224, 128, "avg", 1),
    ("5b", 352, 192, 320, 192, 224, 128, "max", 1),
]


class BNInceptionBlock(nn.Module):
    name_tag: str
    c1: int
    c3r: int
    c3: int
    d3r: int
    d3: int
    cp: int
    pool: str = "avg"
    stride: int = 1
    bn_frozen: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        t, f, s = self.name_tag, self.bn_frozen, self.stride
        dt = self.dtype
        pre = f"inception_{t}_"
        outs = []
        if self.c1:
            outs.append(_CBR(self.c1, 1, bn_frozen=f, dtype=dt, name=pre + "1x1")(x, train))
        b3 = _CBR(self.c3r, 1, bn_frozen=f, dtype=dt, name=pre + "3x3_reduce")(x, train)
        outs.append(_CBR(self.c3, 3, stride=s, bn_frozen=f, dtype=dt, name=pre + "3x3")(b3, train))
        bd = _CBR(self.d3r, 1, bn_frozen=f, dtype=dt, name=pre + "double_3x3_reduce")(x, train)
        bd = _CBR(self.d3, 3, bn_frozen=f, dtype=dt, name=pre + "double_3x3_1")(bd, train)
        outs.append(_CBR(self.d3, 3, stride=s, bn_frozen=f, dtype=dt, name=pre + "double_3x3_2")(bd, train))
        if s == 2:
            bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
            outs.append(bp)
        else:
            if self.pool == "avg":
                bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
            else:
                bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
            outs.append(_CBR(self.cp, 1, bn_frozen=f, dtype=dt, name=pre + "pool_proj")(bp, train))
        return jnp.concatenate(outs, axis=-1)


class BNInceptionNetwork(nn.Module):
    """BN-Inception (reference bninception.py): pretrainedmodels topology;
    `double` arch adds max pooling to the global pool (bninception.py:31-40)."""

    embed_dim: int = 128
    normalize: bool = True
    bn_frozen: bool = False
    double_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f, dt = self.bn_frozen, self.dtype
        x = x.astype(dt)
        x = _CBR(64, 7, stride=2, bn_frozen=f, dtype=dt, name="conv1_7x7_s2")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        x = _CBR(64, 1, bn_frozen=f, dtype=dt, name="conv2_3x3_reduce")(x, train)
        x = _CBR(192, 3, bn_frozen=f, dtype=dt, name="conv2_3x3")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        for name, c1, c3r, c3, d3r, d3, cp, pool, stride in _BNINC_CFG:
            x = BNInceptionBlock(
                name, c1, c3r, c3, d3r, d3, cp, pool=pool, stride=stride,
                bn_frozen=f, dtype=dt, name=f"block_{name}",
            )(x, train)
        x = x.astype(jnp.float32)
        B, H, W, C = x.shape
        y = jnp.mean(x, axis=(1, 2))
        if self.double_pool:
            y = y + jnp.max(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(y)
        if self.normalize:
            out = l2norm(out)
        return out, (y, x.reshape(B, H * W, C)), {}
