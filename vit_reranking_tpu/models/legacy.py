"""Legacy RevisitDML baseline backbones: DenseNet-169/201, GoogLeNet,
BN-Inception (reference architectures/densenet.py, googlenet.py,
bninception.py) — same ``(embed, (enc_out, feature_map))`` contract.

BN-Inception follows the pretrainedmodels topology (Inception-v1 with
BatchNorm); `double` in the arch string adds max pooling to the global
average pool (bninception.py:31-40)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .common import l2norm


def _bn(train: bool, frozen: bool, name: str):
    return nn.BatchNorm(
        use_running_average=(not train) or frozen, momentum=0.9, epsilon=1e-5, name=name
    )


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        y = _bn(train, self.bn_frozen, "norm1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False, name="conv1")(y)
        y = _bn(train, self.bn_frozen, "norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetNetwork(nn.Module):
    """DenseNet-169 (block config 6/12/32/32, growth 32) or -201 (6/12/48/32)."""

    embed_dim: int = 128
    normalize: bool = True
    block_config: Sequence[int] = (6, 12, 32, 32)
    growth: int = 32
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f = self.bn_frozen
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False, name="conv0")(x)
        x = nn.relu(_bn(train, f, "norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        feats = 64
        for bi, layers in enumerate(self.block_config):
            for li in range(layers):
                x = DenseLayer(self.growth, bn_frozen=f, name=f"block{bi}_layer{li}")(x, train)
            feats += layers * self.growth
            if bi < len(self.block_config) - 1:
                x = nn.relu(_bn(train, f, f"transition{bi}_norm")(x))
                feats //= 2
                x = nn.Conv(feats, (1, 1), use_bias=False, name=f"transition{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = _bn(train, f, "norm5")(x)
        x = nn.relu(x)
        B, H, W, C = x.shape
        enc = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(enc)
        if self.normalize:
            out = l2norm(out)
        return out, (enc, x.reshape(B, H * W, C)), {}


class InceptionBlock(nn.Module):
    """GoogLeNet inception module: 1x1 / 3x3 / 5x5(as 3x3 in BN-Inception) /
    pool branches."""

    c1: int
    c3r: int
    c3: int
    c5r: int
    c5: int
    cp: int
    five_as_three: bool = False  # BN-Inception replaces 5x5 with double 3x3
    bn: bool = True
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        def cbr(y, feats, k, name, stride=1):
            y = nn.Conv(
                feats, (k, k), strides=(stride, stride),
                padding=[(k // 2, k // 2)] * 2, use_bias=not self.bn, name=name,
            )(y)
            if self.bn:
                y = _bn(train, self.bn_frozen, name + "_bn")(y)
            return nn.relu(y)

        b1 = cbr(x, self.c1, 1, "b1")
        b3 = cbr(cbr(x, self.c3r, 1, "b3r"), self.c3, 3, "b3")
        if self.five_as_three:
            b5 = cbr(cbr(cbr(x, self.c5r, 1, "b5r"), self.c5, 3, "b5a"), self.c5, 3, "b5b")
        else:
            b5 = cbr(cbr(x, self.c5r, 1, "b5r"), self.c5, 5, "b5")
        bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        bp = cbr(bp, self.cp, 1, "bp")
        return jnp.concatenate([b1, b3, b5, bp], axis=-1)


_GOOGLENET_CFG = [
    # (c1, c3r, c3, c5r, c5, cp, downsample_after)
    (64, 96, 128, 16, 32, 32, False),
    (128, 128, 192, 32, 96, 64, True),
    (192, 96, 208, 16, 48, 64, False),
    (160, 112, 224, 24, 64, 64, False),
    (128, 128, 256, 24, 64, 64, False),
    (112, 144, 288, 32, 64, 64, False),
    (256, 160, 320, 32, 128, 128, True),
    (256, 160, 320, 32, 128, 128, False),
    (384, 192, 384, 48, 128, 128, False),
]


class GoogLeNetNetwork(nn.Module):
    """GoogLeNet/Inception-v1 with BN (torchvision googlenet topology),
    returning the embedding only like the reference wrapper
    (googlenet.py:22-27) — but extended to the shared 3-tuple contract."""

    embed_dim: int = 128
    normalize: bool = True
    five_as_three: bool = False
    bn_frozen: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f = self.bn_frozen
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False, name="conv1")(x)
        x = nn.relu(_bn(train, f, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        x = nn.Conv(64, (1, 1), use_bias=False, name="conv2")(x)
        x = nn.relu(_bn(train, f, "bn2")(x))
        x = nn.Conv(192, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="conv3")(x)
        x = nn.relu(_bn(train, f, "bn3")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        for i, (c1, c3r, c3, c5r, c5, cp, down) in enumerate(_GOOGLENET_CFG):
            x = InceptionBlock(
                c1, c3r, c3, c5r, c5, cp,
                five_as_three=self.five_as_three, bn_frozen=f, name=f"inception{i}",
            )(x, train)
            if down:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        B, H, W, C = x.shape
        enc = jnp.mean(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(enc)
        if self.normalize:
            out = l2norm(out)
        return out, (enc, x.reshape(B, H * W, C)), {}


class BNInceptionNetwork(GoogLeNetNetwork):
    """BN-Inception (reference bninception.py): Inception-v1 trunk with
    BatchNorm and double-3x3 branches; `double` arch adds max pooling to the
    global pool."""

    double_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, ret_attn: bool = False):
        f = self.bn_frozen
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False, name="conv1")(x)
        x = nn.relu(_bn(train, f, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        x = nn.Conv(192, (3, 3), padding=[(1, 1)] * 2, use_bias=False, name="conv2")(x)
        x = nn.relu(_bn(train, f, "bn2")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        for i, (c1, c3r, c3, c5r, c5, cp, down) in enumerate(_GOOGLENET_CFG):
            x = InceptionBlock(
                c1, c3r, c3, c5r, c5, cp, five_as_three=True, bn_frozen=f,
                name=f"inception{i}",
            )(x, train)
            if down:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1)] * 2)
        B, H, W, C = x.shape
        y = jnp.mean(x, axis=(1, 2))
        if self.double_pool:
            y = y + jnp.max(x, axis=(1, 2))
        out = nn.Dense(self.embed_dim, name="last_linear")(y)
        if self.normalize:
            out = l2norm(out)
        return out, (y, x.reshape(B, H * W, C)), {}
