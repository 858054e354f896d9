"""Converter tests: torch ResNet-50 oracle parity (hand-built bottleneck
stack, no torchvision needed), structural round-trips for ViT/Swin/NetVLAD,
k-means behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from vit_reranking_tpu.core import convert
from vit_reranking_tpu.models.resnet import ResNet50Network
from vit_reranking_tpu.models.vit import ViTNetwork
from vit_reranking_tpu.models.swin import SwinNetwork
from vit_reranking_tpu.models.netvlad import PatchNetVLADNetwork


class TorchBottleneck(nn.Module):
    def __init__(self, cin, feats, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, feats, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(feats)
        self.conv2 = nn.Conv2d(feats, feats, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(feats)
        self.conv3 = nn.Conv2d(feats, feats * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(feats * 4)
        self.relu = nn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, feats * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(feats * 4),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet50Trunk(nn.Module):
    """torchvision-compatible naming for state_dict conversion."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for li, (blocks, feats, stride) in enumerate(
            [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
        ):
            mods = []
            for bi in range(blocks):
                mods.append(TorchBottleneck(cin, feats, stride if bi == 0 else 1, bi == 0))
                cin = feats * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x


def test_resnet50_conversion_parity():
    torch.manual_seed(0)
    tm = TorchResNet50Trunk().eval()
    # randomize BN stats so the test actually exercises them
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()  # (B, 2048, 2, 2)

    model = ResNet50Network(embed_dim=8, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)), train=False
    )
    params, stats = convert.convert_resnet50(tm.state_dict())
    merged_p = convert.merge_params(dict(variables["params"]), params)
    merged_s = convert.merge_params(dict(variables["batch_stats"]), stats)
    _, (enc, tok), _ = model.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    ours = np.asarray(tok).reshape(2, 2, 2, 2048).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def _roundtrip(params_tree, converter, to_torch_keys):
    """Structural check: converter output merges into the init tree with
    exact shape agreement for every mapped leaf."""
    sd = to_torch_keys(params_tree)
    out = converter(sd)
    return out


def test_vit_converter_structural():
    model = ViTNetwork(embed_dim=16, depth=2)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
    p = v["params"]

    # build a timm-style state dict with matching shapes
    rng = np.random.default_rng(0)
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    dim = 384
    sd = {
        "patch_embed.proj.weight": t(dim, 3, 16, 16),
        "patch_embed.proj.bias": t(dim),
        "cls_token": t(1, 1, dim),
        "pos_embed": t(*p["pos_embed"].shape),
        "norm.weight": t(dim), "norm.bias": t(dim),
    }
    for i in range(2):
        sd.update({
            f"blocks.{i}.norm1.weight": t(dim), f"blocks.{i}.norm1.bias": t(dim),
            f"blocks.{i}.norm2.weight": t(dim), f"blocks.{i}.norm2.bias": t(dim),
            f"blocks.{i}.attn.qkv.weight": t(3 * dim, dim),
            f"blocks.{i}.attn.qkv.bias": t(3 * dim),
            f"blocks.{i}.attn.proj.weight": t(dim, dim),
            f"blocks.{i}.attn.proj.bias": t(dim),
            f"blocks.{i}.mlp.fc1.weight": t(4 * dim, dim),
            f"blocks.{i}.mlp.fc1.bias": t(4 * dim),
            f"blocks.{i}.mlp.fc2.weight": t(dim, 4 * dim),
            f"blocks.{i}.mlp.fc2.bias": t(dim),
        })
    conv = convert.convert_vit(sd, depth=2)
    merged = convert.merge_params(dict(p), conv)  # raises on shape mismatch
    # qkv weight transposed correctly
    np.testing.assert_allclose(
        merged["block0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].numpy().T,
    )


def test_netvlad_converter_structural():
    model = PatchNetVLADNetwork(num_clusters=4, num_pcs=32, patch_sizes=(2,), strides=(1,))
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(0)
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    vgg_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256), (256, 256),
             (256, 512), (512, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    sd = {}
    for ti, (ci, co) in zip(vgg_ids, chans):
        sd[f"encoder.{ti}.weight"] = t(co, ci, 3, 3)
        sd[f"encoder.{ti}.bias"] = t(co)
    sd["pool.centroids"] = t(4, 512)
    sd["pool.conv.weight"] = t(4, 512, 1, 1)
    sd["WPCA.0.weight"] = t(32, 4 * 512, 1, 1)
    sd["WPCA.0.bias"] = t(32)
    conv = convert.convert_patchnetvlad(sd)
    merged = convert.merge_params(dict(v["params"]), conv)
    assert merged["pool"]["core"]["centroids"].shape == (4, 512)


def test_kmeans():
    from vit_reranking_tpu.ops.kmeans import get_clusters, kmeans

    rng = np.random.default_rng(0)
    protos = rng.standard_normal((4, 8)) * 5
    x = (protos[np.repeat(np.arange(4), 50)] + rng.standard_normal((200, 8))).astype(np.float32)
    cents, assign = kmeans(jnp.asarray(x), 4, jax.random.PRNGKey(0), iters=30)
    # every true cluster recovered: each proto has a centroid within 1.0
    d = np.linalg.norm(protos[:, None] - np.asarray(cents)[None], axis=-1)
    assert (d.min(axis=1) < 1.0).all()
    c2 = get_clusters(x, 4)
    assert c2.shape == (4, 8)
