"""Legacy-backbone converter oracles: hand-built torch models with
torchvision/pretrainedmodels-compatible state-dict naming (no torchvision /
pretrainedmodels in this image), activation-parity vs the Flax models through
the converters (VERDICT r2 item 4; reference architectures/densenet.py:14-56,
googlenet.py:10-27, bninception.py:11-48)."""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from vit_reranking_tpu.core import convert
from vit_reranking_tpu.models.legacy import (
    BNInceptionNetwork,
    DenseNetNetwork,
    GoogLeNetNetwork,
)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.uniform_(-0.5, 0.5)
            mod.running_var.uniform_(0.5, 1.5)


def _apply_converted(model, variables, params, stats, x_nchw):
    merged_p = convert.merge_params(dict(variables["params"]), params)
    merged_s = convert.merge_params(dict(variables["batch_stats"]), stats)
    return model.apply(
        {"params": merged_p, "batch_stats": merged_s},
        jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), train=False,
    )


# ---------------------------------------------------------------- DenseNet


class TorchDenseLayer(nn.Module):
    def __init__(self, cin, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(F.relu(self.norm1(x)))
        y = self.conv2(F.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class TorchDenseNet(nn.Module):
    """torchvision densenet naming (features.denseblockN.denselayerM...)."""

    def __init__(self, block_config=(2, 3), growth=8, embed_dim=8):
        super().__init__()
        feats = OrderedDict()
        feats["conv0"] = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        feats["norm0"] = nn.BatchNorm2d(64)
        cin = 64
        for bi, layers in enumerate(block_config):
            block = nn.Module()
            for li in range(layers):
                block.add_module(f"denselayer{li + 1}", TorchDenseLayer(cin, growth))
                cin += growth
            feats[f"denseblock{bi + 1}"] = block
            if bi < len(block_config) - 1:
                tr = nn.Module()
                tr.add_module("norm", nn.BatchNorm2d(cin))
                cin //= 2
                tr.add_module("conv", nn.Conv2d(cin * 2, cin, 1, bias=False))
                feats[f"transition{bi + 1}"] = tr
        feats["norm5"] = nn.BatchNorm2d(cin)
        self.features = nn.Module()
        for k, v in feats.items():
            self.features.add_module(k, v)
        self.block_config = block_config
        self.last_linear = nn.Linear(cin, embed_dim)

    def forward(self, x):
        f = self.features
        x = F.max_pool2d(F.relu(f.norm0(f.conv0(x))), 3, stride=2, padding=1)
        for bi, layers in enumerate(self.block_config):
            block = getattr(f, f"denseblock{bi + 1}")
            for li in range(layers):
                x = getattr(block, f"denselayer{li + 1}")(x)
            if bi < len(self.block_config) - 1:
                tr = getattr(f, f"transition{bi + 1}")
                x = F.avg_pool2d(tr.conv(F.relu(tr.norm(x))), 2, stride=2)
        x = F.relu(f.norm5(x))
        feat = x
        x = x.mean((2, 3))
        return self.last_linear(x), feat


def test_densenet_conversion_parity():
    torch.manual_seed(0)
    cfg, growth = (2, 3), 8
    tm = TorchDenseNet(block_config=cfg, growth=growth).eval()
    _randomize_bn(tm)
    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_e, ref_f = tm(torch.tensor(x))

    model = DenseNetNetwork(
        embed_dim=8, normalize=False, block_config=cfg, growth=growth
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)), train=False
    )
    params, stats = convert.convert_densenet(tm.state_dict(), block_config=cfg)
    out, (enc, tok), _ = _apply_converted(model, variables, params, stats, x)
    B, C, H, W = ref_f.shape
    ours_f = np.asarray(tok).reshape(B, H, W, C).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_f, ref_f.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out), ref_e.numpy(), rtol=1e-3, atol=1e-3)


def test_densenet_converter_accepts_legacy_dotted_keys():
    """The raw torchvision ImageNet .pth uses 'norm.1.weight' style keys the
    reference renames at load (densenet.py:10-25) — converter handles both."""
    tm = TorchDenseNet(block_config=(2, 3), growth=8)
    sd = {}
    for k, v in tm.state_dict().items():
        import re

        k2 = re.sub(r"denselayer(\d+)\.(norm|conv)([12])\.", r"denselayer\1.\2.\3.", k)
        sd[k2] = v
    p_mod, s_mod = convert.convert_densenet(tm.state_dict(), block_config=(2, 3))
    p_old, s_old = convert.convert_densenet(sd, block_config=(2, 3))
    for a, b in zip(jax.tree.leaves(p_mod), jax.tree.leaves(p_old)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(s_mod), jax.tree.leaves(s_old)):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------- GoogLeNet


class TorchBasicConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchTVInception(nn.Module):
    """torchvision Inception: branch3 is a single 3x3 despite the 5x5 name."""

    def __init__(self, cin, c1, c3r, c3, c5r, c5, cp):
        super().__init__()
        self.branch1 = TorchBasicConv2d(cin, c1, 1)
        self.branch2 = nn.Sequential(
            TorchBasicConv2d(cin, c3r, 1), TorchBasicConv2d(c3r, c3, 3)
        )
        self.branch3 = nn.Sequential(
            TorchBasicConv2d(cin, c5r, 1), TorchBasicConv2d(c5r, c5, 3)
        )
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            TorchBasicConv2d(cin, cp, 1),
        )

    def forward(self, x):
        return torch.cat(
            [self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)], 1
        )


_G_CFG = [
    ("inception3a", 192, 64, 96, 128, 16, 32, 32, False),
    ("inception3b", 256, 128, 128, 192, 32, 96, 64, True),
    ("inception4a", 480, 192, 96, 208, 16, 48, 64, False),
    ("inception4b", 512, 160, 112, 224, 24, 64, 64, False),
    ("inception4c", 512, 128, 128, 256, 24, 64, 64, False),
    ("inception4d", 512, 112, 144, 288, 32, 64, 64, False),
    ("inception4e", 528, 256, 160, 320, 32, 128, 128, True),
    ("inception5a", 832, 256, 160, 320, 32, 128, 128, False),
    ("inception5b", 832, 384, 192, 384, 48, 128, 128, False),
]


class TorchGoogLeNet(nn.Module):
    """torchvision googlenet naming incl. transform_input (the pretrained
    model the reference wraps, googlenet.py:17)."""

    def __init__(self, embed_dim=8):
        super().__init__()
        self.conv1 = TorchBasicConv2d(3, 64, 7, stride=2)
        self.conv2 = TorchBasicConv2d(64, 64, 1)
        self.conv3 = TorchBasicConv2d(64, 192, 3)
        for name, cin, c1, c3r, c3, c5r, c5, cp, _ in _G_CFG:
            setattr(self, name, TorchTVInception(cin, c1, c3r, c3, c5r, c5, cp))
        self.fc = nn.Linear(1024, embed_dim)

    def forward(self, x):
        x_ch0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
        x_ch1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
        x_ch2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        x = torch.cat([x_ch0, x_ch1, x_ch2], 1)
        x = F.max_pool2d(self.conv1(x), 3, stride=2, ceil_mode=True)
        x = F.max_pool2d(self.conv3(self.conv2(x)), 3, stride=2, ceil_mode=True)
        for name, *_, down in _G_CFG:
            x = getattr(self, name)(x)
            if down:
                x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)
        feat = x
        return self.fc(x.mean((2, 3))), feat


def test_googlenet_conversion_parity():
    torch.manual_seed(1)
    tm = TorchGoogLeNet().eval()
    _randomize_bn(tm)
    x = np.random.default_rng(1).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_e, ref_f = tm(torch.tensor(x))

    model = GoogLeNetNetwork(embed_dim=8, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)), train=False
    )
    params, stats = convert.convert_googlenet(tm.state_dict())
    out, (enc, tok), _ = _apply_converted(model, variables, params, stats, x)
    B, C, H, W = ref_f.shape
    ours_f = np.asarray(tok).reshape(B, H, W, C).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_f, ref_f.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out), ref_e.numpy(), rtol=1e-3, atol=1e-3)


# ------------------------------------------------------------- BN-Inception


class TorchCBR(nn.Module):
    """pretrainedmodels BN-Inception unit: conv WITH bias + BN + relu."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2, bias=True)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


_B_CFG = [
    # (tag, cin, c1, c3r, c3, d3r, d3, cp, pool, stride)
    ("3a", 192, 64, 64, 64, 64, 96, 32, "avg", 1),
    ("3b", 256, 64, 64, 96, 64, 96, 64, "avg", 1),
    ("3c", 320, 0, 128, 160, 64, 96, 0, "max", 2),
    ("4a", 576, 224, 64, 96, 96, 128, 128, "avg", 1),
    ("4b", 576, 192, 96, 128, 96, 128, 128, "avg", 1),
    ("4c", 576, 160, 128, 160, 128, 160, 96, "avg", 1),
    ("4d", 576, 96, 128, 192, 160, 192, 96, "avg", 1),
    ("4e", 576, 0, 128, 192, 192, 256, 0, "max", 2),
    ("5a", 1024, 352, 192, 320, 160, 224, 128, "avg", 1),
    ("5b", 1024, 352, 192, 320, 192, 224, 128, "max", 1),
]


class TorchBNInception(nn.Module):
    """pretrainedmodels bninception flat naming (inception_3a_double_3x3_1)."""

    def __init__(self, embed_dim=8):
        super().__init__()
        add = lambda n, m: self.add_module(n, m)
        add("conv1_7x7_s2", nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=True))
        add("conv1_7x7_s2_bn", nn.BatchNorm2d(64))
        add("conv2_3x3_reduce", nn.Conv2d(64, 64, 1, bias=True))
        add("conv2_3x3_reduce_bn", nn.BatchNorm2d(64))
        add("conv2_3x3", nn.Conv2d(64, 192, 3, padding=1, bias=True))
        add("conv2_3x3_bn", nn.BatchNorm2d(192))
        for tag, cin, c1, c3r, c3, d3r, d3, cp, _, stride in _B_CFG:
            pre = f"inception_{tag}_"

            def cb(name, ci, co, k, s=1):
                add(name, nn.Conv2d(ci, co, k, stride=s, padding=k // 2, bias=True))
                add(name + "_bn", nn.BatchNorm2d(co))

            if c1:
                cb(pre + "1x1", cin, c1, 1)
            cb(pre + "3x3_reduce", cin, c3r, 1)
            cb(pre + "3x3", c3r, c3, 3, stride)
            cb(pre + "double_3x3_reduce", cin, d3r, 1)
            cb(pre + "double_3x3_1", d3r, d3, 3)
            cb(pre + "double_3x3_2", d3, d3, 3, stride)
            if cp:
                cb(pre + "pool_proj", cin, cp, 1)
        add("last_linear", nn.Linear(1024, embed_dim))

    def _cbr(self, name, x):
        return F.relu(getattr(self, name + "_bn")(getattr(self, name)(x)))

    def forward(self, x):
        x = self._cbr("conv1_7x7_s2", x)
        x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)
        x = self._cbr("conv2_3x3_reduce", x)
        x = self._cbr("conv2_3x3", x)
        x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)
        for tag, cin, c1, c3r, c3, d3r, d3, cp, pool, stride in _B_CFG:
            pre = f"inception_{tag}_"
            outs = []
            if c1:
                outs.append(self._cbr(pre + "1x1", x))
            b = self._cbr(pre + "3x3_reduce", x)
            outs.append(self._cbr(pre + "3x3", b))
            b = self._cbr(pre + "double_3x3_reduce", x)
            b = self._cbr(pre + "double_3x3_1", b)
            outs.append(self._cbr(pre + "double_3x3_2", b))
            if stride == 2:
                outs.append(F.max_pool2d(x, 3, stride=2, ceil_mode=True))
            else:
                if pool == "avg":
                    bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=True)
                else:
                    bp = F.max_pool2d(x, 3, stride=1, padding=1)
                outs.append(self._cbr(pre + "pool_proj", bp))
            x = torch.cat(outs, 1)
        feat = x
        y = x.mean((2, 3)) + x.amax((2, 3))  # 'double' pooling variant
        return self.last_linear(y), feat


def test_bninception_conversion_parity():
    torch.manual_seed(2)
    tm = TorchBNInception().eval()
    _randomize_bn(tm)
    x = np.random.default_rng(2).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_e, ref_f = tm(torch.tensor(x))

    model = BNInceptionNetwork(embed_dim=8, normalize=False, double_pool=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 64, 64, 3)), train=False
    )
    params, stats = convert.convert_bninception(tm.state_dict())
    out, (enc, tok), _ = _apply_converted(model, variables, params, stats, x)
    B, C, H, W = ref_f.shape
    ours_f = np.asarray(tok).reshape(B, H, W, C).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_f, ref_f.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out), ref_e.numpy(), rtol=1e-3, atol=1e-3)


def test_legacy_converters_cover_all_params():
    """Every converted leaf lands on an existing init-tree leaf with the same
    shape (merge_params would otherwise grow the tree silently)."""
    for tm, model, conv_fn in [
        (
            TorchDenseNet(block_config=(2, 3), growth=8),
            DenseNetNetwork(embed_dim=8, normalize=False, block_config=(2, 3), growth=8),
            lambda sd: convert.convert_densenet(sd, block_config=(2, 3)),
        ),
        (TorchGoogLeNet(), GoogLeNetNetwork(embed_dim=8, normalize=False),
         convert.convert_googlenet),
        (TorchBNInception(), BNInceptionNetwork(embed_dim=8, normalize=False),
         convert.convert_bninception),
    ]:
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
        )
        params, stats = conv_fn(tm.state_dict())

        def check(sub, base, where):
            for k, v in sub.items():
                assert k in base, (where, k)
                if isinstance(v, dict):
                    check(v, base[k], where + (k,))
                else:
                    assert np.shape(v) == np.shape(base[k]), (where, k)

        check(params, variables["params"], (type(tm).__name__, "params"))
        check(stats, variables["batch_stats"], (type(tm).__name__, "stats"))
