"""Generate key/shape manifests of the REAL released checkpoints the
reference consumes (VERDICT r4 item 4) into tests/manifests/*.json.

No network access exists in this image, so the manifests are derived from
the strongest available sources, in order of fidelity:

  cvt13            EXACT: the reference's own torch model
                   (architectures/cvt.py::ConvolutionalVisionTransformer)
                   instantiated and state_dict()-dumped — the official
                   CvT-13-224x224-IN-1k.pth loads into it with strict=True
                   (cvt.py:712), so the model's key/shape set IS the file's.
  patchnetvlad     EXACT structure: the reference's patchnetvlad.py model
                   (the Mapillary code itself) instantiated with a faithful
                   torchvision-vgg16 stub; the Pittsburgh WPCA ckpt's
                   ['state_dict'] is saved from this exact module tree
                   (patchnetvlad.py:361-404).
  deit_small       timm deit_small_patch16_224 ['model'] — formulaic
                   (12 blocks, D=384); key naming per the timm VisionTransformer
                   module tree the reference builds (vit.py:20) and loads
                   strict=False into.
  swin_tiny        microsoft swin_tiny_patch4_window7_224 ['model'] —
                   formulaic (2/2/6/2, C=96, window 7) incl. the
                   relative_position_index and shifted-block attn_mask
                   buffers real files carry.
  resnet50         torchvision resnet50-19c8e357.pth — formulaic; this
                   pre-0.4-era file has NO num_batches_tracked keys.
  densenet169/201  torchvision legacy files (densenet169-b2777c0a /
                   densenet201-c1103571) with the DOTTED legacy naming
                   ("norm.1") the reference regex-fixes (densenet.py:10-24).
  googlenet        torchvision googlenet-1378be20.pth (incl. aux branches
                   + num_batches_tracked).
  bninception      pretrainedmodels bn_inception flat caffe naming
                   (conv1_7x7_s2, inception_3a_double_3x3_1, ...); channel
                   table per the BN-Inception spec mirrored by
                   models/legacy.py (no num_batches_tracked — caffe-era
                   conversion).

Run: python scripts/gen_ckpt_manifests.py   (writes tests/manifests/)
"""

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT = os.path.join(REPO, "tests", "manifests")


def put(man, key, *shape, dtype="float32"):
    man[key] = {"shape": list(shape), "dtype": dtype}


def bn(man, prefix, c, tracked=False, affine=True):
    if affine:
        put(man, f"{prefix}.weight", c)
        put(man, f"{prefix}.bias", c)
    put(man, f"{prefix}.running_mean", c)
    put(man, f"{prefix}.running_var", c)
    if tracked:
        put(man, f"{prefix}.num_batches_tracked", dtype="int64")


# ---------------------------------------------------------------------------
# exact dumps via the reference's own torch modules
# ---------------------------------------------------------------------------


def dump_cvt13():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_cvt_parity import _install_timm_stub, _load_ref_module

    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    from functools import partial

    ref_cvt = _load_ref_module("ref_cvt_manifest", "architectures/cvt.py")
    model = ref_cvt.ConvolutionalVisionTransformer(
        in_chans=3, num_classes=1000, act_layer=ref_cvt.QuickGELU,
        norm_layer=partial(ref_cvt.LayerNorm, eps=1e-5), init="trunc_norm",
        spec=ref_cvt.get_cvt_spec(use_attn=True),
    )
    man = {}
    for k, v in model.state_dict().items():
        put(man, k, *tuple(v.shape),
            dtype=str(v.dtype).replace("torch.", ""))
    return man


def dump_patchnetvlad(num_clusters=64, num_pcs=4096):
    """Instantiate the reference patchnetvlad model tree (Mapillary code)
    with a faithful torchvision-vgg16 stub; keys = the Pittsburgh ckpt's."""
    import torch
    import torch.nn as nn

    # --- minimal faithful torchvision stub: vgg16 features naming ---------
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    def vgg16(**kw):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(cin, v, 3, padding=1),
                           nn.ReLU(inplace=True)]
                cin = v
        m = nn.Module()
        m.features = nn.Sequential(*layers)
        return m

    tvm.vgg16 = vgg16
    tv.models = tvm
    if "torchvision.models" in sys.modules:
        # the cvt-parity timm stub registers a torchvision stub already —
        # augment it rather than fight over sys.modules
        sys.modules["torchvision.models"].vgg16 = vgg16
    else:
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    for name in ("sklearn", "sklearn.neighbors", "faiss"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["sklearn.neighbors"].NearestNeighbors = object
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # architectures.netvlad import inside patchnetvlad
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "architectures.netvlad",
        os.path.join(REFERENCE, "architectures/netvlad.py"))
    nv = iu.module_from_spec(spec)
    sys.modules["architectures.netvlad"] = nv
    spec.loader.exec_module(nv)
    spec = iu.spec_from_file_location(
        "ref_patchnetvlad",
        os.path.join(REFERENCE, "architectures/patchnetvlad.py"))
    pnv = iu.module_from_spec(spec)
    sys.modules["ref_patchnetvlad"] = pnv
    spec.loader.exec_module(pnv)

    cfg = types.SimpleNamespace(
        pooling="patchnetvlad", vladv2=False,
        patch_sizes="4", strides="1",
        num_clusters=num_clusters, append_pca_layer=True, num_pcs=num_pcs,
        vlad_ckpt="", embed_dim=num_pcs,
    )
    vgg, vgg_dim = pnv.get_vgg16()
    model = pnv.get_netvlad(vgg, vgg_dim, cfg)
    man = {}
    for k, v in model.state_dict().items():
        put(man, k, *tuple(v.shape),
            dtype=str(v.dtype).replace("torch.", ""))
    return man


# ---------------------------------------------------------------------------
# formulaic manifests (public model cards)
# ---------------------------------------------------------------------------


def gen_deit_small(depth=12, d=384, n_cls=1000):
    man = {}
    put(man, "cls_token", 1, 1, d)
    put(man, "pos_embed", 1, 197, d)
    put(man, "patch_embed.proj.weight", d, 3, 16, 16)
    put(man, "patch_embed.proj.bias", d)
    for i in range(depth):
        b = f"blocks.{i}"
        put(man, f"{b}.norm1.weight", d)
        put(man, f"{b}.norm1.bias", d)
        put(man, f"{b}.attn.qkv.weight", 3 * d, d)
        put(man, f"{b}.attn.qkv.bias", 3 * d)
        put(man, f"{b}.attn.proj.weight", d, d)
        put(man, f"{b}.attn.proj.bias", d)
        put(man, f"{b}.norm2.weight", d)
        put(man, f"{b}.norm2.bias", d)
        put(man, f"{b}.mlp.fc1.weight", 4 * d, d)
        put(man, f"{b}.mlp.fc1.bias", 4 * d)
        put(man, f"{b}.mlp.fc2.weight", d, 4 * d)
        put(man, f"{b}.mlp.fc2.bias", d)
    put(man, "norm.weight", d)
    put(man, "norm.bias", d)
    put(man, "head.weight", n_cls, d)
    put(man, "head.bias", n_cls)
    return man


def gen_swin_tiny(depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), c0=96,
                  window=7, n_cls=1000):
    man = {}
    put(man, "patch_embed.proj.weight", c0, 3, 4, 4)
    put(man, "patch_embed.proj.bias", c0)
    put(man, "patch_embed.norm.weight", c0)
    put(man, "patch_embed.norm.bias", c0)
    res = 56
    for li, (dep, h) in enumerate(zip(depths, heads)):
        c = c0 * (2 ** li)
        for bi in range(dep):
            b = f"layers.{li}.blocks.{bi}"
            put(man, f"{b}.norm1.weight", c)
            put(man, f"{b}.norm1.bias", c)
            put(man, f"{b}.attn.relative_position_bias_table",
                (2 * window - 1) ** 2, h)
            put(man, f"{b}.attn.relative_position_index",
                window * window, window * window, dtype="int64")
            put(man, f"{b}.attn.qkv.weight", 3 * c, c)
            put(man, f"{b}.attn.qkv.bias", 3 * c)
            put(man, f"{b}.attn.proj.weight", c, c)
            put(man, f"{b}.attn.proj.bias", c)
            put(man, f"{b}.norm2.weight", c)
            put(man, f"{b}.norm2.bias", c)
            put(man, f"{b}.mlp.fc1.weight", 4 * c, c)
            put(man, f"{b}.mlp.fc1.bias", 4 * c)
            put(man, f"{b}.mlp.fc2.weight", c, 4 * c)
            put(man, f"{b}.mlp.fc2.bias", c)
            # shifted blocks at resolutions > window carry the mask buffer
            if bi % 2 == 1 and res > window:
                nw = (res // window) ** 2
                put(man, f"{b}.attn_mask", nw, window * window,
                    window * window)
        if li < len(depths) - 1:
            put(man, f"layers.{li}.downsample.reduction.weight", 2 * c, 4 * c)
            put(man, f"layers.{li}.downsample.norm.weight", 4 * c)
            put(man, f"layers.{li}.downsample.norm.bias", 4 * c)
            res //= 2
    put(man, "norm.weight", c0 * 8)
    put(man, "norm.bias", c0 * 8)
    put(man, "head.weight", n_cls, c0 * 8)
    put(man, "head.bias", n_cls)
    return man


def gen_resnet50(n_cls=1000):
    """torchvision resnet50-19c8e357.pth: pre-0.4 file, no
    num_batches_tracked."""
    man = {}
    put(man, "conv1.weight", 64, 3, 7, 7)
    bn(man, "bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for li, nb in enumerate(blocks):
        width = 64 * (2 ** li)
        cout = width * 4
        for b in range(nb):
            p = f"layer{li+1}.{b}"
            put(man, f"{p}.conv1.weight", width, cin if b == 0 else cout, 1, 1)
            bn(man, f"{p}.bn1", width)
            put(man, f"{p}.conv2.weight", width, width, 3, 3)
            bn(man, f"{p}.bn2", width)
            put(man, f"{p}.conv3.weight", cout, width, 1, 1)
            bn(man, f"{p}.bn3", cout)
            if b == 0:
                put(man, f"{p}.downsample.0.weight", cout, cin, 1, 1)
                bn(man, f"{p}.downsample.1", cout)
        cin = cout
    put(man, "fc.weight", n_cls, 2048)
    put(man, "fc.bias", n_cls)
    return man


def gen_densenet(block_config, growth=32, init_c=64, n_cls=1000):
    """Legacy torchvision densenet file: DOTTED layer naming the reference's
    regex rewrites (densenet.py:15-23): features.denseblockX.denselayerY.
    {norm.1,conv.1,norm.2,conv.2}."""
    man = {}
    put(man, "features.conv0.weight", init_c, 3, 7, 7)
    bn(man, "features.norm0", init_c)
    c = init_c
    for bi, n_layers in enumerate(block_config):
        for li in range(n_layers):
            p = f"features.denseblock{bi+1}.denselayer{li+1}"
            cin = c + li * growth
            bn(man, f"{p}.norm.1", cin)
            put(man, f"{p}.conv.1.weight", 4 * growth, cin, 1, 1)
            bn(man, f"{p}.norm.2", 4 * growth)
            put(man, f"{p}.conv.2.weight", growth, 4 * growth, 3, 3)
        c = c + n_layers * growth
        if bi < len(block_config) - 1:
            bn(man, f"features.transition{bi+1}.norm", c)
            put(man, f"features.transition{bi+1}.conv.weight", c // 2, c, 1, 1)
            c = c // 2
    bn(man, "features.norm5", c)
    put(man, "classifier.weight", n_cls, c)
    put(man, "classifier.bias", n_cls)
    return man


# torchvision GoogLeNet inception channel table:
# name: (in, c1x1, c3r, c3, c5r, c5, pool_proj)
_GOOGLENET_INCEPTION = [
    ("inception3a", 192, 64, 96, 128, 16, 32, 32),
    ("inception3b", 256, 128, 128, 192, 32, 96, 64),
    ("inception4a", 480, 192, 96, 208, 16, 48, 64),
    ("inception4b", 512, 160, 112, 224, 24, 64, 64),
    ("inception4c", 512, 128, 128, 256, 24, 64, 64),
    ("inception4d", 512, 112, 144, 288, 32, 64, 64),
    ("inception4e", 528, 256, 160, 320, 32, 128, 128),
    ("inception5a", 832, 256, 160, 320, 32, 128, 128),
    ("inception5b", 832, 384, 192, 384, 48, 128, 128),
]


def gen_googlenet(n_cls=1000):
    man = {}

    def basic(prefix, cin, cout, k):
        put(man, f"{prefix}.conv.weight", cout, cin, k, k)
        bn(man, f"{prefix}.bn", cout, tracked=True)

    basic("conv1", 3, 64, 7)
    basic("conv2", 64, 64, 1)
    basic("conv3", 64, 192, 3)
    for name, cin, c1, c3r, c3, c5r, c5, cp in _GOOGLENET_INCEPTION:
        basic(f"{name}.branch1", cin, c1, 1)
        basic(f"{name}.branch2.0", cin, c3r, 1)
        basic(f"{name}.branch2.1", c3r, c3, 3)
        basic(f"{name}.branch3.0", cin, c5r, 1)
        basic(f"{name}.branch3.1", c5r, c5, 3)
        basic(f"{name}.branch4.1", cin, cp, 1)
    for aux, cin in (("aux1", 512), ("aux2", 528)):
        basic(f"{aux}.conv", cin, 128, 1)
        put(man, f"{aux}.fc1.weight", 1024, 2048)
        put(man, f"{aux}.fc1.bias", 1024)
        put(man, f"{aux}.fc2.weight", n_cls, 1024)
        put(man, f"{aux}.fc2.bias", n_cls)
    put(man, "fc.weight", n_cls, 1024)
    put(man, "fc.bias", n_cls)
    return man


def gen_bninception(n_cls=1000):
    """pretrainedmodels bn_inception flat caffe naming.  Channel table =
    models/legacy.py::_BNINC_CFG (our forward implementation of the public
    BN-Inception spec — keeps manifest and model in lockstep)."""
    from vit_reranking_tpu.models.legacy import _BNINC_CFG

    man = {}

    def cbr(name, cin, cout, k):
        put(man, f"{name}.weight", cout, cin, k, k)
        put(man, f"{name}.bias", cout)
        bn(man, f"{name}_bn", cout)

    cbr("conv1_7x7_s2", 3, 64, 7)
    cbr("conv2_3x3_reduce", 64, 64, 1)
    cbr("conv2_3x3", 64, 192, 3)
    cin = 192
    for name, c1, c3r, c3, d3r, d3, cp, _pool, stride in _BNINC_CFG:
        p = f"inception_{name}"
        if c1:
            cbr(f"{p}_1x1", cin, c1, 1)
        cbr(f"{p}_3x3_reduce", cin, c3r, 1)
        cbr(f"{p}_3x3", c3r, c3, 3)
        cbr(f"{p}_double_3x3_reduce", cin, d3r, 1)
        cbr(f"{p}_double_3x3_1", d3r, d3, 3)
        cbr(f"{p}_double_3x3_2", d3, d3, 3)
        if cp:
            cbr(f"{p}_pool_proj", cin, cp, 1)
        # stride-2 reduction blocks pass the pooled input through unprojected
        cin = c1 + c3 + d3 + (cp if stride == 1 else cin)
    put(man, "last_linear.weight", n_cls, cin)
    put(man, "last_linear.bias", n_cls)
    return man


def main():
    os.makedirs(OUT, exist_ok=True)
    fams = {
        "cvt13": dump_cvt13,
        "patchnetvlad": dump_patchnetvlad,
        "deit_small": gen_deit_small,
        "swin_tiny": gen_swin_tiny,
        "resnet50": gen_resnet50,
        "densenet169": lambda: gen_densenet((6, 12, 32, 32)),
        "densenet201": lambda: gen_densenet((6, 12, 48, 32)),
        "googlenet": gen_googlenet,
        "bninception": gen_bninception,
    }
    for name, fn in fams.items():
        try:
            man = fn()
        except Exception as e:
            print(f"!! {name}: {type(e).__name__}: {e}")
            continue
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(man, f, indent=0, sort_keys=True)
        n_params = sum(
            int(np.prod(v["shape"] or [1])) for v in man.values()
            if v["dtype"].startswith("float")
        )
        print(f"{name}: {len(man)} keys, {n_params/1e6:.1f}M float params "
              f"-> {path}")


if __name__ == "__main__":
    main()
