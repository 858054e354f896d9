"""Torch -> JAX/Flax weight converters.

Required to hit Recall parity with pretrained backbones (SURVEY.md section 5
"checkpoint/resume"): the reference consumes ImageNet/DeiT/Swin/NetVLAD torch
checkpoints (reference architectures/cvt.py:695-722, vit.py:31-40,
swin.py:23-37, patchnetvlad.py:370-374).  These functions translate a torch
``state_dict`` (loaded with ``torch.load(..., map_location='cpu')`` — torch is
an optional host-side dependency used only here) into the Flax param /
batch_stats pytrees of the models in ``vit_reranking_tpu.models``.

Layout rules:
  torch Conv2d weight  (O, I, kh, kw)  -> flax Conv kernel (kh, kw, I, O)
  torch depthwise conv (C, 1, kh, kw)  -> flax kernel (kh, kw, 1, C)
  torch Linear weight  (O, I)          -> flax Dense kernel (I, O)
  torch LayerNorm weight/bias          -> flax scale/bias
  torch BatchNorm weight/bias/running_mean/running_var
       -> params scale/bias + batch_stats mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor -> numpy (works for plain numpy too)."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


class TrackedStateDict(dict):
    """A state_dict that records which ORIGINAL checkpoint keys a converter
    actually reads — the audit substrate for first contact with a real
    released ``.pth`` (VERDICT r3 item 4).

    Reads via ``[]``/``get`` mark the key consumed; plain iteration
    (``items``/``keys``/``in``) does not.  ``strip_prefix`` threads the
    tracking through key renames, and the ``sd[new] = sd.pop(old)`` rename
    idiom (convert_densenet's legacy-key normalization) transfers the origin
    to the new key instead of marking the old one consumed."""

    def __init__(self, data=(), consumed=None, origin=None):
        super().__init__(data)
        self.consumed = set() if consumed is None else consumed
        self._origin = {k: k for k in self} if origin is None else origin
        self._pending_origin = None

    def _mark(self, k):
        self.consumed.add(self._origin.get(k, k))

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self._mark(k)
        return v

    def get(self, k, default=None):
        if super().__contains__(k):
            return self[k]
        return default

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        if self._pending_origin is not None:
            self._origin[k] = self._pending_origin
            self._pending_origin = None
        else:
            self._origin.setdefault(k, k)

    def pop(self, k, *default):
        if super().__contains__(k):
            v = super().pop(k)
            # rename idiom: the value survives under a new key, so the origin
            # transfers instead of counting as a read
            self._pending_origin = self._origin.pop(k, k)
            return v
        if default:
            return default[0]
        raise KeyError(k)

    def unconsumed(self):
        """Original-key names never read by the converter."""
        live = {self._origin.get(k, k) for k in self}
        return sorted(live - self.consumed)


def _conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _dense_kernel(w) -> np.ndarray:
    return _np(w).T


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def strip_prefix(state_dict: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Drop a leading prefix (e.g. 'model.' or 'module.') from every key.

    Mirrors the reference's module-prefix stripping (utilities/misc.py:58-62).
    A :class:`TrackedStateDict` input stays tracked: the stripped copy shares
    the consumed set and maps each new key back to its original name.
    """
    if isinstance(state_dict, TrackedStateDict):
        items, origin = {}, {}
        for k in state_dict:  # plain iteration: no consumption marking
            nk = k[len(prefix):] if k.startswith(prefix) else k
            items[nk] = dict.__getitem__(state_dict, k)
            origin[nk] = state_dict._origin.get(k, k)
        return TrackedStateDict(items, consumed=state_dict.consumed, origin=origin)
    out = {}
    for k, v in state_dict.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def convert_cvt(
    state_dict: Mapping[str, Any],
    num_stages: int = 3,
    depths=(1, 2, 10),
    include_head: bool = True,
) -> Tuple[Dict, Dict]:
    """Official CvT-13 checkpoint -> (params, batch_stats) for
    models.cvt.ConvolutionalVisionTransformer nested under a wrapper.

    Keys follow the reference naming (architectures/cvt.py:556-606): e.g.
    ``stage2.blocks.9.attn.conv_proj_q.conv.weight``.  Returns the pytrees for
    the ``trunk`` scope plus top-level ``norm``/``head`` if present.
    """
    sd = strip_prefix(state_dict, "model.")
    params: Dict = {}
    stats: Dict = {}

    for i in range(num_stages):
        sp = f"stage{i}"
        _set(params, ("trunk", sp, "patch_embed_proj", "kernel"), _conv_kernel(sd[f"{sp}.patch_embed.proj.weight"]))
        _set(params, ("trunk", sp, "patch_embed_proj", "bias"), _np(sd[f"{sp}.patch_embed.proj.bias"]))
        _set(params, ("trunk", sp, "patch_embed_norm", "ln", "scale"), _np(sd[f"{sp}.patch_embed.norm.weight"]))
        _set(params, ("trunk", sp, "patch_embed_norm", "ln", "bias"), _np(sd[f"{sp}.patch_embed.norm.bias"]))
        if f"{sp}.cls_token" in sd:
            _set(params, ("trunk", sp, "cls_token"), _np(sd[f"{sp}.cls_token"]))

        for j in range(depths[i]):
            bp = f"{sp}.blocks.{j}"
            fp = ("trunk", sp, f"block{j}")
            for ln in ("norm1", "norm2"):
                _set(params, fp + (ln, "ln", "scale"), _np(sd[f"{bp}.{ln}.weight"]))
                _set(params, fp + (ln, "ln", "bias"), _np(sd[f"{bp}.{ln}.bias"]))
            for proj in ("conv_proj_q", "conv_proj_k", "conv_proj_v"):
                _set(params, fp + ("attn", proj, "conv", "kernel"), _conv_kernel(sd[f"{bp}.attn.{proj}.conv.weight"]))
                _set(params, fp + ("attn", proj, "bn", "scale"), _np(sd[f"{bp}.attn.{proj}.bn.weight"]))
                _set(params, fp + ("attn", proj, "bn", "bias"), _np(sd[f"{bp}.attn.{proj}.bn.bias"]))
                _set(stats, fp + ("attn", proj, "bn", "mean"), _np(sd[f"{bp}.attn.{proj}.bn.running_mean"]))
                _set(stats, fp + ("attn", proj, "bn", "var"), _np(sd[f"{bp}.attn.{proj}.bn.running_var"]))
            for lin in ("proj_q", "proj_k", "proj_v", "proj"):
                _set(params, fp + ("attn", lin, "kernel"), _dense_kernel(sd[f"{bp}.attn.{lin}.weight"]))
                if f"{bp}.attn.{lin}.bias" in sd:
                    _set(params, fp + ("attn", lin, "bias"), _np(sd[f"{bp}.attn.{lin}.bias"]))
            for fc in ("fc1", "fc2"):
                _set(params, fp + ("mlp", fc, "kernel"), _dense_kernel(sd[f"{bp}.mlp.{fc}.weight"]))
                _set(params, fp + ("mlp", fc, "bias"), _np(sd[f"{bp}.mlp.{fc}.bias"]))

    if "norm.weight" in sd:
        _set(params, ("norm", "ln", "scale"), _np(sd["norm.weight"]))
        _set(params, ("norm", "ln", "bias"), _np(sd["norm.bias"]))
    if include_head and "head.weight" in sd:
        _set(params, ("head", "kernel"), _dense_kernel(sd["head.weight"]))
        _set(params, ("head", "bias"), _np(sd["head.bias"]))
    if "last_linear.weight" in sd:
        # DIML 1x1-conv head -> Dense over channels (O, I, 1, 1) -> (I, O)
        w = _np(sd["last_linear.weight"])
        _set(params, ("last_linear", "kernel"), w[:, :, 0, 0].T)
        _set(params, ("last_linear", "bias"), _np(sd["last_linear.bias"]))
    return params, stats


def zoom_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """Resize a (1, 1 + g_old^2, C) position embedding to a new grid size:
    cls slot kept, grid part spline-zoomed order=1 — the reference's rule
    (architectures/cvt.py:574-603, scipy.ndimage.zoom)."""
    import scipy.ndimage

    pos = np.asarray(pos)
    tok, grid = pos[:, :1], pos[0, 1:]
    gs_old = int(np.sqrt(len(grid)))
    if gs_old == new_grid:
        return pos
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = scipy.ndimage.zoom(grid, (new_grid / gs_old, new_grid / gs_old, 1), order=1)
    return np.concatenate([tok, grid.reshape(1, new_grid**2, -1)], axis=1)


def convert_vit(
    state_dict: Mapping[str, Any], depth: int = 12, target_grid: Optional[int] = None
) -> Dict:
    """timm DeiT/ViT checkpoint -> params for models.vit.ViTNetwork.

    Key mapping (reference architectures/vit.py:31-40 consumes the timm
    layout): patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,fc2}, norm.  ``target_grid`` zooms the position
    embedding to a different token grid (reference cvt.py:574-603 rule)."""
    sd = strip_prefix(state_dict, "module.")
    p: Dict = {}
    _set(p, ("patch_embed_proj", "kernel"), _conv_kernel(sd["patch_embed.proj.weight"]))
    _set(p, ("patch_embed_proj", "bias"), _np(sd["patch_embed.proj.bias"]))
    _set(p, ("cls_token",), _np(sd["cls_token"]))
    pos = _np(sd["pos_embed"])
    if target_grid is not None:
        pos = zoom_pos_embed(pos, target_grid)
    _set(p, ("pos_embed",), pos)
    for i in range(depth):
        bp = f"blocks.{i}"
        fp = (f"block{i}",)
        for ln in ("norm1", "norm2"):
            _set(p, fp + (ln, "scale"), _np(sd[f"{bp}.{ln}.weight"]))
            _set(p, fp + (ln, "bias"), _np(sd[f"{bp}.{ln}.bias"]))
        _set(p, fp + ("attn", "qkv", "kernel"), _dense_kernel(sd[f"{bp}.attn.qkv.weight"]))
        _set(p, fp + ("attn", "qkv", "bias"), _np(sd[f"{bp}.attn.qkv.bias"]))
        _set(p, fp + ("attn", "proj", "kernel"), _dense_kernel(sd[f"{bp}.attn.proj.weight"]))
        _set(p, fp + ("attn", "proj", "bias"), _np(sd[f"{bp}.attn.proj.bias"]))
        for fc in ("fc1", "fc2"):
            _set(p, fp + ("mlp", fc, "kernel"), _dense_kernel(sd[f"{bp}.mlp.{fc}.weight"]))
            _set(p, fp + ("mlp", fc, "bias"), _np(sd[f"{bp}.mlp.{fc}.bias"]))
    _set(p, ("norm", "scale"), _np(sd["norm.weight"]))
    _set(p, ("norm", "bias"), _np(sd["norm.bias"]))
    return p


def convert_resnet50(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision/pretrainedmodels ResNet-50 -> (params, batch_stats) for
    models.resnet.ResNet50Trunk (scope 'trunk')."""
    sd = strip_prefix(state_dict, "module.")
    sd = strip_prefix(sd, "model.")
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst):
        _set(params, dst + ("scale",), _np(sd[f"{src}.weight"]))
        _set(params, dst + ("bias",), _np(sd[f"{src}.bias"]))
        _set(stats, dst + ("mean",), _np(sd[f"{src}.running_mean"]))
        _set(stats, dst + ("var",), _np(sd[f"{src}.running_var"]))

    _set(params, ("trunk", "conv1", "kernel"), _conv_kernel(sd["conv1.weight"]))
    bn("bn1", ("trunk", "bn1"))
    for li, blocks in enumerate([3, 4, 6, 3]):
        for bi in range(blocks):
            src = f"layer{li + 1}.{bi}"
            dst = ("trunk", f"layer{li + 1}_{bi}")
            for ci in (1, 2, 3):
                _set(params, dst + (f"conv{ci}", "kernel"), _conv_kernel(sd[f"{src}.conv{ci}.weight"]))
                bn(f"{src}.bn{ci}", dst + (f"bn{ci}",))
            if f"{src}.downsample.0.weight" in sd:
                _set(params, dst + ("downsample_conv", "kernel"), _conv_kernel(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", dst + ("downsample_bn",))
    return params, stats


def convert_swin(state_dict: Mapping[str, Any], depths=(2, 2, 6, 2)) -> Dict:
    """timm/microsoft swin_tiny checkpoint -> params for models.swin.SwinNetwork."""
    sd = strip_prefix(state_dict, "module.")
    p: Dict = {}
    _set(p, ("patch_embed_proj", "kernel"), _conv_kernel(sd["patch_embed.proj.weight"]))
    _set(p, ("patch_embed_proj", "bias"), _np(sd["patch_embed.proj.bias"]))
    _set(p, ("patch_embed_norm", "scale"), _np(sd["patch_embed.norm.weight"]))
    _set(p, ("patch_embed_norm", "bias"), _np(sd["patch_embed.norm.bias"]))
    for li, depth in enumerate(depths):
        for bi in range(depth):
            src = f"layers.{li}.blocks.{bi}"
            dst = (f"layer{li}_block{bi}",)
            for ln in ("norm1", "norm2"):
                _set(p, dst + (ln, "scale"), _np(sd[f"{src}.{ln}.weight"]))
                _set(p, dst + (ln, "bias"), _np(sd[f"{src}.{ln}.bias"]))
            _set(p, dst + ("attn", "relative_position_bias_table"),
                 _np(sd[f"{src}.attn.relative_position_bias_table"]))
            _set(p, dst + ("attn", "qkv", "kernel"), _dense_kernel(sd[f"{src}.attn.qkv.weight"]))
            _set(p, dst + ("attn", "qkv", "bias"), _np(sd[f"{src}.attn.qkv.bias"]))
            _set(p, dst + ("attn", "proj", "kernel"), _dense_kernel(sd[f"{src}.attn.proj.weight"]))
            _set(p, dst + ("attn", "proj", "bias"), _np(sd[f"{src}.attn.proj.bias"]))
            for fc in ("fc1", "fc2"):
                _set(p, dst + ("mlp", fc, "kernel"), _dense_kernel(sd[f"{src}.mlp.{fc}.weight"]))
                _set(p, dst + ("mlp", fc, "bias"), _np(sd[f"{src}.mlp.{fc}.bias"]))
        if li < len(depths) - 1:
            src = f"layers.{li}.downsample"
            dst = (f"layer{li}_downsample",)
            _set(p, dst + ("norm", "scale"), _np(sd[f"{src}.norm.weight"]))
            _set(p, dst + ("norm", "bias"), _np(sd[f"{src}.norm.bias"]))
            _set(p, dst + ("reduction", "kernel"), _dense_kernel(sd[f"{src}.reduction.weight"]))
    _set(p, ("norm", "scale"), _np(sd["norm.weight"]))
    _set(p, ("norm", "bias"), _np(sd["norm.bias"]))
    return p


def convert_patchnetvlad(state_dict: Mapping[str, Any]) -> Dict:
    """Patch-NetVLAD checkpoint (e.g. pittsburgh_WPCA4096.pth.tar
    'state_dict') -> params for models.netvlad.PatchNetVLADNetwork.

    Layout (reference patchnetvlad.py:106-135): encoder.N.{weight,bias} for
    VGG conv layers, pool.conv/centroids, WPCA.0.{weight,bias} (1x1 conv)."""
    sd = strip_prefix(state_dict, "module.")
    p: Dict = {}
    conv_i = 0
    # torchvision VGG16 features conv indices (through conv5_3, pools removed)
    vgg_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for ti in vgg_ids:
        k = f"encoder.{ti}.weight"
        if k not in sd:
            continue
        _set(p, ("encoder", f"conv{conv_i}", "kernel"), _conv_kernel(sd[k]))
        _set(p, ("encoder", f"conv{conv_i}", "bias"), _np(sd[f"encoder.{ti}.bias"]))
        conv_i += 1
    if "pool.centroids" in sd:
        scope = ("pool", "core") if "pool.conv.weight" in sd else ("pool",)
        # PatchNetVLAD nests NetVLAD under 'core'; plain NetVLAD is flat
        _set(p, scope + ("centroids",), _np(sd["pool.centroids"]))
        w = _np(sd["pool.conv.weight"])  # (K, D, 1, 1)
        _set(p, scope + ("conv", "kernel"), w[:, :, 0, 0].T)
        if "pool.conv.bias" in sd:
            _set(p, scope + ("conv", "bias"), _np(sd["pool.conv.bias"]))
    if "WPCA.0.weight" in sd:
        w = _np(sd["WPCA.0.weight"])  # (num_pcs, D, 1, 1)
        _set(p, ("WPCA", "kernel"), w[:, :, 0, 0].T)
        _set(p, ("WPCA", "bias"), _np(sd["WPCA.0.bias"]))
    return p


def convert_densenet(
    state_dict: Mapping[str, Any], block_config=(6, 12, 32, 32)
) -> Tuple[Dict, Dict]:
    """torchvision densenet169/201 -> (params, batch_stats) for
    models.legacy.DenseNetNetwork (reference architectures/densenet.py:14-43;
    block_config (6,12,48,32) for -201).

    Accepts both modern keys (``denselayer1.norm1.weight``) and the legacy
    dotted keys (``norm.1.weight``) the reference renames at load time
    (densenet.py:10-25)."""
    import re

    sd = strip_prefix(state_dict, "module.")
    sd = strip_prefix(sd, "model.")
    pat = re.compile(
        r"^(.*denselayer\d+\.(?:norm|relu|conv))\."
        r"((?:[12])\.(?:weight|bias|running_mean|running_var))$"
    )
    for k in list(sd):
        m = pat.match(k)
        if m:
            sd[m.group(1) + m.group(2)] = sd.pop(k)
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst):
        _set(params, dst + ("scale",), _np(sd[f"{src}.weight"]))
        _set(params, dst + ("bias",), _np(sd[f"{src}.bias"]))
        _set(stats, dst + ("mean",), _np(sd[f"{src}.running_mean"]))
        _set(stats, dst + ("var",), _np(sd[f"{src}.running_var"]))

    _set(params, ("conv0", "kernel"), _conv_kernel(sd["features.conv0.weight"]))
    bn("features.norm0", ("norm0",))
    for bi, layers in enumerate(block_config):
        for li in range(layers):
            src = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            dst = (f"block{bi}_layer{li}",)
            for ni in (1, 2):
                bn(f"{src}.norm{ni}", dst + (f"norm{ni}",))
                _set(params, dst + (f"conv{ni}", "kernel"),
                     _conv_kernel(sd[f"{src}.conv{ni}.weight"]))
        if bi < len(block_config) - 1:
            bn(f"features.transition{bi + 1}.norm", (f"transition{bi}_norm",))
            _set(params, (f"transition{bi}_conv", "kernel"),
                 _conv_kernel(sd[f"features.transition{bi + 1}.conv.weight"]))
    bn("features.norm5", ("norm5",))
    if "last_linear.weight" in sd:
        _set(params, ("last_linear", "kernel"), _dense_kernel(sd["last_linear.weight"]))
        _set(params, ("last_linear", "bias"), _np(sd["last_linear.bias"]))
    return params, stats


def convert_googlenet(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision googlenet -> (params, batch_stats) for
    models.legacy.GoogLeNetNetwork (reference architectures/googlenet.py:17).
    Aux-classifier weights are skipped (eval path never runs them); the
    embedding head maps from ``last_linear``/``fc``."""
    sd = strip_prefix(state_dict, "module.")
    sd = strip_prefix(sd, "model.")
    params: Dict = {}
    stats: Dict = {}

    def basic(src, dst):
        _set(params, dst + ("conv", "kernel"), _conv_kernel(sd[f"{src}.conv.weight"]))
        _set(params, dst + ("bn", "scale"), _np(sd[f"{src}.bn.weight"]))
        _set(params, dst + ("bn", "bias"), _np(sd[f"{src}.bn.bias"]))
        _set(stats, dst + ("bn", "mean"), _np(sd[f"{src}.bn.running_mean"]))
        _set(stats, dst + ("bn", "var"), _np(sd[f"{src}.bn.running_var"]))

    for c in ("conv1", "conv2", "conv3"):
        basic(c, (c,))
    for blk in ("3a", "3b", "4a", "4b", "4c", "4d", "4e", "5a", "5b"):
        src = f"inception{blk}"
        basic(f"{src}.branch1", (src, "branch1"))
        basic(f"{src}.branch2.0", (src, "branch2_0"))
        basic(f"{src}.branch2.1", (src, "branch2_1"))
        basic(f"{src}.branch3.0", (src, "branch3_0"))
        basic(f"{src}.branch3.1", (src, "branch3_1"))
        basic(f"{src}.branch4.1", (src, "branch4_1"))
    head = "last_linear" if "last_linear.weight" in sd else (
        "fc" if "fc.weight" in sd else None
    )
    if head and not _is_imagenet_head(sd, head):
        _set(params, ("last_linear", "kernel"), _dense_kernel(sd[f"{head}.weight"]))
        _set(params, ("last_linear", "bias"), _np(sd[f"{head}.bias"]))
    return params, stats


def _is_imagenet_head(sd, head: str) -> bool:
    """True when ``{head}.weight`` is the 1000-class ImageNet classifier,
    which the reference REPLACES with a fresh embed head (googlenet.py:19,
    bninception.py:14) — caught by the real-manifest audit (tests/
    test_convert_manifests.py): mapping a (1000, C) classifier onto the
    (C, embed_dim) head silently shipped garbage before.  The shape peek
    uses ``dict.__getitem__`` so an audit's TrackedStateDict does not count
    a skipped key as consumed (it lands in IGNORABLE_UNCONSUMED instead).
    Limitation: a finetuned head with embed_dim exactly 1000 is
    indistinguishable and will be skipped."""
    w = dict.__getitem__(sd, f"{head}.weight")
    return int(np.shape(_np(w))[0]) == 1000


def convert_bninception(state_dict: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """pretrainedmodels bninception -> (params, batch_stats) for
    models.legacy.BNInceptionNetwork (reference architectures/bninception.py:13).

    The pretrainedmodels state dict is flat (``inception_3a_double_3x3_1``);
    conv layers keep their Caffe biases.  Flax module names equal the torch
    layer names, nested under the owning block scope."""
    sd = strip_prefix(state_dict, "module.")
    sd = strip_prefix(sd, "model.")
    params: Dict = {}
    stats: Dict = {}

    def scope(layer: str) -> Tuple[str, ...]:
        # flax nesting: inception_3a_1x1 -> block_3a/inception_3a_1x1/{conv,bn};
        # stem convs -> conv1_7x7_s2/{conv,bn}
        is_bn = layer.endswith("_bn")
        base = layer[: -len("_bn")] if is_bn else layer
        inner = "bn" if is_bn else "conv"
        if base.startswith("inception_"):
            return (f"block_{base.split('_')[1]}", base, inner)
        return (base, inner)

    # reads go through sd[k] (not .items()) so a TrackedStateDict audit sees
    # exactly which keys a rule consumed; unmapped leaves stay unconsumed
    for k in list(sd):
        if "." not in k:
            continue
        layer, leaf = k.rsplit(".", 1)
        if layer in ("last_linear", "fc"):
            # the pretrainedmodels ImageNet file ships a (1000, 1024)
            # classifier here; the reference replaces it (bninception.py:14)
            if _is_imagenet_head(sd, layer):
                continue
            if leaf == "weight":
                _set(params, ("last_linear", "kernel"), _dense_kernel(sd[k]))
            elif leaf == "bias":
                _set(params, ("last_linear", "bias"), _np(sd[k]))
            continue
        dst = scope(layer)
        if layer.endswith("_bn"):
            if leaf == "weight":
                _set(params, dst + ("scale",), _np(sd[k]))
            elif leaf == "bias":
                _set(params, dst + ("bias",), _np(sd[k]))
            elif leaf == "running_mean":
                _set(stats, dst + ("mean",), _np(sd[k]))
            elif leaf == "running_var":
                _set(stats, dst + ("var",), _np(sd[k]))
        else:
            if leaf == "weight":
                _set(params, dst + ("kernel",), _conv_kernel(sd[k]))
            elif leaf == "bias":
                _set(params, dst + ("bias",), _np(sd[k]))
    return params, stats


def convert_for_arch(arch: str, sd: Mapping[str, Any]) -> Tuple[Dict, Dict]:
    """Arch-string -> converter dispatch (the same routing the reference does
    at model-construction time, architectures/__init__.py:11-34).  Returns
    (params, batch_stats) — batch_stats empty for stat-less models."""
    a = arch.lower()
    if a.startswith("cvt"):
        p, s = convert_cvt(sd, include_head=False)
    elif a.startswith("resnet50") or a.startswith("irresnet50"):
        p, s = convert_resnet50(sd)
    elif a.startswith("vit") or a.startswith("deit"):
        p, s = convert_vit(sd), {}
    elif "swin" in a:
        p, s = convert_swin(sd), {}
    elif "netvlad" in a:
        p, s = convert_patchnetvlad(sd), {}
    elif a.startswith("densenet"):
        cfg = (6, 12, 48, 32) if "201" in a else (6, 12, 32, 32)
        p, s = convert_densenet(sd, block_config=cfg)
    elif a.startswith("googlenet"):
        p, s = convert_googlenet(sd)
    elif a.startswith("bninception"):
        p, s = convert_bninception(sd)
    else:
        raise NotImplementedError(f"converter for {arch} pending")
    return p, s


# Checkpoint keys real released .pth files carry that the converters
# intentionally skip (classification heads replaced by the fresh DML head —
# reference load_state_dict(strict=False) semantics, cvt.py:713-722 — plus
# torch bookkeeping buffers that have no Flax counterpart).
IGNORABLE_UNCONSUMED = (
    "num_batches_tracked",      # torch BN step counter
    "head.weight", "head.bias",  # ImageNet classifier (replaced)
    "fc.weight", "fc.bias",      # torchvision resnet/googlenet classifier
    "classifier.weight", "classifier.bias",  # torchvision densenet
    "head_dist.", "dist_token",  # DeiT distillation branch (unused, vit.py:31)
    "attn_mask",                 # swin shift-mask buffer (recomputed)
    "relative_position_index",   # swin index buffer (recomputed)
    "aux1.", "aux2.",            # googlenet aux classifiers (eval never runs)
    "pre_logits.",               # timm ViT representation layer (unused)
    # pretrainedmodels' (1000, C) ImageNet classifier under this name is
    # skipped by _is_imagenet_head (the reference replaces it with a fresh
    # embed head); a FINETUNED head (embed_dim-out) under the same name IS
    # consumed — see tests/test_convert_legacy.py oracles
    "last_linear.",
)


class ConversionAuditError(ValueError):
    """A converter audit failed — the message carries the named diff."""


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def audit_conversion(
    arch: str,
    state_dict: Mapping[str, Any],
    variables: Optional[Mapping[str, Any]] = None,
    strict: bool = True,
):
    """Dry-run a converter under a consumption audit (VERDICT r3 item 4).

    Checks, against a REAL checkpoint's state_dict:
      * missing keys — the converter read a key the checkpoint lacks
        (raised by the converter as KeyError, re-raised here with context);
      * unconsumed keys — checkpoint keys no converter rule ever read,
        minus the documented IGNORABLE_UNCONSUMED set (a silent transcription
        divergence usually shows up here first: a renamed torch submodule
        leaves its whole subtree unconsumed);
      * shape mismatches / structural extras — converted leaves that do not
        exist in the model's init tree or disagree with its shapes
        (``variables`` = ``model.init(...)`` output);
      * uncovered init leaves — model parameters the checkpoint does not
        provide (EXPECTED for the fresh embedding head; reported, not fatal —
        reference load_state_dict(strict=False), cvt.py:713-722).

    Returns a report dict; with ``strict`` raises ConversionAuditError on any
    fatal finding, naming every offending key.
    """
    tracked = TrackedStateDict({k: v for k, v in state_dict.items()})
    try:
        p, s = convert_for_arch(arch, tracked)
    except KeyError as e:
        raise ConversionAuditError(
            f"[convert:{arch}] checkpoint is MISSING key {e.args[0]!r} that "
            f"the converter requires — wrong checkpoint family, or a "
            f"transcription divergence.  Checkpoint has {len(state_dict)} "
            f"keys; run audit_conversion(strict=False) for the full map."
        ) from e

    unconsumed_all = tracked.unconsumed()
    ignored = [
        k for k in unconsumed_all
        if any(pat in k for pat in IGNORABLE_UNCONSUMED)
    ]
    unconsumed = [k for k in unconsumed_all if k not in set(ignored)]

    shape_mismatches, extras, uncovered = [], [], []
    if variables is not None:
        init_flat = _flatten(
            {"params": dict(variables["params"]),
             "batch_stats": dict(variables.get("batch_stats", {}))}
        )
        conv_flat = _flatten({"params": p, "batch_stats": s})
        for k, v in conv_flat.items():
            if k not in init_flat:
                extras.append(k)
            elif tuple(np.shape(init_flat[k])) != tuple(np.shape(v)):
                shape_mismatches.append(
                    f"{k}: init {tuple(np.shape(init_flat[k]))} "
                    f"vs ckpt {tuple(np.shape(v))}"
                )
        covered = set(conv_flat)
        uncovered = sorted(k for k in init_flat if k not in covered)

    report = {
        "arch": arch,
        "n_keys": len(state_dict),
        "n_consumed": len(tracked.consumed),
        "unconsumed": unconsumed,
        "ignored_unconsumed": ignored,
        "shape_mismatches": shape_mismatches,
        "structural_extras": extras,
        "uncovered_init_leaves": uncovered,
        "params": p,
        "batch_stats": s,
    }
    problems = []
    if unconsumed:
        problems.append(
            f"{len(unconsumed)} checkpoint keys were never consumed "
            f"(first 20): {unconsumed[:20]}"
        )
    if shape_mismatches:
        problems.append(
            f"{len(shape_mismatches)} shape mismatches: {shape_mismatches[:20]}"
        )
    if extras:
        problems.append(
            f"{len(extras)} converted leaves have no init counterpart "
            f"(first 20): {extras[:20]}"
        )
    if problems and strict:
        raise ConversionAuditError(
            f"[convert:{arch}] audit failed:\n  - " + "\n  - ".join(problems)
        )
    report["problems"] = problems
    return report


def merge_params(base: Dict, override: Dict) -> Dict:
    """Recursively merge converted weights into an init pytree (override wins).

    Keeps randomly-initialized leaves for anything the checkpoint lacks — the
    same behavior as the reference's ``load_state_dict(strict=False)`` with a
    fresh head (architectures/cvt.py:713-722).
    """
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape"):
                ov = np.asarray(v)
                if tuple(out[k].shape) != tuple(ov.shape):
                    raise ValueError(
                        f"shape mismatch for {k}: init {tuple(out[k].shape)} vs ckpt {tuple(ov.shape)}"
                    )
            out[k] = v
    return out
