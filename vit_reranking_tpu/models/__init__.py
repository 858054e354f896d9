"""Model registry — substring dispatch over the arch string.

Mirrors reference architectures/__init__.py:11-34, including the arch-string
micro-DSL: `_normalize` (L2-norm output), `_frozen` (freeze BN / early
stages), `_diml` (per-patch embedding head), `_noln` (freeze LayerNorms —
handled by the optimizer mask, see engine/train).
"""

from __future__ import annotations

from .cvt import CVT13_SPEC, CvTDIML, CvTFPNetwork, CvTNetwork
from .legacy import BNInceptionNetwork, DenseNetNetwork, GoogLeNetNetwork
from .netvlad import NetVLAD, PatchNetVLAD, PatchNetVLADNetwork, VGG16Encoder
from .resnet import IRResNet, ResNet50DIML, ResNet50Network
from .swin import SwinNetwork
from .vit import CrossNet, ViTNetwork


def _parse_patch_list(s):
    return tuple(int(v) for v in str(s).split(","))


def select(arch: str, opt):
    """arch string -> Flax module (reference architectures/__init__.py:11-34).

    The returned module follows the shared contract
    ``apply(vars, x, train, ret_attn) -> (embed, (enc_out, token_map), aux)``.
    Pretrained-weight loading is separate (core/convert + core/checkpoint) —
    Flax modules are pure definitions.
    """
    import jax.numpy as jnp

    a = arch.lower()
    normalize = "normalize" in a
    frozen = "frozen" in a
    embed_dim = opt.embed_dim
    dtype = jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32

    if a.startswith("resnet50_diml"):
        return ResNet50DIML(
            embed_dim=embed_dim, normalize=normalize, bn_frozen=frozen,
            dtype=dtype,
        )
    if a.startswith("resnet50"):
        return ResNet50Network(
            embed_dim=embed_dim, normalize=normalize, bn_frozen=frozen,
            dtype=dtype,
        )
    if a.startswith("irresnet50"):
        return IRResNet(embed_dim=embed_dim, dtype=dtype)
    if a.startswith("densenet"):
        cfg = (6, 12, 48, 32) if "201" in a else (6, 12, 32, 32)
        return DenseNetNetwork(
            embed_dim=embed_dim, normalize=normalize, block_config=cfg,
            bn_frozen=frozen, dtype=dtype,
        )
    if a.startswith("googlenet"):
        return GoogLeNetNetwork(
            embed_dim=embed_dim, normalize=normalize, bn_frozen=frozen,
            dtype=dtype,
        )
    if a.startswith("bninception"):
        return BNInceptionNetwork(
            embed_dim=embed_dim, normalize=normalize, bn_frozen=frozen,
            double_pool="double" in a, dtype=dtype,
        )
    if a.startswith("vit") or a.startswith("deit"):
        return ViTNetwork(
            embed_dim=embed_dim, normalize=normalize,
            qk_block=getattr(opt, "blk_ind", 0),
            narrow_sm=bool(getattr(opt, "narrow_sm", False)), dtype=dtype,
        )
    if "netvlad" in a:
        return PatchNetVLADNetwork(
            pooling=getattr(opt, "pooling", "patchnetvlad"),
            num_clusters=int(getattr(opt, "num_clusters", 64)),
            num_pcs=int(getattr(opt, "num_pcs", 4096)),
            append_pca_layer=bool(getattr(opt, "append_pca_layer", True)),
            normalize=normalize,
            patch_sizes=_parse_patch_list(getattr(opt, "patch_sizes", "5")),
            strides=_parse_patch_list(getattr(opt, "strides", "1")),
            vladv2=bool(getattr(opt, "vladv2", False)),
        )
    if "swin" in a:
        return SwinNetwork(
            embed_dim=embed_dim, normalize=normalize,
            narrow_sm=bool(getattr(opt, "narrow_sm", False)), dtype=dtype,
        )
    if a.startswith("cvt"):
        if "diml" in a:
            return CvTDIML(
                embed_dim=embed_dim,
                grid_size=getattr(opt, "grid_size", 7),
                normalize=normalize,
                remat=bool(getattr(opt, "remat", False)),
                narrow_sm=bool(getattr(opt, "narrow_sm", False)),
                dtype=dtype,
            )
        if "fp" in a:  # fpn pooling variant (reference cvt.FPNetwork)
            return CvTFPNetwork(embed_dim=embed_dim, normalize=normalize)
        return CvTNetwork(
            embed_dim=embed_dim, normalize=normalize,
            remat=bool(getattr(opt, "remat", False)),
            narrow_sm=bool(getattr(opt, "narrow_sm", False)),
            dtype=dtype,
        )
    raise NotImplementedError(f"architecture {arch} not available")


def frozen_param_mask(arch: str, params) -> "dict":
    """Boolean pytree: True = trainable.  Encodes the `_frozen` / `_noln`
    modifiers (reference cvt.py:724-733 freezes stages 0/1; cvt.py:858-864
    freezes LayerNorms; resnet BN freezing is handled in-module)."""
    import jax

    a = arch.lower()

    def decide(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        joined = "/".join(str(k) for k in keys)
        if "frozen" in a and a.startswith("cvt"):
            if "stage0" in joined or "stage1" in joined:
                return False
        if "noln" in a:
            if "/ln/" in joined or joined.endswith("/ln"):
                return False
        if "frozen" in a and (a.startswith("vit") or a.startswith("deit") or "swin" in a):
            # reference freezes the whole backbone; only the head trains
            return joined.startswith("head") or "head/" in joined
        return True

    return jax.tree_util.tree_map_with_path(decide, params)
