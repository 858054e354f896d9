"""Activation parity: Flax CvT-13 vs the reference torch implementation.

Loads the reference model from /root/reference (torch, CPU) as an oracle,
converts its randomly-initialized weights with core/convert.py, and checks the
forward outputs agree.  Skipped when the reference checkout is unavailable
(e.g. for external users of this repo) — the converter itself is still
exercised by shape checks elsewhere.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


def _install_timm_stub():
    """The reference imports timm only for DropPath/trunc_normal_; stub them."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode passthrough
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1 - self.drop_prob
            mask = torch.bernoulli(torch.full((x.shape[0],) + (1,) * (x.ndim - 1), keep))
            return x / keep * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers

    # torchvision is only touched by the reference's get_pretraind_res50 helper
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.models.resnet50 = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models


def _load_ref_module(name, relpath):
    """Load a reference module by file path (the package __init__ pulls in
    deps like pretrainedmodels that this image doesn't have)."""
    import importlib.util as iu

    spec = iu.spec_from_file_location(name, os.path.join(REFERENCE, relpath))
    mod = iu.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_cvt():
    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    from functools import partial

    ref_cvt = _load_ref_module("ref_cvt", "architectures/cvt.py")
    ConvolutionalVisionTransformer = ref_cvt.ConvolutionalVisionTransformer
    LayerNorm = ref_cvt.LayerNorm
    QuickGELU = ref_cvt.QuickGELU
    get_cvt_spec = ref_cvt.get_cvt_spec

    torch.manual_seed(0)
    model = ConvolutionalVisionTransformer(
        in_chans=3,
        num_classes=1000,
        act_layer=QuickGELU,
        norm_layer=partial(LayerNorm, eps=1e-5),
        init="trunc_norm",
        spec=get_cvt_spec(use_attn=True),
    )
    model.eval()
    return model


def test_cvt_forward_parity(torch_cvt):
    import torch
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vit_reranking_tpu.models.cvt import CvTNetwork
    from vit_reranking_tpu.core.convert import convert_cvt, merge_params

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        tokens_t, cls_t = torch_cvt.both_forward(torch.tensor(x))
        logits_t = torch_cvt.head(torch_cvt.norm(cls_t).squeeze(1))
        probs_t = [
            blk._probs[0].numpy()
            for si in range(3)
            for blk in getattr(torch_cvt, f"stage{si}").blocks
        ]

    model = CvTNetwork(embed_dim=128, num_classes=1000, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False, ret_attn=False,
    )
    conv_params, conv_stats = convert_cvt(torch_cvt.state_dict())
    params = merge_params(dict(variables["params"]), conv_params)
    stats = merge_params(dict(variables.get("batch_stats", {})), conv_stats)

    out, (enc, no_avg), aux = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
        ret_attn=True,
    )

    # spatial token map: torch (B, C, H, W) vs ours LN'd (B, HW, C) pre-norm diff;
    # compare the classifier logits and the cls path end-to-end
    np.testing.assert_allclose(np.asarray(out), logits_t.numpy(), rtol=1e-3, atol=2e-4)

    # token map parity (pre-head LayerNorm applied on both sides)
    with torch.no_grad():
        tok_ref = torch_cvt.norm(
            tokens_t.flatten(2).permute(0, 2, 1)
        ).numpy()  # (B, HW, C)
    np.testing.assert_allclose(np.asarray(no_avg), tok_ref, rtol=1e-3, atol=2e-4)

    # attention probabilities of the last stage-2 block
    last_probs = probs_t[-1]  # (B, heads, T, T)
    # ours are already filtered+pooled; instead check the rollout pipeline
    # end-to-end against a torch replication of filter+resize on the raw maps
    assert aux["rollout_maps"].shape == (13, 2, 49, 49)
    assert np.all(np.isfinite(np.asarray(aux["rollout_maps"])))


def test_rollout_matches_reference_pipeline(torch_cvt):
    """Filter+pool+joint-rollout vs the reference's own functions (per-sample
    corrected indexing on both sides: batch size 1 makes the reference's
    cross-batch quirk a no-op)."""
    import torch
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vit_reranking_tpu.models.cvt import CvTNetwork
    from vit_reranking_tpu.core.convert import convert_cvt, merge_params
    from vit_reranking_tpu.ops.rollout import rollout_saliency

    # pre-register a bare 'evaluation' package so `evaluation.metrics` resolves
    # without executing the reference's evaluation/__init__.py (needs faiss)
    if "evaluation" not in sys.modules:
        pkg = types.ModuleType("evaluation")
        pkg.__path__ = [os.path.join(REFERENCE, "evaluation")]
        sys.modules["evaluation"] = pkg
    ref_eval = _load_ref_module("ref_eval_cvt_diml", "evaluation/eval_cvt_diml.py")
    get_attention_rollout = ref_eval.get_attention_rollout

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)

    rollout_ref = get_attention_rollout(torch_cvt, torch.tensor(x), grid=7)
    sal_ref = rollout_ref[-1].mean(1).numpy()  # (B, 49)

    model = CvTNetwork(embed_dim=128, num_classes=1000, normalize=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    conv_params, conv_stats = convert_cvt(torch_cvt.state_dict())
    params = merge_params(dict(variables["params"]), conv_params)
    stats = merge_params(dict(variables.get("batch_stats", {})), conv_stats)
    _, _, aux = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
        ret_attn=True,
    )
    sal = np.asarray(rollout_saliency(aux["rollout_maps"]))
    np.testing.assert_allclose(sal, sal_ref, rtol=5e-3, atol=1e-5)
