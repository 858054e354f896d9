"""End-to-end flagship-path parity: the reference's own eval_cvt_diml.evaluate
(torch, rollout OT rerank) vs our extract_features + rerank_evaluate, on the
same converted weights and the same images.  This is the R@K-parity check the
metric protocol demands (BASELINE.md: parity +-0.2)."""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)

# reuse the stub/loader helpers from the CvT parity test
sys.path.insert(0, os.path.dirname(__file__))
from test_cvt_parity import _install_timm_stub, _load_ref_module  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch
    from functools import partial

    ref_cvt = _load_ref_module("ref_cvt_e2e", "architectures/cvt.py")
    if "evaluation" not in sys.modules:
        pkg = types.ModuleType("evaluation")
        pkg.__path__ = [os.path.join(REFERENCE, "evaluation")]
        sys.modules["evaluation"] = pkg
    ref_eval = _load_ref_module("ref_eval_e2e", "evaluation/eval_cvt_diml.py")

    torch.manual_seed(0)
    trunk = ref_cvt.ConvolutionalVisionTransformer(
        in_chans=3, num_classes=1000,
        act_layer=ref_cvt.QuickGELU,
        norm_layer=partial(ref_cvt.LayerNorm, eps=1e-5),
        init="trunc_norm",
        spec=ref_cvt.get_cvt_spec(use_attn=True),
    )
    # swap the classifier for a 32-d embedding head like cvt.Network
    trunk.head = torch.nn.Linear(384, 32)
    torch.nn.init.normal_(trunk.head.weight, std=0.02)
    trunk.eval()

    class RefNetwork(torch.nn.Module):
        """Test shim replicating reference cvt.Network.forward:735-749."""

        def __init__(self, model):
            super().__init__()
            self.model = model
            self.pars = types.SimpleNamespace(
                dataset="synthetic", arch="cvt_13_normalize", not_pretrained=False
            )

        def forward(self, x, **kw):
            import torch as T

            x, cls_token = self.model.both_forward(x)
            x = x.flatten(2).permute(0, 2, 1)
            no_avg_feat = self.model.norm(x)
            x = self.model.norm(cls_token)
            x = T.squeeze(x, dim=1)
            enc_out = x
            x = self.model.head(x)
            x = T.nn.functional.normalize(x, dim=-1)
            return x, (enc_out, no_avg_feat)

    return ref_eval, RefNetwork(trunk), trunk


def test_flagship_eval_parity(setup, monkeypatch, tmp_path):
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from vit_reranking_tpu.core.convert import convert_cvt, merge_params
    from vit_reranking_tpu.engine.extract import extract_features
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate
    from vit_reranking_tpu.models.cvt import CvTNetwork

    ref_eval, ref_net, trunk = setup

    # --- synthetic image set: 24 images, 6 classes
    rng = np.random.default_rng(0)
    protos = rng.uniform(-1.5, 1.5, (6, 8, 8, 3)).astype(np.float32)
    labels = np.repeat(np.arange(6), 4)
    images = np.stack(
        [
            np.kron(protos[c], np.ones((28, 28, 1), np.float32))
            + 0.4 * rng.standard_normal((224, 224, 3)).astype(np.float32)
            for c in labels
        ]
    )

    # --- reference side
    monkeypatch.setattr(ref_eval, "visual_heatmap", lambda *a, **k: None)
    monkeypatch.setattr(ref_eval.os, "makedirs", lambda *a, **k: None)
    loader = [
        (
            torch.tensor(labels[s : s + 8].astype(np.int64)),
            torch.tensor(images[s : s + 8].transpose(0, 3, 1, 2)),
        )
        for s in range(0, 24, 8)
    ]
    # reference evaluate assumes CUDA; patch tensors to stay on CPU
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    cpu_dev = torch.device("cpu")
    monkeypatch.setattr(ref_eval.torch, "device", lambda *a, **k: cpu_dev)
    with torch.no_grad():
        ref_res = ref_eval.evaluate(
            ref_net, dataset=None, dataloader=loader, training=False,
            trunc_nums=[0, 16], use_uniform=False, grid_size=7,
            use_inverse=False, temperature=0.1, use_cls_token=True,
            use_ot=True, ot_part=1.0, use_rollout=True,
        )

    # --- our side: same weights via the converter
    model = CvTNetwork(embed_dim=32, normalize=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 224, 224, 3)), train=False,
    )
    p, s = convert_cvt(trunk.state_dict())
    variables = {
        "params": merge_params(dict(variables["params"]), p),
        "batch_stats": merge_params(dict(variables.get("batch_stats", {})), s),
    }

    class ArrayLoader:
        def __iter__(self):
            for st in range(0, 24, 8):
                yield labels[st : st + 8], images[st : st + 8], np.arange(st, st + 8)

    feats = extract_features(
        model, variables, ArrayLoader(), grid_size=7, use_rollout=True, pad_batch=8
    )
    ours = rerank_evaluate(
        jnp.asarray(feats["bank"]), jnp.asarray(feats["center"]),
        jnp.asarray(feats["labels"]), rollout=jnp.asarray(feats["rollout"]),
        trunc_nums=(0, 16), method="rollout",
        flags=dict(use_ot=True, ot_part=1.0), query_block=24,
    )

    for ti, trunc in enumerate((0, 16)):
        for m in ("r1", "rp", "mapr"):
            ref_v = float(ref_res[m][ti])
            our_v = ours[m][trunc]
            assert abs(our_v - ref_v) <= 0.2, (
                f"{m}@{trunc}: ours={our_v:.4f} ref={ref_v:.4f}"
            )


# ---------------------------------------------------------------------------
# Parity matrix beyond the flagship config (VERDICT r2 item 5): featvit
# use_minus / use_inverse, partial OT through the fused group-exit path, and
# the eval_attn_diml (ViT) evaluator incl. use_soft.


def _synthetic_images(seed=0, n_cls=6, per_cls=4, side=224, cell=8):
    rng = np.random.default_rng(seed)
    protos = rng.uniform(-1.5, 1.5, (n_cls, cell, cell, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_cls), per_cls)
    k = side // cell
    images = np.stack(
        [
            np.kron(protos[c], np.ones((k, k, 1), np.float32))
            + 0.4 * rng.standard_normal((side, side, 3)).astype(np.float32)
            for c in labels
        ]
    )
    return images, labels


def _patch_ref_eval(ref_eval, monkeypatch):
    import torch

    monkeypatch.setattr(ref_eval, "visual_heatmap", lambda *a, **k: None)
    monkeypatch.setattr(ref_eval.os, "makedirs", lambda *a, **k: None)
    monkeypatch.setattr(
        torch.Tensor, "cuda", lambda self, *a, **k: self, raising=False
    )
    cpu_dev = torch.device("cpu")
    monkeypatch.setattr(ref_eval.torch, "device", lambda *a, **k: cpu_dev)


@pytest.fixture(scope="module")
def cvt_feats(setup):
    """One extraction (converted CvT weights, rollout on) reused by every
    variant config — bank/center are identical across featvit configs."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from vit_reranking_tpu.core.convert import convert_cvt, merge_params
    from vit_reranking_tpu.engine.extract import extract_features
    from vit_reranking_tpu.models.cvt import CvTNetwork

    _, _, trunk = setup
    images, labels = _synthetic_images()
    model = CvTNetwork(embed_dim=32, normalize=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 224, 224, 3)), train=False
    )
    p, s = convert_cvt(trunk.state_dict())
    variables = {
        "params": merge_params(dict(variables["params"]), p),
        "batch_stats": merge_params(dict(variables.get("batch_stats", {})), s),
    }

    class ArrayLoader:
        def __iter__(self):
            for st in range(0, len(images), 8):
                yield labels[st : st + 8], images[st : st + 8], np.arange(st, st + 8)

    feats = extract_features(
        model, variables, ArrayLoader(), grid_size=7, use_rollout=True, pad_batch=8
    )
    return images, labels, feats


@pytest.mark.parametrize(
    "ref_kw, method, flags",
    [
        (  # featvit with 1-att marginals (eval_cvt_diml.py:334-343 use_minus)
            dict(use_rollout=False, use_minus=True, use_cls_token=True,
                 temperature=1.0, ot_part=1.0),
            "featvit",
            dict(use_minus=True, use_cls_token=True, temperature=1.0,
                 use_ot=True, ot_part=1.0),
        ),
        (  # featvit with exp(-att/T) marginals (diml.py:107-113 use_inverse)
            dict(use_rollout=False, use_inverse=True, temperature=0.1,
                 use_cls_token=True, ot_part=1.0),
            "featvit",
            dict(use_inverse=True, temperature=0.1, use_cls_token=True,
                 use_ot=True, ot_part=1.0),
        ),
        (  # partial OT through the fused group-exit path (diml.py:56-75)
            dict(use_rollout=True, ot_part=0.5),
            "rollout",
            dict(use_ot=True, ot_part=0.5),
        ),
        (  # flagship rollout full OT through the bf16 similarity stream
            # (stream_dtype fast mode): R@K must stay within the same +-0.2
            # protocol tolerance vs the reference's own evaluate() that
            # gates the f32 path — this is what licenses bf16 as the
            # production rerank mode (BASELINE.json parity clause)
            dict(use_rollout=True, ot_part=1.0),
            "rollout",
            dict(use_ot=True, ot_part=1.0, _stream_dtype="bfloat16"),
        ),
    ],
    ids=[
        "featvit-minus", "featvit-inverse", "rollout-partial-0.5",
        "rollout-bf16-stream",
    ],
)
def test_eval_variant_parity(setup, cvt_feats, monkeypatch, ref_kw, method, flags):
    """Reference eval_cvt_diml.evaluate vs our pipeline on converted weights
    for the non-flagship configurations (eval_cvt_diml.py:334-354)."""
    import torch
    import jax.numpy as jnp

    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    ref_eval, ref_net, _ = setup
    images, labels, feats = cvt_feats

    _patch_ref_eval(ref_eval, monkeypatch)
    loader = [
        (
            torch.tensor(labels[s : s + 8].astype(np.int64)),
            torch.tensor(images[s : s + 8].transpose(0, 3, 1, 2)),
        )
        for s in range(0, len(images), 8)
    ]
    with torch.no_grad():
        ref_res = ref_eval.evaluate(
            ref_net, dataset=None, dataloader=loader, training=False,
            trunc_nums=[0, 16], grid_size=7, use_ot=True, **ref_kw,
        )

    stream_dtype = flags.get("_stream_dtype", "float32")
    flags = {k: v for k, v in flags.items() if not k.startswith("_")}
    ours = rerank_evaluate(
        jnp.asarray(feats["bank"]), jnp.asarray(feats["center"]),
        jnp.asarray(feats["labels"]),
        rollout=jnp.asarray(feats["rollout"]) if method == "rollout" else None,
        trunc_nums=(0, 16), method=method, flags=flags, query_block=24,
        stream_dtype=stream_dtype,
    )

    for ti, trunc in enumerate((0, 16)):
        for m in ("r1", "rp", "mapr"):
            ref_v = float(ref_res[m][ti])
            our_v = ours[m][trunc]
            assert abs(our_v - ref_v) <= 0.2, (
                f"{m}@{trunc}: ours={our_v:.4f} ref={ref_v:.4f}"
            )


@pytest.fixture(scope="module")
def vit_setup():
    """Tiny DeiT shim around the reference's ViT forward contract
    (architectures/vit.py:45-60) + the eval_attn_diml evaluator, with
    pytorch_grad_cam / utilities.cam stubbed (not installed here and unused
    by the featvit path)."""
    _install_timm_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    if "evaluation" not in sys.modules:
        pkg = types.ModuleType("evaluation")
        pkg.__path__ = [os.path.join(REFERENCE, "evaluation")]
        sys.modules["evaluation"] = pkg
    for name in ("pytorch_grad_cam", "pytorch_grad_cam.utils",
                 "pytorch_grad_cam.utils.image"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["pytorch_grad_cam.utils.image"].show_cam_on_image = lambda *a, **k: None
    cam_stub = types.ModuleType("utilities.cam")
    cam_stub.get_cam_ouput = lambda *a, **k: None
    cam_stub.demo = lambda *a, **k: None
    sys.modules.setdefault("utilities.cam", cam_stub)
    ref_attn_eval = _load_ref_module("ref_attn_eval", "evaluation/eval_attn_diml.py")

    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert import _tiny_vit_sd, _torch_vit_forward

    rng = np.random.default_rng(7)
    dim, depth, heads, patch, img = 32, 2, 2, 8, 32
    grid = img // patch
    sd = _tiny_vit_sd(rng, dim, depth, heads, patch, grid)
    head_w = torch.tensor(rng.standard_normal((8, dim)).astype(np.float32) * 0.1)
    head_b = torch.tensor(rng.standard_normal(8).astype(np.float32) * 0.01)

    class RefViTNetwork(torch.nn.Module):
        """Reference vit.Network.forward:45-60 on the hand-built DeiT."""

        def __init__(self):
            super().__init__()
            self.model = torch.nn.Module()
            self.model.head = torch.nn.Linear(dim, 8)
            with torch.no_grad():
                self.model.head.weight.copy_(head_w)
                self.model.head.bias.copy_(head_b)
            self.pars = types.SimpleNamespace(
                dataset="synthetic", arch="vit_normalize", not_pretrained=False
            )

        def forward(self, x, **kw):
            import torch.nn.functional as F

            tok = _torch_vit_forward(sd, x, depth, heads)
            enc_out = tok[:, 0]
            no_avg_feat = tok[:, 1:]
            out = F.normalize(self.model.head(enc_out), dim=-1)
            return out, (enc_out, no_avg_feat)

    return ref_attn_eval, RefViTNetwork(), sd, (head_w, head_b), (dim, depth, heads, patch, img)


@pytest.mark.parametrize(
    "ref_kw, flags",
    [
        (dict(), dict()),
        (dict(use_soft=True), dict(use_soft=True)),
    ],
    ids=["featvit-default", "featvit-soft"],
)
def test_attn_eval_parity(vit_setup, monkeypatch, ref_kw, flags):
    """Reference eval_attn_diml.evaluate (the ViT evaluator, featvit path —
    its qk branch is unreachable as shipped: use_featvit=True hardcoded at
    eval_attn_diml.py:110 and the branch references an undefined use_exp at
    :258) vs our ViT pipeline on converted weights, incl. the use_soft
    marginal variant only this evaluator exposes."""
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from vit_reranking_tpu.core import convert
    from vit_reranking_tpu.engine.extract import extract_features
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate
    from vit_reranking_tpu.models.vit import ViTNetwork

    ref_attn_eval, ref_net, sd, (head_w, head_b), (dim, depth, heads, patch, img) = vit_setup
    images, labels = _synthetic_images(seed=3, side=img, cell=8)

    _patch_ref_eval(ref_attn_eval, monkeypatch)
    loader = [
        (
            torch.tensor(labels[s : s + 8].astype(np.int64)),
            torch.tensor(images[s : s + 8].transpose(0, 3, 1, 2)),
        )
        for s in range(0, len(images), 8)
    ]
    with torch.no_grad():
        ref_res = ref_attn_eval.evaluate(
            ref_net, dataset=None, dataloader=loader, training=False,
            trunc_nums=[0, 8], grid_size=img // patch, use_cls_token=True,
            use_ot=True, ot_part=1.0, temperature=0.1, **ref_kw,
        )

    model = ViTNetwork(embed_dim=8, dim=dim, depth=depth, num_heads=heads, patch=patch)
    v = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False
    )
    p = convert.merge_params(dict(v["params"]), convert.convert_vit(sd, depth=depth))
    p["head"] = {"kernel": head_w.numpy().T, "bias": head_b.numpy()}
    variables = {"params": p}

    class ArrayLoader:
        def __iter__(self):
            for st in range(0, len(images), 8):
                yield labels[st : st + 8], images[st : st + 8], np.arange(st, st + 8)

    feats = extract_features(
        model, variables, ArrayLoader(), grid_size=img // patch, pad_batch=8
    )
    ours = rerank_evaluate(
        jnp.asarray(feats["bank"]), jnp.asarray(feats["center"]),
        jnp.asarray(feats["labels"]), trunc_nums=(0, 8), method="featvit",
        flags=dict(use_cls_token=True, use_ot=True, ot_part=1.0,
                   temperature=0.1, **flags),
        query_block=24,
    )

    for ti, trunc in enumerate((0, 8)):
        for m in ("r1", "rp", "mapr"):
            ref_v = float(ref_res[m][ti])
            our_v = ours[m][trunc]
            assert abs(our_v - ref_v) <= 0.2, (
                f"{m}@{trunc}: ours={our_v:.4f} ref={ref_v:.4f}"
            )


def test_qk_fused_matches_reference_torch():
    """The fused qk kernel vs the reference's own torch calc_similarity_vit
    (utilities/diml.py:206-263) on identical q/k banks — the strongest qk
    check available given the evaluator's qk branch is dead code (see
    test_attn_eval_parity docstring)."""
    import torch
    import jax.numpy as jnp

    ref_diml = _load_ref_module("ref_diml_qk", "utilities/diml.py")
    from vit_reranking_tpu.ops.rerank_pallas import fused_qk_rerank_scores

    rng = np.random.default_rng(5)
    N, C, R, H, hd, K = 20, 16, 16, 3, 8, 8
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    q = rng.standard_normal((N, H, R + 1, hd)).astype(np.float32)
    k = rng.standard_normal((N, H, R + 1, hd)).astype(np.float32)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100)
    top = np.argsort(-sims, 1)[:, :K].astype(np.int32)

    t = torch.tensor
    ref = np.stack([
        ref_diml.calc_similarity_vit(
            None, t(fb[i]), t(q[i]), None, t(fb[top[i]]), t(k[top[i]]),
            stage=1,
        )[0].numpy()
        for i in range(N)
    ])

    out = fused_qk_rerank_scores(
        jnp.asarray(fb), jnp.asarray(q), jnp.asarray(k), jnp.asarray(top),
        query_tile=8, interpret=True,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
    assert (np.argsort(-out, axis=1) == np.argsort(-ref, axis=1)).all()
