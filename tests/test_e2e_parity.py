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
