"""Torch-transcription oracles for Grad-CAM (reference utilities/cam.py:69-86
= pytorch_grad_cam.GradCAM over the last conv stage, targets=None) and for the
``use_cam`` featvit rerank that consumes it (utilities/diml.py:405-412)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from vit_reranking_tpu.ops.similarity import calc_similarity_featvit
from vit_reranking_tpu.utils.cam import grad_cam, grad_cam_from_feats


def torch_gradcam(feats_t: torch.Tensor, weight: torch.Tensor, bias: torch.Tensor):
    """GradCAM transcription: feats (B, C, h, w); classifier = GAP + linear.
    targets=None -> per-image argmax logit; w_c = spatial-mean grads;
    cam = relu(sum_c w_c A_c); per-image min-max to [0, 1]."""
    feats_t = feats_t.clone().requires_grad_(True)
    logits = F.linear(feats_t.mean((2, 3)), weight, bias)
    target = logits.argmax(1)
    score = logits.gather(1, target[:, None]).sum()
    (grads,) = torch.autograd.grad(score, feats_t)
    w = grads.mean((2, 3))
    cam = F.relu((w[:, :, None, None] * feats_t).sum(1))
    cam = cam - cam.amin((1, 2), keepdim=True)
    cam = cam / (cam.amax((1, 2), keepdim=True) + 1e-7)
    return cam.detach()


def test_grad_cam_core_matches_torch():
    rng = np.random.default_rng(31)
    B, C, h, w, ncls = 5, 16, 7, 7, 10
    feats = rng.standard_normal((B, h, w, C)).astype(np.float32)
    W = rng.standard_normal((ncls, C)).astype(np.float32)
    b = rng.standard_normal((ncls,)).astype(np.float32)

    ref = torch_gradcam(
        torch.tensor(feats).permute(0, 3, 1, 2), torch.tensor(W), torch.tensor(b)
    ).numpy()

    Wj, bj = jnp.asarray(W.T), jnp.asarray(b)
    head_fn = lambda f: jnp.mean(f, axis=(1, 2)) @ Wj + bj
    ours = np.asarray(grad_cam_from_feats(jnp.asarray(feats), head_fn))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grad_cam_model_level_resnet():
    """Model-level CAM on the repo ResNet: activation-CAM at the trunk output
    (NOT input-gradient saliency), shape/range checks + the head default."""
    from vit_reranking_tpu.models.resnet import ResNet50Network

    m = ResNet50Network(embed_dim=8)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    sal = grad_cam(m, v, x, grid=2)  # trunk map at 64px is 2x2 -> identity
    assert sal.shape == (2, 2, 2)
    assert float(sal.max()) <= 1.0 + 1e-6 and float(sal.min()) >= 0.0
    sal4 = grad_cam(m, v, x, grid=4)  # upsample path
    assert sal4.shape == (2, 4, 4)


def test_use_cam_featvit_rerank_matches_torch():
    """End-to-end: torch GradCAM maps -> torch use_cam featvit transcription
    (diml.py:405-412) vs our grad_cam_from_feats + calc_similarity_featvit."""
    rng = np.random.default_rng(32)
    n, c, R = 6, 12, 9  # grid 3
    g = int(R**0.5)
    a = rng.standard_normal((c, R + 1)).astype(np.float32)
    a /= np.linalg.norm(a, axis=0, keepdims=True)
    f = rng.standard_normal((n, c, R + 1)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)

    # CAM source: feats at the grid resolution (h=w=g, the 224px layer4 case)
    Ccam, ncls = 8, 5
    a_feats = rng.standard_normal((1, g, g, Ccam)).astype(np.float32)
    f_feats = rng.standard_normal((n, g, g, Ccam)).astype(np.float32)
    W = rng.standard_normal((ncls, Ccam)).astype(np.float32)
    b = np.zeros((ncls,), np.float32)

    # torch side
    cam_a_t = torch_gradcam(
        torch.tensor(a_feats).permute(0, 3, 1, 2), torch.tensor(W), torch.tensor(b)
    )
    cam_f_t = torch_gradcam(
        torch.tensor(f_feats).permute(0, 3, 1, 2), torch.tensor(W), torch.tensor(b)
    )
    at, ft = torch.tensor(a), torch.tensor(f)
    an, fb = at[:, 1:], ft[:, :, 1:]
    sim = torch.einsum("cm,ncs->nsm", an, fb)
    K = torch.exp(-(1 - sim) / 0.05)
    resize = torch.nn.AdaptiveAvgPool2d(g)
    u = resize(cam_f_t[:, None]).view(n, R)
    u = u / (u.sum(1, keepdims=True) + 1e-5)
    v = resize(cam_a_t[:, None].expand(n, 1, -1, -1)).reshape(n, R)
    v = v / (v.sum(1, keepdims=True) + 1e-5)
    from tests.test_similarity import torch_sinkhorn

    T = torch_sinkhorn(K, u, v, thresh=0.0)
    ref = torch.sum(T * sim, dim=(1, 2)).numpy()

    # ours
    Wj, bj = jnp.asarray(W.T), jnp.asarray(b)
    head_fn = lambda x: jnp.mean(x, axis=(1, 2)) @ Wj + bj
    cam_a = grad_cam_from_feats(jnp.asarray(a_feats), head_fn)[0]
    cam_f = grad_cam_from_feats(jnp.asarray(f_feats), head_fn)
    np.testing.assert_allclose(np.asarray(cam_a), cam_a_t[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam_f), cam_f_t.numpy(), atol=1e-5)
    ours, _ = calc_similarity_featvit(
        jnp.asarray(a), jnp.asarray(f), stage=1, use_cam=True,
        anchor_cam=cam_a, fb_cam=cam_f, thresh=0.0,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_rerank_evaluate_cam_method():
    """Engine 'cam' method (verdict item 4): grid-flattened CAM banks ride
    the aux slots and the tile matches per-query calc_similarity_featvit."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate
    from vit_reranking_tpu.ops.topk import pairwise_topk

    rng = np.random.default_rng(33)
    N, C, R, ncls = 80, 16, 9, 8
    protos = rng.standard_normal((ncls, C)).astype(np.float32)
    labels = np.repeat(np.arange(ncls), N // ncls)
    fb = protos[labels][:, :, None] + 0.7 * rng.standard_normal((N, C, R)).astype(
        np.float32
    )
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    # centers in a DIFFERENT (head-projected) dim than the bank channels —
    # the real resnet eval has 128-d centers over a 2048-channel bank
    proj = rng.standard_normal((C, C // 2)).astype(np.float32)
    centers = fb.mean(-1) @ proj
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    cams = rng.uniform(0, 1, (N, R)).astype(np.float32)

    fbj, cj, lj, camj = map(jnp.asarray, (fb, centers, labels, cams))
    res = rerank_evaluate(
        fbj, cj, lj, rollout=camj, trunc_nums=(0, 8), method="cam",
        flags=dict(use_ot=True), query_block=40,
    )
    assert np.isfinite(res["r1"][8])
    # the cam method now auto-dispatches to the fused rollout path (CAM maps
    # are non-negative per-image saliency); metrics must match the XLA path
    res_xla = rerank_evaluate(
        fbj, cj, lj, rollout=camj, trunc_nums=(0, 8), method="cam",
        flags=dict(use_ot=True), query_block=40, use_fused=False,
    )
    for m in ("r1", "rp", "mapr"):
        for t in (0, 8):
            assert abs(res[m][t] - res_xla[m][t]) < 0.2, (m, t)

    # score parity vs direct per-query featvit use_cam
    _, top = pairwise_topk(cj, cj, k=8, mask_self=True)
    g = int(R**0.5)
    i = 3
    a_feat = jnp.concatenate([jnp.zeros_like(fbj[i][:, :1]), fbj[i]], axis=1)
    f_feat = jnp.concatenate(
        [jnp.zeros_like(fbj[top[i]][:, :, :1]), fbj[top[i]]], axis=2
    )
    direct, _ = calc_similarity_featvit(
        a_feat, f_feat, stage=1, use_cam=True,
        anchor_cam=camj[i].reshape(g, g), fb_cam=camj[top[i]].reshape(-1, g, g),
    )
    assert np.all(np.isfinite(np.asarray(direct)))


def test_cli_eval_use_cam(tmp_path):
    """--use_cam end to end through the eval CLI on synthetic data."""
    import os

    from vit_reranking_tpu.cli.test_diml import main as eval_main

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res = eval_main([
            "--dataset", "synthetic", "--synthetic_size", "32",
            "--synthetic_classes", "4", "--synthetic_per_class", "8",
            "--kernels", "1", "--bs", "8", "--arch", "resnet50_normalize",
            "--use_cam", "--use_ot", "--grid_size", "1",
            "--save_path", str(tmp_path),
        ])
    finally:
        os.chdir(cwd)
    assert np.isfinite(res["r1"][0])
