"""Probes, extra metrics, visualization, Grad-CAM smoke tests."""

import os
import types

import numpy as np
import jax
import jax.numpy as jnp

from vit_reranking_tpu.engine.metrics_extra import compute_standard
from vit_reranking_tpu.engine.proofs import (
    evaluate_cls_cluster,
    patch_similarity_per_layer,
    plot_cluster,
)
from vit_reranking_tpu.utils.visual import (
    visual_attention_rollout,
    visual_heatmap,
    visualise_retrieval_strip,
)


def test_compute_standard_metrics():
    rng = np.random.default_rng(0)
    protos = rng.standard_normal((5, 16)) * 3
    labels = np.repeat(np.arange(5), 20)
    emb = (protos[labels] + 0.3 * rng.standard_normal((100, 16))).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    out = compute_standard(emb, labels)
    assert out["e_recall@1"] > 0.9
    assert out["nmi"] > 0.8
    assert out["f1"] > 0.6
    assert 0 <= out["mAP_c"] <= 1
    assert out["dists@intra"] < out["dists@inter"]
    assert np.isfinite(out["rho_spectrum@1"])


def test_patch_similarity_probe():
    rng = np.random.default_rng(1)
    # degenerate tokens (all same) -> similarity ~1; random -> ~0
    same = jnp.ones((2, 1, 8, 4))
    rand = jnp.asarray(rng.standard_normal((2, 1, 8, 64)).astype(np.float32))
    s_same = float(patch_similarity_per_layer(same)[0])
    s_rand = float(patch_similarity_per_layer(rand)[0])
    assert s_same > 0.99
    assert abs(s_rand) < 0.3


def test_cls_cluster_probe():
    rng = np.random.default_rng(2)
    labels = np.repeat(np.arange(4), 16)
    good = np.repeat(np.eye(4, 8), 16, axis=0) + 0.1 * rng.standard_normal((64, 8))
    bad = rng.standard_normal((64, 8))
    cls_layers = np.stack([bad, good], axis=1).astype(np.float32)  # (B, 2, D)
    nmis = evaluate_cls_cluster(cls_layers, labels)
    assert nmis[1] > nmis[0]
    assert nmis[1] > 0.8


def test_visualizations(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.standard_normal((32, 32, 3)).astype(np.float32)
    u = np.abs(rng.standard_normal(49)); v = np.abs(rng.standard_normal(49))
    T = np.abs(rng.standard_normal((49, 49)))
    visual_heatmap(img, img, u, v, T, T, save_path=str(tmp_path / "h.png"))
    visualise_retrieval_strip(img, [img, img], [True, False], str(tmp_path / "r.png"))
    visual_attention_rollout(img, u[:16], str(tmp_path / "a.png"))
    plot_cluster(rng.standard_normal((20, 8)), np.arange(20) % 4, str(tmp_path / "c.png"))
    for f in ("h.png", "r.png", "a.png", "c.png"):
        assert os.path.exists(tmp_path / f)


def test_grad_cam():
    from vit_reranking_tpu.models.resnet import ResNet50Network
    from vit_reranking_tpu.utils.cam import grad_cam

    m = ResNet50Network(embed_dim=8)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    sal = grad_cam(m, v, x, grid=4)
    assert sal.shape == (1, 4, 4)
    assert float(sal.max()) <= 1.0 + 1e-6 and float(sal.min()) >= 0.0


def test_patchsim_cli_synthetic():
    from vit_reranking_tpu.cli.test_pair_patchsim import main

    sims = main([
        "--dataset", "synthetic", "--synthetic_size", "64", "--arch", "vit_normalize",
        "--bs", "8", "--kernels", "1", "--synthetic_per_class", "4",
    ])
    assert np.all(np.isfinite(np.asarray(sims)))
