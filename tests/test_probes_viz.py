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


def test_visualization_tail(tmp_path):
    """Flow / rollout panels + MSLS heatmap + triptych (verdict item 9;
    reference visual.py:298-505, train_epoch.py:106-123)."""
    from vit_reranking_tpu.utils.visual import (
        top_correspondences,
        visual_attention_rollout_images,
        visual_attention_rollout_layers,
        visual_heatmap_msls,
        visual_msls_triptych,
        visual_self_cross_flow,
    )

    rng = np.random.default_rng(5)
    img = rng.standard_normal((32, 32, 3)).astype(np.float32)
    R = 16
    u = np.abs(rng.standard_normal(R)); v = np.abs(rng.standard_normal(R))
    T = np.abs(rng.standard_normal((R, R)))
    S = np.abs(rng.standard_normal((R, R)))

    # correspondence orientation: row = gallery patch, col = query patch
    st = np.zeros((R, R)); st[5, 7] = 9.0; st[2, 3] = 5.0
    assert top_correspondences(st, 2) == [(5, 7), (2, 3)]

    visual_heatmap_msls(img, img, u, v, T, S, str(tmp_path / "hm.png"))
    visual_self_cross_flow(img, img, (u, v), (u, v), str(tmp_path / "fl.png"))
    visual_attention_rollout_layers(
        img, np.abs(rng.standard_normal((3, R))), str(tmp_path / "rl.png")
    )
    visual_attention_rollout_images(
        np.stack([img, img]), np.abs(rng.standard_normal((2, R))),
        str(tmp_path / "ri.png"),
    )
    visual_msls_triptych(img, img, img, str(tmp_path / "tri.png"))
    for f in ("hm.png", "fl.png", "rl.png", "ri.png", "tri.png"):
        assert os.path.exists(tmp_path / f)


def test_msls_val_writes_heatmaps(tmp_path):
    """visual_dir in msls_val writes the per-city OT heatmap panels."""
    from vit_reranking_tpu.data.msls import SyntheticMSLS
    from vit_reranking_tpu.engine.msls_val import msls_val

    ds = SyntheticMSLS(n_queries=12, n_db=24, nNeg=2, image_size=32, seed=3)

    def extract(imgs):
        # must be jax-traceable: msls_val compiles whole extraction chunks
        # into one program (engine/msls_val.py::_embed_names)
        x = imgs.reshape(imgs.shape[0], -1, 3).mean(1)
        x = jnp.concatenate([x, imgs.reshape(imgs.shape[0], 8, -1).mean(-1)], -1)
        c = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        d = jnp.repeat(c[:, :, None], 4, axis=2).astype(jnp.float32)
        return c.astype(jnp.float32), d

    out = msls_val(
        ds, extract, trunc_nums=(0, 4), batch=8,
        visual_dir=str(tmp_path), vis_every=6,
    )
    assert "dimlR_5" in out
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert pngs, "no heatmap panels written"


def test_msls_train_writes_triptychs(tmp_path):
    """First-steps triptych in the MSLS train loop (train_epoch.py:106-123)."""
    from vit_reranking_tpu.cli.train_msls_baseline import main

    main([
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--n_epochs", "1", "--evalevery", "5",
        "--nNeg", "2", "--lr", "0.0001", "--save_path", str(tmp_path),
        "--group", "viz", "--bs", "4",
    ])
    run_dir = os.path.join(str(tmp_path), "synthetic", "viz_s1", "visual")
    assert os.path.isdir(run_dir) and len(os.listdir(run_dir)) >= 1
