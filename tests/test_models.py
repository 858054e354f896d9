"""Model-family tests: forward contracts, shapes, registry dispatch."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vit_reranking_tpu.models as archs


def opt(**kw):
    base = dict(
        embed_dim=32, grid_size=7, blk_ind=0, pooling="patchnetvlad",
        num_clusters=8, num_pcs=64, append_pca_layer=True, patch_sizes="2",
        strides="1", vladv2=False,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def run(model, x, **kw):
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False, **kw)
    out = model.apply(v, x, train=False, **kw)
    return v, out


def test_resnet50_contract():
    m = archs.select("resnet50_frozen_normalize", opt())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    _, (e, (enc, tok), aux) = run(m, x)
    assert e.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(e, axis=-1)), 1.0, rtol=1e-5)
    assert enc.shape == (2, 2048)
    assert tok.shape == (2, 4, 2048)  # 64/32 = 2x2 map


def test_resnet50_diml_contract():
    m = archs.select("resnet50_diml_frozen", opt())
    x = jnp.zeros((2, 64, 64, 3))
    _, (pf, (enc, tok), aux) = run(m, x)
    assert pf.shape == (2, 2, 2, 32)
    assert enc.shape == (2, 2048)


def test_irresnet_gem():
    m = archs.select("irresnet50", opt())
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    _, (e, (pooled, tok), _) = run(m, x)
    assert e.shape == (1, 32)
    np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, rtol=1e-4)


def test_vit_contract_and_qk():
    m = archs.select("vit_normalize", opt())
    x = jnp.zeros((2, 64, 64, 3))  # 4x4 = 16 patches
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False, ret_attn=True)
    e, (enc, tok), aux = m.apply(v, x, train=False, ret_attn=True)
    assert e.shape == (2, 32)
    assert enc.shape == (2, 384)
    assert tok.shape == (2, 16, 384)
    assert aux["q"].shape == (2, 6, 17, 64)  # heads, T+1, head_dim


def test_swin_contract():
    m = archs.select("swin_normalize", opt())
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 224, 224, 3)), jnp.float32
    )  # 56 -> 28 -> 14 -> 7 token grids
    _, (e, (enc, tok), _) = run(m, x)
    assert e.shape == (1, 32)
    assert enc.shape == (1, 768)
    assert tok.shape == (1, 49, 768)
    np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, rtol=1e-5)


def test_cvt_registry_variants():
    m = archs.select("cvt_13_normalize_frozen", opt())
    assert isinstance(m, archs.CvTNetwork)
    m2 = archs.select("cvt_diml_normalize_frozen", opt())
    assert isinstance(m2, archs.CvTDIML)


def test_netvlad_network():
    m = archs.select("patchnetvlad", opt())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    _, (e, (vg, vl), _) = run(m, x)
    assert e.shape == (1, 64)  # num_pcs
    assert vg.shape == (1, 8 * 512)
    assert isinstance(vl, list) and vl[0].shape[1] == 8 * 512
    np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, rtol=1e-4)


def test_integral_patch_pooling_matches_direct():
    """Box-sum via integral image == direct window mean."""
    from vit_reranking_tpu.models.netvlad import (
        integral_feature,
        square_regions_from_integral,
    )

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))
    out = square_regions_from_integral(integral_feature(f), patch_size=3, stride=2)
    fn = np.asarray(f)
    expect_h = (8 - 3) // 2 + 1
    assert out.shape == (1, 3, expect_h, expect_h)
    for i in range(expect_h):
        for j in range(expect_h):
            ref = fn[:, :, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3].mean((-1, -2))
            np.testing.assert_allclose(np.asarray(out[:, :, i, j]), ref, rtol=1e-4)


def test_netvlad_layer_properties():
    from vit_reranking_tpu.models.netvlad import NetVLAD

    m = NetVLAD(num_clusters=4, dim=16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 3, 3, 16)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    vlad, _ = m.apply(v, x)
    assert vlad.shape == (2, 64)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(vlad, axis=1)), 1.0, rtol=1e-5)
    # local_global consistency: summing local over space == global before norms
    vl, vg = m.apply(v, x, method="local_global")
    assert vl.shape == (2, 64, 3, 3)
    assert vg.shape == (2, 64)
    # pix_map: un-summed residual maps; summing over space must reproduce
    # the unnormalized VLAD (reference netvlad.py:130-146 comment)
    pm = m.apply(v, x, method="pix_map", keep_dim=True)
    assert pm.shape == (2, 4, 16, 3, 3)
    res = m.apply(v, x, method="residuals")
    np.testing.assert_allclose(
        np.asarray(pm.sum((-1, -2))), np.asarray(res.sum(-1)), rtol=1e-5, atol=1e-6
    )
    # cluster_weights: a softmax over clusters at every pixel
    cw = m.apply(v, x, method="cluster_weights")
    assert cw.shape == (2, 4, 3, 3)
    np.testing.assert_allclose(np.asarray(cw.sum(1)), 1.0, rtol=1e-5)


def test_cross_net():
    m = archs.CrossNet(embed_dim=16, dim=32, depth=1)
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, xs, ys)
    xo, yo = m.apply(v, xs, ys)
    assert xo.shape == (2, 16) and yo.shape == (2, 16)


def test_frozen_param_mask():
    m = archs.select("cvt_13_normalize_frozen", opt())
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    mask = archs.frozen_param_mask("cvt_13_normalize_frozen", v["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    froze = [p for p, val in flat if not val]
    train = [p for p, val in flat if val]
    assert froze and train
    assert all("stage0" in str(p) or "stage1" in str(p) for p in froze)


def test_cvt_remat_matches_and_differentiates():
    """remat=True must be numerically identical and differentiable
    (jax.checkpoint recompute, SURVEY section 7 HBM note)."""
    m1 = archs.CvTNetwork(embed_dim=16, remat=True)
    m2 = archs.CvTNetwork(embed_dim=16, remat=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    e1 = m1.apply(v, x, train=False)[0]
    e2 = m2.apply(v, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(m1.apply({"params": p, "batch_stats": v.get("batch_stats", {})}, x, train=False)[0] ** 2))(v["params"])
    assert all(bool(jnp.all(jnp.isfinite(t))) for t in jax.tree.leaves(g))


def test_cvt_bf16_close_to_f32():
    import jax.numpy as jnp2

    m32 = archs.CvTNetwork(embed_dim=16)
    mbf = archs.CvTNetwork(embed_dim=16, dtype=jnp2.bfloat16)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    e32 = m32.apply(v, x, train=False)[0]
    ebf = mbf.apply(v, x, train=False)[0].astype(jnp.float32)
    cos = float(jnp.sum(e32 * ebf, -1)[0])
    assert cos > 0.999, cos


def test_cvt_narrow_sm_contract():
    """narrow_sm (bf16 attention scores/softmax, models/cvt.py::CvTAttention):
    inert in f32 (bit-identical), close to the pinned-f32 softmax in bf16,
    and never touches the ret_attn rollout path (rollout needs f32 probs)."""
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 224, 224, 3)), jnp.float32)
    m32 = archs.CvTNetwork(embed_dim=16)
    m32n = archs.CvTNetwork(embed_dim=16, narrow_sm=True)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert bool(jnp.array_equal(m32.apply(v, x, train=False)[0],
                                m32n.apply(v, x, train=False)[0]))

    mbf = archs.CvTNetwork(embed_dim=16, dtype=jnp.bfloat16)
    mbfn = archs.CvTNetwork(embed_dim=16, dtype=jnp.bfloat16, narrow_sm=True)
    ebf = mbf.apply(v, x, train=False)[0]
    ebfn = mbfn.apply(v, x, train=False)[0]
    cos = float(jnp.sum(ebf * ebfn, -1)[0])
    assert cos > 0.999, cos
    # rollout maps must come from the f32 softmax either way
    a0 = mbf.apply(v, x, train=False, ret_attn=True)[2]["rollout_maps"]
    a1 = mbfn.apply(v, x, train=False, ret_attn=True)[2]["rollout_maps"]
    assert bool(jnp.array_equal(a0, a1))


def test_cvt_diml_bf16_parity():
    """CvTDIML (structural per-patch variant) with bf16 trunk + narrow_sm
    stays close to the f32 forward; the per-patch head output is f32."""
    x = jnp.asarray(np.random.default_rng(7).standard_normal((1, 224, 224, 3)), jnp.float32)
    m32 = archs.CvTDIML(embed_dim=16)
    mbf = archs.CvTDIML(embed_dim=16, dtype=jnp.bfloat16, narrow_sm=True)
    v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    p32, (g32, _), _ = m32.apply(v, x, train=False)
    pbf, (gbf, _), _ = mbf.apply(v, x, train=False)
    assert pbf.dtype == jnp.float32 and gbf.dtype == jnp.float32
    c = np.asarray(jnp.sum(p32 * pbf, -1) / (jnp.linalg.norm(p32, axis=-1)
                                             * jnp.linalg.norm(pbf, axis=-1)))
    assert c.min() > 0.995, c.min()


def test_vit_swin_bf16_parity():
    """bf16 activation compute (f32 norms/softmax) stays close to the f32
    forward for ViT and Swin (verdict item 7; same recipe as models/cvt.py)."""
    import types

    import vit_reranking_tpu.models as archs

    rng = np.random.default_rng(9)
    for arch in ("vit_normalize", "swin_normalize"):
        size = 224 if "swin" in arch else 64  # swin-T merge chain needs 56->28->14->7
        x = jnp.asarray(rng.standard_normal((2, size, size, 3)).astype(np.float32))
        opt32 = types.SimpleNamespace(embed_dim=16, bf16=False)
        opt16 = types.SimpleNamespace(embed_dim=16, bf16=True)
        m32 = archs.select(arch, opt32)
        m16 = archs.select(arch, opt16)
        v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        e32 = m32.apply(v, x, train=False)[0]
        e16 = m16.apply(v, x, train=False)[0]
        assert e16.dtype == jnp.float32  # head output stays f32
        cos = jnp.sum(e32 * e16, -1)
        assert float(cos.min()) > 0.995, (arch, cos)


def test_vit_swin_narrow_sm_contract():
    """narrow_sm for ViT/Swin (bf16 attention scores/softmax, same recipe as
    models/cvt.py): inert in f32 (bit-identical forward), close to the
    pinned-f32 softmax in bf16, and the ViT q/k capture (attention-marginal
    rerank inputs, pre-softmax) is unaffected by the narrowing."""
    import types

    import vit_reranking_tpu.models as archs

    rng = np.random.default_rng(17)
    for arch in ("deit_normalize", "swin_normalize"):
        size = 224 if "swin" in arch else 64
        x = jnp.asarray(rng.standard_normal((2, size, size, 3)).astype(np.float32))
        m32 = archs.select(arch, types.SimpleNamespace(embed_dim=16, bf16=False))
        m32n = archs.select(
            arch, types.SimpleNamespace(embed_dim=16, bf16=False, narrow_sm=True)
        )
        v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        assert bool(jnp.array_equal(m32.apply(v, x, train=False)[0],
                                    m32n.apply(v, x, train=False)[0])), arch

        mbf = archs.select(arch, types.SimpleNamespace(embed_dim=16, bf16=True))
        mbfn = archs.select(
            arch, types.SimpleNamespace(embed_dim=16, bf16=True, narrow_sm=True)
        )
        ebf = mbf.apply(v, x, train=False)[0]
        ebfn = mbfn.apply(v, x, train=False)[0]
        cos = jnp.sum(ebf * ebfn, -1)
        assert float(cos.min()) > 0.995, (arch, cos)

    # ViT q/k (pre-softmax projections) are identical with narrow on/off
    mbf = archs.select("deit_normalize", types.SimpleNamespace(embed_dim=16, bf16=True))
    mbfn = archs.select(
        "deit_normalize", types.SimpleNamespace(embed_dim=16, bf16=True, narrow_sm=True)
    )
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = mbf.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    aux0 = mbf.apply(v, x, train=False, ret_attn=True)[2]
    aux1 = mbfn.apply(v, x, train=False, ret_attn=True)[2]
    assert bool(jnp.array_equal(aux0["q"], aux1["q"]))
    assert bool(jnp.array_equal(aux0["k"], aux1["k"]))


def test_resnet_bf16_parity():
    """bf16 trunk compute for the ResNet family (BN batch stats stay f32 via
    flax _compute_stats; heads/pooling and all returned tensors f32): close
    to the f32 forward for the retrieval wrapper, the DIML per-patch head,
    and the GeM/whitening variant."""
    import types

    import vit_reranking_tpu.models as archs2

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    for arch in ("resnet50_normalize", "resnet50_diml", "irresnet50"):
        m32 = archs2.select(arch, types.SimpleNamespace(embed_dim=16, bf16=False))
        m16 = archs2.select(arch, types.SimpleNamespace(embed_dim=16, bf16=True))
        v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        e32, (g32, t32), _ = m32.apply(v, x, train=False)
        e16, (g16, t16), _ = m16.apply(v, x, train=False)
        assert e16.dtype == jnp.float32 and g16.dtype == jnp.float32
        assert t16.dtype == jnp.float32
        f32 = e32.reshape(2, -1)
        f16 = e16.reshape(2, -1)
        cos = jnp.sum(f32 * f16, -1) / (
            jnp.linalg.norm(f32, axis=-1) * jnp.linalg.norm(f16, axis=-1)
        )
        assert float(cos.min()) > 0.99, (arch, cos)
        # train mode must also run (BN batch-stats path) and mutate stats
        _, mut = m16.apply(
            v, x, train=True, mutable=["batch_stats"],
        )
        assert "batch_stats" in mut


def test_legacy_bf16_parity():
    """Same bf16-trunk recipe for the legacy RevisitDML backbones
    (DenseNet/GoogLeNet/BN-Inception, models/legacy.py): close to the f32
    forward, f32 outputs, BN batch-stats path runs."""
    import types

    import vit_reranking_tpu.models as archs2

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    for arch in ("densenet169_normalize", "googlenet_normalize",
                 "bninception_normalize"):
        m32 = archs2.select(arch, types.SimpleNamespace(embed_dim=16, bf16=False))
        m16 = archs2.select(arch, types.SimpleNamespace(embed_dim=16, bf16=True))
        v = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        e32, (g16_unused, t16u), _ = m32.apply(v, x, train=False)
        e16, (g16, t16), _ = m16.apply(v, x, train=False)
        assert e16.dtype == jnp.float32 and g16.dtype == jnp.float32
        assert t16.dtype == jnp.float32
        cos = jnp.sum(e32 * e16, -1)  # both L2-normalized (_normalize arch)
        assert float(cos.min()) > 0.99, (arch, cos)
        _, mut = m16.apply(v, x, train=True, mutable=["batch_stats"])
        assert "batch_stats" in mut


def test_cvt_fpn_variant():
    """FPN pooling variant (reference cvt.FPNetwork:752-816): selectable via
    the arch string, follows the (embed, (enc_out, token_map), aux) contract."""
    import types

    m = archs.select("cvt_fp_normalize", types.SimpleNamespace(embed_dim=24))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    embed, (enc, tokens), aux = m.apply(v, x, train=False)
    assert embed.shape == (2, 24)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(embed, axis=-1)), 1.0, rtol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(enc)))
