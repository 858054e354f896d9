"""Legacy backbones + cross-attention losses."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vit_reranking_tpu.models as archs
import vit_reranking_tpu.losses as losses
import vit_reranking_tpu.miners as miners


def opt(**kw):
    base = dict(embed_dim=16, n_classes=4, lr=1e-4, arch="x_normalize",
                grid_size=7, blk_ind=0)
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.mark.parametrize("arch", ["densenet169_normalize", "googlenet_normalize",
                                  "bninception_double_normalize"])
def test_legacy_backbones(arch):
    m = archs.select(arch, opt())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    e, (enc, tok), _ = m.apply(v, x, train=False)
    assert e.shape == (1, 16)
    np.testing.assert_allclose(float(jnp.linalg.norm(e)), 1.0, rtol=1e-4)
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert n > 1e6


def test_densenet169_feature_dim():
    m = archs.select("densenet169", opt())
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    _, (enc, _), _ = m.apply(v, x, train=False)
    assert enc.shape == (1, 1664)  # densenet169 final features


def test_margin_cross_embed():
    o = opt(loss_margin_margin=0.2, loss_margin_beta_constant=False,
            loss_margin_beta=1.2, loss_margin_beta_lr=5e-4, cat_global=False,
            miner_distance_lower_cutoff=0.5, miner_distance_upper_cutoff=1.4)
    miner = miners.select("distance", o)
    crit, groups = losses.select("margin_cross_embed", o, miner)
    params = crit.init_params(jax.random.PRNGKey(0))

    cross = archs.CrossNet(embed_dim=16, dim=32, depth=1)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((8, 10, 32)).astype(np.float32))
    cv = cross.init({"params": jax.random.PRNGKey(1)}, tokens[:1], tokens[:1])
    embeds = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    embeds = embeds / jnp.linalg.norm(embeds, axis=-1, keepdims=True)
    labels = jnp.asarray(np.arange(8) % 4)

    def cross_apply(xs, ys):
        return cross.apply(cv, xs, ys)

    loss, g = jax.value_and_grad(
        lambda e: crit(params, e, labels, key=jax.random.PRNGKey(2),
                       batch=tokens, cross_apply=cross_apply)
    )(embeds)
    assert np.isfinite(float(loss))


def test_margin_cross_diml():
    o = opt(loss_margin_margin=0.2, loss_margin_beta_constant=True,
            loss_margin_beta=1.2, use_uniform=True,
            miner_distance_lower_cutoff=0.5, miner_distance_upper_cutoff=1.4)
    miner = miners.select("distance", o)
    crit, _ = losses.select("margin_cross_diml", o, miner)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((8, 3, 3, 12)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 4)

    def cross_apply(xs, ys):
        # identity "rescorer" with matching (B, C, R) output contract
        return xs, ys

    loss = crit({}, None, labels, key=jax.random.PRNGKey(0),
                batch=feats, cross_apply=cross_apply)
    assert np.isfinite(float(loss))


def test_calc_similarity_cross():
    from vit_reranking_tpu.models.vit import calc_similarity_cross

    cross = archs.CrossNet(embed_dim=8, dim=16, depth=1)
    rng = np.random.default_rng(3)
    anchor = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    fb = jnp.asarray(rng.standard_normal((5, 6, 16)).astype(np.float32))
    cv = cross.init({"params": jax.random.PRNGKey(0)}, fb, fb)
    sims = calc_similarity_cross(anchor, fb, lambda a, b: cross.apply(cv, a, b))
    assert sims.shape == (5,)
    assert np.all(np.isfinite(np.asarray(sims)))
