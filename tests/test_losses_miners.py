"""Loss + miner tests: distribution sanity for miners, value checks vs torch
oracles for the core losses, smoke + gradient checks for the full registry."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

import vit_reranking_tpu.miners as miners
import vit_reranking_tpu.losses as losses


def make_opt(**kw):
    base = dict(
        n_classes=10, embed_dim=16, lr=1e-5, loss="margin", arch="resnet50_normalize",
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def make_batch(rng, B=16, C=16, n_classes=4, normalize=True):
    emb = rng.standard_normal((B, C)).astype(np.float32)
    if normalize:
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    labels = np.arange(B) % n_classes  # SPC-4
    return jnp.asarray(emb), jnp.asarray(labels)


# ---------------------------------------------------------------- miners


def test_distance_miner_distribution():
    """Negatives must follow the inverse-sphere distribution: empirically the
    per-negative frequency over many keys matches q_d_inv."""
    rng = np.random.default_rng(0)
    emb, labels = make_batch(rng, B=8, n_classes=2)
    m = miners.select("distance", make_opt())

    # oracle distribution for anchor 0 (reference distance.py:51-66)
    e = torch.tensor(np.asarray(emb))
    prod = e @ e.T
    nrm = prod.diag().unsqueeze(1).expand_as(prod)
    d = (nrm + nrm.T - 2 * prod).clamp(min=0).sqrt().clamp(min=0.5)
    lab = np.asarray(labels)
    dim = 128
    log_q = (2.0 - dim) * torch.log(d[0]) - ((dim - 3) / 2) * torch.log(1 - 0.25 * d[0] ** 2)
    log_q[lab == lab[0]] = 0
    q = torch.exp(log_q - log_q.max())
    q[lab == lab[0]] = 0
    q = (q / q.sum()).numpy()

    draws = np.zeros(8)
    n = 4000
    batched = jax.jit(jax.vmap(lambda k: m(k, emb, labels).negative[0]))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    negs = np.asarray(batched(keys))
    for i in range(8):
        draws[i] = np.mean(negs == i)
    np.testing.assert_allclose(draws, q, atol=0.03)
    # positives always same class, never produce cross-class pairs
    t = m(jax.random.PRNGKey(1), emb, labels)
    assert np.all(np.asarray(labels)[np.asarray(t.positive)] == np.asarray(labels))
    assert np.all(np.asarray(labels)[np.asarray(t.negative)] != np.asarray(labels))


@pytest.mark.parametrize("name", sorted(miners.BATCHMINING_METHODS))
def test_all_miners_produce_valid_output(name):
    rng = np.random.default_rng(1)
    emb, labels = make_batch(rng, B=12, n_classes=3)
    opt = make_opt(loss="triplet", loss_triplet_margin=0.2)
    m = miners.select(name, opt)
    out = m(jax.random.PRNGKey(0), emb, labels)
    B = emb.shape[0]
    lab = np.asarray(labels)
    if isinstance(out, miners.Triplets):
        a, p, n, v = map(np.asarray, out)
        assert a.shape == p.shape == n.shape == (B,)
        if name not in ("rho_distance", "random_distance", "intra_random"):
            assert np.all(lab[p[v]] == lab[a[v]])
            assert np.all(lab[n[v]] != lab[a[v]])
    else:
        assert isinstance(out, miners.TupleSets)
        a, p, pm, nm, v = out
        assert np.asarray(pm).shape == (B, B)


# ---------------------------------------------------------------- losses


class FixedMiner:
    """Deterministic miner for loss value comparisons."""

    name = "distance"

    def __init__(self, triplets):
        self.t = triplets

    def __call__(self, key, batch, labels):
        a, p, n = self.t
        return miners.Triplets(
            jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
            jnp.ones((len(a),), bool),
        )


def test_margin_loss_matches_torch_oracle():
    rng = np.random.default_rng(2)
    emb, labels = make_batch(rng, B=12, n_classes=3)
    trips = ([0, 1, 2, 3], [3, 4, 5, 6], [1, 2, 3, 4])
    # force valid triplets: positive same class, negative different
    lab = np.asarray(labels)
    a = list(range(12))
    p = [int(np.where((lab == lab[i]) & (np.arange(12) != i))[0][0]) for i in a]
    n = [int(np.where(lab != lab[i])[0][0]) for i in a]

    opt = make_opt(
        loss_margin_margin=0.2, loss_margin_nu=0.0,
        loss_margin_beta_constant=False, loss_margin_beta=1.2,
        loss_margin_beta_lr=5e-4, n_classes=3,
    )
    crit, groups = losses.select("margin", opt, FixedMiner((a, p, n)))
    params = crit.init_params(jax.random.PRNGKey(0))
    loss = crit(params, emb, labels, key=jax.random.PRNGKey(0))

    # torch oracle (reference margin.py:39-73 semantics)
    e = torch.tensor(np.asarray(emb))
    beta = torch.ones(3) * 1.2
    d_ap = torch.stack([((e[i] - e[j]).pow(2).sum() + 1e-8).pow(0.5) for i, j in zip(a, p)])
    d_an = torch.stack([((e[i] - e[j]).pow(2).sum() + 1e-8).pow(0.5) for i, j in zip(a, n)])
    b = beta[torch.tensor(lab[a])]
    pos_l = F.relu(d_ap - b + 0.2)
    neg_l = F.relu(b - d_an + 0.2)
    cnt = ((pos_l > 0) | (neg_l > 0)).float().sum()
    ref = (pos_l + neg_l).sum() / cnt if cnt > 0 else (pos_l + neg_l).sum()
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


def test_multisimilarity_matches_torch_oracle():
    rng = np.random.default_rng(3)
    emb, labels = make_batch(rng, B=16, n_classes=4)
    opt = make_opt()
    crit, _ = losses.select("multisimilarity", opt, None)
    loss = crit({}, emb, labels)

    e = torch.tensor(np.asarray(emb))
    lab = torch.tensor(np.asarray(labels))
    sim = e @ e.T
    vals = []
    for i in range(16):
        pos = lab == lab[i]
        pos[i] = False
        neg = lab != lab[i]
        aps, ans = sim[i][pos], sim[i][neg]
        keep_n = (ans + 0.1) > aps.min()
        keep_p = (aps - 0.1) < ans.max()
        if not keep_n.sum() or not keep_p.sum():
            continue
        aps, ans = aps[keep_p], ans[keep_n]
        pt = 1 / 2.0 * torch.log(1 + torch.sum(torch.exp(-2.0 * (aps - 0.5))))
        nt = 1 / 40.0 * torch.log(1 + torch.sum(torch.exp(40.0 * (ans - 0.5))))
        vals.append(pt + nt)
    ref = torch.stack(vals).mean()
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


ALL_SIMPLE_LOSSES = [
    "triplet", "margin", "contrastive", "snr", "quadruplet",
    "multisimilarity", "histogram", "softmax", "arcface",
    "softtriplet", "proxynca",
]


@pytest.mark.parametrize("name", ALL_SIMPLE_LOSSES)
def test_loss_smoke_and_grads(name):
    rng = np.random.default_rng(4)
    emb, labels = make_batch(rng, B=16, n_classes=4)
    opt = make_opt(n_classes=4)
    cls = losses.LOSSES[name]
    miner = miners.select("distance", opt) if cls.REQUIRES_BATCHMINER else None
    crit, groups = losses.select(name, opt, miner)
    params = crit.init_params(jax.random.PRNGKey(0))

    def f(e, p):
        return crit(p, e, labels, key=jax.random.PRNGKey(1))

    loss, grads = jax.value_and_grad(f)(emb, params)
    assert np.isfinite(float(loss)), name
    assert np.all(np.isfinite(np.asarray(grads))), name


@pytest.mark.parametrize("name", ["npair", "angular", "lifted"])
def test_tuple_losses_smoke(name):
    rng = np.random.default_rng(5)
    emb, labels = make_batch(rng, B=16, n_classes=4, normalize=False)
    emb = emb / 4.0
    opt = make_opt(n_classes=4)
    allowed = losses.LOSSES[name].ALLOWED_MINING_OPS[0]
    miner = miners.select(allowed, opt)
    crit, _ = losses.select(name, opt, miner)
    loss, grads = jax.value_and_grad(lambda e: crit({}, e, labels, key=jax.random.PRNGKey(0)))(emb)
    assert np.isfinite(float(loss)), name
    assert np.all(np.isfinite(np.asarray(grads))), name


def test_diml_losses_smoke():
    rng = np.random.default_rng(6)
    B, g, C = 8, 3, 16
    feats = jnp.asarray(rng.standard_normal((B, g, g, C)).astype(np.float32))
    cls_tok = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
    labels = jnp.asarray(np.arange(B) % 4)
    opt = make_opt(
        n_classes=4, use_uniform=False, use_inverse=False, use_cls_token=True,
        temperature=0.1,
    )
    miner = miners.select("distance", opt)
    crit, _ = losses.select("margin_diml", opt, miner)
    params = crit.init_params(jax.random.PRNGKey(0))
    loss, grads = jax.value_and_grad(
        lambda f: crit(params, f, labels, key=jax.random.PRNGKey(1), class_token=cls_tok)
    )(feats)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grads)))

    opt2 = make_opt(n_classes=4, use_uniform=True)
    crit2, _ = losses.select("multisimilarity_diml", opt2, None)
    loss2 = crit2({}, feats, labels)
    assert np.isfinite(float(loss2))


def test_adversarial_separation_reverses_grads():
    opt = make_opt(embed_dim=16)
    crit, _ = losses.select("adversarial_separation", opt, None)
    params = crit.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    f1 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    loss, g = jax.value_and_grad(
        lambda a: crit(params, {"embed1": a, "embed2": f2})
    )(f1)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(g)))


def test_semihard_picks_the_unique_violator():
    """With exactly one semi-hard negative per anchor (reference
    semihard.py:27-33 window d_ap < d_an < d_ap + margin), the miner must
    select it; anchors with no violator fall back to any negative."""
    emb = jnp.asarray(np.array([[0.0], [0.1], [0.25], [1.0]], np.float32))
    labels = jnp.asarray(np.array([0, 0, 1, 1]))
    m = miners.select("semihard", make_opt(loss="triplet", loss_triplet_margin=0.2))
    for seed in range(8):
        t = m(jax.random.PRNGKey(seed), emb, labels)
        n = np.asarray(t.negative)
        assert n[0] == 2  # d_ap=0.1, only d(0,2)=0.25 in (0.1, 0.3)
        assert n[1] == 2  # d_ap=0.1, only d(1,2)=0.15 in (0.1, 0.3)
        assert n[2] in (0, 1)  # no semihard in (0.75, 0.95) -> any negative
        assert n[3] == 1  # d_ap=0.75, only d(3,1)=0.9 in (0.75, 0.95)


def test_inverse_sphere_log_q_exact_all_anchors():
    """softmax(inverse_sphere_log_q) equals the reference q_d_inv
    (batchminer/distance.py:51-66) exactly for every anchor, including the
    quirk that zeroed same-class entries participate in the max."""
    from vit_reranking_tpu.miners.common import inverse_sphere_log_q, pdist

    rng = np.random.default_rng(2)
    emb, labels = make_batch(rng, B=10, n_classes=3)
    lab = np.asarray(labels)
    d = np.maximum(np.asarray(pdist(emb)), 0.5)
    same = lab[:, None] == lab[None, :]
    ours = np.asarray(jax.nn.softmax(
        inverse_sphere_log_q(jnp.asarray(d), jnp.asarray(same), dim=128), axis=-1
    ))
    dim = 128
    for i in range(10):
        di = torch.tensor(d[i])
        log_q = (2.0 - dim) * torch.log(di) - ((dim - 3) / 2) * torch.log(1 - 0.25 * di**2)
        log_q[lab == lab[i]] = 0
        q = torch.exp(log_q - log_q.max())
        q[lab == lab[i]] = 0
        q = (q / q.sum()).numpy()
        np.testing.assert_allclose(ours[i], q, atol=1e-6)


def test_softhard_masks_match_reference_window():
    """Crafted 1-D batch where the softhard masks (reference
    softhard.py:27-33: neg with d < max pos-dist, pos with d > min neg-dist)
    are singletons -> the draw is forced."""
    emb = jnp.asarray(np.array([[0.0], [0.1], [0.6], [0.3], [2.0]], np.float32))
    labels = jnp.asarray(np.array([0, 0, 0, 1, 1]))
    m = miners.select("softhard", make_opt())
    for seed in range(6):
        t = m(jax.random.PRNGKey(seed), emb, labels)
        p, n = np.asarray(t.positive), np.asarray(t.negative)
        # anchor 0: hard positives {2} (0.6 > min_neg 0.3), hard negatives {3}
        assert p[0] == 2 and n[0] == 3
        # anchor 4: hard positives {3} (1.7 > min_neg 1.4), hard negatives {2}
        assert p[4] == 3 and n[4] == 2
        # anchor 3: unique positive 4; all negatives are hard
        assert p[3] == 4 and n[3] in (0, 1, 2)
