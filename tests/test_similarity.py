"""calc_similarity family tests against torch oracles built from the documented
reference semantics (SURVEY.md section 2.1).  torch (CPU) is a test-only oracle
dependency; the framework itself never imports it on the compute path."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vit_reranking_tpu.ops import (
    calc_distance,
    calc_similarity,
    calc_similarity_featvit,
    calc_similarity_mhvit,
    calc_similarity_rollout,
    global_similarity,
)


def torch_sinkhorn(K, u, v, iters=100, thresh=1e-1):
    r, c = torch.ones_like(u), torch.ones_like(v)
    for _ in range(iters):
        r0 = r
        r = u / torch.einsum("bmn,bn->bm", K, c)
        c = v / torch.einsum("bmn,bm->bn", K, r)
        if (r - r0).abs().mean().item() < thresh:
            break
    return r.unsqueeze(-1) * K * c.unsqueeze(-2)


def torch_calc_similarity_oracle(
    anchor, anchor_center, fb, fb_center, use_uniform=False, use_inverse=False,
    temperature=1.0, use_cls_token=True, ot_temp=0.05, use_minus=False, use_soft=False
):
    """Oracle reimplementation of the stage-1 semantics from the survey."""
    if use_minus:
        use_inverse = False
    if not use_cls_token:
        anchor_center = anchor.mean(dim=1)
        fb_center = fb.mean(dim=-1)
    anchor_center = F.normalize(anchor_center, p=2, dim=-1)
    fb_center = F.normalize(fb_center, p=2, dim=-1)
    N, _, R = fb.shape
    sim = torch.einsum("cm,ncs->nsm", anchor, fb)
    K = torch.exp(-(1.0 - sim) / ot_temp)
    att_u = torch.einsum("c,ncr->nr", anchor_center, fb)
    att_v = torch.einsum("cr,nc->nr", anchor, fb_center)
    if use_uniform:
        u = torch.full((N, R), 1.0 / R)
        v = torch.full((N, R), 1.0 / R)
    elif use_minus:
        u = 1 - F.relu(att_u)
        u = u / (u.sum(1, keepdim=True) + 1e-5)
        v = 1 - F.relu(att_v)
        v = v / (v.sum(1, keepdim=True) + 1e-5)
    elif use_inverse:
        u = torch.exp(-F.relu(att_u) / temperature)
        u = u / (u.sum(1, keepdim=True) + 1e-5)
        v = torch.exp(-F.relu(att_v) / temperature)
        v = v / (v.sum(1, keepdim=True) + 1e-5)
    elif use_soft:
        u = F.softmax(att_u, -1)
        u = u / (u.sum(1, keepdim=True) + 1e-5)
        v = F.softmax(att_v, -1)
        v = v / (v.sum(1, keepdim=True) + 1e-5)
    else:
        u = F.relu(att_u)
        u = u / (u.sum(1, keepdim=True) + 1e-5)
        v = F.relu(att_v)
        v = v / (v.sum(1, keepdim=True) + 1e-5)
    T = torch_sinkhorn(K, u, v)
    return torch.sum(T * sim, dim=(1, 2))


def make_features(rng, n=10, c=16, r=49):
    anchor = rng.standard_normal((c, r)).astype(np.float32)
    anchor /= np.linalg.norm(anchor, axis=0, keepdims=True)
    fb = rng.standard_normal((n, c, r)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    ac = rng.standard_normal((c,)).astype(np.float32)
    ac /= np.linalg.norm(ac)
    fc = rng.standard_normal((n, c)).astype(np.float32)
    fc /= np.linalg.norm(fc, axis=-1, keepdims=True)
    return anchor, ac, fb, fc


def test_stage0_is_inner_product():
    rng = np.random.default_rng(0)
    _, ac, _, fc = make_features(rng)
    sim, aux = calc_similarity(None, jnp.asarray(ac), None, jnp.asarray(fc), stage=0)
    assert aux is None
    np.testing.assert_allclose(np.asarray(sim), fc @ ac, rtol=1e-5)


@pytest.mark.parametrize(
    "flags",
    [
        dict(),
        dict(use_uniform=True),
        dict(use_inverse=True, temperature=0.1),
        dict(use_minus=True),
        dict(use_soft=True),
        dict(use_cls_token=False),
    ],
)
def test_stage1_matches_torch_oracle(flags):
    rng = np.random.default_rng(42)
    use_cls_token = flags.pop("use_cls_token", True)
    anchor, ac, fb, fc = make_features(rng, n=8, c=12, r=9)
    sim, aux = calc_similarity(
        jnp.asarray(anchor), jnp.asarray(ac), jnp.asarray(fb), jnp.asarray(fc),
        stage=1, use_cls_token=use_cls_token, **flags,
    )
    ref = torch_calc_similarity_oracle(
        torch.tensor(anchor), torch.tensor(ac), torch.tensor(fb), torch.tensor(fc),
        use_cls_token=use_cls_token, **flags,
    )
    np.testing.assert_allclose(np.asarray(sim), ref.numpy(), rtol=2e-3, atol=2e-4)


def test_stage1_mean_center_path():
    rng = np.random.default_rng(7)
    anchor, ac, fb, fc = make_features(rng, n=6, c=8, r=4)
    sim, _ = calc_similarity(
        jnp.asarray(anchor), jnp.asarray(ac), jnp.asarray(fb), jnp.asarray(fc),
        stage=1, use_cls_token=False,
    )
    ref = torch_calc_similarity_oracle(
        torch.tensor(anchor), torch.tensor(ac), torch.tensor(fb), torch.tensor(fc),
        use_cls_token=False,
    )
    np.testing.assert_allclose(np.asarray(sim), ref.numpy(), rtol=2e-3, atol=2e-4)


def test_rollout_marginals():
    rng = np.random.default_rng(3)
    anchor, ac, fb, fc = make_features(rng, n=5, c=8, r=9)
    a_roll = rng.uniform(-0.2, 1.0, (9,)).astype(np.float32)
    f_roll = rng.uniform(-0.2, 1.0, (5, 9)).astype(np.float32)
    sim, aux = calc_similarity_rollout(
        jnp.asarray(ac), jnp.asarray(anchor), jnp.asarray(a_roll),
        jnp.asarray(fc), jnp.asarray(fb), jnp.asarray(f_roll), stage=1,
    )
    # oracle: u = relu(fb_rollout)/sum, v = relu(anchor_rollout)/sum
    S = torch.einsum("cm,ncs->nsm", torch.tensor(anchor), torch.tensor(fb))
    K = torch.exp(-(1 - S) / 0.05)
    u = F.relu(torch.tensor(f_roll))
    u = u / (u.sum(1, keepdim=True) + 1e-5)
    v = F.relu(torch.tensor(a_roll)).expand(5, -1)
    v = v / (v.sum(1, keepdim=True) + 1e-5)
    T = torch_sinkhorn(K, u, v)
    ref = torch.sum(T * S, dim=(1, 2))
    np.testing.assert_allclose(np.asarray(sim), ref.numpy(), rtol=2e-3, atol=2e-4)
    # partial OT path shape: extended plan returned in aux
    sim_p, aux_p = calc_similarity_rollout(
        jnp.asarray(ac), jnp.asarray(anchor), jnp.asarray(a_roll),
        jnp.asarray(fc), jnp.asarray(fb), jnp.asarray(f_roll), stage=1, ot_part=0.5,
    )
    assert aux_p.T.shape == (5, 10, 10)
    assert np.all(np.isfinite(np.asarray(sim_p)))


def test_featvit_cls_split():
    rng = np.random.default_rng(5)
    n, c, rp1 = 6, 8, 10
    a = rng.standard_normal((c, rp1)).astype(np.float32)
    a /= np.linalg.norm(a, axis=0, keepdims=True)
    f = rng.standard_normal((n, c, rp1)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    sim0, _ = calc_similarity_featvit(jnp.asarray(a), jnp.asarray(f), stage=0)
    np.testing.assert_allclose(np.asarray(sim0), f[:, :, 0] @ a[:, 0], rtol=1e-5)
    sim1, aux = calc_similarity_featvit(jnp.asarray(a), jnp.asarray(f), stage=1)
    assert sim1.shape == (n,)
    assert np.all(np.isfinite(np.asarray(sim1)))


def test_mhvit_runs_and_is_finite():
    rng = np.random.default_rng(6)
    nhead, ndim, r = 4, 8, 9
    c = nhead * ndim
    a = rng.standard_normal((c, r + 1)).astype(np.float32)
    a /= np.linalg.norm(a, axis=0, keepdims=True)
    f = rng.standard_normal((5, c, r + 1)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    sim, _ = calc_similarity_mhvit(jnp.asarray(a), jnp.asarray(f), stage=1, nhead=nhead)
    assert sim.shape == (5,)
    assert np.all(np.isfinite(np.asarray(sim)))


def test_calc_distance_stage0():
    rng = np.random.default_rng(8)
    ac = rng.standard_normal((16,)).astype(np.float32)
    fc = rng.standard_normal((7, 16)).astype(np.float32)
    d, _ = calc_distance(None, jnp.asarray(ac), None, jnp.asarray(fc), stage=0)
    ref = np.sqrt(((ac[None] - fc) ** 2).sum(-1) + 1e-6)
    np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-5)


def test_calc_distance_stage1_finite_and_shape():
    rng = np.random.default_rng(9)
    anchor, ac, fb, fc = make_features(rng, n=4, c=8, r=9)
    d, aux = calc_distance(
        jnp.asarray(anchor), jnp.asarray(ac), jnp.asarray(fb), jnp.asarray(fc),
        stage=1, use_cls_token=True,
    )
    assert d.shape == (4,)
    assert np.all(np.isfinite(np.asarray(d)))


def test_calc_distance_stage1_matches_torch_oracle():
    """OT-weighted L2 distance (reference diml.py:149-203): 'cm,ncs->nms'
    orientation, Sinkhorn(K, v, u) order, exp/relu/uniform marginal variants.
    Full trip count on both sides so only the math is under test."""
    rng = np.random.default_rng(21)
    N, C, R = 5, 16, 9
    anchor = rng.standard_normal((C, R)).astype(np.float32)
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    ac = rng.standard_normal((C,)).astype(np.float32)
    fc = rng.standard_normal((N, C)).astype(np.float32)

    def torch_oracle(use_uniform, use_exp, use_cls_token, temperature=1.0):
        a = torch.tensor(anchor); f = torch.tensor(fb)
        a_c = torch.tensor(ac); f_c = torch.tensor(fc)
        if not use_cls_token:
            a_c, f_c = a.mean(-1), f.mean(-1)
        a_c, f_c = F.normalize(a_c, dim=-1), F.normalize(f_c, dim=-1)
        a, f = F.normalize(a, dim=0), F.normalize(f, dim=1)
        sim = torch.einsum("cm,ncs->nms", a, f)
        d1 = torch.sqrt(((a[None, :, :, None] - f[:, :, None, :]) ** 2).sum(1) + 1e-6)
        K = torch.exp(-(1.0 - sim) / 0.05)
        if use_uniform:
            u = torch.full((N, R), 1.0 / R); v = torch.full((N, R), 1.0 / R)
        else:
            att = F.relu(torch.einsum("c,ncr->nr", a_c, f))
            att = torch.exp(-att / temperature) if use_exp else att
            u = att / (att.sum(1, keepdims=True) + 1e-5)
            att = F.relu(torch.einsum("cr,nc->nr", a, f_c))
            att = torch.exp(-att / temperature) if use_exp else att
            v = att / (att.sum(1, keepdims=True) + 1e-5)
        T = torch_sinkhorn(K, v, u, thresh=0.0)
        return torch.sum(T * d1, dim=(1, 2)).numpy()

    for kw in (dict(use_uniform=True, use_exp=True, use_cls_token=False),
               dict(use_uniform=False, use_exp=True, use_cls_token=False),
               dict(use_uniform=False, use_exp=False, use_cls_token=False),
               dict(use_uniform=False, use_exp=True, use_cls_token=True)):
        ours, _ = calc_distance(
            jnp.asarray(anchor), jnp.asarray(ac), jnp.asarray(fb),
            jnp.asarray(fc), stage=1, thresh=0.0, **kw,
        )
        np.testing.assert_allclose(np.asarray(ours), torch_oracle(**kw),
                                   atol=2e-4, err_msg=str(kw))


def test_mhvit_matches_torch_per_head_loop():
    """Per-head OT with max-over-heads (reference diml.py:424-472): the
    batched N*heads Sinkhorn equals the reference's per-head Python loop at
    full trip count."""
    rng = np.random.default_rng(22)
    nhead, ndim, R, N = 4, 8, 9, 5
    C = nhead * ndim
    a_feat = rng.standard_normal((C, R + 1)).astype(np.float32)
    f_feat = rng.standard_normal((N, C, R + 1)).astype(np.float32)
    a_feat /= np.linalg.norm(a_feat, axis=0, keepdims=True)
    f_feat /= np.linalg.norm(f_feat, axis=1, keepdims=True)

    ours, _ = calc_similarity_mhvit(
        jnp.asarray(a_feat), jnp.asarray(f_feat), stage=1, nhead=nhead, thresh=0.0
    )

    at, ft = torch.tensor(a_feat), torch.tensor(f_feat)
    a_c, f_c = at[:, 0], ft[:, :, 0]
    a, f = at[:, 1:], ft[:, :, 1:]
    a = a.reshape(nhead, ndim, R); f = f.reshape(N, nhead, ndim, R)
    a_c = a_c.reshape(nhead, ndim); f_c = f_c.reshape(N, nhead, ndim)
    sim = torch.einsum("hdm,nhds->nhsm", a, f)
    K = torch.exp(-(1 - sim) / 0.05)
    att = F.relu(torch.einsum("hd,nhdr->nhr", a_c, f))
    u = att / (att.sum(2, keepdims=True) + 1e-5)
    att = F.relu(torch.einsum("hdr,nhd->nhr", a, f_c))
    v = att / (att.sum(2, keepdims=True) + 1e-5)
    per_head = []
    for h in range(nhead):
        T = torch_sinkhorn(K[:, h], u[:, h], v[:, h], thresh=0.0)
        per_head.append(T * sim[:, h])
    ref = torch.stack(per_head).max(0).values.sum(dim=(1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_featvit_stage1_matches_torch_oracle():
    """featvit OT similarity (reference diml.py:368-422): default
    cross-attention, use_self, and uniform marginals."""
    rng = np.random.default_rng(23)
    n, c, R = 6, 12, 9
    a = rng.standard_normal((c, R + 1)).astype(np.float32)
    a /= np.linalg.norm(a, axis=0, keepdims=True)
    f = rng.standard_normal((n, c, R + 1)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    at, ft = torch.tensor(a), torch.tensor(f)

    def torch_oracle(use_uniform=False, use_self=False):
        a_c, f_c = at[:, 0], ft[:, :, 0]
        an, fb = at[:, 1:], ft[:, :, 1:]
        sim = torch.einsum("cm,ncs->nsm", an, fb)
        K = torch.exp(-(1 - sim) / 0.05)
        if use_uniform:
            u = torch.full((n, R), 1.0 / R); v = torch.full((n, R), 1.0 / R)
        elif use_self:
            u = F.relu(torch.einsum("nc,ncr->nr", f_c, fb))
            u = u / (u.sum(1, keepdims=True) + 1e-5)
            v = F.relu(torch.einsum("c,cr->r", a_c, an)).view(1, R)
            v = (v / (v.sum(1, keepdims=True) + 1e-5)).expand(n, -1)
        else:
            u = F.relu(torch.einsum("c,ncr->nr", a_c, fb))
            u = u / (u.sum(1, keepdims=True) + 1e-5)
            v = F.relu(torch.einsum("cr,nc->nr", an, f_c))
            v = v / (v.sum(1, keepdims=True) + 1e-5)
        T = torch_sinkhorn(K, u, v, thresh=0.0)
        return torch.sum(T * sim, dim=(1, 2)).numpy()

    for kw in (dict(), dict(use_uniform=True), dict(use_self=True)):
        ours, _ = calc_similarity_featvit(
            jnp.asarray(a), jnp.asarray(f), stage=1, thresh=0.0, **kw
        )
        np.testing.assert_allclose(np.asarray(ours), torch_oracle(**kw),
                                   atol=2e-4, err_msg=str(kw))


def test_mhvit_matches_torch_oracle():
    """Per-head OT with elementwise max-over-heads of T*S (reference
    diml.py:424-472, dormant there; wired behind --use_mh).  Full trip count
    on both sides so only the math is under test."""
    rng = np.random.default_rng(31)
    nhead, ndim, R, N = 4, 8, 9, 5
    C = nhead * ndim
    a_feat = rng.standard_normal((C, R + 1)).astype(np.float32)
    f_feat = rng.standard_normal((N, C, R + 1)).astype(np.float32)

    def oracle(use_uniform):
        af = torch.tensor(a_feat)
        ff = torch.tensor(f_feat)
        ac = af[:, 0].reshape(nhead, ndim)
        fc = ff[:, :, 0].reshape(N, nhead, ndim)
        a = af[:, 1:].reshape(nhead, ndim, R)
        f = ff[:, :, 1:].reshape(N, nhead, ndim, R)
        sim = torch.einsum("hdm,nhds->nhsm", a, f)
        K = torch.exp(-(1 - sim) / 0.05)
        if use_uniform:
            u = torch.full((N, nhead, R), 1.0 / R)
            v = torch.full((N, nhead, R), 1.0 / R)
        else:
            att = F.relu(torch.einsum("hd,nhdr->nhr", ac, f))
            u = att / (att.sum(2, keepdims=True) + 1e-5)
            att = F.relu(torch.einsum("hdr,nhd->nhr", a, fc))
            v = att / (att.sum(2, keepdims=True) + 1e-5)
        per_head = []
        for i in range(nhead):
            T = torch_sinkhorn(K[:, i], u[:, i], v[:, i], thresh=0.0)
            per_head.append(T * sim[:, i])
        stacked = torch.stack(per_head)  # (h, N, R, R)
        return stacked.max(0).values.sum((1, 2)).numpy()

    for uni in (False, True):
        ours, _ = calc_similarity_mhvit(
            jnp.asarray(a_feat), jnp.asarray(f_feat), stage=1,
            use_uniform=uni, nhead=nhead, thresh=0.0,
        )
        np.testing.assert_allclose(np.asarray(ours), oracle(uni), rtol=2e-4, atol=2e-5)
