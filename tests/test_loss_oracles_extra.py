"""Value-parity of multisimilarity / lifted / contrastive / triplet losses vs
direct torch transcriptions of the reference semantics
(criteria/multisimilarity.py:28-56, lifted.py:28-40, contrastive.py:27-38,
triplet.py:24-33).  The mined tuples are pinned so both sides see the exact
same pairs; only the loss arithmetic is under test."""

import types

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

import vit_reranking_tpu.losses as losses
from vit_reranking_tpu.miners.common import Triplets, TupleSets


def make_batch(seed=0, B=12, C=8, n_classes=3):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((B, C)).astype(np.float32) / 4
    labels = np.arange(B) % n_classes
    return emb, labels


def make_opt(**kw):
    base = dict(
        n_classes=3, embed_dim=8, lr=1e-4, arch="resnet",
        loss_multisimilarity_pos_weight=2.0,
        loss_multisimilarity_neg_weight=40.0,
        loss_multisimilarity_margin=0.1,
        loss_multisimilarity_thresh=0.5,
        loss_lifted_neg_margin=1.0, loss_lifted_l2=0.005,
        loss_contrastive_pos_margin=0.0, loss_contrastive_neg_margin=1.0,
        loss_triplet_margin=0.2,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def fixed_triplets(labels):
    """One deterministic (a, p, n) per batch element."""
    B = len(labels)
    trips = []
    for i in range(B):
        same = [j for j in range(B) if labels[j] == labels[i] and j != i]
        diff = [j for j in range(B) if labels[j] != labels[i]]
        trips.append((i, same[0], diff[0]))
    return trips


class FixedTripletMiner:
    name = "distance"

    def __init__(self, trips):
        self.trips = trips

    def __call__(self, key, batch, labs):
        a, p, n = zip(*self.trips)
        B = len(self.trips)
        return Triplets(
            jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), jnp.ones((B,), bool)
        )


def test_multisimilarity_matches_torch_loop():
    emb, labels = make_batch()
    crit, _ = losses.select("multisimilarity", make_opt())
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e = torch.tensor(emb)
    sim = e.mm(e.T)
    pw, nw, margin, thresh = 2.0, 40.0, 0.1, 0.5
    terms = []
    for i in range(len(e)):
        pos_idxs = torch.tensor(labels == labels[i])
        pos_idxs[i] = False
        neg_idxs = torch.tensor(labels != labels[i])
        aps, ans = sim[i][pos_idxs], sim[i][neg_idxs]
        keep_n = (ans + margin) > torch.min(aps)
        keep_p = (aps - margin) < torch.max(ans)
        if not torch.sum(keep_n) or not torch.sum(keep_p):
            continue
        aps, ans = aps[keep_p], ans[keep_n]
        pos_term = 1.0 / pw * torch.log(1 + torch.sum(torch.exp(-pw * (aps - thresh))))
        neg_term = 1.0 / nw * torch.log(1 + torch.sum(torch.exp(nw * (ans - thresh))))
        terms.append(pos_term + neg_term)
    ref = float(torch.mean(torch.stack(terms)))
    assert abs(ours - ref) < 1e-5


def test_lifted_matches_torch_loop():
    emb, labels = make_batch()
    B = len(labels)
    pos_mask = (labels[None, :] == labels[:, None]) & ~np.eye(B, dtype=bool)
    neg_mask = labels[None, :] != labels[:, None]

    class FixedLiftedMiner:
        name = "lifted"

        def __call__(self, key, batch, labs):
            return TupleSets(
                jnp.arange(B), jnp.arange(B),
                jnp.asarray(pos_mask), jnp.asarray(neg_mask), jnp.ones((B,), bool),
            )

    crit, _ = losses.select("lifted", make_opt(), FixedLiftedMiner())
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    # torch transcription: per-anchor logsumexp over euclidean distances to
    # the positive/negative sets (the reference's PairwiseDistance call
    # reduces over the channel dim — old-torch dim=1 semantics).
    e = torch.tensor(emb)
    margin, l2w = 1.0, 0.005
    terms = []
    for i in range(B):
        d = torch.norm(e[i][None, :] - e, p=2, dim=1)
        pos_term = torch.logsumexp(d[torch.tensor(pos_mask[i])], dim=0)
        neg_term = torch.logsumexp(margin - d[torch.tensor(neg_mask[i])], dim=0)
        terms.append(F.relu(pos_term + neg_term))
    ref = float(torch.mean(torch.stack(terms)) + l2w * torch.mean(torch.norm(e, p=2, dim=1)))
    assert abs(ours - ref) < 1e-4


def test_contrastive_matches_torch():
    emb, labels = make_batch()
    trips = fixed_triplets(labels)
    crit, _ = losses.select("contrastive", make_opt(), FixedTripletMiner(trips))
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e = torch.tensor(emb)
    a, p, n = zip(*trips)
    pos = torch.mean(F.relu(torch.norm(e[list(a)] - e[list(p)], p=2, dim=1) - 0.0))
    neg = torch.mean(F.relu(1.0 - torch.norm(e[list(a)] - e[list(n)], p=2, dim=1)))
    assert abs(ours - float(pos + neg)) < 1e-5


def test_triplet_matches_torch():
    emb, labels = make_batch()
    trips = fixed_triplets(labels)
    crit, _ = losses.select("triplet", make_opt(), FixedTripletMiner(trips))
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e = torch.tensor(emb)
    terms = [
        F.relu((e[a] - e[p]).pow(2).sum() - (e[a] - e[n]).pow(2).sum() + 0.2)
        for a, p, n in trips
    ]
    ref = float(torch.mean(torch.stack(terms)))
    assert abs(ours - ref) < 1e-5


def test_margin_matches_torch_loop():
    """Canonical-recipe loss (reference criteria/margin.py:39-73), learned and
    constant beta; includes the pair_count normalization quirk."""
    emb, labels = make_batch(seed=3)
    trips = fixed_triplets(labels)
    e = torch.tensor(emb)

    def torch_margin(beta_per_anchor):
        d_ap, d_an = [], []
        for a, p, n in trips:
            d_ap.append(((e[a] - e[p]).pow(2).sum() + 1e-8).pow(0.5))
            d_an.append(((e[a] - e[n]).pow(2).sum() + 1e-8).pow(0.5))
        d_ap, d_an = torch.stack(d_ap), torch.stack(d_an)
        beta = torch.tensor(beta_per_anchor, dtype=torch.float32)
        pos_loss = F.relu(d_ap - beta + 0.2)
        neg_loss = F.relu(beta - d_an + 0.2)
        pair_count = torch.sum((pos_loss > 0.0) + (neg_loss > 0.0)).float()
        if pair_count == 0.0:
            return float(torch.sum(pos_loss + neg_loss))
        return float(torch.sum(pos_loss + neg_loss) / pair_count)

    # learned per-class beta
    crit, groups = losses.select("margin", make_opt(), FixedTripletMiner(trips))
    beta = np.asarray([1.2, 0.9, 1.5], np.float32)
    ours = float(crit({"beta": jnp.asarray(beta)}, jnp.asarray(emb),
                      jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    ref = torch_margin([beta[labels[a]] for a, _, _ in trips])
    assert abs(ours - ref) < 1e-5
    assert groups and groups[0][0] == "criterion"

    # constant beta
    critc, _ = losses.select(
        "margin", make_opt(loss_margin_beta_constant=True), FixedTripletMiner(trips)
    )
    ours_c = float(critc({}, jnp.asarray(emb), jnp.asarray(labels),
                         key=jax.random.PRNGKey(0)))
    ref_c = torch_margin([1.2] * len(trips))
    assert abs(ours_c - ref_c) < 1e-5


def test_proxynca_matches_torch():
    """reference criteria/proxynca.py:39-55: 3x-normalized NCA over proxies."""
    emb, labels = make_batch(seed=4)
    rng = np.random.default_rng(5)
    proxies = rng.standard_normal((3, emb.shape[1])).astype(np.float32) / 8

    crit, groups = losses.select("proxynca", make_opt())
    ours = float(crit({"proxies": jnp.asarray(proxies)}, jnp.asarray(emb),
                      jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e = 3 * F.normalize(torch.tensor(emb), dim=1)
    pr = 3 * F.normalize(torch.tensor(proxies), dim=1)
    idxs = torch.arange(3)
    pos = torch.stack([pr[l : l + 1] for l in labels])
    neg_idx = [torch.cat([idxs[:l], idxs[l + 1 :]]) for l in labels]
    neg = torch.stack([pr[ni] for ni in neg_idx])
    d_neg = torch.sum((e[:, None, :] - neg).pow(2), dim=-1)
    d_pos = torch.sum((e[:, None, :] - pos).pow(2), dim=-1)
    ref = float(torch.mean(d_pos[:, 0] + torch.logsumexp(-d_neg, dim=1)))
    assert abs(ours - ref) < 1e-5
    assert groups and groups[0][0] == "criterion"


def test_softmax_matches_torch():
    """reference criteria/softmax.py:34-39: normalized class map, temp 0.05."""
    emb, labels = make_batch(seed=6)
    rng = np.random.default_rng(7)
    cmap = rng.uniform(-0.35, 0.35, (3, emb.shape[1])).astype(np.float32)
    crit, _ = losses.select(
        "softmax", make_opt(loss_softmax_temperature=0.05)
    )
    ours = float(crit({"class_map": jnp.asarray(cmap)}, jnp.asarray(emb),
                      jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    logits = torch.tensor(emb) @ F.normalize(torch.tensor(cmap), dim=1).T / 0.05
    ref = float(torch.nn.CrossEntropyLoss()(logits, torch.tensor(labels, dtype=torch.long)))
    assert abs(ours - ref) < 1e-5


def test_arcface_matches_torch():
    """reference criteria/arcface.py:36-55 — including the quirk that the
    margin shift (marginal - original) is broadcast over ALL class logits."""
    emb, labels = make_batch(seed=8)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    rng = np.random.default_rng(9)
    cmap = rng.uniform(-0.35, 0.35, (3, emb.shape[1])).astype(np.float32)
    crit, _ = losses.select(
        "arcface",
        make_opt(loss_arcface_angular_margin=0.5, loss_arcface_feature_scale=16.0,
                 loss_arcface_lr=0.0005),
    )
    ours = float(crit({"class_map": jnp.asarray(cmap)}, jnp.asarray(emb),
                      jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    e, lab = torch.tensor(emb), torch.tensor(labels, dtype=torch.long)
    cos = (e @ F.normalize(torch.tensor(cmap), dim=1).T).clamp(1e-10, 1 - 1e-10)
    orig = cos[torch.arange(len(e)), lab]
    marginal = torch.cos(torch.acos(orig) + 0.5)
    logits = 16.0 * (cos + (marginal - orig).unsqueeze(1))
    ref = float(torch.nn.CrossEntropyLoss()(logits, lab))
    assert abs(ours - ref) < 1e-5


def test_softtriplet_matches_torch():
    """reference criteria/softtriplet.py:52-69 — keeps the reference's dim=1
    centroid normalization (across centroids per embedding row) and
    class-axis softmax."""
    emb, labels = make_batch(seed=10)
    n_classes, n_centroids, C = 3, 2, emb.shape[1]
    rng = np.random.default_rng(11)
    cent = rng.uniform(-0.4, 0.4, (C, n_classes * n_centroids)).astype(np.float32)
    crit, _ = losses.select(
        "softtriplet",
        make_opt(loss_softtriplet_n_centroids=2, loss_softtriplet_margin_delta=0.01,
                 loss_softtriplet_gamma=0.1, loss_softtriplet_lambda=8.0,
                 loss_softtriplet_reg_weight=0.2, loss_softtriplet_lrmulti=1.0),
    )
    ours = float(crit({"centroids": jnp.asarray(cent)}, jnp.asarray(emb),
                      jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e, lab = torch.tensor(emb), torch.tensor(labels, dtype=torch.long)
    cc = F.normalize(torch.tensor(cent), dim=1)
    sims = (e @ cc).reshape(-1, n_classes, n_centroids)
    w = torch.nn.Softmax(dim=1)(0.1 * sims)
    per_class = torch.sum(w * sims, dim=2)
    delta = torch.zeros_like(per_class)
    delta[torch.arange(len(e)), lab] = 0.01
    cls_loss = torch.nn.CrossEntropyLoss()(8.0 * (per_class - delta), lab)
    inter = cc.T @ cc
    reg_idx = torch.zeros(n_classes * n_centroids, n_classes * n_centroids, dtype=torch.bool)
    for i in range(n_classes):
        for j in range(n_centroids):
            reg_idx[i * n_centroids + j, i * n_centroids + j + 1:(i + 1) * n_centroids] = 1
    reg = torch.sum(torch.sqrt(2.00001 - 2 * inter[reg_idx])) / (n_classes * n_centroids * (n_centroids - 1))
    ref = float(cls_loss + 0.2 * reg)
    assert abs(ours - ref) < 1e-5


def test_histogram_matches_torch():
    """reference criteria/histogram.py:60-120: the hard two-neighbour bin
    assignment equals our linear-interpolation soft histogram."""
    emb, labels = make_batch(seed=12)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    nbins = 65
    bw = 2.0 / (nbins - 1)
    crit, _ = losses.select("histogram", make_opt(loss_histogram_nbins=nbins))
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels),
                      key=jax.random.PRNGKey(0)))

    sim = emb @ emb.T
    B = len(labels)
    iu, ju = np.triu_indices(B, k=1)
    sims, eq = sim[iu, ju], labels[iu] == labels[ju]

    def hard_hist(vals):
        h = np.zeros(nbins)
        for s in vals:
            k = int((s + 1) / bw)  # the reference's int-floor bin assignment
            assigned = k * bw - 1
            h[k] += (-s + assigned + bw) / bw
            if k + 1 < nbins:
                h[k + 1] += (s - assigned) / bw
        return h / max(len(vals), 1)

    hp, hn = hard_hist(sims[eq]), hard_hist(sims[~eq])
    ref = float(np.sum(hn * np.cumsum(hp)))
    assert abs(ours - ref) < 1e-5


def test_rkd_and_hkd_match_torch():
    """MSLS distillation losses vs torch transcriptions of reference
    training_tools/loss.py:52-90 (RKD) and :185-219 (Hinton KD)."""
    from vit_reranking_tpu.losses.msls import (
        hkd_loss, rkd_angle, rkd_distance, supcon_loss,
    )

    rng = np.random.default_rng(13)
    s = rng.standard_normal((10, 16)).astype(np.float32)
    t = rng.standard_normal((10, 16)).astype(np.float32)
    st, tt = torch.tensor(s), torch.tensor(t)

    def torch_pdist(e):
        sq = e.pow(2).sum(1)
        res = (sq.unsqueeze(1) + sq.unsqueeze(0) - 2 * e @ e.T).clamp(min=1e-12).sqrt()
        res = res.clone()
        res[range(len(e)), range(len(e))] = 0
        return res

    sl1 = torch.nn.SmoothL1Loss(reduction="mean")
    t_d = torch_pdist(tt); t_d = t_d / t_d[t_d > 0].mean()
    s_d = torch_pdist(st); s_d = s_d / s_d[s_d > 0].mean()
    ref_dist = float(sl1(s_d, t_d))
    assert abs(float(rkd_distance(jnp.asarray(s), jnp.asarray(t))) - ref_dist) < 1e-5

    def torch_angles(e):
        d = F.normalize(e.unsqueeze(0) - e.unsqueeze(1), p=2, dim=2)
        return torch.bmm(d, d.transpose(1, 2)).view(-1)

    ref_ang = float(sl1(torch_angles(st), torch_angles(tt)))
    assert abs(float(rkd_angle(jnp.asarray(s), jnp.asarray(t))) - ref_ang) < 1e-5

    # HKD over stacked (query, positive, negatives): bs=3, nNeg=2 -> 12 rows
    bs, T = 3, 0.5
    so = rng.standard_normal((12, 16)).astype(np.float32)
    to = rng.standard_normal((12, 16)).astype(np.float32)
    ours_hkd = float(hkd_loss(jnp.asarray(so), jnp.asarray(to), bs=bs, temperature=T))
    sto, tto = torch.tensor(so), torch.tensor(to)
    q_s, p_s, n_s = torch.split(sto, [bs, bs, 12 - 2 * bs])
    q_t, p_t, n_t = torch.split(tto, [bs, bs, 12 - 2 * bs])
    pn_s = torch.cat([p_s.view(bs, 1, -1), n_s.view(bs, -1, 16)], dim=1)
    pn_t = torch.cat([p_t.view(bs, 1, -1), n_t.view(bs, -1, 16)], dim=1)
    prob_s = torch.bmm(q_s.view(bs, 1, -1), pn_s.transpose(1, 2)).squeeze(1)
    prob_t = torch.bmm(q_t.view(bs, 1, -1), pn_t.transpose(1, 2)).squeeze(1)
    ref_hkd = float(
        torch.nn.KLDivLoss(reduction="batchmean")(
            F.log_softmax(prob_s / T, dim=1), F.softmax(prob_t / T, dim=1)
        ) * (T * T)
    )
    assert abs(ours_hkd - ref_hkd) < 1e-5


def test_supcon_two_views_matches_torch():
    """SupCon (reference loss.py:94-180) with V=2 views exercises the mask
    tiling and per-view anchor averaging."""
    from vit_reranking_tpu.losses.msls import supcon_loss

    rng = np.random.default_rng(14)
    B, V, C = 6, 2, 8
    f = rng.standard_normal((B, V, C)).astype(np.float32)
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    labels = np.arange(B) % 3
    temp = 0.07
    ours = float(supcon_loss(jnp.asarray(f), jnp.asarray(labels), temperature=temp))

    ft = torch.tensor(f)
    lab = torch.tensor(labels).view(-1, 1)
    mask = torch.eq(lab, lab.T).float()
    contrast = torch.cat(torch.unbind(ft, dim=1), dim=0)
    anchor = contrast
    logits = (anchor @ contrast.T) / temp
    logits = logits - logits.max(dim=1, keepdim=True)[0].detach()
    mask = mask.repeat(V, V)
    logits_mask = torch.scatter(
        torch.ones_like(mask), 1, torch.arange(B * V).view(-1, 1), 0
    )
    mask = mask * logits_mask
    exp_logits = torch.exp(logits) * logits_mask
    log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True))
    mean_lpp = (mask * log_prob).sum(1) / (mask.sum(1) + 1e-8)
    ref = float((-(temp / temp) * mean_lpp).view(V, B).mean())
    assert abs(ours - ref) < 1e-5


def test_xbm_triplet_matches_torch_loop():
    """XBM triplet loss (reference training_tools/loss.py:221-300): given the
    same per-query positive/negative memory sets, the mask-based device loss
    equals the reference's per-query sort/select loop."""
    from vit_reranking_tpu.losses.msls import xbm_triplet_loss

    rng = np.random.default_rng(15)
    n, m, d = 9, 24, 16
    col = rng.standard_normal((n, d)).astype(np.float32)
    row = rng.standard_normal((m, d)).astype(np.float32)
    col /= np.linalg.norm(col, axis=1, keepdims=True)
    row /= np.linalg.norm(row, axis=1, keepdims=True)
    query_rows = np.array([0, 3, 6])
    pos_mask = rng.random((3, m)) < 0.15
    neg_mask = (rng.random((3, m)) < 0.5) & ~pos_mask
    pos_mask[1] = False  # query with no positive contributes nothing
    neg_mask[:, :2] = True  # ensure every query has negatives
    pos_mask[:, :2] = False
    pos_mask[0, 5] = pos_mask[2, 7] = True

    ours = float(xbm_triplet_loss(
        jnp.asarray(col), jnp.asarray(row), jnp.asarray(query_rows),
        jnp.asarray(pos_mask), jnp.asarray(neg_mask), margin=0.1,
    ))

    ct, rt = torch.tensor(col), torch.tensor(row)
    sim = ct @ rt.T
    loss = 0.0
    for i, q in enumerate(query_rows):
        pos_idx = np.where(pos_mask[i])[0]
        if len(pos_idx) == 0:
            continue
        pos_pair_ = torch.sort(sim[q, pos_idx])[0]
        neg_pair_ = torch.sort(sim[q, np.where(neg_mask[i])[0]])[0]
        pos_pair = pos_pair_[pos_pair_ < neg_pair_[-1] + 0.1]
        neg_pair = neg_pair_[neg_pair_ > max(0.4, float(pos_pair_[-1])) - 0.1]
        pos_loss = torch.sum(1 - pos_pair) / len(pos_pair) if len(pos_pair) else 0.0
        neg_loss = torch.sum(neg_pair) / len(neg_pair) if len(neg_pair) else 0.0
        loss += pos_loss + neg_loss
    ref = float(loss / len(query_rows))
    assert abs(ours - ref) < 1e-5


def test_ada_xbm_triplet_matches_torch_loop():
    """Adaptive XBM triplet (reference loss.py:303-394): every violating
    memory negative adds TripletMarginLoss(margin=sqrt(0.1), p=2), summed and
    normalized by the total violation count."""
    from vit_reranking_tpu.losses.msls import ada_xbm_triplet_loss

    rng = np.random.default_rng(16)
    n, m, d = 6, 20, 16
    col = rng.standard_normal((n, d)).astype(np.float32)
    row = rng.standard_normal((m, d)).astype(np.float32)
    col /= np.linalg.norm(col, axis=1, keepdims=True)
    row /= np.linalg.norm(row, axis=1, keepdims=True)
    query_rows = np.array([0, 1, 2])
    pos_rows = np.array([3, 5, 7])
    neg_mask = rng.random((3, m)) < 0.6
    neg_mask[np.arange(3), pos_rows] = False

    ours = float(ada_xbm_triplet_loss(
        jnp.asarray(col), jnp.asarray(row), jnp.asarray(query_rows),
        jnp.asarray(pos_rows), jnp.asarray(neg_mask), margin=0.1,
    ))

    ct, rt = torch.tensor(col), torch.tensor(row)
    sim = ct @ rt.T
    crit = torch.nn.TripletMarginLoss(margin=0.1 ** 0.5, p=2, reduction="sum")
    loss, neg_count = 0.0, 0
    for i, q in enumerate(query_rows):
        pos_sim = sim[q, pos_rows[i]]
        neg_idx = np.where(neg_mask[i])[0]
        viol = neg_idx[np.asarray(sim[q, neg_idx] > pos_sim - 0.1)]
        neg_count += len(viol)
        for nn_ in viol:
            loss += crit(ct[q][None], rt[pos_rows[i]][None], rt[nn_][None])
    ref = float(loss / neg_count) if neg_count else 0.0
    assert abs(ours - ref) < 1e-4


def test_quadruplet_matches_torch(monkeypatch):
    """Quadruplet loss (reference criteria/quadruplet.py:27-46) with the random
    fourth element pinned, vs the reference's two-hinge formula."""
    import vit_reranking_tpu.losses.quadruplet as quad_mod

    emb, labels = make_batch(seed=17)
    trips = fixed_triplets(labels)
    B = len(labels)
    # pin the fourth draw: first valid index per row of the diff-negative mask
    fourth = np.zeros(B, np.int64)
    negs = np.array([n for _, _, n in trips])
    for i in range(B):
        fourth[i] = np.where(negs != negs[i])[0][0]
    monkeypatch.setattr(
        quad_mod, "uniform_choice", lambda key, mask: jnp.asarray(fourth)
    )

    crit, _ = losses.select(
        "quadruplet",
        make_opt(loss_quadruplet_margin_alpha_1=0.2, loss_quadruplet_margin_alpha_2=0.2),
        FixedTripletMiner(trips),
    )
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))

    e = torch.tensor(emb)
    a, p, n = zip(*trips)
    a, p, n = e[list(a)], e[list(p)], e[list(n)]
    f = e[list(fourth)]
    tl = F.relu(torch.norm(a - p, p=2, dim=-1) - torch.norm(a - n, p=2, dim=-1) + 0.2)
    ql = F.relu(torch.norm(a - p, p=2, dim=-1) - torch.norm(n - f, p=2, dim=-1) + 0.2)
    ref = float(torch.mean(tl) + torch.mean(ql))
    assert abs(ours - ref) < 1e-5


def test_adversarial_separation_matches_torch():
    """DiVA decorrelation value (reference adversarial_separation.py:52-60)
    with pinned regressor weights (forward value; the gradient-reversal
    behavior is covered in test_losses_miners.py)."""
    rng = np.random.default_rng(18)
    C, P, B = 8, 16, 10
    f1 = rng.standard_normal((B, C)).astype(np.float32)
    f2 = rng.standard_normal((B, C)).astype(np.float32)
    w1 = rng.standard_normal((C, P)).astype(np.float32) * 0.3
    b1 = rng.standard_normal((P,)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((P, C)).astype(np.float32) * 0.3
    b2 = rng.standard_normal((C,)).astype(np.float32) * 0.1

    crit, _ = losses.select(
        "adversarial_separation",
        make_opt(diva_decorrnet_dim=P, diva_decorrelations=["embed1-embed2"],
                 diva_rho_decorrelation=[1.5], diva_decorrnet_lr=1e-4),
    )
    params = {"embed1-embed2": {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                                "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)}}
    ours = float(crit(params, {"embed1": jnp.asarray(f1), "embed2": jnp.asarray(f2)}))

    s = F.normalize(torch.tensor(f1), dim=-1)
    t = F.normalize(torch.tensor(f2), dim=-1)
    proj = torch.relu(s @ torch.tensor(w1) + torch.tensor(b1)) @ torch.tensor(w2) + torch.tensor(b2)
    ref = float(-1.5 * torch.mean(torch.mean((t * F.normalize(proj, dim=-1)) ** 2, dim=-1)))
    assert abs(ours - ref) < 1e-6


def _torch_pair_wise_wdist(x, y, x_mean=None, y_mean=None, is_positive=True,
                           use_uniform=False, use_inverse=False, eps=0.05,
                           max_iter=100):
    """Transcription of reference criteria/margin_diml.py:69-125 (x, y are
    (B, C, R) torch tensors)."""
    B, C, R = x.shape
    if x_mean is None and y_mean is None:
        x_mean, y_mean = x.mean(2), y.mean(2)
    x, y = F.normalize(x, dim=1), F.normalize(y, dim=1)
    x_mean, y_mean = F.normalize(x_mean, dim=1), F.normalize(y_mean, dim=1)
    dist1 = torch.sqrt(((x[:, :, :, None] - y[:, :, None, :]) ** 2).sum(1) + 1e-6)
    dist2 = torch.sqrt(((x_mean - y_mean) ** 2).sum(1) + 1e-6)
    sim = torch.einsum("bcs,bcm->bsm", x, y)
    if use_uniform:
        u = torch.full((B, R), 1.0 / R)
        v = torch.full((B, R), 1.0 / R)
    else:
        att = F.relu(torch.einsum("nc,ncr->nr", x_mean, y))
        att = 1 - att if use_inverse else att
        u = att / (att.sum(1, keepdims=True) + 1e-5)
        att = F.relu(torch.einsum("nc,ncr->nr", y_mean, x))
        att = 1 - att if use_inverse else att
        v = att / (att.sum(1, keepdims=True) + 1e-5)
    wdist = 1.0 - sim
    if is_positive:
        with torch.no_grad():
            K = torch.exp(-wdist / eps)
            r, c = torch.ones_like(v), torch.ones_like(u)
            for _ in range(max_iter):
                r0 = r
                r = v / (K @ c.unsqueeze(-1)).squeeze(-1)
                c = u / (K.permute(0, 2, 1) @ r.unsqueeze(-1)).squeeze(-1)
                if (r - r0).abs().mean().item() < 1e-1:
                    break
            T = r.unsqueeze(-1) * K * c.unsqueeze(-2)
    else:
        T = torch.ones_like(wdist)
    return (torch.sum(T * dist1, dim=(1, 2)) + dist2) / 2


def test_pair_wise_wdist_matches_torch():
    """Training-loss OT distance parity across marginal variants and the
    negative (T=ones) path."""
    from vit_reranking_tpu.losses.diml_ot import pair_wise_wdist

    rng = np.random.default_rng(19)
    B, C, R = 6, 16, 9
    x = rng.standard_normal((B, C, R)).astype(np.float32)
    y = rng.standard_normal((B, C, R)).astype(np.float32)
    xm = rng.standard_normal((B, C)).astype(np.float32)
    ym = rng.standard_normal((B, C)).astype(np.float32)
    xt, yt = torch.tensor(x), torch.tensor(y)
    xmt, ymt = torch.tensor(xm), torch.tensor(ym)

    cases = [
        dict(is_positive=True, use_uniform=True),
        dict(is_positive=True, use_uniform=False),  # pooled-mean cross attention
        dict(is_positive=False, use_uniform=True),
    ]
    for kw in cases:
        ours = np.asarray(pair_wise_wdist(jnp.asarray(x), jnp.asarray(y), **kw))
        ref = _torch_pair_wise_wdist(xt, yt, **kw).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4, err_msg=str(kw))

    # explicit cls-token marginals + use_inverse (the --use_cls_token path)
    ours = np.asarray(pair_wise_wdist(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(xm), jnp.asarray(ym),
        is_positive=True, use_inverse=True,
    ))
    ref = _torch_pair_wise_wdist(
        xt, yt, xmt, ymt, is_positive=True, use_inverse=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)
