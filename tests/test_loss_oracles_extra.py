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
