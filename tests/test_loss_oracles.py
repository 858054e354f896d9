"""Value-parity of the vectorized tuple losses vs direct torch loops that
transcribe the reference semantics (criteria/npair.py:30-45,
angular.py:30-50, snr.py:30-44)."""

import types

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

import vit_reranking_tpu.losses as losses
from vit_reranking_tpu.miners.common import Triplets, TupleSets


def setup_tuples():
    rng = np.random.default_rng(0)
    B, C = 12, 8
    emb = rng.standard_normal((B, C)).astype(np.float32) / 4
    labels = np.arange(B) % 3
    anchors, positives = [], []
    for i in range(B):
        same = [j for j in range(B) if labels[j] == labels[i] and j != i]
        anchors.append(i)
        positives.append(same[0])
    neg_mask = np.ones((B, B), bool)
    for i, (a, p) in enumerate(zip(anchors, positives)):
        neg_mask[i, a] = False
        neg_mask[i, p] = False

    class FixedTupleMiner:
        name = "npair"

        def __call__(self, key, batch, labs):
            return TupleSets(
                jnp.asarray(anchors), jnp.asarray(positives),
                jnp.asarray(labels[None, :] == labels[:, None]) & ~jnp.eye(B, dtype=bool),
                jnp.asarray(neg_mask), jnp.ones((B,), bool),
            )

    return emb, labels, anchors, positives, neg_mask, FixedTupleMiner()


def make_opt(**kw):
    base = dict(
        n_classes=3, embed_dim=8, lr=1e-4, arch="resnet",
        loss_npair_l2=0.005, loss_angular_alpha=45.0,
        loss_angular_npair_ang_weight=2.0, loss_angular_npair_l2=0.005,
        loss_snr_margin=0.2, loss_snr_reg_lambda=0.005,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_npair_matches_torch_loop():
    emb, labels, anchors, positives, neg_mask, miner = setup_tuples()
    crit, _ = losses.select("npair", make_opt(), miner)
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    e = torch.tensor(emb)
    loss = 0.0
    for i, (a, p) in enumerate(zip(anchors, positives)):
        negset = np.where(neg_mask[i])[0]
        a_e, p_e, n_e = e[a : a + 1], e[p : p + 1], e[negset]
        inner = a_e[:, None, :].bmm((n_e - p_e[:, None, :]).permute(0, 2, 1)).view(1, -1)
        loss = loss + torch.mean(torch.log(torch.sum(torch.exp(inner), dim=1) + 1)) / len(anchors)
        loss = loss + 0.005 * torch.mean(torch.norm(e, p=2, dim=1)) / len(anchors)
    assert abs(ours - float(loss)) < 1e-5


def test_angular_matches_torch_loop():
    emb, labels, anchors, positives, neg_mask, miner = setup_tuples()
    crit, _ = losses.select("angular", make_opt(), miner)
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    e = torch.tensor(emb)
    tan2 = float(np.tan(np.pi / 4)) ** 2
    an, po = e[anchors], e[positives]
    n_an, n_po, n_all = F.normalize(an, dim=1), F.normalize(po, dim=1), F.normalize(e, dim=-1)
    is1 = 4 * tan2 * (n_an + n_po) @ n_all.T
    is2 = 2 * (1 + tan2) * (n_an * n_po).sum(1, keepdim=True)
    inner_ang = is1 - is2
    ang_terms, np_terms = [], []
    for i in range(len(anchors)):
        negset = np.where(neg_mask[i])[0]
        ang_terms.append(torch.log(torch.sum(torch.exp(inner_ang[i, negset])) + 1))
        inn = (an[i : i + 1] @ (e[negset] - po[i : i + 1]).T).clamp(-50, 50)
        np_terms.append(torch.log(torch.sum(torch.exp(inn)) + 1))
    ref = (
        torch.stack(np_terms).mean()
        + 2.0 * torch.stack(ang_terms).mean()
        + 0.005 * torch.mean(torch.norm(e, p=2, dim=1))
    )
    assert abs(ours - float(ref)) < 1e-5


def test_snr_matches_torch_loop():
    emb, labels, anchors, positives, neg_mask, _ = setup_tuples()
    negatives = [int(np.where(neg_mask[i])[0][0]) for i in range(len(anchors))]

    class FixedTripletMiner:
        name = "semihard"  # any non-'distance' name keeps reg_lambda active

        def __call__(self, key, batch, labs):
            return Triplets(
                jnp.asarray(anchors), jnp.asarray(positives),
                jnp.asarray(negatives), jnp.ones((len(anchors),), bool),
            )

    crit, _ = losses.select("snr", make_opt(), FixedTripletMiner())
    ours = float(crit({}, jnp.asarray(emb), jnp.asarray(labels), key=jax.random.PRNGKey(0)))
    e = torch.tensor(emb)
    a, p, n = e[anchors], e[positives], e[negatives]
    pos_snr = torch.var(a - p, dim=1) / torch.var(a, dim=1)
    neg_snr = torch.var(a - n, dim=1) / torch.var(a, dim=1)
    reg = torch.mean(torch.abs(torch.sum(a, dim=1)))
    h = F.relu(pos_snr - neg_snr + 0.2)
    snr = torch.sum(h) / torch.sum(h > 0)
    ref = snr + 0.005 * reg
    assert abs(ours - float(ref)) < 1e-5
