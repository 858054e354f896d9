"""Margin loss over OT structural distances (reference criteria/margin_diml.py).

Mining runs on the pooled/cls global features; the margin hinge runs on the
OT-weighted patch distance.  The reference loops triplets one by one through
``pair_wise_wdist`` — here both the (a,p) and (a,n) pair batches go through
one batched call each."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion
from .diml_ot import pair_wise_wdist
from .margin import ALL_MINERS


def _to_cr(x):
    """(B, H, W, C) or (B, C, R) -> (B, C, R)."""
    if x.ndim == 4:
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C).transpose(0, 2, 1)
    return x


class MarginDIMLLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = True
    name = "margin_diml"

    def __init__(self, opt, batchminer):
        self.n_classes = opt.n_classes
        self.margin = getattr(opt, "loss_margin_margin", 0.2)
        self.nu = getattr(opt, "loss_margin_nu", 0.0)
        self.beta_constant = getattr(opt, "loss_margin_beta_constant", False)
        self.beta_val = getattr(opt, "loss_margin_beta", 1.2)
        self.lr = getattr(opt, "loss_margin_beta_lr", 0.0005)
        self.use_uniform = getattr(opt, "use_uniform", False)
        self.use_inverse = getattr(opt, "use_inverse", False)
        self.use_cls_token = getattr(opt, "use_cls_token", False)
        self.batchminer = batchminer

    def init_params(self, rng):
        if self.beta_constant:
            return {}
        return {"beta": jnp.full((self.n_classes,), self.beta_val, jnp.float32)}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        feats = _to_cr(batch)  # (B, C, R)

        if self.use_cls_token:
            if "class_token" not in kwargs:
                raise KeyError("class_token not found")
            pooled = kwargs["class_token"]
        else:
            pooled = jnp.mean(feats, axis=-1)
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

        trip = self.batchminer(key, pooled, labels)
        a, p, n = feats[trip.anchor], feats[trip.positive], feats[trip.negative]

        if self.use_cls_token:
            am, pm, nm = pooled[trip.anchor], pooled[trip.positive], pooled[trip.negative]
            d_ap = pair_wise_wdist(a, p, am, pm, use_uniform=self.use_uniform, use_inverse=self.use_inverse)
            d_an = pair_wise_wdist(a, n, am, nm, use_uniform=self.use_uniform, use_inverse=self.use_inverse)
        else:
            d_ap = pair_wise_wdist(a, p, use_uniform=self.use_uniform, use_inverse=self.use_inverse)
            d_an = pair_wise_wdist(a, n, use_uniform=self.use_uniform, use_inverse=self.use_inverse)

        if self.beta_constant:
            beta = self.beta_val
        else:
            beta = params["beta"][labels[trip.anchor]]

        pos_loss = jax.nn.relu(d_ap - beta + self.margin)
        neg_loss = jax.nn.relu(beta - d_an + self.margin)

        # reference drops triplets whose OT plan went NaN (margin_diml.py:101-102)
        ok = trip.valid & jnp.isfinite(d_ap) & jnp.isfinite(d_an)
        pos_loss = jnp.where(ok, pos_loss, 0.0)
        neg_loss = jnp.where(ok, neg_loss, 0.0)
        pair_count = jnp.sum(((pos_loss > 0) | (neg_loss > 0)).astype(jnp.float32))
        total = jnp.sum(pos_loss + neg_loss)
        return jnp.where(pair_count == 0.0, total, total / jnp.maximum(pair_count, 1.0))
