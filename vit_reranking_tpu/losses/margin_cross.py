"""Cross-attention margin losses (reference criteria/margin_cross_embed.py and
margin_cross_diml.py): the model re-encodes (anchor, positive) / (anchor,
negative) pairs through a pairwise cross-attention rescorer before the margin
hinge.

The rescorer is passed per call as ``cross_apply(xs, ys) -> (x_out, y_out)``
(typically a bound Flax CrossNet apply, see models/vit.py CrossNet), and the
pair token sequences as ``batch`` — this keeps the criterion pure while the
reference instead mutates a global model handle."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion, pair_norm
from .diml_ot import pair_wise_wdist
from .margin import ALL_MINERS


class MarginCrossEmbedLoss(Criterion):
    ALLOWED_MINING_OPS = ALL_MINERS
    REQUIRES_BATCHMINER = True
    REQUIRES_OPTIM = True
    name = "margin_cross_embed"

    def __init__(self, opt, batchminer):
        self.n_classes = opt.n_classes
        self.margin = getattr(opt, "loss_margin_margin", 0.2)
        self.beta_constant = getattr(opt, "loss_margin_beta_constant", False)
        self.beta_val = getattr(opt, "loss_margin_beta", 1.2)
        self.lr = getattr(opt, "loss_margin_beta_lr", 0.0005)
        self.cat_global = getattr(opt, "cat_global", False)
        self.batchminer = batchminer

    def init_params(self, rng):
        if self.beta_constant:
            return {}
        return {"beta": jnp.full((self.n_classes,), self.beta_val, jnp.float32)}

    def _margin_hinge(self, params, labels, trip, d_ap, d_an):
        beta = (
            self.beta_val
            if self.beta_constant
            else params["beta"][labels[trip.anchor]]
        )
        pos_loss = jax.nn.relu(d_ap - beta + self.margin)
        neg_loss = jax.nn.relu(beta - d_an + self.margin)
        ok = trip.valid & jnp.isfinite(d_ap) & jnp.isfinite(d_an)
        pos_loss = jnp.where(ok, pos_loss, 0.0)
        neg_loss = jnp.where(ok, neg_loss, 0.0)
        cnt = jnp.sum(((pos_loss > 0) | (neg_loss > 0)).astype(jnp.float32))
        total = jnp.sum(pos_loss + neg_loss)
        return jnp.where(cnt == 0.0, total, total / jnp.maximum(cnt, 1.0))

    def __call__(self, params, embeds, labels, key=None, *, batch=None,
                 cross_apply=None, **kwargs):
        if batch is None or cross_apply is None:
            raise ValueError("margin_cross losses need batch tokens + cross_apply")
        trip = self.batchminer(key, embeds, labels)

        a0, p0 = cross_apply(batch[trip.anchor], batch[trip.positive])
        a1, n1 = cross_apply(batch[trip.anchor], batch[trip.negative])
        if self.cat_global:
            def catn(x, e):
                y = jnp.concatenate([x, e], axis=-1)
                return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)

            a0 = catn(a0, embeds[trip.anchor])
            a1 = catn(a1, embeds[trip.anchor])
            p0 = catn(p0, embeds[trip.positive])
            n1 = catn(n1, embeds[trip.negative])
        d_ap = pair_norm(a0, p0, eps=1e-8)
        d_an = pair_norm(a1, n1, eps=1e-8)
        return self._margin_hinge(params, labels, trip, d_ap, d_an)


class MarginCrossDIMLLoss(MarginCrossEmbedLoss):
    """Cross + OT hybrid (reference margin_cross_diml.py): the cross model
    returns spatial maps; the distance is the OT-weighted patch distance."""

    name = "margin_cross_diml"

    def __init__(self, opt, batchminer):
        super().__init__(opt, batchminer)
        self.use_uniform = getattr(opt, "use_uniform", False)

    def __call__(self, params, embeds, labels, key=None, *, batch=None,
                 cross_apply=None, **kwargs):
        if batch is None or cross_apply is None:
            raise ValueError("margin_cross losses need batch tokens + cross_apply")
        # mining on pooled features (margin_cross_diml.py:111-116); batch is
        # (B, C, R) or (B, H, W, C) spatial
        feats = batch
        if feats.ndim == 4:
            B, H, W, C = feats.shape
            feats = feats.reshape(B, H * W, C).transpose(0, 2, 1)
        pooled = jnp.mean(feats, axis=-1)
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
        trip = self.batchminer(key, pooled, labels)

        a0, p0 = cross_apply(feats[trip.anchor], feats[trip.positive])
        a1, n1 = cross_apply(feats[trip.anchor], feats[trip.negative])
        d_ap = pair_wise_wdist(a0, p0, use_uniform=self.use_uniform)
        d_an = pair_wise_wdist(a1, n1, use_uniform=self.use_uniform)
        return self._margin_hinge(params, labels, trip, d_ap, d_an)
