"""SoftTriple loss (reference criteria/softtriplet.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .common import Criterion


class SoftTripletLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = True
    name = "softtriplet"

    def __init__(self, opt):
        self.n_classes = opt.n_classes
        self.embed_dim = opt.embed_dim
        self.n_centroids = getattr(opt, "loss_softtriplet_n_centroids", 2)
        self.margin_delta = getattr(opt, "loss_softtriplet_margin_delta", 0.01)
        self.gamma = getattr(opt, "loss_softtriplet_gamma", 0.1)
        self.lam = getattr(opt, "loss_softtriplet_lambda", 8.0)
        self.reg_weight = getattr(opt, "loss_softtriplet_reg_weight", 0.2)
        self.lr = opt.lr * getattr(opt, "loss_softtriplet_lrmulti", 1.0)

    def init_params(self, rng):
        n = self.n_classes * self.n_centroids
        stdv = 1.0 / jnp.sqrt(n)
        return {
            "centroids": jax.random.uniform(
                rng, (self.embed_dim, n), minval=-stdv, maxval=stdv
            )
        }

    def __call__(self, params, batch, labels, key=None, **kwargs):
        B = batch.shape[0]
        C = params["centroids"]
        C = C / jnp.maximum(jnp.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        sims = (batch @ C).reshape(B, self.n_classes, self.n_centroids)
        # NOTE: reference applies softmax over the CLASS axis (dim=1) — kept
        w = jax.nn.softmax(self.gamma * sims, axis=1)
        per_class = jnp.sum(w * sims, axis=2)
        delta = jnp.zeros_like(per_class).at[jnp.arange(B), labels].set(self.margin_delta)
        cls_loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                self.lam * (per_class - delta), labels
            )
        )
        inter = C.T @ C
        n = self.n_classes * self.n_centroids
        idx = jnp.arange(n)
        same_class = (idx[:, None] // self.n_centroids) == (idx[None, :] // self.n_centroids)
        upper = idx[None, :] > idx[:, None]
        mask = same_class & upper
        reg_norm = self.n_classes * self.n_centroids * (self.n_centroids - 1)
        reg = jnp.sum(jnp.where(mask, jnp.sqrt(2.00001 - 2 * inter), 0.0)) / max(reg_norm, 1)
        return cls_loss + self.reg_weight * reg
