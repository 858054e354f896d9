"""ArcFace (reference criteria/arcface.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .common import Criterion


class ArcFaceLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = True
    name = "arcface"

    def __init__(self, opt):
        self.n_classes = opt.n_classes
        self.embed_dim = opt.embed_dim
        self.angular_margin = getattr(opt, "loss_arcface_angular_margin", 0.5)
        self.feature_scale = getattr(opt, "loss_arcface_feature_scale", 16.0)
        self.lr = getattr(opt, "loss_arcface_lr", 0.0005)

    def init_params(self, rng):
        stdv = 1.0 / jnp.sqrt(self.embed_dim)
        w = jax.random.uniform(rng, (self.n_classes, self.embed_dim), minval=-stdv, maxval=stdv)
        return {"class_map": w}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        w = params["class_map"]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        cos = jnp.clip(batch @ w.T, 1e-10, 1.0 - 1e-10)
        target = jnp.take_along_axis(cos, labels[:, None], axis=1)[:, 0]
        theta = jnp.arccos(target)
        marginal = jnp.cos(theta + self.angular_margin)
        logits = self.feature_scale * (cos + (marginal - target)[:, None])
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
