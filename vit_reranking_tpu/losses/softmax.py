"""Normalized-softmax classification loss (reference criteria/softmax.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .common import Criterion


class SoftmaxLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = True
    name = "softmax"

    def __init__(self, opt):
        self.n_classes = opt.n_classes
        self.embed_dim = opt.embed_dim
        self.temperature = getattr(opt, "loss_softmax_temperature", 0.05)
        self.lr = getattr(opt, "loss_softmax_lr", 1e-5)

    def init_params(self, rng):
        stdv = 1.0 / jnp.sqrt(self.embed_dim)
        w = jax.random.uniform(rng, (self.n_classes, self.embed_dim), minval=-stdv, maxval=stdv)
        return {"class_map": w}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        w = params["class_map"]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        logits = batch @ w.T / self.temperature
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
