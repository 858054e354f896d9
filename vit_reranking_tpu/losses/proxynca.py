"""ProxyNCA (reference criteria/proxynca.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion


class ProxyNCALoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = True
    name = "proxynca"

    def __init__(self, opt):
        self.num_proxies = opt.n_classes
        self.embed_dim = opt.embed_dim
        self.lr = opt.lr * getattr(opt, "loss_proxynca_lrmulti", 50.0)

    def init_params(self, rng):
        return {"proxies": jax.random.normal(rng, (self.num_proxies, self.embed_dim)) / 8.0}

    def __call__(self, params, batch, labels, key=None, **kwargs):
        def norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        batch = 3.0 * norm(batch)
        proxies = 3.0 * norm(params["proxies"])

        d = jnp.sum((batch[:, None, :] - proxies[None, :, :]) ** 2, axis=-1)  # (B, P)
        pos_d = jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0]
        neg_mask = jnp.arange(self.num_proxies)[None, :] != labels[:, None]
        neg_lse = jax.scipy.special.logsumexp(
            jnp.where(neg_mask, -d, -jnp.inf), axis=1
        )
        return jnp.mean(pos_d + neg_lse)
