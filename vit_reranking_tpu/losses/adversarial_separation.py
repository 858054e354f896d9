"""Adversarial decorrelation between embedding spaces (reference
criteria/adversarial_separation.py, used by DiVA-style multi-embedding
training).

The reference reads ``opt.diva_*`` flags that parameters.py never defines
(unrunnable as shipped); defaults are provided here.  Gradient reversal is a
custom_vjp identity with negated cotangent."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion


@jax.custom_vjp
def grad_reverse(x):
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (-g,)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class AdversarialSeparationLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = True
    name = "adversarial_separation"

    def __init__(self, opt):
        self.embed_dim = opt.embed_dim
        self.proj_dim = getattr(opt, "diva_decorrnet_dim", 512)
        self.directions = getattr(opt, "diva_decorrelations", ["embed1-embed2"])
        self.weights = getattr(opt, "diva_rho_decorrelation", [1.0] * len(self.directions))
        self.lr = getattr(opt, "diva_decorrnet_lr", 1e-4)

    def init_params(self, rng):
        params = {}
        for d in self.directions:
            k1, k2, rng = jax.random.split(rng, 3)
            params[d] = {
                "w1": jax.random.normal(k1, (self.embed_dim, self.proj_dim))
                * (2.0 / self.embed_dim) ** 0.5,
                "b1": jnp.zeros((self.proj_dim,)),
                "w2": jax.random.normal(k2, (self.proj_dim, self.embed_dim))
                * (2.0 / self.proj_dim) ** 0.5,
                "b2": jnp.zeros((self.embed_dim,)),
            }
        return params

    def __call__(self, params, feature_dict, labels=None, key=None, **kwargs):
        def norm(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        adj = {k: norm(grad_reverse(v)) for k, v in feature_dict.items()}
        loss = 0.0
        for w, d in zip(self.weights, self.directions):
            source, target = d.split("-")
            p = params[d]
            proj = jax.nn.relu(adj[source] @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]
            loss += -w * jnp.mean(jnp.mean((adj[target] * norm(proj)) ** 2, axis=-1))
        return loss
