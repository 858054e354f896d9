"""Parametric support-distribution miner (reference batchminer/parametric.py).

The reference version is unrunnable as shipped: it reads
``opt.miner_parametric_mode / _n_support / _support_lim`` which parameters.py
never defines (verified — no such flags at parameters.py:216-224).  We expose
the same registry key with explicit defaults so the method is usable here:
distances are binned into ``n_support`` buckets over ``support_lim`` and
negatives drawn from a per-bucket probability profile."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .common import Triplets, pdist, uniform_choice


class BatchMiner:
    name = "parametric"

    def __init__(self, opt=None):
        self.mode = getattr(opt, "miner_parametric_mode", "uniform")
        self.n_support = getattr(opt, "miner_parametric_n_support", 10)
        self.support_lim = getattr(opt, "miner_parametric_support_lim", (0.1, 1.4))
        lo, hi = self.support_lim
        self.support = np.linspace(lo, hi, self.n_support)
        if self.mode == "uniform":
            self.sample_distr = np.ones(self.n_support) / self.n_support
        elif self.mode == "hards":
            self.sample_distr = np.exp(-np.arange(self.n_support))
            self.sample_distr /= self.sample_distr.sum()
        else:  # 'easies'
            self.sample_distr = np.exp(-np.arange(self.n_support))[::-1].copy()
            self.sample_distr /= self.sample_distr.sum()

    def __call__(self, key, batch, labels) -> Triplets:
        B = batch.shape[0]
        kp, kn = jax.random.split(key)
        d = pdist(jax.lax.stop_gradient(batch))
        lo, hi = self.support_lim

        same = labels[:, None] == labels[None, :]
        eye = jnp.eye(B, dtype=bool)
        pos = same & ~eye
        valid = jnp.any(pos, axis=-1)

        bucket = jnp.sum(d[..., None] > jnp.asarray(self.support[1:-1]), axis=-1)
        p = jnp.asarray(self.sample_distr, jnp.float32)[bucket]
        p = jnp.where((d >= lo) & (d <= hi) & ~same, p, 0.0)
        logp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)), -jnp.inf)
        has_neg = jnp.any(p > 0, axis=-1)
        fallback = jnp.where(~same, 0.0, -jnp.inf)
        logits = jnp.where(has_neg[:, None], logp, fallback)
        negative = jax.random.categorical(kn, logits, axis=-1)

        positive = uniform_choice(kp, jnp.where(valid[:, None], pos, eye))
        anchor = jnp.arange(B, dtype=jnp.int32)
        return Triplets(anchor, positive.astype(jnp.int32), negative.astype(jnp.int32), valid)
