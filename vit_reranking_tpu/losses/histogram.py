"""Histogram loss (reference criteria/histogram.py): soft histograms of
positive and negative pair similarities; loss = sum(neg_hist * pos_cdf)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import Criterion


class HistogramLoss(Criterion):
    ALLOWED_MINING_OPS = None
    REQUIRES_BATCHMINER = False
    REQUIRES_OPTIM = False
    name = "histogram"

    def __init__(self, opt):
        self.nbins = getattr(opt, "loss_histogram_nbins", 65)
        self.bin_width = 2.0 / (self.nbins - 1)

    def _soft_hist(self, sims, mask):
        """Linear-interpolation histogram over [-1, 1] (equivalent to the
        reference's two-neighbour bin assignment, histogram.py:84-107)."""
        support = jnp.linspace(-1.0, 1.0, self.nbins)  # (nbins,)
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(sims[None, :] - support[:, None]) / self.bin_width
        )  # (nbins, P)
        w = w * mask[None, :].astype(w.dtype)
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        return jnp.sum(w, axis=1) / n

    def __call__(self, params, batch, labels, key=None, **kwargs):
        B = batch.shape[0]
        sim = jnp.einsum(
            "ic,jc->ij", batch, batch,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        iu, ju = jnp.triu_indices(B, k=1)
        sims = sim[iu, ju]
        eq = labels[iu] == labels[ju]

        hist_pos = self._soft_hist(sims, eq)
        hist_neg = self._soft_hist(sims, ~eq)
        pos_cdf = jnp.cumsum(hist_pos)
        return jnp.sum(hist_neg * pos_cdf)
