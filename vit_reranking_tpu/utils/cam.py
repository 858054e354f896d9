"""Gradient-based class-activation saliency (reference utilities/cam.py:69-86
wraps pytorch_grad_cam over ResNet layer4; the reference consumes the CAM only
as OT marginals via `use_cam` in calc_similarity_featvit, diml.py:405-412).

Implemented as input-gradient saliency pooled to the token grid: |d score /
d pixels| averaged per patch cell, ReLU'd and max-normalized — the same role
(a per-patch importance map in [0, 1]) without torch-style layer hooks."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def grad_cam(
    model,
    variables,
    images: jnp.ndarray,
    grid: int = 7,
    target_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, grid, grid) saliency maps in [0, 1].

    ``target_fn(embed) -> (B,)`` is the score to differentiate; default is
    the squared embedding norm (class-agnostic)."""
    if target_fn is None:
        target_fn = lambda e: jnp.sum(e**2, axis=-1)

    def score(imgs):
        embed = model.apply(variables, imgs, train=False)[0]
        return jnp.sum(target_fn(embed))

    g = jax.grad(score)(images)  # (B, H, W, 3)
    B, H, W, _ = g.shape
    sal = jnp.sum(jnp.abs(g), axis=-1)
    ph, pw = H // grid, W // grid
    sal = sal[:, : ph * grid, : pw * grid].reshape(B, grid, ph, grid, pw).mean((2, 4))
    sal = jax.nn.relu(sal)
    return sal / jnp.maximum(sal.max(axis=(1, 2), keepdims=True), 1e-12)
