"""Grad-CAM activation saliency (reference utilities/cam.py:69-86 wraps
pytorch_grad_cam.GradCAM over ResNet layer4 with targets=None; the reference
consumes the CAM as OT marginals via ``use_cam`` in calc_similarity_featvit,
utilities/diml.py:405-412, pooled to the patch grid).

The GradCAM recipe (transcribed semantics, oracle-tested against a torch
reimplementation in tests/test_cam_oracle.py):
  1. A = last-conv-stage activations (B, h, w, C);
  2. target = argmax logit per image (``targets=None`` in the reference);
  3. w_c = spatial mean of d logit_target / d A_c  (per channel);
  4. cam = ReLU(sum_c w_c * A_c), per-image min-max scaled to [0, 1].
pytorch_grad_cam then bilinearly upsamples to the input size before the
consumer average-pools back to the 7x7 grid — at h == grid (ResNet layer4 at
224px) that round trip is the identity, so we pool the (h, w) map directly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def grad_cam_from_feats(
    feats: jnp.ndarray,
    head_fn: Callable[[jnp.ndarray], jnp.ndarray],
    class_idx: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Core GradCAM: feats (B, h, w, C) activations, ``head_fn(feats) ->
    (B, n_classes)`` logits.  Returns (B, h, w) maps in [0, 1]."""
    logits = head_fn(feats)
    if class_idx is None:
        class_idx = jnp.argmax(logits, axis=-1)  # targets=None semantics

    def target_sum(f):
        lg = head_fn(f)
        return jnp.sum(jnp.take_along_axis(lg, class_idx[:, None], axis=1))

    g = jax.grad(target_sum)(feats)  # (B, h, w, C)
    w = jnp.mean(g, axis=(1, 2))  # (B, C) — GAP of the gradients
    cam = jax.nn.relu(jnp.einsum("bhwc,bc->bhw", feats, w))
    cam = cam - jnp.min(cam, axis=(1, 2), keepdims=True)
    return cam / (jnp.max(cam, axis=(1, 2), keepdims=True) + 1e-7)


def grad_cam(
    model,
    variables,
    images: jnp.ndarray,
    grid: int = 7,
    head_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, grid, grid) activation-CAM maps in [0, 1]
    for the repo's ResNet networks (trunk exposed as the ``trunk`` scope).

    ``head_fn(feats (B, h, w, C)) -> (B, n)`` logits; the default pools the
    trunk map and applies the model's own ``last_linear`` head (embedding
    models have no 1000-class ImageNet classifier — pass a converted
    classifier head for bit-faithful reference behavior)."""
    from ..models.resnet import ResNet50Trunk

    trunk_vars = {"params": variables["params"]["trunk"]}
    if "batch_stats" in variables:
        trunk_vars["batch_stats"] = variables["batch_stats"]["trunk"]
    feats = ResNet50Trunk().apply(trunk_vars, images, train=False)

    if head_fn is None:
        kernel = variables["params"]["last_linear"]["kernel"]
        bias = variables["params"]["last_linear"].get("bias")

        def head_fn(f):
            lg = jnp.mean(f, axis=(1, 2)) @ kernel
            return lg if bias is None else lg + bias

    cam = grad_cam_from_feats(feats, head_fn)
    B, h, w = cam.shape
    if (h, w) == (grid, grid):
        return cam
    if h % grid == 0 and w % grid == 0:
        ph, pw = h // grid, w // grid
        return cam.reshape(B, grid, ph, grid, pw).mean((2, 4))
    # reference round trip: bilinear upsample to input size, then pool
    return jax.image.resize(cam, (B, grid, grid), method="bilinear")


def input_grad_saliency(
    model,
    variables,
    images: jnp.ndarray,
    grid: int = 7,
    target_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Input-gradient saliency pooled to the token grid (|d score / d pixels|
    per patch cell) — a model-agnostic fallback that works for backbones
    without a conv trunk; NOT the reference's activation-CAM."""
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
