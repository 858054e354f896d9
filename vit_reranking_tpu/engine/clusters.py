"""NetVLAD centroid initialization driver (reference
training_tools/get_clusters.py): sample encoder descriptors over a dataset,
k-means them on device, and produce the alpha-scaled soft-assignment init."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.netvlad import netvlad_init_from_clusters
from ..ops.kmeans import get_clusters


def init_netvlad_clusters(
    encoder_apply,
    images_iter,
    num_clusters: int = 64,
    n_descriptors: int = 50000,
    per_image: int = 100,
    seed: int = 0,
    vladv2: bool = False,
) -> Dict[str, np.ndarray]:
    """Returns {'centroids', 'conv_kernel'[, 'conv_bias']} for merging into a
    (Patch)NetVLAD params tree.

    Args:
      encoder_apply: fn(images (B,H,W,3)) -> (B, h, w, D) encoder features.
      images_iter: yields image batches (numpy/NHWC).
    """
    rng = np.random.default_rng(seed)
    descs = []
    total = 0
    for images in images_iter:
        feats = np.asarray(encoder_apply(jnp.asarray(images)))
        B, h, w, D = feats.shape
        flat = feats.reshape(B * h * w, D)
        flat = flat / np.maximum(np.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
        take = min(per_image * B, len(flat))
        descs.append(flat[rng.choice(len(flat), take, replace=False)])
        total += take
        if total >= n_descriptors:
            break
    descs = np.concatenate(descs, 0)[:n_descriptors].astype(np.float32)
    clusters = get_clusters(descs, num_clusters, seed=seed)
    return netvlad_init_from_clusters(clusters, descs, vladv2=vladv2)
