"""Analysis probes — the reference's missing `proofs` package, reconstructed
from call sites (SURVEY.md section 0.1: test_pair_patchsim_*.py:126,
test_cls_token.py:126) plus the in-repo copy of evaluate_patch_similarity
(evaluation/eval_cvt_diml.py:175-194)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def patch_similarity_per_layer(layer_tokens: jnp.ndarray) -> jnp.ndarray:
    """Mean off-diagonal patch cosine similarity per layer — the patch-
    similarity degeneration study (eval_cvt_diml.py:175-194).

    layer_tokens: (B, L_layers, n_patches, D).  Returns (L_layers,)."""
    x = layer_tokens / jnp.maximum(
        jnp.linalg.norm(layer_tokens, axis=-1, keepdims=True), 1e-12
    )
    sim = jnp.einsum("blmd,blnd->blmn", x, x, preferred_element_type=jnp.float32)
    n = x.shape[2]
    sim = sim - jnp.eye(n)[None, None]
    avg = jnp.sum(sim, axis=(2, 3)) / (n * (n - 1))  # (B, L)
    return jnp.mean(avg, axis=0)


def evaluate_patch_similarity(extract_layers_fn: Callable, loader, max_batches=None):
    """Dataset-level patch-similarity curve.  ``extract_layers_fn(images) ->
    (B, L, n, D)`` per-block patch tokens."""
    sims = []
    for bi, (labels, images, idx) in enumerate(loader):
        if max_batches and bi >= max_batches:
            break
        sims.append(np.asarray(patch_similarity_per_layer(extract_layers_fn(images))))
    return np.mean(np.stack(sims), axis=0)


def evaluate_cls_cluster(
    cls_per_layer: np.ndarray, labels: np.ndarray, seed: int = 0
) -> Dict[int, float]:
    """Cls-token cluster quality per depth (the missing
    proofs.vit_vs_cnn.evaluate_cls_cluster): k-means NMI of each layer's cls
    embedding vs class labels.  cls_per_layer: (B, L, D)."""
    from ..engine.metrics_extra import nmi_score
    from ..ops.kmeans import kmeans

    B, L, D = cls_per_layer.shape
    n_classes = len(np.unique(labels))
    out = {}
    for l in range(L):
        _, assign = kmeans(
            jnp.asarray(cls_per_layer[:, l]), n_classes,
            jax.random.PRNGKey(seed + l), iters=25,
        )
        out[l] = nmi_score(np.asarray(assign), np.asarray(labels))
    return out


def plot_cluster(
    embeds: np.ndarray, labels: np.ndarray, save_path: str = "cls_cluster.png"
):
    """2D PCA scatter colored by class (the missing proofs.vit_vs_cnn
    plot_cluster)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = embeds - embeds.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    p = x @ vt[:2].T
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(p[:, 0], p[:, 1], c=labels, cmap="tab20", s=8)
    fig.savefig(save_path)
    plt.close(fig)
