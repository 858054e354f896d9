"""Host-side visualization (matplotlib): OT heatmaps, retrieval strips,
rollout overlays (reference utilities/visual.py:174-505,
evaluation/__init__.py:85-110 recover_closest_standard).

Everything here consumes numpy arrays pulled from device at the call site —
visualization stays off the compute path."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..data.transforms import denormalize


def _grid_img(att: np.ndarray) -> np.ndarray:
    g = int(round(len(att) ** 0.5))
    return np.asarray(att).reshape(g, g)


def visual_heatmap(
    query_img: np.ndarray,
    top_img: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    T: np.ndarray,
    sim_r: Optional[np.ndarray] = None,
    save_path: str = "heatmap.png",
    is_correct: bool = True,
):
    """OT panel: query/gallery images, u/v marginal maps, transport plan T,
    weighted similarity (reference visual_heatmap, visual.py:174-294).

    query_img/top_img: HWC normalized floats; u/v: (R,); T/sim_r: (R, R)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(2, 3, figsize=(12, 8))
    axs = axs.flat
    axs[0].imshow(denormalize(np.asarray(query_img)))
    axs[0].set_title("query")
    color = "green" if is_correct else "red"
    axs[1].imshow(denormalize(np.asarray(top_img)))
    axs[1].set_title("top-1")
    for spine in axs[1].spines.values():
        spine.set_edgecolor(color)
        spine.set_linewidth(4)
    im = axs[2].imshow(_grid_img(v))
    axs[2].set_title("v (query marginal)")
    fig.colorbar(im, ax=axs[2])
    im = axs[3].imshow(_grid_img(u))
    axs[3].set_title("u (gallery marginal)")
    fig.colorbar(im, ax=axs[3])
    im = axs[4].imshow(np.asarray(T))
    axs[4].set_title("transport plan T")
    fig.colorbar(im, ax=axs[4])
    if sim_r is not None:
        im = axs[5].imshow(np.asarray(sim_r))
        axs[5].set_title("T * S")
        fig.colorbar(im, ax=axs[5])
    for ax in axs:
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)


def visualise_retrieval_strip(
    query_img: np.ndarray,
    top_imgs: Sequence[np.ndarray],
    correct: Sequence[bool],
    save_path: str = "retrieval.png",
):
    """Query + top-k strip with green/red borders (reference
    visual.py:197-211, evaluation/__init__.py:96-109)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(top_imgs) + 1
    fig, axs = plt.subplots(1, n, figsize=(2.2 * n, 2.5))
    axs[0].imshow(denormalize(np.asarray(query_img)))
    axs[0].set_title("query")
    for i, (img, ok) in enumerate(zip(top_imgs, correct)):
        axs[i + 1].imshow(denormalize(np.asarray(img)))
        for spine in axs[i + 1].spines.values():
            spine.set_edgecolor("green" if ok else "red")
            spine.set_linewidth(4)
    for ax in axs:
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def visual_attention_rollout(
    image: np.ndarray, saliency: np.ndarray, save_path: str = "rollout.png"
):
    """Rollout saliency overlay (reference
    visual_attention_rollout_images_mean, visual.py:356-505)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = denormalize(np.asarray(image))
    sal = _grid_img(saliency)
    sal = sal / max(sal.max(), 1e-12)
    fig, axs = plt.subplots(1, 2, figsize=(8, 4))
    axs[0].imshow(img)
    axs[1].imshow(img)
    axs[1].imshow(
        np.kron(sal, np.ones((img.shape[0] // sal.shape[0], img.shape[1] // sal.shape[1]))),
        alpha=0.5, cmap="jet",
    )
    for ax in axs:
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)
