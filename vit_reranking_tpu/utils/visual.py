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


def _overlay(ax, img: np.ndarray, marginal: np.ndarray, alpha: float = 0.5):
    """Blend a grid marginal over an image (jet), reference visual.py:327-344."""
    sal = _grid_img(marginal).astype(np.float64)
    sal = sal / max(sal.max(), 1e-12)
    ax.imshow(img)
    ax.imshow(
        np.kron(sal, np.ones((img.shape[0] // sal.shape[0], img.shape[1] // sal.shape[1]))),
        alpha=alpha, cmap="jet",
    )
    ax.set_axis_off()


def top_correspondences(sim_t: np.ndarray, topk: int = 3):
    """Strongest (gallery_patch, query_patch) cells of T*S (reference
    get_min_topk_ind + get_patch_from_coord, visual.py:318-324; T rows are
    gallery patches s, columns query patches m per S='cm,ncs->nsm')."""
    flat = np.argsort(-np.asarray(sim_t).reshape(-1))[:topk]
    R_m = sim_t.shape[1]
    return [(int(i // R_m), int(i % R_m)) for i in flat]


def _patch_rect(idx: int, grid: int, img_hw, color):
    from matplotlib.patches import Rectangle

    H, W = img_hw[:2]
    ph, pw = H // grid, W // grid
    r, c = idx // grid, idx % grid
    return Rectangle((c * pw, r * ph), pw, ph, fill=False, edgecolor=color, lw=2)


def visual_heatmap_msls(
    q_img: np.ndarray,
    db_img: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    T: np.ndarray,
    sim_r: np.ndarray,
    save_path: str = "heatmap_msls.png",
    use_cls_token: bool = True,
    topk: int = 3,
):
    """MSLS OT panel (reference visual_heatmap_msls, visual.py:298-353):
    query + v-marginal overlay with the top-k correspondence source patches,
    db + u-marginal overlay with the matching target patches, plus the plain
    pair.  u/v (R,), T/sim_r (R, R) of the reranked top-1."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    q = denormalize(np.asarray(q_img))
    db = denormalize(np.asarray(db_img))
    grid = int(round(len(np.asarray(u)) ** 0.5))
    pairs = top_correspondences(np.asarray(sim_r) * np.asarray(T), topk)
    colors = ["white", "yellow", "cyan"]

    fig, axs = plt.subplots(2, 2, figsize=(10, 8))
    axs = axs.flat
    _overlay(axs[0], q, v)
    for ci, (s, m) in enumerate(pairs):
        axs[0].add_patch(_patch_rect(m, grid, q.shape, colors[ci % len(colors)]))
    _overlay(axs[1], db, u)
    for ci, (s, m) in enumerate(pairs):
        axs[1].add_patch(_patch_rect(s, grid, db.shape, colors[ci % len(colors)]))
    axs[2].imshow(q)
    axs[2].text(0, 0, "query")
    axs[3].imshow(db)
    axs[3].text(0, 0, "db")
    for ax in axs:
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)


def visual_self_cross_flow(
    q_img: np.ndarray,
    db_img: np.ndarray,
    cross_uv,
    self_uv,
    save_path: str = "flow.png",
):
    """Self- vs cross-attention marginal comparison (reference
    visual_self_cross_flow, visual.py:356-…): query row = cross-v / self-v,
    db row = cross-u / self-u overlays."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    q = denormalize(np.asarray(q_img))
    db = denormalize(np.asarray(db_img))
    fig, axs = plt.subplots(2, 2, figsize=(10, 8))
    _overlay(axs[0, 0], q, cross_uv[1])
    axs[0, 0].set_title("query: cross v")
    _overlay(axs[0, 1], q, self_uv[1])
    axs[0, 1].set_title("query: self v")
    _overlay(axs[1, 0], db, cross_uv[0])
    axs[1, 0].set_title("db: cross u")
    _overlay(axs[1, 1], db, self_uv[0])
    axs[1, 1].set_title("db: self u")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)


def visual_attention_rollout_layers(
    image: np.ndarray,
    layer_saliencies: np.ndarray,
    save_path: str = "rollout_layers.png",
):
    """Per-layer rollout panel for one image (reference
    visual_attention_rollout_layers, visual.py:413-441): one overlay per
    accumulated joint-attention layer.  layer_saliencies (L, R)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = denormalize(np.asarray(image))
    L = len(layer_saliencies)
    fig, axs = plt.subplots(1, L + 1, figsize=(2.2 * (L + 1), 2.5))
    axs[0].imshow(img)
    axs[0].set_title("input")
    axs[0].set_axis_off()
    for i in range(L):
        _overlay(axs[i + 1], img, np.asarray(layer_saliencies[i]))
        axs[i + 1].set_title(f"layer {i}")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def visual_attention_rollout_images(
    images: np.ndarray,
    saliencies: np.ndarray,
    save_path: str = "rollout_images.png",
):
    """Final-layer rollout overlays across a batch (reference
    visual_attention_rollout_images(_mean), visual.py:445-505).
    images (B, H, W, 3), saliencies (B, R)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    B = len(images)
    fig, axs = plt.subplots(2, B, figsize=(2.2 * B, 5), squeeze=False)
    for i in range(B):
        img = denormalize(np.asarray(images[i]))
        axs[0][i].imshow(img)
        axs[0][i].set_axis_off()
        _overlay(axs[1][i], img, np.asarray(saliencies[i]))
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def visual_msls_triptych(
    q_img: np.ndarray,
    p_img: np.ndarray,
    n_img: np.ndarray,
    save_path: str = "triptych.png",
):
    """Input triptych (query, positive, first negative) saved for the first
    few steps of each MSLS epoch (reference train_epoch.py:106-123)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(10, 5))
    for ax, img, title in zip(axs, (q_img, p_img, n_img), ("query", "pos", "neg")):
        ax.grid(False)
        ax.imshow(denormalize(np.asarray(img)))
        ax.set_title(title)
        ax.set_axis_off()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path)
    plt.close(fig)
