"""Patch-similarity degeneration probe (reference test_pair_patchsim_*.py +
the missing proofs.eval_pair_patch_sim, reconstructed per SURVEY.md 0.1):
measures per-layer mean off-diagonal patch cosine similarity over the test
split — the study motivating DIML's structural rerank."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import models as archs
from ..core.config import from_args
from ..data.loader import build_dataset
from ..engine.proofs import evaluate_patch_similarity
from .common import load_pretrained_into, seed_everything


def main(argv=None):
    opt = from_args(argv)
    seed_everything(opt.seed)
    loaders, _ = build_dataset(opt)
    model = archs.select(opt.arch, opt)

    _, images0, _ = next(iter(loaders["testing"]))
    a = opt.arch.lower()
    ret_layers = a.startswith("vit") or a.startswith("deit")
    kw = dict(train=False)
    if ret_layers:
        kw["ret_layers"] = True
    variables = model.init({"params": jax.random.PRNGKey(opt.seed)}, jnp.asarray(images0[:2]), **kw)
    variables = load_pretrained_into(opt, variables)

    if ret_layers:
        @jax.jit
        def extract(images):
            _, _, aux = model.apply(variables, jnp.asarray(images), train=False, ret_layers=True)
            return aux["layer_tokens"]
    else:
        # non-ViT backbones: single final token map as one "layer"
        @jax.jit
        def extract(images):
            _, (_, tok), _ = model.apply(variables, jnp.asarray(images), train=False)
            return tok[:, None, :, :]

    sims = evaluate_patch_similarity(extract, loaders["testing"], max_batches=8)
    print(f"evaluated patch similarity per layer: {np.round(sims, 4).tolist()}")
    return sims


if __name__ == "__main__":
    main()
