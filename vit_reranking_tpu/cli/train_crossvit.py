"""Cross-attention rescorer training (the reference's missing train_crossvit.py
driver, referenced by scripts/; behavior reconstructed from
criteria/margin_cross_embed.py + architectures/vit.py CrossNet_vit):
a frozen ViT backbone supplies cls+patch tokens; the CrossNet exchange layers
train with the margin_cross_embed loss."""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import losses, miners
from .. import models as archs
from ..core.checkpoint import copy_best, save_checkpoint
from ..core.config import from_args
from ..core.logger import RunLogger
from ..data.loader import build_dataset
from .common import load_pretrained_into, seed_everything


def main(argv=None):
    opt = from_args(argv)
    seed_everything(opt.seed)
    loaders, _ = build_dataset(opt)
    steps_per_epoch = len(loaders["training"])

    backbone = archs.select("vit_normalize", opt)
    _, images0, _ = next(iter(loaders["testing"]))
    bb_vars = backbone.init(
        {"params": jax.random.PRNGKey(opt.seed)}, jnp.asarray(images0[:2]), train=False
    )
    bb_vars = load_pretrained_into(opt.replace(arch="vit_normalize"), bb_vars)

    cross = archs.CrossNet(
        embed_dim=opt.embed_dim, dim=384, depth=opt.cross_attn_depth,
        normalize="normalize" in opt.arch,
    )
    tokens0 = jnp.zeros((2, 17, 384))
    cross_vars = cross.init({"params": jax.random.PRNGKey(1)}, tokens0, tokens0)

    miner = miners.select(opt.batch_mining, opt)
    criterion, _ = losses.select("margin_cross_embed", opt, miner)
    loss_params = criterion.init_params(jax.random.PRNGKey(2))

    tx = optax.adam(opt.lr)
    opt_state = tx.init({"cross": cross_vars["params"], "criterion": loss_params})
    logger = RunLogger(opt)

    @jax.jit
    def embed_tokens(images):
        out, (enc, patches), _ = backbone.apply(bb_vars, images, train=False)
        tokens = jnp.concatenate([enc[:, None, :], patches], axis=1)
        return out, tokens

    @jax.jit
    def step(cross_params, loss_params, opt_state, embeds, tokens, labels, key):
        def f(ps):
            cp, lp = ps["cross"], ps["criterion"]

            def cross_apply(xs, ys):
                return cross.apply({"params": cp}, xs, ys, train=False)

            return criterion(
                lp, embeds, labels, key=key, batch=tokens, cross_apply=cross_apply,
                cat_global=opt.cat_global,
            )

        loss, grads = jax.value_and_grad(f)(
            {"cross": cross_params, "criterion": loss_params}
        )
        updates, opt_state = tx.update(grads, opt_state)
        new = optax.apply_updates(
            {"cross": cross_params, "criterion": loss_params}, updates
        )
        return new["cross"], new["criterion"], opt_state, loss

    cross_params = cross_vars["params"]
    key = jax.random.PRNGKey(opt.seed + 3)
    best = np.inf
    for epoch in range(opt.n_epochs):
        t0, losses_e = time.time(), []
        for lab, images, idx in loaders["training"]:
            key, sub = jax.random.split(key)
            embeds, tokens = embed_tokens(jnp.asarray(images))
            cross_params, loss_params, opt_state, loss = step(
                cross_params, loss_params, opt_state, embeds, tokens,
                jnp.asarray(lab), sub,
            )
            losses_e.append(loss)  # device scalar; drained per epoch
        losses_e = [float(x) for x in losses_e]
        mean_loss = float(np.mean(losses_e))
        logger.log("Train", {"loss": mean_loss}, epoch)
        print(f"epoch {epoch}: loss={mean_loss:.4f} ({time.time()-t0:.1f}s)")
        if mean_loss < best:
            best = mean_loss
            save_checkpoint(
                f"{logger.run_dir}/latest",
                {"cross": cross_params, "criterion": loss_params},
                {"loss": mean_loss},
            )
    logger.plot_curves()
    return best


if __name__ == "__main__":
    main()
