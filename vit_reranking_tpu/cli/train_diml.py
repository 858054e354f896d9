"""Structural (OT) loss training + rerank evaluation (reference train_diml.py).

Same skeleton as train_baseline, but the model is the DIML per-patch variant,
the criterion receives the cls embedding as ``class_token``
(train_diml.py:249-258), and the in-train evaluation reranks the top-100 with
``calc_similarity`` stage 1 (train_diml.py:297-402, trunc=100).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.checkpoint import copy_best, save_checkpoint
from ..core.config import from_args
from ..core.logger import RunLogger
from ..data.loader import build_dataset
from ..engine.extract import extract_features
from ..engine.rerank_eval import rerank_evaluate
from ..parallel.mesh import create_mesh
from .common import (
    build_training,
    epoch_batches,
    maybe_step_checkpoint,
    resume_train_state,
    run_train_step,
    seed_everything,
    setup_device_cache,
)


def evaluate_rerank(opt, model, variables, loader, trunc=100, eval_cache=None):
    if eval_cache is not None:
        # one-dispatch extraction over the HBM-resident test pool
        from ..engine.extract import extract_features_device

        feats = extract_features_device(
            model, variables, eval_cache.images,
            batch_size=opt.bs, grid_size=opt.grid_size, training_mode=True,
            uint8_input=not eval_cache.normalized,
        )
        feats = dict(feats, labels=eval_cache.labels)
    else:
        feats = extract_features(
            model, variables, loader, grid_size=opt.grid_size,
            training_mode=True, pad_batch=opt.bs,
        )
    n = len(feats["labels"])
    truncs = (0, trunc) if trunc < n else (0,)
    res = rerank_evaluate(
        jnp.asarray(feats["bank"]), jnp.asarray(feats["center"]),
        jnp.asarray(feats["labels"]),
        trunc_nums=truncs, method="featvit",
        flags=dict(
            use_uniform=opt.use_uniform, use_inverse=opt.use_inverse,
            temperature=opt.temperature, use_cls_token=opt.use_cls_token,
            use_minus=opt.use_minus, ot_part=opt.ot_part,
        ),
    )
    t = truncs[-1]
    return {
        "r1": res["r1"][t], "rp": res["rp"][t], "mapr": res["mapr"][t],
        "r1_global": res["r1"][0],
    }


def main(argv=None):
    opt = from_args(argv)
    if "diml" not in opt.arch:
        opt = opt.replace(arch=opt.arch.replace("cvt", "cvt_diml", 1)) if opt.arch.startswith("cvt") else opt
    if opt.bf16 is None:
        # bf16-trunk training defaults (per-patch head + structural OT loss
        # stay f32; --no-bf16 opts out): CvT-DIML 99.7 -> 64.7 ms/step,
        # ResNet-DIML (the reference's canonical train_diml arch) 84.5 ->
        # 47.2 ms/step at bs=112/224px on the v5e, loss parity (RESULTS.md).
        # TPU only: off-TPU backends EMULATE bf16, so the CPU mesh stays f32.
        opt = opt.replace(
            bf16=jax.default_backend() == "tpu"
            and opt.arch.startswith(("cvt", "resnet50", "irresnet50"))
        )
    if opt.narrow_sm is None:
        opt = opt.replace(narrow_sm=bool(opt.bf16))
    seed_everything(opt.seed, debug=opt.debug)

    loaders, sampler = build_dataset(opt)
    train_loader = loaders["training"]
    steps_per_epoch = len(train_loader)
    _, images0, _ = next(iter(loaders["testing"]))

    mesh = create_mesh(mesh_shape=opt.mesh_shape) if opt.device_batch else None
    cache, cache_images = setup_device_cache(
        opt, train_loader, images0, mesh, "train_diml"
    )
    eval_cache = None
    if opt.cache_device:
        from ..data.device_cache import DeviceEvalCache

        eval_cache = DeviceEvalCache.from_dataset(loaders["testing"].dataset)
        print(
            f"[train_diml] device eval cache: {tuple(eval_cache.images.shape)} "
            f"{eval_cache.images.dtype} ({eval_cache.nbytes / 1e9:.2f} GB resident)"
        )
    model, criterion, state, step_fn, mesh = build_training(
        opt, steps_per_epoch, images0,
        augment_fn=cache.augment if cache is not None else None,
        cached=cache is not None, mesh=mesh,
    )
    logger = RunLogger(opt)
    print(f"[train_diml] run dir: {logger.run_dir}")

    if opt.resume_path:
        state, saved_epoch = resume_train_state(opt.resume_path, state)
        print(f"[train_diml] resumed {opt.resume_path} (epoch {saved_epoch})")

    best_r1, patience_ctr = -1.0, 0
    key = jax.random.PRNGKey(opt.seed + 1)
    for epoch in range(opt.start_epoch, opt.n_epochs):
        t0 = time.time()
        epoch_losses = []
        # storage-based samplers refresh their embedding storage per epoch
        if getattr(sampler, "requires_storage", False):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            feats = extract_features(
                model, variables, loaders["evaluation"], grid_size=opt.grid_size,
                training_mode=True, pad_batch=opt.bs,
            )
            if sampler.storage is None:
                sampler.create_storage(feats["center"])
            else:
                sampler.full_storage_update(feats["center"])
            sampler.precompute_indices()
        for lab, images, idx in epoch_batches(train_loader, cache):
            key, sub = jax.random.split(key)
            state, m = run_train_step(
                step_fn, state, mesh, cache_images, lab, images, idx, sub
            )
            epoch_losses.append(m["loss"])  # device scalar; drained per epoch
            maybe_step_checkpoint(
                opt, logger.run_dir, state, epoch, len(epoch_losses)
            )
        epoch_losses = [float(x) for x in epoch_losses]
        logger.log("Train", {"loss": float(np.mean(epoch_losses))}, epoch)
        print(f"epoch {epoch}: loss={np.mean(epoch_losses):.4f} ({time.time()-t0:.1f}s)")

        if epoch % opt.evalevery == 0 or epoch == opt.n_epochs - 1:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            te = time.time()
            metrics = evaluate_rerank(
                opt, model, variables, loaders["testing"], eval_cache=eval_cache
            )
            logger.log("Test", metrics, epoch)
            print(f"  eval ({time.time()-te:.1f}s): {metrics}")
            ckpt = {
                "params": state.params, "batch_stats": state.batch_stats,
                "loss_params": state.loss_params, "opt_state": state.opt_state,
                "step": state.step, "epoch": epoch,
            }
            save_checkpoint(f"{logger.run_dir}/latest", ckpt, metrics)
            if metrics["r1"] > best_r1:
                best_r1 = metrics["r1"]
                copy_best(logger.run_dir)
                patience_ctr = 0
            else:
                patience_ctr += 1
                if patience_ctr >= opt.max_patience:
                    print("early stop: patience exceeded")
                    break
    logger.plot_curves()
    print(f"best R@1: {best_r1:.3f}")
    return best_r1


if __name__ == "__main__":
    main()
