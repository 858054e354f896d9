"""Step-1 global-embedding DML training (reference train_baseline.py).

Same flags, same loop shape: per-epoch training with on-device mining and
loss, eval every ``--evalevery`` epochs (full test-set embed -> NxN cosine
with self-masking -> R@1/RP/MAP@R), best-checkpoint copy on R@1, patience
early stop (train_baseline.py:166-337).

Run: python -m vit_reranking_tpu.cli.train_baseline --dataset synthetic \
        --arch cvt_13_normalize --loss margin --batch_mining distance ...
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.checkpoint import copy_best, save_checkpoint
from ..core.config import from_args
from ..core.logger import RunLogger
from ..data.loader import build_dataset
from ..engine.extract import extract_features
from ..engine.metrics import metrics_from_scores, summarize
from ..engine.train import TrainState
from ..ops.topk import similarity_matrix
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


def evaluate_plain(model, variables, loader, pad_batch=None, eval_cache=None):
    """In-train eval (train_baseline.py:247-326): embed, NxN cosine, metrics.

    With ``eval_cache`` (data/device_cache.py::DeviceEvalCache) the whole
    extraction runs as one compiled program over the HBM-resident test pool
    — no host->device image traffic per eval epoch."""
    if eval_cache is not None:
        from ..engine.extract import extract_features_device

        res = extract_features_device(
            model, variables, eval_cache.images,
            batch_size=pad_batch or 32, grid_size=1,
            uint8_input=not eval_cache.normalized,
        )
        centers = res["center"]
        labels = jnp.asarray(eval_cache.labels)
    else:
        feats = extract_features(model, variables, loader, grid_size=1, pad_batch=pad_batch)
        centers = jnp.asarray(feats["center"])
        labels = jnp.asarray(feats["labels"])
    sims = similarity_matrix(centers, centers, mask_self=True)
    return summarize(metrics_from_scores(sims, labels, labels, mask_diagonal=False))


def main(argv=None):
    opt = from_args(argv)
    if opt.bf16 is None:
        # bf16 activation training defaults (f32 master weights, f32 BN
        # stats; --no-bf16 opts out): CvT 96.7 -> 69.8 ms/step, ResNet-50
        # 82.1 -> 45.5 ms/step at bs=112 on the v5e — loss parity to 3
        # decimals for both (RESULTS.md).  TPU only: off-TPU backends
        # EMULATE bf16 (slower, not faster), so the CPU test mesh stays f32.
        # ViT/Swin joined the default set in round 3; measured (round 4,
        # RESULTS.md): DeiT-S 44.5 -> 24.8 ms/step (1.79x), Swin-T 117.6 ->
        # 83.5 (1.41x) at bs=64/224px with bf16+narrow_sm
        # (scripts/profile_train_step.py protocol; supersedes the round-2
        # "DeiT-S bf16 -4%, default f32" note, which measured bf16 WITHOUT
        # the narrowed softmax).
        opt = opt.replace(
            bf16=jax.default_backend() == "tpu"
            and (
                (opt.arch.startswith("cvt") and "diml" not in opt.arch)
                or opt.arch.startswith(("resnet50", "irresnet50"))
                or opt.arch.startswith(("vit", "deit"))
                or "swin" in opt.arch
            )
        )
    if opt.narrow_sm is None:
        # bf16 training also narrows the attention softmax where one exists
        # (CvT 69.8 -> 61.8 ms/step, DeiT-S 28.6 -> 24.8, Swin-T -> 83.5;
        # --no-narrow_sm opts out; inert for the CNN families)
        opt = opt.replace(narrow_sm=bool(opt.bf16))
    seed_everything(opt.seed, debug=opt.debug)

    loaders, sampler = build_dataset(opt)
    train_loader = loaders["training"]
    steps_per_epoch = len(train_loader)

    _, images0, _ = next(iter(loaders["testing"]))
    mesh = create_mesh(mesh_shape=opt.mesh_shape) if opt.device_batch else None
    cache, cache_images = setup_device_cache(
        opt, train_loader, images0, mesh, "train_baseline"
    )
    eval_cache = None
    if opt.cache_device:
        from ..data.device_cache import DeviceEvalCache

        eval_cache = DeviceEvalCache.from_dataset(loaders["testing"].dataset)
        print(
            f"[train_baseline] device eval cache: {tuple(eval_cache.images.shape)} "
            f"{eval_cache.images.dtype} ({eval_cache.nbytes / 1e9:.2f} GB resident)"
        )
    model, criterion, state, step_fn, mesh = build_training(
        opt, steps_per_epoch, images0,
        augment_fn=cache.augment if cache is not None else None,
        cached=cache is not None, mesh=mesh,
    )
    logger = RunLogger(opt)
    print(f"[train_baseline] run dir: {logger.run_dir}")

    if opt.resume_path:
        state, saved_epoch = resume_train_state(opt.resume_path, state)
        print(f"[train_baseline] resumed {opt.resume_path} (epoch {saved_epoch})")

    best_r1, patience_ctr = -1.0, 0
    key = jax.random.PRNGKey(opt.seed + 1)
    step = 0
    for epoch in range(opt.start_epoch, opt.n_epochs):
        t0 = time.time()
        epoch_losses = []
        for lab, images, idx in epoch_batches(train_loader, cache):
            key, sub = jax.random.split(key)
            state, m = run_train_step(
                step_fn, state, mesh, cache_images, lab, images, idx, sub
            )
            # keep the device scalar — float() here would force a host sync
            # every step and serialize the pipeline (reference logs grads per
            # step too, train_baseline.py:217-220, and pays a full GPU->CPU
            # copy for it; we drain once per epoch instead)
            epoch_losses.append(m["loss"])
            step += 1
            maybe_step_checkpoint(opt, logger.run_dir, state, epoch, step)
        epoch_losses = [float(x) for x in epoch_losses]
        logger.log(
            "Train",
            {
                "loss": float(np.mean(epoch_losses)),
                "grad_l2": float(m["grad_l2"]),
                "grad_max": float(m["grad_max"]),
                "epoch_s": time.time() - t0,
            },
            epoch,
        )
        print(
            f"epoch {epoch}: loss={np.mean(epoch_losses):.4f} "
            f"({time.time()-t0:.1f}s, {steps_per_epoch} steps)"
        )

        if opt.save_every_epoch and epoch % opt.evalevery != 0:
            # preemption-safe periodic checkpoint (SURVEY.md section 5): keep
            # `latest` fresh even between eval epochs so a preempted TPU job
            # resumes with --resume_path from at most one epoch back
            ckpt = {
                "params": state.params, "batch_stats": state.batch_stats,
                "loss_params": state.loss_params, "opt_state": state.opt_state,
                "step": state.step, "epoch": epoch,
            }
            save_checkpoint(f"{logger.run_dir}/latest", ckpt, {})

        if epoch % opt.evalevery == 0 or epoch == opt.n_epochs - 1:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            te = time.time()
            metrics = evaluate_plain(
                model, variables, loaders["testing"], pad_batch=opt.bs,
                eval_cache=eval_cache,
            )
            logger.log("Test", metrics, epoch)
            print(f"  eval ({time.time()-te:.1f}s): {metrics}")
            ckpt = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "loss_params": state.loss_params,
                "opt_state": state.opt_state,
                "step": state.step,
                "epoch": epoch,
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
