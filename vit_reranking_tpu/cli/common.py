"""Shared CLI wiring: model/loss/miner/optimizer assembly from a Config."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import losses, miners
from .. import models as archs
from ..core.config import Config
from ..engine.train import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from ..parallel.mesh import create_mesh


def seed_everything(seed: int, debug: bool = False):
    np.random.seed(seed)
    import random

    random.seed(seed)
    if debug:
        # NaN-checking debug mode (SURVEY.md section 5: replaces the
        # reference's breakpoint()/ipdb scaffolding)
        jax.config.update("jax_debug_nans", True)


def build_labels(opt: Config, params, loss_params):
    """Label pytree for parameter groups: model / fc (optional own lr) /
    frozen (zeroed updates) / criterion."""
    trainable = archs.frozen_param_mask(opt.arch, params)

    def decide(path, train_ok):
        keys = "/".join(str(getattr(p, "key", "")) for p in path)
        if not train_ok:
            return "frozen"
        if opt.fc_lr > 0 and ("head" in keys or "last_linear" in keys):
            return "fc"
        return "model"

    model_labels = jax.tree_util.tree_map_with_path(decide, trainable)
    crit_labels = jax.tree.map(lambda _: "criterion", loss_params)
    return {"model": model_labels, "criterion": crit_labels}


def build_training(
    opt: Config, steps_per_epoch: int, sample_images: np.ndarray,
    augment_fn=None, cached: bool = False, mesh=None,
):
    """Assemble (model, criterion, state, step_fn, mesh).

    ``augment_fn``/``cached`` thread the device-resident image-cache input
    pipeline into the step (engine/train.py::make_train_step).  ``mesh``
    injects a pre-built device mesh (setup_device_cache needs it before the
    step is assembled); default builds one per ``--device_batch``."""
    model = archs.select(opt.arch, opt)
    miner = (
        miners.select(opt.batch_mining, opt)
        if losses.LOSSES[opt.loss].REQUIRES_BATCHMINER
        else None
    )
    criterion, groups = losses.select(opt.loss, opt, miner)

    rng = jax.random.PRNGKey(opt.seed)
    variables = model.init(
        {"params": rng}, jnp.asarray(sample_images[:2]), train=False
    )
    variables = load_pretrained_into(opt, variables)
    loss_params = criterion.init_params(jax.random.fold_in(rng, 1))

    labels = build_labels(opt, variables["params"], loss_params)
    group_lrs = {"model": opt.lr, "criterion": getattr(criterion, "lr", None) or opt.lr}
    if opt.fc_lr > 0:
        group_lrs["fc"] = opt.fc_lr
    present = set(jax.tree.leaves(labels))
    if "frozen" in present:
        group_lrs["frozen"] = 0.0

    tx = make_optimizer(
        opt.optim, opt.lr, opt.decay, opt.tau, opt.gamma, steps_per_epoch,
        group_lrs=group_lrs,
        label_fn=labels,
    )

    from flax.core import FrozenDict

    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict({})),
        loss_params=loss_params,
        opt_state=tx.init(
            {"model": variables["params"], "criterion": loss_params}
        ),
        step=jnp.zeros((), jnp.int32),
    )

    if mesh is None:
        mesh = create_mesh(mesh_shape=opt.mesh_shape) if opt.device_batch else None
    pass_cls = opt.loss in ("margin_diml", "multisimilarity_diml") and opt.use_cls_token
    step_fn = make_train_step(
        model.apply, criterion, tx, mesh=mesh, pass_class_token=pass_cls,
        donate=True, augment_fn=augment_fn, cached=cached,
    )
    return model, criterion, state, step_fn, mesh


def setup_device_cache(opt: Config, train_loader, images0, mesh, tag: str):
    """Build the opt-in device-resident image cache (data/device_cache.py).

    Returns (cache, cache_images): ``cache`` is None unless
    ``--cache_device``; ``cache_images`` is the HBM-resident pool, replicated
    across the mesh when one is active (each device gathers its own data
    shard's raw batch in-program)."""
    if not opt.cache_device:
        return None, None
    from ..data.device_cache import DeviceImageCache

    ds = train_loader.dataset
    tsize = getattr(getattr(ds, "transform", None), "size", None)
    cache = DeviceImageCache.from_dataset(ds, out_size=int(tsize or images0.shape[1]))
    print(
        f"[{tag}] device image cache: {tuple(cache.images.shape)} "
        f"{cache.images.dtype} ({cache.nbytes / 1e9:.2f} GB resident)"
    )
    cache_images = cache.images
    if mesh is not None:
        cache_images = jax.device_put(
            cache_images,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
    return cache, cache_images


def epoch_batches(train_loader, cache):
    """Per-batch (labels, images, indices) stream for the epoch loop.

    With a device cache only (labels, indices) are materialized on the host
    — images is None and the jitted step gathers the raw batch from HBM."""
    if cache is None:
        yield from train_loader
        return
    image_list = train_loader.dataset.image_list
    for bidx in train_loader.iter_index_batches():
        lab = np.asarray([image_list[i][1] for i in bidx], np.int32)
        yield lab, None, np.asarray(bidx, np.int32)


def run_train_step(step_fn, state, mesh, cache_images, lab, images, idx, sub):
    """Dispatch one train step across the (cached x mesh) pipeline variants.

    Host->device placement per variant: the cached paths ship only the
    int32 index/label vectors; the mesh paths shard the batch over the data
    axis and replicate the PRNG key."""
    from ..parallel.mesh import shard_batch

    if cache_images is not None:
        if mesh is not None:
            idx_d, labels_d = shard_batch(mesh, (np.asarray(idx), np.asarray(lab)))
            sub_d = jax.device_put(
                sub, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            )
            return step_fn(state, idx_d, labels_d, sub_d, cache_images)
        return step_fn(state, jnp.asarray(idx), jnp.asarray(lab), sub, cache_images)
    if mesh is not None:
        images_d, labels_d = shard_batch(mesh, (np.asarray(images), np.asarray(lab)))
        sub_d = jax.device_put(
            sub, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        return step_fn(state, images_d, labels_d, sub_d)
    return step_fn(state, jnp.asarray(images), jnp.asarray(lab), sub)


def maybe_step_checkpoint(opt: Config, run_dir: str, state, epoch: int, step: int):
    """Step-granular periodic checkpoint (``--checkpoint_every_steps N``).

    Refreshes ``{run_dir}/latest`` every N optimizer steps so a preempted TPU
    job loses at most N steps of model/optimizer progress on long epochs
    (SOP: 1000+ steps).  Resume restarts the interrupted epoch
    (``--resume_path .../latest``); the save pulls the (possibly dp x tp
    sharded) tree to host, and ``load_checkpoint(..., shardings=...)``
    replaces it onto a fresh mesh (tests/test_checkpoint_mesh.py).  The
    reference checkpoints per epoch only (utilities/misc.py:42-69)."""
    every = int(getattr(opt, "checkpoint_every_steps", 0) or 0)
    if not every or step % every:
        return
    from ..core.checkpoint import save_checkpoint

    ckpt = {
        "params": state.params, "batch_stats": state.batch_stats,
        "loss_params": state.loss_params, "opt_state": state.opt_state,
        "step": state.step, "epoch": epoch,
    }
    save_checkpoint(f"{run_dir}/latest", ckpt, {})


def resume_train_state(path: str, state):
    """Restore a trainer checkpoint (the {params, batch_stats, loss_params,
    opt_state, step, epoch} dict both trainers save) into a TrainState.

    The saved tree is a dict with an extra ``epoch`` leaf, so restoring with
    the bare TrainState as the orbax target mismatches structures; build the
    dict template from the live state instead.  Returns (state, saved_epoch)
    — reference resume semantics: continue from the checkpointed epoch
    (train_diml.py:206-213)."""
    from ..core.checkpoint import load_checkpoint
    from ..engine.train import TrainState

    tmpl = {
        "params": state.params, "batch_stats": state.batch_stats,
        "loss_params": state.loss_params, "opt_state": state.opt_state,
        "step": state.step, "epoch": 0,
    }
    try:
        restored = load_checkpoint(path, target=tmpl)
    except ValueError:
        # older/bare checkpoints without the epoch leaf (e.g. converted
        # pretrained checkpoints hold only params/batch_stats)
        restored = load_checkpoint(path)
    out = TrainState(
        params=restored.get("params", state.params),
        batch_stats=restored.get("batch_stats", state.batch_stats),
        loss_params=restored.get("loss_params", state.loss_params),
        opt_state=restored.get("opt_state", state.opt_state),
        step=restored.get("step", state.step),
    )
    return out, int(np.asarray(restored.get("epoch", 0)))


def maybe_msls_subcache_checkpoint(opt: Config, run_dir: str, variables,
                                   opt_state, it_count: int, epoch: int,
                                   dataset, metrics=None) -> bool:
    """Preemption-safe MSLS mid-epoch checkpoint at SUBCACHE granularity
    (VERDICT r4 item 6 — the MSLS workloads have the longest epochs:
    mining + triplet steps per subcache, reference training_tools/
    train_epoch.py:53-174).

    Enabled by the same ``--checkpoint_every_steps`` flag the DML trainers
    use; for MSLS the subcache boundary is the only point where the mining
    RNG / negCache / subset cursor are snapshot-consistent with the model,
    so any nonzero value saves there (a mid-subcache model save could not
    reproduce the interrupted subcache's triplets).  Saves the model tree to
    ``{run_dir}/latest`` and the mining state (data/msls.py::mining_state)
    to ``{run_dir}/latest_mining.pkl``; resume via ``--resume_path
    {run_dir}/latest`` restores BIT-IDENTICAL mining for every subsequent
    subcache (tests/test_msls.py::test_subcache_checkpoint_resume).

    Returns True when a checkpoint was written (the trainer's epoch-end eval
    save calls this FIRST with ``metrics`` so it doesn't clobber the rich
    tree with a model-only one, falling back to the plain save when the flag
    is off)."""
    if not int(getattr(opt, "checkpoint_every_steps", 0) or 0):
        return False
    import pickle

    from ..core.checkpoint import save_checkpoint

    ckpt = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": opt_state,
        "it_count": it_count,
        "epoch": epoch,
        # dataset.current_subset already points at the NEXT subcache
        "subset": int(dataset.current_subset),
    }
    save_checkpoint(f"{run_dir}/latest", ckpt, metrics or {})
    with open(f"{run_dir}/latest_mining.pkl", "wb") as f:
        pickle.dump(dataset.mining_state(), f)
    return True


def resume_msls_state(path: str, variables, opt_state):
    """Restore an MSLS trainer checkpoint written by
    :func:`maybe_msls_subcache_checkpoint` (or the per-epoch ``latest``).

    Returns ``(variables, opt_state, it_count, epoch, subset, mining_state)``
    — ``mining_state`` is None for per-epoch checkpoints (no .pkl sibling),
    in which case the caller restarts the epoch from subcache 0."""
    import pickle

    from ..core.checkpoint import load_checkpoint

    tmpl = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": opt_state,
        "it_count": 0,
        "epoch": 0,
        "subset": 0,
    }
    try:
        restored = load_checkpoint(path, target=tmpl)
    except ValueError:
        restored = load_checkpoint(path)
    variables = {
        "params": restored.get("params", variables["params"]),
        "batch_stats": restored.get("batch_stats",
                                    variables.get("batch_stats", {})),
    }
    opt_state = restored.get("opt_state", opt_state)
    mining = None
    pkl = os.path.join(os.path.dirname(path.rstrip("/")),
                       "latest_mining.pkl")
    # only trust the mining pkl when the checkpoint itself is a subcache-
    # boundary save (carries "subset"): the per-epoch eval save writes a
    # model-only tree to the same `latest` path and would leave the pkl stale
    if "subset" in restored and os.path.exists(pkl):
        with open(pkl, "rb") as f:
            mining = pickle.load(f)
    return (
        variables, opt_state,
        int(np.asarray(restored.get("it_count", 0))),
        int(np.asarray(restored.get("epoch", 0))),
        int(np.asarray(restored.get("subset", 0))),
        mining,
    )


def load_pretrained_into(opt: Config, variables):
    """Convert a torch checkpoint into the init pytree when configured."""
    if not opt.pretrained_ckpt or not os.path.exists(opt.pretrained_ckpt):
        return variables
    import torch

    from ..core import convert

    sd = torch.load(opt.pretrained_ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # strict load-time audit: fail with a named diff on unconsumed / missing
    # / shape-mismatched checkpoint keys BEFORE any weight lands in the model
    # (core/convert.py::audit_conversion; first-real-checkpoint hardening,
    # docs/MIGRATION.md runbook)
    report = convert.audit_conversion(opt.arch, sd, variables=variables, strict=True)
    p, s = report["params"], report["batch_stats"]
    if report["uncovered_init_leaves"]:
        heads = report["uncovered_init_leaves"]
        print(
            f"[convert:{opt.arch}] {len(heads)} init leaves not in the "
            f"checkpoint (fresh-head expected, strict=False semantics): "
            f"{heads[:8]}{' ...' if len(heads) > 8 else ''}"
        )
    out = dict(variables)
    out["params"] = convert.merge_params(dict(variables["params"]), p)
    if s:
        out["batch_stats"] = convert.merge_params(
            dict(variables.get("batch_stats", {})), s
        )
    return out
