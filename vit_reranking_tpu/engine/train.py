"""Training engine: jitted train step over a device mesh + epoch driver.

Mirrors the reference's inline epoch loop (train_baseline.py:166-337) and
train_diml.py:217-413, with the throughput sinks removed: mining runs on
device (no per-anchor numpy), gradients reduce via XLA collectives over the
``data`` mesh axis (no DataParallel scatter/gather), and grad-norm logging
comes back as part of the step's metrics instead of a per-step full gradient
download (train_baseline.py:217-220).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..parallel.mesh import DATA_AXIS, batch_sharding, create_mesh, replicated


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    loss_params: Any
    opt_state: Any
    step: jnp.ndarray


def multistep_schedule(base_lr: float, tau, gamma: float, steps_per_epoch: int):
    """torch MultiStepLR semantics: lr * gamma^(#milestones passed), stepped
    per epoch (train_baseline.py:119-120)."""
    milestones = sorted(int(t) for t in tau)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        k = jnp.sum(jnp.asarray([epoch >= m for m in milestones]).astype(jnp.int32)) if milestones else 0
        return base_lr * (gamma ** k)

    return schedule


def make_optimizer(
    opt_name: str,
    base_lr: float,
    weight_decay: float,
    tau,
    gamma: float,
    steps_per_epoch: int,
    group_lrs: Dict[str, float],
    label_fn: Callable[[Any], Any],
    momentum: float = 0.9,
):
    """Parameter-group optimizer matching torch semantics.

    torch.optim.Adam applies weight_decay as L2 *before* the moment updates;
    we chain add_decayed_weights first accordingly.  ``group_lrs`` maps label
    -> base lr ('model' must be present); every group shares the MultiStepLR
    decay profile (reference wires one scheduler over all groups).
    """

    def group_tx(lr):
        sched = multistep_schedule(lr, tau, gamma, steps_per_epoch)
        if opt_name == "adam":
            core = optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(),
            )
        elif opt_name == "sgd":
            core = optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.trace(decay=momentum),
            )
        else:
            raise ValueError(f"optimizer {opt_name} not supported")
        return optax.chain(core, optax.scale_by_schedule(lambda c: -sched(c)))

    transforms = {k: group_tx(v) for k, v in group_lrs.items()}
    return optax.multi_transform(transforms, label_fn)


def default_label_fn(tree):
    """Label every leaf under the top-level 'model'/'criterion' keys with that
    key (per-group learning rates, replacing the reference's to_optim list)."""
    return {k: jax.tree.map(lambda _: k, v) for k, v in tree.items()}


def make_train_step(
    model_apply: Callable,
    criterion,
    tx: optax.GradientTransformation,
    mesh=None,
    loss_input: str = "embed",
    pass_class_token: bool = False,
    donate: bool = True,
    state_shardings=None,
    augment_fn: Optional[Callable] = None,
    cached: bool = False,
):
    """Build the jitted train step.

    ``loss_input`` selects what feeds the criterion: 'embed' (global embedding,
    train_baseline.py:206-210) or 'per_feat' (per-patch map, the DIML losses,
    train_diml.py:249-258).

    ``augment_fn(key, raw) -> images`` runs train-time augmentation inside
    the compiled step (data/device_cache.py).  With ``cached`` the step
    signature becomes ``(state, idxs, labels, key, cache)``: the raw batch is
    gathered from the device-resident image cache in-program, so an epoch
    moves no image bytes over the host link (the cache rides along as a jit
    argument — never a closure: the axon remote-compile rejects large
    closure constants).
    """

    def step_fn(state: TrainState, images, labels, key):
        if augment_fn is not None:
            key, k_aug = jax.random.split(key)
            images = augment_fn(k_aug, images)

        def loss_fn(params, loss_params):
            out, new_stats = model_apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                rngs={"dropout": key, "droppath": key},
                mutable=["batch_stats"],
            )
            embed, (enc_out, token_map), _aux = out
            kwargs = {}
            if pass_class_token:
                kwargs["class_token"] = enc_out
            # out[0] is the global embedding for plain models and the
            # per-patch map for DIML models — both feed the criterion as-is
            loss = criterion(loss_params, embed, labels, key=key, **kwargs)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.loss_params
        )
        gmodel, gloss = grads
        updates, new_opt = tx.update(
            {"model": gmodel, "criterion": gloss},
            state.opt_state,
            {"model": state.params, "criterion": state.loss_params},
        )
        new_params = optax.apply_updates(state.params, updates["model"])
        new_loss_params = optax.apply_updates(state.loss_params, updates["criterion"])

        flat = jax.tree.leaves(gmodel)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in flat))
        gmax = jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in flat]))

        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats["batch_stats"],
            loss_params=new_loss_params,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {"loss": loss, "grad_l2": gnorm, "grad_max": gmax}
        return new_state, metrics

    if cached:
        core = step_fn

        def step_fn(state, idxs, labels, key, cache):
            return core(state, cache[idxs], labels, key)

    if mesh is not None:
        state_sh = state_shardings if state_shardings is not None else replicated(mesh)
        img_sh = batch_sharding(mesh, 4)
        lab_sh = batch_sharding(mesh, 1)
        rep = replicated(mesh)
        if cached:
            # idxs shard over the data axis; the image cache is replicated,
            # each device gathers its own shard's raw batch in-program
            in_sh = (state_sh, lab_sh, lab_sh, rep, rep)
        else:
            in_sh = (state_sh, img_sh, lab_sh, rep)
        step_fn = jax.jit(
            step_fn,
            in_shardings=in_sh,
            out_shardings=(state_sh, rep),
            donate_argnums=(0,) if donate else (),
        )
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return step_fn


def init_train_state(
    model,
    criterion,
    tx: optax.GradientTransformation,
    rng,
    sample_batch,
    train_kwargs: Optional[dict] = None,
) -> TrainState:
    kw = dict(train=False)
    kw.update(train_kwargs or {})
    variables = model.init({"params": rng}, sample_batch, **kw)
    loss_params = criterion.init_params(jax.random.fold_in(rng, 1))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    opt_state = tx.init({"model": params, "criterion": loss_params})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        loss_params=loss_params,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
