"""Preemption-grade checkpointing under a dp x tp mesh (SURVEY section 5,
failure-recovery row; VERDICT r3 item 6).

The scenario a TPU-pod preemption creates: training runs with the TrainState
sharded over a data x model mesh, a step-granular checkpoint lands mid-epoch
(cli/common.py::maybe_step_checkpoint), the job dies, a NEW process builds a
FRESH mesh and must continue bit-identically.  The reference's resume is a
host-side torch.load once per epoch (train_diml.py:206-213,
utilities/misc.py:42-69) with no placement story.
"""

import types

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import vit_reranking_tpu.losses as losses
import vit_reranking_tpu.miners as miners
from vit_reranking_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from vit_reranking_tpu.engine.train import (
    TrainState,
    default_label_fn,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from vit_reranking_tpu.parallel.mesh import (
    create_mesh,
    shard_batch,
    tp_state_shardings,
)


def _tiny_model():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            B = x.shape[0]
            h = x.reshape(B, -1)
            h = nn.Dense(32, name="trunk")(h)
            h = nn.BatchNorm(use_running_average=not train, name="bn")(h)
            e = nn.Dense(16, name="head")(h)
            e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
            return e, (e, None), {}

    return Tiny()


def _build(mesh):
    opt = types.SimpleNamespace(
        n_classes=4, embed_dim=16, lr=1e-2, loss="margin",
        loss_margin_margin=0.2, loss_margin_nu=0.0,
        loss_margin_beta_constant=False, loss_margin_beta=1.2,
        loss_margin_beta_lr=5e-4,
        miner_distance_lower_cutoff=0.5, miner_distance_upper_cutoff=1.4,
    )
    miner = miners.select("distance", opt)
    criterion, _ = losses.select("margin", opt, miner)
    model = _tiny_model()
    tx = make_optimizer(
        "adam", 1e-2, 4e-4, tau=[1000], gamma=0.3, steps_per_epoch=10,
        group_lrs={"model": 1e-2, "criterion": 5e-4},
        label_fn=default_label_fn,
    )
    state = init_train_state(
        model, criterion, tx, jax.random.PRNGKey(0), jnp.zeros((32, 8, 8, 3))
    )
    # shard the embedding head's kernel over the model axis (output-feature
    # TP), everything else replicated — the production tp rule shape
    # (parallel/mesh.py::tp_state_shardings)
    state_sh = tp_state_shardings(mesh, state, [("head/kernel", P(None, "model"))])
    step_fn = make_train_step(
        model.apply, criterion, tx, mesh=mesh,
        state_shardings=state_sh, donate=False,
    )
    return state, state_sh, step_fn


def _batch(mesh):
    rng = np.random.default_rng(0)
    B = 32
    protos = rng.standard_normal((4, 8 * 8 * 3)).astype(np.float32)
    labels_np = (np.arange(B) % 4).astype(np.int32)
    images_np = (
        (protos[labels_np] + 3.0 * rng.standard_normal((B, 192)))
        .astype(np.float32)
        .reshape(B, 8, 8, 3)
    )
    return shard_batch(mesh, (images_np, labels_np))


def _run_steps(step_fn, mesh, state, steps, start=0):
    images, labels = _batch(mesh)
    rep = NamedSharding(mesh, P())
    for i in range(start, start + steps):
        key = jax.device_put(jax.random.PRNGKey(i), rep)
        state, m = step_fn(state, images, labels, key)
    return state, m


def test_sharded_midepoch_save_restore_bitident(tmp_path):
    """Save a dp4 x tp2-sharded TrainState mid-epoch, restore onto a fresh
    mesh in a fresh program, continue — final state bit-identical to an
    uninterrupted run."""
    devices = jax.devices()[:8]
    mesh = create_mesh(devices, mesh_shape="data:4,model:2")

    state, state_sh, step_fn = _build(mesh)
    state = jax.device_put(state, state_sh)

    # uninterrupted reference: 4 steps straight through
    ref_state, _ = _run_steps(step_fn, mesh, state, 4)

    # interrupted run: 2 steps, mid-epoch checkpoint (the sharded tree pulls
    # to host exactly like maybe_step_checkpoint's save)
    mid_state, _ = _run_steps(step_fn, mesh, state, 2)
    ckpt = {
        "params": mid_state.params, "batch_stats": mid_state.batch_stats,
        "loss_params": mid_state.loss_params, "opt_state": mid_state.opt_state,
        "step": mid_state.step, "epoch": 0,
    }
    save_checkpoint(str(tmp_path / "latest"), ckpt, {"r1": 0.0})

    # "new process": fresh mesh object, fresh shardings, fresh jit
    mesh2 = create_mesh(devices, mesh_shape="data:4,model:2")
    state2, state_sh2, step_fn2 = _build(mesh2)
    restored = load_checkpoint(str(tmp_path / "latest"), target=ckpt)
    restored_state = TrainState(
        params=restored["params"], batch_stats=restored["batch_stats"],
        loss_params=restored["loss_params"], opt_state=restored["opt_state"],
        step=restored["step"],
    )
    restored_state = load_or_place(restored_state, state_sh2)

    # the restored leaves actually carry the requested mesh placement
    head_kernel = restored_state.params["head"]["kernel"]
    assert head_kernel.sharding.spec == P(None, "model")
    assert restored_state.params["trunk"]["kernel"].sharding.spec == P()

    cont_state, _ = _run_steps(step_fn2, mesh2, restored_state, 2, start=2)

    ref_leaves = jax.tree.leaves(ref_state)
    cont_leaves = jax.tree.leaves(cont_state)
    assert len(ref_leaves) == len(cont_leaves)
    for a, b in zip(ref_leaves, cont_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def load_or_place(tree, shardings):
    """device_put a restored host tree onto mesh shardings — the
    load_checkpoint(shardings=...) path, exposed for reuse in the test."""
    return jax.device_put(tree, shardings)


def test_load_checkpoint_shardings_arg(tmp_path):
    """load_checkpoint(shardings=...) places the restored tree directly."""
    devices = jax.devices()[:8]
    mesh = create_mesh(devices, mesh_shape="data:4,model:2")
    tree = {"w": np.arange(64, dtype=np.float32).reshape(8, 8), "b": np.ones(8, np.float32)}
    save_checkpoint(str(tmp_path / "ck"), tree)
    sh = {
        "w": NamedSharding(mesh, P(None, "model")),
        "b": NamedSharding(mesh, P()),
    }
    restored = load_checkpoint(str(tmp_path / "ck"), target=tree, shardings=sh)
    assert restored["w"].sharding.spec == P(None, "model")
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
