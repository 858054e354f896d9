"""Unified checkpoint store (Orbax): params / batch_stats / loss_params /
opt_state / step / metrics / rng in one tree.

Replaces the reference's three coexisting torch formats (SURVEY.md section 5:
utilities/misc.py:42-69 latest.pth/best.pth, training_tools/tools.py:113-120
checkpoint.pth.tar, evaluation/__init__.py:68-76 set_checkpoint) with one
layout and the same latest/best semantics.  Torch-checkpoint *import*
converters live in core/convert.py.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import numpy as np
import jax
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any], metrics: Optional[dict] = None):
    """Save a state pytree to ``path`` (a directory).  ``metrics`` (plain
    floats) is stored alongside as JSON for quick inspection."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_host(state))
    if metrics is not None:
        with open(path + ".metrics.json", "w") as f:
            json.dump(metrics, f, indent=1)


def load_checkpoint(
    path: str, target: Optional[Any] = None, shardings: Optional[Any] = None
):
    """Load a checkpoint saved by save_checkpoint.  When ``target`` is given,
    the restored arrays adopt its structure/dtypes.

    ``shardings`` places the restored tree onto a device mesh: either one
    ``NamedSharding`` for the whole tree or a pytree of shardings matching
    the restored structure (e.g. ``parallel.mesh.tp_state_shardings`` output).
    This is the preemption-recovery path for dp x tp training: a mid-epoch
    checkpoint saved from a sharded TrainState restores onto a FRESH mesh and
    training continues bit-identically (tests/test_checkpoint_mesh.py; the
    reference's resume is host-side torch.load, train_diml.py:206-213, and
    has no notion of placement)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(path, item=_to_host(target))
        else:
            restored = ckptr.restore(path)
    if shardings is not None:
        restored = jax.device_put(restored, shardings)
    return restored


def copy_best(run_dir: str, name: str = "latest"):
    """latest -> best copy (reference train_baseline.py:314-318)."""
    src = os.path.join(run_dir, name)
    dst = os.path.join(run_dir, "best")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    if os.path.exists(src + ".metrics.json"):
        shutil.copyfile(src + ".metrics.json", dst + ".metrics.json")
