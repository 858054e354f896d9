"""MSLS recall evaluation (reference test_msls_baseline.py): load a
checkpoint, run msls_val with global + DIML-reranked Recall@N."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import models as archs
from ..core.checkpoint import load_checkpoint
from ..core.config import from_args
from ..engine.msls_val import msls_val
from .common import load_pretrained_into, seed_everything
from .train_msls_baseline import build_msls, make_extract_fn


def main(argv=None):
    opt = from_args(argv)
    seed_everything(opt.seed)
    eval_set = build_msls(opt, "val" if opt.dataset != "synthetic" else "train")

    model = archs.select(opt.arch, opt)
    size = 64 if opt.dataset == "synthetic" else (opt.imageresizeh, opt.imageresizew)
    h, w = (size, size) if isinstance(size, int) else size
    sample = jnp.zeros((2, h, w, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(opt.seed)}, sample, train=False)
    variables = load_pretrained_into(opt, variables)
    if opt.resume_path:
        restored = load_checkpoint(opt.resume_path)
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }

    extract = make_extract_fn(model, with_dense=opt.use_ot, grid_size=opt.grid_size)
    recalls = msls_val(
        eval_set, extract, trunc_nums=(0, 100) if opt.use_ot else (0,), batch=8,
        variables=variables,
    )
    for k, v in recalls.items():
        print(f"====> {k.replace('globalR_', 'Recall@').replace('dimlR_', 'DIML Recall@')}: {v:.4f}")
    return recalls


if __name__ == "__main__":
    main()
