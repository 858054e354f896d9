"""One-shot torch-checkpoint -> Orbax conversion.

The reference loads torch ``.pth`` files at model-construction time on every
run (architectures/cvt.py:695-722, vit.py:31-40, swin.py:23-37,
patchnetvlad.py:361-374); here the conversion (core/convert.py) can instead
run ONCE, producing a native Orbax checkpoint that every later train/eval
process restores with ``--resume_path`` — no torch import on the serving
path.

    python -m vit_reranking_tpu.cli.convert_checkpoint \
        --arch cvt_13_normalize --embed_dim 128 \
        --pretrained_ckpt CvT-13-224x224-IN-1k.pth --save_path ckpts/cvt13

The output layout matches engine checkpoints ({'params', 'batch_stats'}), so
``load_checkpoint(save_path)`` slots straight into ``model.init`` shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import models as archs
from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..core.config import from_args
from .common import load_pretrained_into


def main(argv=None):
    opt = from_args(argv)
    if not opt.pretrained_ckpt:
        raise SystemExit("--pretrained_ckpt is required")
    if not opt.save_path:
        raise SystemExit("--save_path is required (output checkpoint dir)")

    model = archs.select(opt.arch, opt)
    size = (
        (opt.imageresizeh, opt.imageresizew)
        if opt.arch.lower().startswith(("patchnetvlad", "netvlad"))
        else (224, 224)
    )
    sample = jnp.zeros((1, *size, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(opt.seed)}, sample, train=False
    )
    variables = load_pretrained_into(opt, variables)

    save_checkpoint(opt.save_path, dict(variables), metrics=None)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"converted {opt.pretrained_ckpt} -> {opt.save_path} ({n/1e6:.1f}M params)")

    # verification: restore and check the tree round-trips
    restored = load_checkpoint(opt.save_path)
    r = sum(x.size for x in jax.tree_util.tree_leaves(restored))
    assert r == n, (r, n)
    print("restore check OK")
    return opt.save_path


if __name__ == "__main__":
    main()
