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
    if not opt.save_path and not opt.audit:
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

    if opt.audit:
        # dry mode: run the conversion under the consumption audit and print
        # the full named diff — nothing is written (VERDICT r3 item 4; see
        # docs/MIGRATION.md "first real checkpoint" runbook)
        import torch

        from ..core import convert

        sd = torch.load(opt.pretrained_ckpt, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
            sd = sd["model"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        report = convert.audit_conversion(opt.arch, sd, variables=variables, strict=False)
        print(f"[audit:{opt.arch}] {report['n_consumed']}/{report['n_keys']} keys consumed")
        for field in ("unconsumed", "ignored_unconsumed", "shape_mismatches",
                      "structural_extras", "uncovered_init_leaves"):
            vals = report[field]
            print(f"  {field}: {len(vals)}")
            for v in vals[:40]:
                print(f"    {v}")
            if len(vals) > 40:
                print(f"    ... +{len(vals) - 40} more")
        if report["problems"]:
            print("AUDIT FAILED:")
            for pr in report["problems"]:
                print(f"  - {pr}")
            raise SystemExit(1)
        print("audit OK (would convert cleanly)")
        return None

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
