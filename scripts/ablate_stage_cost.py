"""Attribute the CvT stage-0/1 train cost (scripts/profile_train_step.py
found them at <10% MFU while stage 2 runs ~28%).

Ablations, each a separate compile of the stage-0 (or chosen) fwd+bwd at the
canonical shapes:
  base        unmodified stage
  bn_frozen   BatchNorms on running stats (isolates train-mode stats cost)
  k1proj      q/k/v ConvProj kernel 3 -> 1 (isolates the depthwise 3x3s)
  flash       attention via the shipped Pallas TPU flash kernel
              (jax.experimental.pallas.ops.tpu.flash_attention) instead of
              materializing the (T, T_kv) probs

Usage: python scripts/ablate_stage_cost.py [--stage 0] [--bf16] [--bs 112]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--bs", type=int, default=112)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cases", nargs="+",
                    default=["base", "bn_frozen", "k1proj", "flash"])
    args = ap.parse_args()

    from vit_reranking_tpu.models import cvt as cvt_mod
    from vit_reranking_tpu.models.cvt import CVT13_SPEC, CvTStage

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    sizes = {0: (224, 3), 1: (56, 64), 2: (28, 192)}
    side, cin = sizes[args.stage]
    x = jnp.asarray(rng.standard_normal((args.bs, side, side, cin)).astype(np.float32))

    def run_case(name):
        import dataclasses as dc

        spec = CVT13_SPEC
        if name == "k1proj":
            spec = dc.replace(
                spec, kernel_qkv=(1, 1, 1), padding_kv=(0, 0, 0),
                padding_q=(0, 0, 0),
            )
        stage = CvTStage(spec=spec, index=args.stage, dtype=dtype)
        frozen = name == "bn_frozen"

        old_flash = getattr(cvt_mod, "USE_FLASH_ATTENTION", None)
        if name == "flash":
            cvt_mod.USE_FLASH_ATTENTION = True
        try:
            v = stage.init({"params": jax.random.PRNGKey(0)}, x[:2], train=False)

            @jax.jit
            def fwd_bwd(v, x):
                def loss_fn(params):
                    (y, _, _), _ = stage.apply(
                        {"params": params, "batch_stats": v["batch_stats"]}, x,
                        train=not frozen, mutable=["batch_stats"],
                        rngs={"dropout": key, "droppath": key},
                    )
                    return jnp.sum(y.astype(jnp.float32) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(v["params"])
                return loss + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                  for g in jax.tree.leaves(grads))

            t0 = time.time()
            first = fwd_bwd(v, x)
            np.asarray(first)
            tc = time.time() - t0
            t = timed(fwd_bwd, v, x, reps=args.reps)
            print(f"{name}: {t*1e3:.1f} ms fwd+bwd (compile {tc:.0f}s)", flush=True)
        finally:
            if old_flash is None:
                if hasattr(cvt_mod, "USE_FLASH_ATTENTION"):
                    cvt_mod.USE_FLASH_ATTENTION = False
            else:
                cvt_mod.USE_FLASH_ATTENTION = old_flash

    for name in args.cases:
        if name == "flash" and not hasattr(cvt_mod, "USE_FLASH_ATTENTION"):
            print("flash: model has no USE_FLASH_ATTENTION switch yet — skipped")
            continue
        run_case(name)


if __name__ == "__main__":
    main()
