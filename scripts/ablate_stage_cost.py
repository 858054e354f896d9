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
  remat       jax.checkpoint around every block (recompute vs residual HBM
              traffic on the bandwidth-bound backward)
  bf16sm      attention scores + softmax in the compute dtype instead of
              pinned f32 (halves the prob-materialization traffic)
  noattn      skip score/softmax/value einsums entirely (out = projected q);
              garbage math, isolates the attention-materialization cost

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
        stage = CvTStage(spec=spec, index=args.stage, dtype=dtype,
                         remat=name == "remat",
                         narrow_sm=name in ("bf16sm", "kvres_sm"))
        frozen = name == "bn_frozen"

        old_flash = getattr(cvt_mod, "USE_FLASH_ATTENTION", None)
        old_kvres = getattr(cvt_mod, "USE_KV_RESIDENT_ATTENTION", None)
        old_attn = cvt_mod.CvTAttention
        # force both kernel switches per case (kvres defaults ON since
        # round 4 — non-kvres cases must measure the plain XLA path)
        cvt_mod.USE_FLASH_ATTENTION = name == "flash"
        # kv-resident fused attention (ops/attention_pallas.py): probs
        # never touch HBM in fwd OR bwd; custom VJP
        cvt_mod.USE_KV_RESIDENT_ATTENTION = name in ("kvres", "kvres_sm")
        if name == "noattn":
            import flax.linen as nn
            from vit_reranking_tpu.models.common import trunc_normal_init

            class NoAttn(cvt_mod.CvTAttention):
                @nn.compact
                def __call__(self, x, h, w, train=False, ret_attn=False):
                    B, T, C = x.shape
                    if self.with_cls_token:
                        cls_tok, tokens = x[:, :1], x[:, 1:]
                    else:
                        cls_tok, tokens = None, x
                    spatial = tokens.reshape(B, h, w, C)
                    q = cvt_mod.ConvProj(
                        self.dim, self.kernel, self.stride_q, self.padding_q,
                        dtype=self.dtype, name="conv_proj_q")(spatial, train)
                    k = cvt_mod.ConvProj(
                        self.dim, self.kernel, self.stride_kv, self.padding_kv,
                        dtype=self.dtype, name="conv_proj_k")(spatial, train)
                    v = cvt_mod.ConvProj(
                        self.dim, self.kernel, self.stride_kv, self.padding_kv,
                        dtype=self.dtype, name="conv_proj_v")(spatial, train)
                    if cls_tok is not None:
                        q = jnp.concatenate([cls_tok, q], axis=1)
                        k = jnp.concatenate([cls_tok, k], axis=1)
                        v = jnp.concatenate([cls_tok, v], axis=1)
                    proj = lambda nm: nn.Dense(
                        self.dim, use_bias=self.qkv_bias,
                        kernel_init=trunc_normal_init(), dtype=self.dtype,
                        name=nm)
                    # keep all projections live (k/v feed the checksum via +0
                    # mean so their convs/denses aren't DCE'd), drop only the
                    # score/softmax/value einsums
                    out = proj("proj_q")(q)
                    out = out + 0.0 * (jnp.mean(proj("proj_k")(k))
                                       + jnp.mean(proj("proj_v")(v)))
                    out = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                                   dtype=self.dtype, name="proj")(out)
                    return out, None

            cvt_mod.CvTAttention = NoAttn
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
            if old_flash is not None:
                cvt_mod.USE_FLASH_ATTENTION = old_flash
            if old_kvres is not None:
                cvt_mod.USE_KV_RESIDENT_ATTENTION = old_kvres
            cvt_mod.CvTAttention = old_attn

    for name in args.cases:
        if name == "flash" and not hasattr(cvt_mod, "USE_FLASH_ATTENTION"):
            print("flash: model has no USE_FLASH_ATTENTION switch yet — skipped")
            continue
        run_case(name)


if __name__ == "__main__":
    main()
