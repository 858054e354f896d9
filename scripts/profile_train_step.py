"""Phase/op breakdown of the canonical CvT-13 train step (VERDICT r2 item 1).

Times, on the real chip with host-forced transfers:
  * the full jitted train step (forward + on-device mining + loss + backward
    + Adam) at the reference's canonical recipe (readme.md:3-4: bs 112,
    224px, margin loss + distance mining), f32 and bf16;
  * forward-only and forward+backward-only variants (isolates optimizer);
  * per-stage forwards (isolates where the time lives);
  * XLA's cost_analysis FLOPs for the full step -> an MFU estimate.

Usage: python scripts/profile_train_step.py [--bf16] [--bs 112] [--remat]
       [--trace /tmp/trace_dir]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                 out)  # force
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        # force a host transfer per rep: block_until_ready is unreliable
        # under the axon runtime (CLAUDE.md)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=112)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--bf16sm", action="store_true",
                    help="narrow attention scores/softmax to the compute "
                         "dtype (models/cvt.py::CvTAttention.narrow_sm)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--arch", default="cvt_13_normalize",
                    help="e.g. cvt_13_diml for the structural-loss step")
    ap.add_argument("--loss", default="margin",
                    help="e.g. margin_diml (train_diml.py's default pairing)")
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--micro_only", action="store_true",
                    help="skip the full train step (avoids its ~10-25 min compile)")
    ap.add_argument("--full_only", action="store_true",
                    help="skip the micro fwd/bwd/per-stage timings (8 compiles)")
    args = ap.parse_args()

    from vit_reranking_tpu.cli.common import build_training, seed_everything
    from vit_reranking_tpu.core.config import Config

    seed_everything(0)
    opt = Config(
        dataset="synthetic", arch=args.arch, loss=args.loss,
        batch_mining="distance", bs=args.bs, embed_dim=128,
        bf16=args.bf16, narrow_sm=args.bf16sm, remat=args.remat,
        device_batch=False,
    )
    rng = np.random.default_rng(0)
    images = rng.standard_normal((args.bs, args.size, args.size, 3)).astype(np.float32)
    labels = np.asarray(rng.integers(0, 16, size=args.bs), np.int32)
    # n_classes for the margin loss's per-class beta
    opt.n_classes = 16

    model, criterion, state, step_fn, mesh = build_training(
        opt, steps_per_epoch=10, sample_images=images[:2]
    )
    key = jax.random.PRNGKey(0)
    imgs_j, labs_j = jnp.asarray(images), jnp.asarray(labels)

    if args.micro_only:
        st = state
        micro(args, model, st, imgs_j, key)
        return

    # --- full step -------------------------------------------------------
    print("compiling full step ...", flush=True)
    t0 = time.time()
    state2, metrics = step_fn(state, imgs_j, labs_j, key)
    float(metrics["loss"])
    print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)

    def run_full(st):
        st, m = step_fn(st, imgs_j, labs_j, key)
        return st, m

    # donated state: keep threading it.  Two timings: per-rep host sync
    # (upper bound incl. the ~30-60ms axon round trip) and deferred sync
    # (the in-loop number RESULTS.md reports)
    reps = args.reps
    st = state2
    for _ in range(2):
        st, m = run_full(st)
    np.asarray(m["loss"])
    t0 = time.time()
    for _ in range(reps):
        st, m = run_full(st)
        np.asarray(m["loss"])
    t_sync = (time.time() - t0) / reps
    n_def = max(reps, 10)
    t0 = time.time()
    for _ in range(n_def):
        st, m = run_full(st)
    np.asarray(m["loss"])
    t_step = (time.time() - t0) / n_def
    print(f"full step: {t_step*1e3:.1f} ms deferred ({args.bs/t_step:.0f} img/s) "
          f"/ {t_sync*1e3:.1f} ms per-rep-sync", flush=True)

    # --- XLA cost analysis -> MFU ---------------------------------------
    try:
        lowered = step_fn.lower(st, imgs_j, labs_j, key)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        print(f"XLA cost_analysis flops/step: {flops/1e12:.2f} TFLOP")
        print(f"achieved: {flops/t_step/1e12:.1f} TFLOP/s "
              f"(v5e bf16 peak ~197 TFLOP/s -> MFU {flops/t_step/197e12*100:.1f}%)",
              flush=True)
        # bytes accessed -> memory-roofline side of the picture (v5e HBM
        # ~819 GB/s peak; ~634 GB/s measured on a fused reduce, RESULTS.md)
        byt = float(ca.get("bytes accessed", 0.0))
        if byt:
            print(f"XLA cost_analysis bytes/step: {byt/1e9:.2f} GB -> "
                  f"{byt/t_step/1e9:.0f} GB/s achieved "
                  f"({byt/t_step/819e9*100:.0f}% of 819 GB/s peak)",
                  flush=True)
    except Exception as e:  # cost_analysis availability varies by backend
        print("cost_analysis unavailable:", e)

    if not args.full_only:
        micro(args, model, st, imgs_j, key)

    if args.trace:
        import os

        os.makedirs(args.trace, exist_ok=True)
        with jax.profiler.trace(args.trace):
            st, m = run_full(st)
            np.asarray(m["loss"])
        print(f"profiler trace written to {args.trace}")


def micro(args, model, st, imgs_j, key):
    """Forward / forward+backward / per-stage timings.  Every timed fn
    returns a SCALAR checksum — returning activations would make the timing
    transfer-bound on this host's ~50 MB/s tunnel, and returning only the
    loss from value_and_grad would let XLA dead-code-eliminate the entire
    backward pass."""
    reps = args.reps
    variables = {"params": st.params, "batch_stats": st.batch_stats}

    @jax.jit
    def fwd(v, images):
        out, _ = model.apply(v, images, train=True, mutable=["batch_stats"],
                             rngs={"dropout": key, "droppath": key})
        return jnp.sum(out[0].astype(jnp.float32) ** 2)

    t_fwd = timed(fwd, variables, imgs_j, reps=reps)
    print(f"forward only (train mode): {t_fwd*1e3:.1f} ms "
          f"(incl. ~30-60 ms sync RTT)", flush=True)

    @jax.jit
    def fwd_bwd(v, images):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, images,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": key, "droppath": key},
            )
            return jnp.sum(out[0].astype(jnp.float32) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        # checksum keeps every gradient live
        return loss + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in jax.tree.leaves(grads))

    t_bwd = timed(fwd_bwd, variables, imgs_j, reps=reps)
    print(f"forward+backward (sum-loss): {t_bwd*1e3:.1f} ms", flush=True)

    # --- per-stage forwards ----------------------------------------------
    from vit_reranking_tpu.models.cvt import CVT13_SPEC, CvTStage

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    x = imgs_j
    for i in range(3):
        stage = CvTStage(spec=CVT13_SPEC, index=i, dtype=dtype,
                         narrow_sm=args.bf16sm)
        v = stage.init({"params": jax.random.PRNGKey(i)}, x[:2], train=False)

        @jax.jit
        def stage_fwd(v, x, stage=stage):
            (y, _, _), _ = stage.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": key, "droppath": key},
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        @jax.jit
        def stage_fwd_bwd(v, x, stage=stage):
            def loss_fn(params):
                (y, _, _), _ = stage.apply(
                    {"params": params, "batch_stats": v["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": key, "droppath": key},
                )
                return jnp.sum(y.astype(jnp.float32) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(v["params"])
            return loss + sum(jnp.sum(g.astype(jnp.float32) ** 2)
                              for g in jax.tree.leaves(grads))

        t_s = timed(stage_fwd, v, x, reps=reps)
        t_sb = timed(stage_fwd_bwd, v, x, reps=reps)
        nxt, _, _ = stage.apply(v, x, train=False)
        print(f"stage {i}: fwd {t_s*1e3:.1f} ms / fwd+bwd {t_sb*1e3:.1f} ms "
              f"(in {x.shape} -> {nxt.shape})", flush=True)
        x = jnp.asarray(nxt)


if __name__ == "__main__":
    main()
