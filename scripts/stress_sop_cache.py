"""SOP-scale device-cache validation on the real chip (VERDICT r3 item 7).

RESULTS.md claims the SOP train pool (59,551 images as uint8 at the 256px
store = ~11.7 GB) fits v5e HBM next to the model; this proves it:

  phase 1: synthetic 59,551-image uint8 pool resident in HBM, canonical
    CvT-13 bs=112 cached train steps (in-program gather + RandomResizedCrop
    + flip + normalize, bf16+narrow_sm production config) — steady s/epoch
    + peak HBM recorded, OOM-free.
  phase 2 (separate pool, same process after freeing phase 1): synthetic
    60,480-image uint8 EVAL pool (224px center-crop store), one-program
    extraction + blocked exact top-k R@1 — the SOP eval shape
    (reference scripts/diml/test_diml_cvt_sop.sh:331-336 stress configs).

Usage: python scripts/stress_sop_cache.py [--n_train 59551] [--n_test 60480]
       [--steps 160] [--arch cvt_13_normalize]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def hbm_stats(tag):
    try:
        st = jax.devices()[0].memory_stats()
        used = st.get("bytes_in_use", 0) / 1e9
        peak = st.get("peak_bytes_in_use", 0) / 1e9
        lim = st.get("bytes_limit", 0) / 1e9
        print(f"[hbm] {tag}: in_use {used:.2f} GB, peak {peak:.2f} GB, "
              f"limit {lim:.2f} GB", flush=True)
        return peak
    except Exception as e:
        print(f"[hbm] {tag}: memory_stats unavailable ({e})", flush=True)
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_train", type=int, default=59551)
    ap.add_argument("--n_test", type=int, default=60480)
    ap.add_argument("--bs", type=int, default=112)
    ap.add_argument("--store", type=int, default=256)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=160,
                    help="timed steps (a full SOP epoch is ~531; 160 is "
                         "enough for a steady rate)")
    ap.add_argument("--arch", default="cvt_13_normalize")
    ap.add_argument("--n_classes", type=int, default=11318)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_eval", action="store_true")
    args = ap.parse_args()

    from vit_reranking_tpu.cli.common import build_training, seed_everything
    from vit_reranking_tpu.core.config import Config
    from vit_reranking_tpu.data.device_cache import DeviceImageCache

    seed_everything(0)
    hbm_stats("start")

    if not args.skip_train:
        # ---- phase 1: train pool + cached steps ---------------------------
        key = jax.random.PRNGKey(0)
        # pool synthesized ON DEVICE: 11.7 GB over the ~50 MB/s host tunnel
        # would take ~4 min and prove nothing
        pool = jax.jit(
            lambda k: jax.random.randint(
                k, (args.n_train, args.store, args.store, 3), 0, 256,
                dtype=jnp.uint8,
            )
        )(key)
        np.asarray(pool[0, 0, 0])  # materialize
        print(f"train pool: {tuple(pool.shape)} uint8 = "
              f"{pool.size / 1e9:.2f} GB", flush=True)
        hbm_stats("train pool resident")

        cache = DeviceImageCache(pool, args.size, "base", normalized=False)
        labels_all = (np.arange(args.n_train) % args.n_classes).astype(np.int32)

        opt = Config(
            dataset="synthetic", arch=args.arch, loss="margin",
            batch_mining="distance", bs=args.bs, embed_dim=128,
            bf16=True, narrow_sm=True, device_batch=False,
        )
        opt.n_classes = args.n_classes
        sample = np.zeros((2, args.size, args.size, 3), np.float32)
        model, criterion, state, step_fn, mesh = build_training(
            opt, steps_per_epoch=531, sample_images=sample,
            augment_fn=cache.augment, cached=True,
        )
        hbm_stats("model + optimizer resident")

        rng = np.random.default_rng(0)
        steps_per_epoch = args.n_train // args.bs

        def batch(i):
            idx = rng.integers(0, args.n_train, size=args.bs).astype(np.int32)
            return jnp.asarray(idx), jnp.asarray(labels_all[idx])

        print("compiling cached train step ...", flush=True)
        t0 = time.time()
        idx0, lab0 = batch(0)
        state, m = step_fn(state, idx0, lab0, key, cache.images)
        print(f"  compile+first: {time.time() - t0:.1f}s", flush=True)
        hbm_stats("after first step (activations live)")

        for i in range(3):
            idx, lab = batch(i)
            state, m = step_fn(state, idx, lab, key, cache.images)
        np.asarray(m["loss"])
        t0 = time.time()
        for i in range(args.steps):
            idx, lab = batch(i)
            state, m = step_fn(state, idx, lab, key, cache.images)
        np.asarray(m["loss"])
        dt = (time.time() - t0) / args.steps
        print(f"cached SOP train step: {dt * 1e3:.1f} ms "
              f"({args.bs / dt:.0f} img/s) -> full epoch "
              f"({steps_per_epoch} steps) = {dt * steps_per_epoch:.1f} s",
              flush=True)
        assert np.isfinite(float(np.asarray(m['loss'])))
        peak = hbm_stats("train steady state")
        print(f"TRAIN OK peak_hbm={peak:.2f}GB", flush=True)
        # free phase-1 state before the eval pool lands
        del pool, cache, state, m, step_fn, model, criterion
        import gc

        gc.collect()

    if args.skip_eval:
        return

    # ---- phase 2: eval pool + one-program extraction + blocked top-k ------
    from vit_reranking_tpu.data.device_cache import DeviceEvalCache
    from vit_reranking_tpu.engine.extract import extract_features_device
    from vit_reranking_tpu.ops.topk import pairwise_topk

    from vit_reranking_tpu import models as archs
    from vit_reranking_tpu.core.config import Config as C2

    key = jax.random.PRNGKey(1)
    pool_e = jax.jit(
        lambda k: jax.random.randint(
            k, (args.n_test, args.size, args.size, 3), 0, 256, dtype=jnp.uint8
        )
    )(key)
    np.asarray(pool_e[0, 0, 0])
    labels_e = (np.arange(args.n_test) % args.n_classes).astype(np.int32)
    print(f"eval pool: {tuple(pool_e.shape)} uint8 = "
          f"{pool_e.size / 1e9:.2f} GB", flush=True)
    hbm_stats("eval pool resident")

    opt2 = C2(dataset="synthetic", arch=args.arch, embed_dim=128, bf16=True,
              narrow_sm=True)
    model = archs.select(args.arch, opt2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, args.size, args.size, 3), jnp.float32), train=False,
    )

    # chunk_images bounds the in-program layout copy of the pool (the full
    # 8.5 GB pool goes resident twice otherwise — measured OOM, RESULTS.md)
    chunk = 12096 if args.n_test % 12096 == 0 else 64 * max(args.n_test // 320, 1)
    print(f"compiling chunked extraction (chunk {chunk}) ...", flush=True)
    t0 = time.time()
    res = extract_features_device(
        model, variables, pool_e, batch_size=64, grid_size=1,
        uint8_input=True, chunk_images=chunk,
    )
    centers = res["center"]
    np.asarray(centers[0])
    print(f"  compile+first: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    res = extract_features_device(
        model, variables, pool_e, batch_size=64, grid_size=1,
        uint8_input=True, chunk_images=chunk,
    )
    centers = res["center"]
    np.asarray(centers[0])
    t_ex = time.time() - t0
    print(f"extraction: {t_ex:.1f} s steady "
          f"({args.n_test / t_ex:.0f} img/s)", flush=True)
    hbm_stats("extraction steady")

    t0 = time.time()
    _, top = pairwise_topk(centers, centers, k=128, mask_self=True)
    r1_hits = np.asarray(top[:, 0])
    r1 = float((labels_e[r1_hits] == labels_e).mean()) * 100
    t_tk = time.time() - t0
    print(f"stage-0 blocked top-128 of {args.n_test}^2: {t_tk:.1f} s, "
          f"R@1 {r1:.2f} (random-pixel pool; finite = pass)", flush=True)
    peak = hbm_stats("eval steady state")
    print(f"EVAL OK peak_hbm={peak:.2f}GB", flush=True)


if __name__ == "__main__":
    main()
