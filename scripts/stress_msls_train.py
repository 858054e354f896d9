"""MSLS production-scale cached training cycle on the real chip (VERDICT r4
item 7): round-3's device-pool numbers were toy-scale (48q/96db, 64px); this
runs ONE real-geometry subcache cycle — 1000 cached queries, 480x640 uint8
frames, pools sized like a real city subcache — through pool-load, mining,
and triplet steps, recording each phase's wall-clock and peak HBM.

Matches the reference cycle training_tools/msls.py:416-567 (subcache
mining) + train_epoch.py:53-174 (triplet steps); the device-resident design
is data/device_cache.py::MSLSSubcachePool, and the step replicates
cli/train_msls_baseline.py::train_step_cached (margin triplet, Adam)
without the teacher/XBM branches.

uint8 store: the synthetic dataset here renders RAW uint8 frames at
(480, 640) via the ``load_key_uint8`` pool hook, so the pools carry the
same bytes/frame a real photo subcache does (the r3 synthetic pools stored
f32 at 4x the bytes); normalization runs inside the jitted programs.

Usage: python scripts/stress_msls_train.py [--queries 1000] [--negs 1000]
         [--h 480] [--w 640] [--steps 24] [--bs 4] [--nneg 5]
"""

import argparse
import time
import types

import numpy as np
import jax
import jax.numpy as jnp
import optax


def hbm(tag):
    try:
        st = jax.devices()[0].memory_stats()
        print(f"[hbm] {tag}: in_use {st.get('bytes_in_use', 0)/1e9:.2f} GB, "
              f"peak {st.get('peak_bytes_in_use', 0)/1e9:.2f} GB", flush=True)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--db", type=int, default=20000)
    ap.add_argument("--negs", type=int, default=1000)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--nneg", type=int, default=5)
    ap.add_argument("--cachebatch", type=int, default=20)
    ap.add_argument("--arch", default="resnet50_normalize")
    args = ap.parse_args()

    from vit_reranking_tpu import models as archs
    from vit_reranking_tpu.data.device_cache import _MEAN, _STD, MSLSSubcachePool
    from vit_reranking_tpu.data.msls import SyntheticMSLS
    from vit_reranking_tpu.losses.msls import msls_triplet_loss

    H, W = args.h, args.w

    class ProdSyntheticMSLS(SyntheticMSLS):
        """480x640 uint8 frames through the load_key_uint8 pool hook."""

        def load_key_uint8(self, key):
            frames = []
            for name in key.split(","):
                img = self.load_frame(name)          # (s, s, 3) float
                # tile the square procedural pattern to (H, W) and quantize
                ry = -(-H // img.shape[0])
                rx = -(-W // img.shape[1])
                big = np.tile(img, (ry, rx, 1))[:H, :W]
                frames.append(
                    np.clip((big + 3.0) / 6.0 * 255.0, 0, 255).astype(np.uint8)
                )
            return frames[0] if len(frames) == 1 else np.stack(frames)

    t0 = time.time()
    ds = ProdSyntheticMSLS(
        n_queries=args.queries * 2, n_db=args.db, nNeg=args.nneg,
        image_size=64, cached_queries=args.queries,
        cached_negatives=args.negs, seed=0,
    )
    # mark as un-normalized so pools store uint8 and programs normalize
    ds.transform = types.SimpleNamespace(resize=(H, W))
    ds.new_epoch()
    print(f"dataset: {len(ds.qIdx)} queries / {args.db} db, "
          f"{ds.nCacheSubset} subcaches ({time.time()-t0:.1f}s)", flush=True)

    opt_ns = types.SimpleNamespace(
        embed_dim=256, bf16=None, narrow_sm=None, blk_ind=0, arch=args.arch,
        not_pretrained=True,
    )
    model = archs.select(args.arch, opt_ns)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, H, W, 3)), train=False
    )
    tx = optax.adam(1e-4)
    opt_state = tx.init(variables["params"])

    # ---- phase 1: pool load (host render + 50 MB/s tunnel) ----------------
    t0 = time.time()
    qidxs, pidxs, nidxs = ds._select_pools()
    pool = MSLSSubcachePool.build(ds, qidxs, pidxs, nidxs, pad_to=256)
    jax.block_until_ready(pool.dbpool)
    t_pool = time.time() - t0
    print(f"pool load: q{tuple(pool.qpool.shape)} db{tuple(pool.dbpool.shape)} "
          f"{pool.dbpool.dtype} = {pool.nbytes/1e9:.2f} GB resident "
          f"in {t_pool:.1f}s", flush=True)
    hbm("pools")

    # ---- phase 2: mining (one-dispatch embeds + host triplet select) ------
    t0 = time.time()
    qv, pv, nv = pool.embed_split(model, variables, batch=args.cachebatch)
    t_embed = time.time() - t0
    t0 = time.time()
    ds._mine_from_vecs(qidxs, pidxs, nidxs, qv, pv, nv)
    t_mine = time.time() - t0
    print(f"mining: embed {t_embed:.1f}s "
          f"({(len(qv)+len(pv)+len(nv))/max(t_embed,1e-9):.0f} img/s), "
          f"select {t_mine:.1f}s, {len(ds.triplets)} triplets", flush=True)
    hbm("mining")

    # ---- phase 3: cached triplet steps (in-program gather + normalize) ----
    def prep(x):
        return (x.astype(jnp.float32) / 255.0 - _MEAN) / _STD

    @jax.jit
    def step(params, bstats, opt_state, qrows, prows, negrows, qpool, dbpool):
        def loss_fn(params):
            q, p = prep(qpool[qrows]), prep(dbpool[prows])
            negs = prep(dbpool[negrows])
            nq = q.shape[0]
            images = jnp.concatenate(
                [q, p, negs.reshape(-1, *negs.shape[-3:])], 0)
            out, new_stats = model.apply(
                {"params": params, "batch_stats": bstats}, images,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0),
                      "droppath": jax.random.PRNGKey(0)},
            )
            emb = out[0]
            eq, ep = emb[:nq], emb[nq: 2 * nq]
            en = emb[2 * nq:].reshape(nq, -1, emb.shape[-1])
            return msls_triplet_loss(eq, ep, en, margin=ds.margin), new_stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                new_stats["batch_stats"], opt_state, loss)

    trips = list(range(len(ds)))
    params, bstats = variables["params"], variables.get("batch_stats", {})
    t_compile = t_steady = None
    losses = []
    n_run = 0
    t0 = time.time()
    for i, s in enumerate(range(0, len(trips) - args.bs + 1, args.bs)):
        ids = trips[s: s + args.bs]
        qrows, prows, negrows = pool.rows(ds.triplets, ids)
        params, bstats, opt_state, loss = step(
            params, bstats, opt_state, jnp.asarray(qrows),
            jnp.asarray(prows), jnp.asarray(negrows),
            pool.qpool, pool.dbpool,
        )
        if i == 0:
            np.asarray(loss)
            t_compile = time.time() - t0
            print(f"first step (compile): {t_compile:.1f}s", flush=True)
            t0 = time.time()
        losses.append(loss)
        n_run += 1
        if n_run - 1 >= args.steps:
            break
    losses = [float(x) for x in losses]
    t_steady = (time.time() - t0) / max(n_run - 1, 1)
    imgs = args.bs * (2 + args.nneg)
    print(f"steady step: {t_steady*1e3:.1f} ms ({imgs/t_steady:.0f} img/s at "
          f"{H}x{W}), loss[0]={losses[0]:.4f} loss[-1]={losses[-1]:.4f}",
          flush=True)
    hbm("steps")
    assert all(np.isfinite(losses)), "non-finite loss"
    full_steps = len(ds) // args.bs
    print(f"cycle extrapolation: pool {t_pool:.1f}s + mine "
          f"{t_embed + t_mine:.1f}s + {full_steps} steps x {t_steady*1e3:.0f} "
          f"ms = {t_pool + t_embed + t_mine + full_steps * t_steady:.1f}s "
          f"per subcache", flush=True)
    print("STRESS OK", flush=True)


if __name__ == "__main__":
    main()
