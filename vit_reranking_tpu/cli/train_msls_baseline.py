"""MSLS place-recognition training (reference train_msls_baseline.py +
training_tools/train_epoch.py) with optional distillation
(train_msls_distill.py + train_epoch_KD*.py) behind the same flags.

Per epoch: weighted query subcaches -> hard-negative mining with the CURRENT
model (jitted embed over the q/p/n pools, top-nNeg violating negatives) ->
triplet training over (q, p, negs) batches.  ``--distill embed`` adds the
SmoothL1 embedding-distillation term against a frozen teacher
(train_msls_baseline.py:126); ``--task_loss supcon`` swaps the task loss;
``--enable_xbm`` adds the cross-batch-memory triplet term.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import models as archs
from ..core.checkpoint import copy_best, load_checkpoint, save_checkpoint
from ..core.config import Config, from_args
from ..core.logger import RunLogger
from ..data.msls import MSLS, SyntheticMSLS
from ..data.transforms import input_transform
from ..engine.msls_val import msls_val
from ..losses.msls import (
    msls_triplet_loss,
    rkd_angle,
    rkd_distance,
    smooth_l1,
    supcon_loss,
    xbm_triplet_loss,
)
from .common import (
    load_pretrained_into,
    maybe_msls_subcache_checkpoint,
    resume_msls_state,
    seed_everything,
)


class XBM:
    """Cross-batch memory ring buffer (reference train_epoch_KD_xbm.py:74-101).

    Embeddings are detached snapshots, so the buffer lives host-side; the
    per-step positive/negative masks are built from the MSLS metadata and fed
    into the jitted step where the XBM loss contributes gradients."""

    def __init__(self, size: int, dim: int):
        self.feats = np.zeros((size, dim), np.float32)
        self.targets = np.full((size,), -1, np.int64)
        self.ptr = 0
        self.full = False

    def enqueue(self, feats: np.ndarray, targets: np.ndarray):
        n = len(feats)
        size = len(self.feats)
        idx = (self.ptr + np.arange(n)) % size
        self.feats[idx] = feats
        self.targets[idx] = targets
        self.ptr = int((self.ptr + n) % size)
        self.full = self.full or self.ptr < n

    def masks(self, pidx_sets, nonneg_sets):
        """(pos_mask, neg_mask) (nq, M) from per-query positive / non-negative
        db-index sets."""
        valid = self.targets >= 0
        pos = np.stack([np.isin(self.targets, p) & valid for p in pidx_sets])
        neg = np.stack(
            [(~np.isin(self.targets, nn)) & valid for nn in nonneg_sets]
        )
        return pos, neg


def build_msls(opt: Config, mode: str):
    if opt.dataset == "synthetic":
        return SyntheticMSLS(
            n_queries=48, n_db=96, nNeg=opt.nNeg, image_size=opt.msls_image_size,
            cached_queries=16, cached_negatives=48, margin=opt.margin,
            seed=opt.seed, mode=mode,
            task=opt.msls_task, seq_length=opt.msls_seq_length,
        )
    return MSLS(
        opt.source_path,
        cities="" if not opt.mini_data else "amman",
        nNeg=opt.nNeg,
        transform=input_transform((opt.imageresizeh, opt.imageresizew)),
        mode=mode,
        task=opt.msls_task, subtask=opt.msls_subtask,
        seq_length=opt.msls_seq_length,
        cached_queries=1000, cached_negatives=1000,
        bs=opt.cachebatchsize, margin=opt.margin, seed=opt.seed,
    )


def _flatten_frames(x):
    """(..., L, H, W, 3) with any leading dims -> (N_frames, H, W, 3)."""
    return x.reshape(-1, *x.shape[-3:])


def _agg_frames(e, L):
    """(B*L, D) frame embeddings -> (B, D) L2-normalized means (sequence
    descriptor; single frames pass through)."""
    if L == 1:
        return e
    e = e.reshape(-1, L, e.shape[-1]).mean(1)
    return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)


import functools


@functools.lru_cache(maxsize=8)
def _drift_extract(model):
    """Stable (variables, images) extractor for the drift probe — one cache
    entry per model so the msls_val chunk program compiles once."""
    return lambda variables, imgs: (_mining_embed(model)(variables, imgs), None)


@functools.lru_cache(maxsize=8)
def _mining_embed(model):
    """Jitted global-descriptor forward for subcache mining, cached per
    model so every subcache reuses one compiled executable."""
    return jax.jit(
        lambda variables, imgs: model.apply(variables, imgs, train=False)[0]
    )


@functools.lru_cache(maxsize=8)
def make_extract_fn(model, with_dense: bool, grid_size: int = 7):
    """Stable extract fn for msls_val: ``fn(variables, images)`` with the
    parameters as a runtime argument (pass them via msls_val's
    ``variables=``).  Cached on hashable keys so the compiled chunk program
    in engine/msls_val.py is reused across epochs instead of retracing per
    fresh closure (and old parameter pytrees are never pinned)."""
    from ..engine.extract import make_embed_fn

    embed = make_embed_fn(model, grid_size=grid_size, training_mode=False)

    def fn(variables, images):
        res = embed(variables, jnp.asarray(images))
        return res["center"], (res["bank"] if with_dense else None)

    return fn


def main(argv=None):
    opt = from_args(argv)
    seed_everything(opt.seed)

    train_set = build_msls(opt, "train")
    val_set = build_msls(opt, "val" if opt.dataset != "synthetic" else "train")

    model = archs.select(opt.arch, opt)
    size = (
        opt.msls_image_size if opt.dataset == "synthetic"
        else (opt.imageresizeh, opt.imageresizew)
    )
    h, w = (size, size) if isinstance(size, int) else size
    sample = jnp.zeros((2, h, w, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(opt.seed)}, sample, train=False)
    variables = load_pretrained_into(opt, variables)

    teacher = teacher_vars = None
    if opt.distill:
        t_opt = opt.replace(arch="patchnetvlad", append_pca_layer=True, num_pcs=opt.embed_dim)
        teacher = archs.select(t_opt.arch, t_opt)
        teacher_vars = teacher.init({"params": jax.random.PRNGKey(1)}, sample, train=False)

    # optimizer: Adam/SGD + StepLR (train_msls_baseline.py:108-118)
    sched = optax.exponential_decay(
        opt.lr, transition_steps=opt.lrstep, decay_rate=opt.lrgamma, staircase=True
    )
    if opt.optim == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(opt.weightdecay),
            optax.trace(decay=opt.momentum),
            optax.scale_by_schedule(lambda c: -sched(c // 1000)),
        )
    else:
        tx = optax.chain(
            optax.add_decayed_weights(opt.weightdecay),
            optax.scale_by_adam(),
            optax.scale_by_schedule(lambda c: -sched(c // 1000)),
        )
    opt_state = tx.init(variables["params"])

    logger = RunLogger(opt)
    print(f"[train_msls] run dir: {logger.run_dir}")

    nNeg = opt.nNeg
    B = opt.bs if opt.dataset != "synthetic" else 4

    xbm = XBM(opt.xbm_size, opt.embed_dim) if opt.enable_xbm else None

    def _step_core(params, batch_stats, opt_state, q, p, negs, t_embed,
                   xbm_feats, xbm_pos, xbm_neg, xbm_on):
        def loss_fn(params):
            # sequence tasks carry a frame axis: q (B, Lq, H, W, 3),
            # p/negs (…, Ldb, H, W, 3); frames flatten into ONE forward
            # (keeps the MXU batch large) and aggregate to per-sequence
            # descriptors afterwards
            nq = q.shape[0]
            Lq = q.shape[1] if q.ndim == 5 else 1
            Ldb = p.shape[1] if p.ndim == 5 else 1
            images = jnp.concatenate(
                [_flatten_frames(q), _flatten_frames(p), _flatten_frames(negs)], 0
            )
            out, new_stats = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(0)},
            )
            emb = out[0]  # frame-level (N_frames, D)
            eq = _agg_frames(emb[: nq * Lq], Lq)
            ep = _agg_frames(emb[nq * Lq : nq * (Lq + Ldb)], Ldb)
            en_flat = _agg_frames(emb[nq * (Lq + Ldb) :], Ldb)
            en = en_flat.reshape(nq, -1, emb.shape[-1])
            emb_agg = jnp.concatenate([eq, ep, en_flat], 0)
            if opt.task_loss == "supcon":
                # queries + their positives as two views of the same "class"
                feats = jnp.stack([eq, ep], axis=1)
                task = supcon_loss(feats, jnp.arange(nq), temperature=opt.supcon_temp)
            else:
                task = msls_triplet_loss(eq, ep, en, margin=opt.margin)
            loss = opt.tl_weight * task
            if xbm_feats is not None:
                xl = xbm_triplet_loss(
                    emb_agg, xbm_feats, jnp.arange(nq), xbm_pos, xbm_neg,
                    margin=opt.margin,
                )
                loss = loss + opt.xbm_weight * xbm_on * xl
            if t_embed is not None:
                # distill at frame level — teacher embeds the same frames
                loss = loss + opt.kd_weight * smooth_l1(emb, t_embed)
                if opt.distill == "rkd":
                    loss = loss + opt.rkd_distance_weight * rkd_distance(emb, t_embed)
                    loss = loss + opt.rkd_angle_weight * rkd_angle(emb, t_embed)
            return loss, (new_stats, emb_agg)

        (loss, (new_stats, emb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats["batch_stats"], opt_state, loss, emb

    train_step = jax.jit(_step_core)

    # device-resident subcache (--cache_device, data/device_cache.py): the
    # step gathers (q, p, negs) rows from the HBM pools by index and — when
    # distilling — embeds the SAME gathered frames through the teacher
    # in-program (the teacher params ride in as an argument: axon
    # remote-compile rejects large closure constants)
    cache_norm = train_set.transform is None

    def _pool_prep(x):
        x = x.astype(jnp.float32)
        if cache_norm:
            return x
        from ..data.device_cache import _MEAN, _STD

        return (x / 255.0 - _MEAN) / _STD

    @jax.jit
    def train_step_cached(params, batch_stats, opt_state, qrows, prows,
                          negrows, qpool, dbpool, t_vars,
                          xbm_feats, xbm_pos, xbm_neg, xbm_on):
        q = _pool_prep(qpool[qrows])
        p = _pool_prep(dbpool[prows])
        negs = _pool_prep(dbpool[negrows])
        t_embed = None
        if teacher is not None:
            imgs = jnp.concatenate(
                [_flatten_frames(q), _flatten_frames(p), _flatten_frames(negs)], 0
            )
            t_embed = jax.lax.stop_gradient(
                teacher.apply(t_vars, imgs, train=False)[0]
            )
        return _step_core(params, batch_stats, opt_state, q, p, negs, t_embed,
                          xbm_feats, xbm_pos, xbm_neg, xbm_on)

    best_r5 = -1.0
    it_count = 0
    prev_drift_feat = None
    drift_idx = 0  # per-subcache snapshot index (it_count can stall on tiny subcaches)

    # mid-epoch preemption resume (VERDICT r4 item 6): restore model +
    # optimizer + subcache-mining state from a subcache-boundary checkpoint
    # (see cli/common.py::maybe_msls_subcache_checkpoint) and continue at the
    # NEXT subcache with bit-identical mining
    start_epoch, resume_epoch, resume_sub, mining_restored = (
        opt.start_epoch, None, 0, None
    )
    if opt.resume_path:
        (variables, opt_state, it_count, resume_epoch, resume_sub,
         mining_restored) = resume_msls_state(
            opt.resume_path, variables, opt_state
        )
        start_epoch = resume_epoch
        print(
            f"[train_msls] resumed {opt.resume_path} (epoch {resume_epoch}, "
            f"subcache {resume_sub}, it {it_count}, "
            f"mining={'yes' if mining_restored is not None else 'no'})"
        )

    for epoch in range(start_epoch, opt.n_epochs):
        if mining_restored is not None and epoch == resume_epoch:
            train_set.set_mining_state(mining_restored)
            start_sub, mining_restored = resume_sub, None
        else:
            train_set.new_epoch()
            start_sub = 0
        epoch_losses = []
        t0 = time.time()
        for sub in range(start_sub, train_set.nCacheSubset):
            # mining with the CURRENT model (train_epoch.py:85); the forward
            # is jitted ONCE (module-level cache keyed on the model) and the
            # current params flow in as arguments — _embed_paths feeds it
            # fixed (32, H, W, 3) batches so it never recompiles
            mine_vars = {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            }
            pool = None
            if opt.cache_device:
                from ..data.device_cache import MSLSSubcachePool

                qidxs, pidxs, nidxs = train_set._select_pools()
                pool = MSLSSubcachePool.build(
                    train_set, qidxs, pidxs, nidxs,
                    pad_to=16 if opt.dataset == "synthetic" else 256,
                )
                if sub == 0 and epoch == opt.start_epoch:
                    print(
                        f"[train_msls] device subcache pools: "
                        f"q{tuple(pool.qpool.shape)} db{tuple(pool.dbpool.shape)} "
                        f"{pool.dbpool.dtype} ({pool.nbytes / 1e9:.2f} GB resident)"
                    )
                qv, pv, nv = pool.embed_split(
                    model, mine_vars, batch=opt.cachebatchsize
                )
                train_set._mine_from_vecs(qidxs, pidxs, nidxs, qv, pv, nv)
            else:
                embed_fn = lambda imgs: np.asarray(
                    _mining_embed(model)(mine_vars, jnp.asarray(imgs))
                )
                train_set.update_subcache(embed_fn, opt.embed_dim)
            if getattr(opt, "track_drift", False):
                # per-subcache feature-drift MSE vs the previous subcache's
                # val-query embeddings (reference train_epoch_KD_xbm.py:276-303:
                # embed, save feat_<i>.npz, MSE vs feat_<i-1>.npz, log 'Drift')
                from ..engine.msls_val import _embed_names

                # traceable fn: _embed_names traces it inside one compiled
                # chunk program (np.asarray-style wrappers would break);
                # mine_vars ride in as a runtime argument so the program
                # compiles once per training run, not per subcache
                cur, _ = _embed_names(
                    val_set, list(val_set.qImages), _drift_extract(model),
                    batch=16, variables=mine_vars,
                )
                np.savez(f"{logger.run_dir}/feat_{drift_idx}.npz", qFeat=cur)
                if prev_drift_feat is not None:
                    mse = float(np.mean((cur - prev_drift_feat) ** 2))
                    logger.log("Drift", {"feat_drift_mse": mse}, drift_idx)
                    print(f"  subcache drift MSE: {mse:.6f}")
                prev_drift_feat = cur
                drift_idx += 1
            trips = list(range(len(train_set)))
            np.random.shuffle(trips)
            for step_i, s in enumerate(range(0, len(trips) - B + 1, B)):
                batch_ids = trips[s : s + B]
                if pool is not None:
                    # device-cache path: only int32 row indices leave the host
                    metas = [train_set.triplets[i][0] for i in batch_ids]
                    qrows, prows, negrows = pool.rows(train_set.triplets, batch_ids)
                    items = q = p = negs = None
                else:
                    items = [train_set[i] for i in batch_ids]
                    metas = [it[3] for it in items]
                    q = jnp.asarray(np.stack([it[0] for it in items]))
                    p = jnp.asarray(np.stack([it[1] for it in items]))
                    negs = jnp.asarray(np.stack([it[2] for it in items]))
                if sub == 0 and step_i < 3:
                    # input triptych for the first steps of every epoch
                    # (reference train_epoch.py:106-123); sequences show
                    # their center frame
                    from ..utils.visual import visual_msls_triptych

                    center = lambda a: a[a.shape[0] // 2] if a.ndim == 4 else a
                    if pool is not None:
                        qimg = pool.host_example(pool.q_row[int(metas[0][0])])
                        pimg = pool.host_example(
                            pool.db_row[int(metas[0][1])], db=True
                        )
                        nimg = pool.host_example(
                            pool.db_row[int(metas[0][2])], db=True
                        )
                        qimg, pimg, nimg = center(qimg), center(pimg), center(nimg)
                    else:
                        qimg, pimg, nimg = (
                            center(items[0][0]), center(items[0][1]),
                            center(items[0][2][0]),
                        )
                    visual_msls_triptych(
                        qimg, pimg, nimg,
                        save_path=f"{logger.run_dir}/visual/{epoch}_{step_i}.png",
                    )
                xbm_feats = xbm_pos = xbm_neg = None
                xbm_on = jnp.float32(0.0)
                batch_qidx = [m[0] for m in metas]
                if xbm is not None:
                    qpos = [np.where(train_set.qIdx == qi)[0][0] for qi in batch_qidx]
                    pos_sets = [np.asarray(train_set.pIdx[qp]) for qp in qpos]
                    nn_sets = [np.asarray(train_set.nonNegIdx[qp]) for qp in qpos]
                    pm, nm = xbm.masks(pos_sets, nn_sets)
                    xbm_feats = jnp.asarray(xbm.feats)
                    xbm_pos, xbm_neg = jnp.asarray(pm), jnp.asarray(nm)
                    xbm_on = jnp.float32(it_count >= opt.xbm_start_iteration)
                if pool is not None:
                    params, bstats, opt_state, loss, emb = train_step_cached(
                        variables["params"], variables.get("batch_stats", {}),
                        opt_state, jnp.asarray(qrows), jnp.asarray(prows),
                        jnp.asarray(negrows), pool.qpool, pool.dbpool,
                        teacher_vars, xbm_feats, xbm_pos, xbm_neg, xbm_on,
                    )
                else:
                    t_embed = None
                    if teacher is not None:
                        imgs = jnp.concatenate(
                            [_flatten_frames(q), _flatten_frames(p), _flatten_frames(negs)], 0
                        )
                        t_embed = jax.lax.stop_gradient(
                            teacher.apply(teacher_vars, imgs, train=False)[0]
                        )
                    params, bstats, opt_state, loss, emb = train_step(
                        variables["params"], variables.get("batch_stats", {}),
                        opt_state, q, p, negs, t_embed,
                        xbm_feats, xbm_pos, xbm_neg, xbm_on,
                    )
                variables = {"params": params, "batch_stats": bstats}
                epoch_losses.append(loss)  # device scalar; drained per epoch
                it_count += 1
                if xbm is not None:
                    # enqueue the db-side embeddings (positives + negatives)
                    emb_np = np.asarray(emb)
                    nq = len(metas)
                    db_idx = np.concatenate(
                        [[m[1] for m in metas]]
                        + [[i for m in metas for i in m[2:]]]
                    ).astype(np.int64)
                    xbm.enqueue(emb_np[nq:], db_idx)
            # subcache boundary: the only point where model/optimizer and the
            # mining RNG/cursor are mutually consistent — preemption-safe save
            maybe_msls_subcache_checkpoint(
                opt, logger.run_dir, variables, opt_state, it_count, epoch,
                train_set,
            )
        epoch_losses = [float(x) for x in epoch_losses]
        if epoch_losses:
            print(
                f"epoch {epoch}: loss={np.mean(epoch_losses):.4f} "
                f"({len(epoch_losses)} steps, {time.time()-t0:.1f}s)"
            )
            logger.log("Train", {"loss": float(np.mean(epoch_losses))}, epoch)
        else:
            # resume landed past this epoch's final subcache: nothing to train
            print(f"epoch {epoch}: resumed past final subcache (0 steps)")

        if epoch % opt.evalevery == 0 or epoch == opt.n_epochs - 1:
            extract = make_extract_fn(model, with_dense=False)
            recalls = msls_val(
                val_set, extract, trunc_nums=(0,), batch=8, variables=variables
            )
            logger.log("Test", recalls, epoch)
            print(f"  val: " + ", ".join(f"{k}={v:.3f}" for k, v in recalls.items()))
            # with step-checkpointing on, keep `latest` the RICH consistent
            # tree (model + optimizer + mining) instead of clobbering the
            # subcache-boundary save with a model-only one
            if not maybe_msls_subcache_checkpoint(
                opt, logger.run_dir, variables, opt_state, it_count, epoch,
                train_set, metrics=recalls,
            ):
                save_checkpoint(f"{logger.run_dir}/latest", variables, recalls)
            r5 = recalls.get("globalR_5", 0.0)
            if r5 > best_r5:
                best_r5 = r5
                copy_best(logger.run_dir)
    logger.plot_curves()
    print(f"best R@5: {best_r5:.4f}")
    return best_r5


if __name__ == "__main__":
    main()
