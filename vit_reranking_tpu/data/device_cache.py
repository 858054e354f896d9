"""Device-resident image cache + on-device augmentation.

TPU-idiomatic input pipeline for DML training (SURVEY.md section 7.4): the
reference feeds every step through torch DataLoader workers (host decode +
augment + PCIe copy per batch, train_baseline.py:193); here the raw images
are loaded ONCE into HBM as uint8 and the train-time augmentation
(RandomResizedCrop + horizontal flip + normalize — the semantics of
data/transforms.py::TrainTransform, itself mirroring the reference's
``augmentation base`` pipeline) runs INSIDE the jitted train step via
jax.random.  An epoch then performs zero host->device image transfers: the
host supplies only (indices, labels) per batch and the step gathers +
augments + trains in one compiled program.

Memory: CUB200-scale fits trivially (5,994 train images at 256px uint8 =
1.1 GB of a 16 GB v5e); SOP's 59k train images at 256px = 11.6 GB still fit
but leave little headroom — the cache is opt-in (``--cache_device``).

Accepted deviations from the torch pipeline (same class of deviation as the
vectorized distance miner, SURVEY section 7.5): the crop is sampled once
with clamping instead of torch's 10-try accept loop; crops are taken from a
short-side-256 center-crop store rather than the full-resolution original;
resampling is jax.image's bilinear rather than PIL's. Distributions match
in scale/ratio; RNG streams differ by construction.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# ImageNet constants, identical to data/transforms.py::normalize
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DeviceImageCache:
    """Raw training images resident on device + an augment fn for the step.

    Attributes:
      images: (N, S, S, 3) device array — uint8 for photo datasets, float32
        for datasets whose loader already emits final pixel values
        (SyntheticDataset, whose ``transform`` is None).
      augment: (key, raw_batch) -> (B, out, out, 3) float32 model input;
        traceable, meant to be fused into the train step.
    """

    def __init__(self, images: jnp.ndarray, out_size: int, augmentation: str,
                 normalized: bool):
        self.images = images
        self.out_size = out_size
        self.augmentation = augmentation
        self.normalized = normalized

    @classmethod
    def from_dataset(cls, dataset, out_size: int = 224, store_size: int = 256):
        """Load every image of ``dataset`` once into one device array.

        Photo datasets (``dataset.transform`` set) are stored as uint8 at
        store_size (short-side resize + center crop); datasets without a
        transform (synthetic) are stored exactly as their loader emits them
        (already float pixel values) and only get flip augmentation.
        """
        from PIL import Image

        from .transforms import _center_crop, _resize_short

        has_paths = getattr(dataset, "transform", None) is not None
        if has_paths:
            arrs = []
            for path, _cls in dataset.image_list:
                img = Image.open(path).convert("RGB")
                img = _center_crop(_resize_short(img, store_size), store_size)
                arrs.append(np.asarray(img, np.uint8))
            stack = np.stack(arrs)
            # 'adv' color jitter has no device implementation — its crop+flip
            # part still applies (documented deviation)
            augmentation = getattr(dataset.transform, "augmentation", "base")
            normalized = False
        else:
            stack = np.stack([dataset.load_image(i) for i in range(len(dataset))])
            stack = stack.astype(np.float32)
            augmentation = "flip"
            normalized = True
        return cls(jax.device_put(stack), out_size, augmentation, normalized)

    @property
    def nbytes(self) -> int:
        return self.images.size * self.images.dtype.itemsize

    def augment(self, key, raw):
        """Vectorized train-time augmentation, traceable under jit."""
        D = self.out_size
        B = raw.shape[0]
        S = raw.shape[1]
        k_area, k_ratio, k_x, k_y, k_flip = jax.random.split(key, 5)

        x = raw.astype(jnp.float32)
        if not self.normalized:
            x = x / 255.0

        if self.augmentation != "flip" and not (self.normalized and S == D):
            if self.augmentation == "red":
                # random fixed-size crop from the store (transforms.py 'red')
                w = jnp.full((B,), float(min(D, S)))
                h = w
            else:
                # RandomResizedCrop: area U(0.08, 1), ratio logU(3/4, 4/3)
                area = jax.random.uniform(k_area, (B,), minval=0.08, maxval=1.0)
                logr = jax.random.uniform(
                    k_ratio, (B,),
                    minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0),
                )
                r = jnp.exp(logr)
                w = jnp.clip(jnp.sqrt(area * S * S * r), 8.0, float(S))
                h = jnp.clip(jnp.sqrt(area * S * S / r), 8.0, float(S))
            x0 = jax.random.uniform(k_x, (B,)) * (S - w)
            y0 = jax.random.uniform(k_y, (B,)) * (S - h)

            def crop_one(img, h1, w1, y1, x1):
                scale = jnp.stack([D / h1, D / w1])
                trans = jnp.stack([-y1 * D / h1, -x1 * D / w1])
                return jax.image.scale_and_translate(
                    img, (D, D, 3), (0, 1), scale, trans,
                    method="bilinear", antialias=False,
                )

            x = jax.vmap(crop_one)(x, h, w, y0, x0)
        elif S != D:
            x = jax.image.resize(x, (B, D, D, 3), method="bilinear")

        flip = jax.random.bernoulli(k_flip, 0.5, (B,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

        if not self.normalized:
            x = (x - _MEAN) / _STD
        return x


class DeviceEvalCache:
    """Device-resident test/eval pool for the in-train evaluation.

    The eval transform is deterministic (resize-short + center-crop +
    normalize, data/transforms.py::EvalTransform mirroring the reference's
    ``augmentation base`` eval pipeline), so the pool loads ONCE: photo
    datasets store the cropped uint8 pixels (4x smaller than f32; the
    extraction program normalizes per batch in-VMEM via
    engine/extract.py::extract_features_device(uint8_input=True)),
    synthetic datasets store their final float values.  Every eval epoch
    then runs as one compiled program with zero host->device image traffic
    — the same epochs that motivated the training-side cache: the in-train
    eval embeds the whole test set each --evalevery epochs
    (reference train_baseline.py:247-326)."""

    def __init__(self, images, labels: np.ndarray, normalized: bool):
        self.images = images
        self.labels = labels
        self.normalized = normalized

    @classmethod
    def from_dataset(cls, dataset):
        tf = getattr(dataset, "transform", None)
        if tf is None:
            stack = np.stack(
                [dataset.load_image(i) for i in range(len(dataset))]
            ).astype(np.float32)
            normalized = True
        else:
            from PIL import Image

            from .transforms import _center_crop, _resize_short

            size = tf.size
            arrs = []
            for path, _cls in dataset.image_list:
                img = Image.open(path).convert("RGB")
                img = _center_crop(
                    _resize_short(img, int(size * 256 / 224)), size
                )
                arrs.append(np.asarray(img, np.uint8))
            stack = np.stack(arrs)
            normalized = False
        labels = np.asarray([c for _, c in dataset.image_list], np.int32)
        return cls(jax.device_put(stack), labels, normalized)

    @property
    def nbytes(self) -> int:
        return self.images.size * self.images.dtype.itemsize


# ---------------------------------------------------------------------------
# MSLS: device-resident subcache pools
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _pool_embed_program(model, batch: int, L: int, normalized: bool):
    """ONE compiled program embedding a device-resident image pool.

    The reference mines each subcache through a host batch loop
    (training_tools/msls.py:449-487: three DataLoaders feeding
    ``model.encoder`` batch by batch); on this platform every dispatch
    costs ~30-60 ms, so the whole pool embeds under one ``lax.map``.
    Normalization of uint8 stores happens PER BATCH inside the map body —
    an up-front whole-pool f32 cast would materialize 4x the pool bytes in
    HBM.  Sequence pools (L > 1) aggregate frame embeddings to
    L2-normalized means (center-frame semantics preserved upstream),
    matching ``MSLS.aggregate_seq``."""

    @jax.jit
    def run(variables, pool):
        frames = pool.reshape(-1, *pool.shape[-3:])  # (P[*L], H, W, 3)
        n = frames.shape[0]
        pad = (-n) % batch
        if pad:  # wrap-pad to whole batches; cropped below
            frames = jnp.take(frames, jnp.arange(n + pad) % n, axis=0)
        nb = frames.shape[0] // batch

        def body(b):
            x = b.astype(jnp.float32)
            if not normalized:
                x = (x / 255.0 - _MEAN) / _STD
            return model.apply(variables, x, train=False)[0]

        embs = jax.lax.map(body, frames.reshape(nb, batch, *frames.shape[1:]))
        embs = embs.reshape(nb * batch, -1)[:n]
        if L > 1:
            e = embs.reshape(-1, L, embs.shape[-1]).mean(1)
            embs = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
        return embs

    return run


class MSLSSubcachePool:
    """Device-resident MSLS subcache: the query pool and the positive+negative
    db pool live in HBM for the subcache's whole lifetime, serving BOTH the
    hard-negative mining (one-dispatch embed, `_pool_embed_program`) and the
    triplet training steps (the jitted step gathers (q, p, negs) rows by
    index — zero image bytes cross the host link after the pool loads).

    The reference ships every subcache image twice per subcache — once
    through the mining DataLoaders (training_tools/msls.py:449-487) and once
    per triplet batch (train_epoch.py:99-104); on this platform's ~50 MB/s
    host link that transfer dominates.  Photo datasets store uint8 at the
    transform's resize geometry (normalize runs on device); synthetic
    datasets store their final float values.

    Query and db pools are separate arrays because im2seq/seq2im tasks give
    them different frame counts (Lq != Ldb)."""

    def __init__(self, qpool, dbpool, q_row, db_row, normalized,
                 n_q: int, n_p: int, n_n: int,
                 qpool_host: np.ndarray, dbpool_host: np.ndarray):
        self.qpool = qpool
        self.dbpool = dbpool
        self.q_row = q_row    # global query-image id -> qpool row
        self.db_row = db_row  # global db-image id -> dbpool row
        self.normalized = normalized
        self.n_q, self.n_p, self.n_n = n_q, n_p, n_n
        self.qpool_host = qpool_host
        self.dbpool_host = dbpool_host

    @classmethod
    def build(cls, dataset, qidxs, pidxs, nidxs, pad_to: int = 32):
        """Load the subcache's union pool once (qidxs index dataset.qIdx;
        pidxs/nidxs are global db ids from MSLS._select_pools).

        Pools wrap-pad to a multiple of ``pad_to`` rows: subcaches vary in
        size, and without bucketing every subcache would recompile the
        embed program and the cached train step (compiles cost minutes on
        this platform)."""
        normalized = dataset.transform is None

        def load_key(key):
            if normalized:
                return np.asarray(dataset._load_key(key), np.float32)
            if hasattr(dataset, "load_key_uint8"):
                # non-file datasets can supply raw uint8 frames directly
                # (production-geometry stress pools, scripts/stress_msls_train.py)
                return dataset.load_key_uint8(key)
            # uint8 store at the transform's geometry; device normalizes
            from PIL import Image

            h, w = dataset.transform.resize
            frames = [
                np.asarray(
                    Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR),
                    np.uint8,
                )
                for p in key.split(",")
            ]
            return frames[0] if len(frames) == 1 else np.stack(frames)

        q_ids = np.asarray(dataset.qIdx[qidxs])
        db_ids = np.concatenate([np.asarray(pidxs), np.asarray(nidxs)]).astype(int)
        if len(q_ids) == 0 or len(db_ids) == 0:
            raise ValueError("empty subcache pool — nothing to cache")

        def _pad_rows(a):
            pad = (-len(a)) % pad_to
            if pad:
                a = np.concatenate([a, a[np.arange(pad) % len(a)]])
            return a

        qpool_host = _pad_rows(np.stack([load_key(k) for k in dataset.qImages[q_ids]]))
        dbpool_host = _pad_rows(np.stack([load_key(k) for k in dataset.dbImages[db_ids]]))
        q_row = {int(g): r for r, g in enumerate(q_ids)}
        db_row = {int(g): r for r, g in enumerate(db_ids)}
        return cls(
            jax.device_put(qpool_host), jax.device_put(dbpool_host),
            q_row, db_row, normalized,
            len(q_ids), len(pidxs), len(nidxs), qpool_host, dbpool_host,
        )

    @property
    def nbytes(self) -> int:
        return (self.qpool.size * self.qpool.dtype.itemsize
                + self.dbpool.size * self.dbpool.dtype.itemsize)

    def _L(self, pool) -> int:
        return pool.shape[1] if pool.ndim == 5 else 1

    def embed_split(self, model, variables, batch: int = 32):
        """(qvecs, pvecs, nvecs) descriptors for MSLS._mine_from_vecs —
        two dispatches total (one per pool)."""
        qv = np.asarray(
            _pool_embed_program(model, batch, self._L(self.qpool),
                                self.normalized)(variables, self.qpool)
        )
        dbv = np.asarray(
            _pool_embed_program(model, batch, self._L(self.dbpool),
                                self.normalized)(variables, self.dbpool)
        )
        return (qv[: self.n_q], dbv[: self.n_p],
                dbv[self.n_p : self.n_p + self.n_n])

    def prep(self, x):
        """Traceable gathered-rows -> model-input normalization."""
        x = x.astype(jnp.float32)
        if self.normalized:
            return x
        return (x / 255.0 - _MEAN) / _STD

    def rows(self, triplets, batch_ids):
        """(qrows, prows, negrows) int32 arrays for a batch of triplet ids."""
        qrows, prows, negrows = [], [], []
        for i in batch_ids:
            t, _ = triplets[i]
            qrows.append(self.q_row[int(t[0])])
            prows.append(self.db_row[int(t[1])])
            negrows.append([self.db_row[int(n)] for n in t[2:]])
        return (np.asarray(qrows, np.int32), np.asarray(prows, np.int32),
                np.asarray(negrows, np.int32))

    def host_example(self, row: int, db: bool = False) -> np.ndarray:
        """Final-value center frame from the host copy (visualization)."""
        x = (self.dbpool_host if db else self.qpool_host)[row]
        if x.ndim == 4:  # (L, H, W, 3) sequence -> center frame
            x = x[x.shape[0] // 2]
        if self.normalized:
            return x
        return (x.astype(np.float32) / 255.0 - _MEAN) / _STD
