"""Device-resident image cache + on-device augmentation
(data/device_cache.py): shape/normalization contracts, the flip-only
synthetic path, photo-store building, and the cached train step end-to-end
through the actual CLI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_reranking_tpu.data.device_cache import _MEAN, _STD, DeviceImageCache


def test_augment_rrc_shapes_and_normalization():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    cache = DeviceImageCache(jnp.asarray(raw), out_size=24,
                             augmentation="base", normalized=False)
    out = jax.jit(cache.augment)(jax.random.PRNGKey(0), cache.images)
    assert out.shape == (6, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
    # standardized pixel range: (x/255 - mean)/std stays within the
    # ImageNet-normalized envelope
    lo = (0.0 - _MEAN) / _STD
    hi = (1.0 - _MEAN) / _STD
    o = np.asarray(out)
    assert (o >= lo - 1e-4).all() and (o <= hi + 1e-4).all()
    # different keys give different crops
    out2 = jax.jit(cache.augment)(jax.random.PRNGKey(1), cache.images)
    assert np.abs(np.asarray(out2) - o).max() > 1e-3


def test_augment_flip_only_is_flip_or_identity():
    rng = np.random.default_rng(1)
    raw = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    cache = DeviceImageCache(jnp.asarray(raw), out_size=16,
                             augmentation="flip", normalized=True)
    out = np.asarray(jax.jit(cache.augment)(jax.random.PRNGKey(0), cache.images))
    flipped = raw[:, :, ::-1, :]
    for b in range(8):
        same = np.allclose(out[b], raw[b])
        flip = np.allclose(out[b], flipped[b])
        assert same or flip, b
    # with 8 samples both outcomes should appear (p(fail) = 2/256)
    kinds = {np.allclose(out[b], raw[b]) for b in range(8)}
    assert len(kinds) == 2


def test_from_dataset_photo_store(tmp_path):
    from PIL import Image

    from vit_reranking_tpu.data.datasets import ImageDataset
    from vit_reranking_tpu.data.transforms import TrainTransform

    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
        ).save(p)
        paths.append((str(p), i % 2))
    ds = ImageDataset(paths, transform=TrainTransform("base"))
    cache = DeviceImageCache.from_dataset(ds, out_size=24, store_size=32)
    assert cache.images.shape == (4, 32, 32, 3)
    assert cache.images.dtype == jnp.uint8
    assert cache.augmentation == "base" and not cache.normalized
    out = jax.jit(cache.augment)(jax.random.PRNGKey(0), cache.images)
    assert out.shape == (4, 24, 24, 3)


class _TinyEmbed:
    """Minimal model with the mining-forward contract
    ``apply(variables, imgs, train=False)[0] -> (B, D)`` (hashable so the
    lru-cached pool program reuses one executable)."""

    def apply(self, variables, imgs, train=False):
        x = imgs.mean(axis=(1, 2)) if imgs.ndim == 4 else imgs
        e = x @ variables["params"]["w"]
        e = e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-12)
        return (e,)

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


def _tiny_vars(din=3, dout=16, seed=0):
    rng = np.random.default_rng(seed)
    return {"params": {"w": jnp.asarray(rng.standard_normal((din, dout)), jnp.float32)}}


@pytest.mark.parametrize("task,L", [("im2im", 1), ("seq2seq", 3)])
def test_msls_pool_mining_parity(task, L):
    """Device-pool mining (MSLSSubcachePool.embed_split + _mine_from_vecs)
    selects the SAME triplets as the host-loop update_subcache path given
    the same model — the cached pipeline changes the transport, not the
    mining semantics (reference msls.py:416-567)."""
    from vit_reranking_tpu.data.device_cache import MSLSSubcachePool
    from vit_reranking_tpu.data.msls import SyntheticMSLS

    kw = dict(n_queries=24, n_db=48, nNeg=2, image_size=16,
              cached_queries=12, cached_negatives=24, seed=3, mode="train",
              task=task, seq_length=L)
    model, variables = _TinyEmbed(), _tiny_vars()

    ref = SyntheticMSLS(**kw)
    ref.new_epoch()

    def embed_fn(imgs):
        return np.asarray(model.apply(variables, jnp.asarray(imgs))[0])

    ref.update_subcache(embed_fn, 16)

    dev = SyntheticMSLS(**kw)
    dev.new_epoch()
    qidxs, pidxs, nidxs = dev._select_pools()
    pool = MSLSSubcachePool.build(dev, qidxs, pidxs, nidxs, pad_to=8)
    qv, pv, nv = pool.embed_split(model, variables, batch=8)
    dev._mine_from_vecs(qidxs, pidxs, nidxs, qv, pv, nv)

    assert len(dev.triplets) == len(ref.triplets) > 0
    for (ta, _), (tb, _) in zip(dev.triplets, ref.triplets):
        assert list(ta) == list(tb)


def test_msls_pool_rows_and_prep():
    """Row mapping round-trips triplet ids to pool rows; prep of a gathered
    row equals the stored final value (synthetic pools store final floats)."""
    from vit_reranking_tpu.data.device_cache import MSLSSubcachePool
    from vit_reranking_tpu.data.msls import SyntheticMSLS

    ds = SyntheticMSLS(n_queries=16, n_db=32, nNeg=2, image_size=16,
                       cached_queries=8, cached_negatives=16, seed=0, mode="train")
    ds.new_epoch()
    qidxs, pidxs, nidxs = ds._select_pools()
    pool = MSLSSubcachePool.build(ds, qidxs, pidxs, nidxs, pad_to=8)
    model, variables = _TinyEmbed(), _tiny_vars()
    qv, pv, nv = pool.embed_split(model, variables, batch=8)
    ds._mine_from_vecs(qidxs, pidxs, nidxs, qv, pv, nv)
    assert ds.triplets
    qrows, prows, negrows = pool.rows(ds.triplets, [0])
    t0, _ = ds.triplets[0]
    np.testing.assert_allclose(
        np.asarray(pool.prep(pool.qpool[qrows[0]])),
        ds._load_key(ds.qImages[t0[0]]), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pool.prep(pool.dbpool[prows[0]])),
        ds._load_key(ds.dbImages[t0[1]]), rtol=1e-6,
    )
    assert negrows.shape == (1, 2)


def test_eval_cache_extraction_parity(tmp_path):
    """DeviceEvalCache + extract_features_device(uint8_input) reproduces the
    host-loader extraction exactly: the uint8 store is the same post-crop
    pixels the EvalTransform normalizes, so centers match to float tolerance."""
    from PIL import Image

    from vit_reranking_tpu.data.datasets import ImageDataset
    from vit_reranking_tpu.data.device_cache import DeviceEvalCache
    from vit_reranking_tpu.data.loader import DataLoader
    from vit_reranking_tpu.data.transforms import EvalTransform
    from vit_reranking_tpu.engine.extract import (
        extract_features,
        extract_features_device,
    )

    rng = np.random.default_rng(5)
    paths = []
    for i in range(6):
        p = tmp_path / f"e{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (40, 52, 3), dtype=np.uint8)
        ).save(p)
        paths.append((str(p), i % 3))
    ds = ImageDataset(paths, transform=EvalTransform(size=32))
    loader = DataLoader(ds, batch_size=4, shuffle=False)

    class _Tok:
        """Tiny model with the extract contract: returns
        (out, (enc_out, token_map), aux)."""

        def apply(self, variables, imgs, train=False, ret_attn=False):
            B = imgs.shape[0]
            g = imgs.reshape(B, 4, 8, 4, 8, 3).mean(axis=(2, 4))  # (B,4,4,3)
            tokens = g.reshape(B, 16, 3) @ variables["params"]["w"]
            return tokens.mean(1), (tokens.mean(1), tokens), {"head_tokens": tokens}

        def __hash__(self):
            return hash(type(self))

        def __eq__(self, other):
            return type(other) is type(self)

    model, variables = _Tok(), _tiny_vars(din=3, dout=8, seed=7)
    host = extract_features(model, variables, loader, grid_size=2, pad_batch=4)
    cache = DeviceEvalCache.from_dataset(ds)
    assert cache.images.dtype == jnp.uint8
    dev = extract_features_device(
        model, variables, cache.images, batch_size=4, grid_size=2,
        uint8_input=True,
    )
    np.testing.assert_allclose(np.asarray(dev["center"]), host["center"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev["bank"]), host["bank"], atol=1e-5)
    np.testing.assert_array_equal(cache.labels, host["labels"])


def test_cached_eval_cli_parity(tmp_path):
    """test_diml --cache_device reproduces the host-loader eval metrics
    (same seed/init, synthetic): the cached extraction is a transport
    change, not a semantic one."""
    import os

    from vit_reranking_tpu.cli.test_diml import main as eval_main

    args = [
        "--dataset", "synthetic", "--synthetic_size", "32",
        "--synthetic_classes", "4", "--synthetic_per_class", "8",
        "--kernels", "1", "--bs", "8", "--arch", "resnet50_normalize",
        "--use_uniform", "--use_ot", "--grid_size", "1",
        "--save_path", str(tmp_path),
    ]
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        host = eval_main(list(args))
        dev = eval_main(list(args) + ["--cache_device"])
    finally:
        os.chdir(cwd)
    for k in ("r1", "rp", "mapr"):
        for t in host[k]:
            assert abs(host[k][t] - dev[k][t]) < 1e-3, (k, t)


def test_cached_msls_training_cli_e2e(tmp_path):
    """--cache_device through train_msls_baseline: pool mining + gathered
    triplet steps end-to-end on the CPU mesh."""
    from vit_reranking_tpu.cli.train_msls_baseline import main

    r5 = main([
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--n_epochs", "1", "--evalevery", "1",
        "--nNeg", "2", "--lr", "0.0001", "--save_path", str(tmp_path),
        "--group", "test_cache", "--bs", "4", "--cache_device",
    ])
    assert 0.0 <= r5 <= 1.0


def test_cached_msls_distill_xbm_cli_e2e(tmp_path):
    """--cache_device + --distill embed + --enable_xbm: the teacher embeds
    the gathered pool frames INSIDE the cached step (teacher params as a jit
    argument) and the XBM masks ride along unchanged."""
    from vit_reranking_tpu.cli.train_msls_baseline import main

    r5 = main([
        "--dataset", "synthetic", "--arch", "resnet50_normalize",
        "--embed_dim", "16", "--n_epochs", "1", "--evalevery", "1",
        "--nNeg", "2", "--lr", "0.0001", "--save_path", str(tmp_path),
        "--group", "test_cache_kd", "--bs", "4", "--cache_device",
        "--distill", "embed", "--enable_xbm", "--xbm_size", "64",
        "--xbm_start_iteration", "2",
    ])
    assert 0.0 <= r5 <= 1.0


def test_cached_diml_training_cli_e2e(tmp_path):
    """--cache_device through train_diml (structural OT loss): the shared
    cli/common.py helpers drive the cached step for the DIML loop too."""
    from vit_reranking_tpu.cli.train_diml import main

    r = main([
        "--dataset", "synthetic", "--synthetic_size", "32",
        "--synthetic_classes", "4", "--synthetic_per_class", "8",
        "--kernels", "1", "--bs", "8", "--grid_size", "2",
        "--arch", "resnet50_diml", "--loss", "margin_diml",
        "--batch_mining", "distance", "--n_epochs", "1", "--evalevery", "1",
        "--lr", "0.0001", "--cache_device",
        "--group", "cachedev_diml", "--save_path", str(tmp_path),
    ])
    assert 0.0 <= r <= 100.0


def test_cached_training_cli_e2e(tmp_path):
    """--cache_device trains through the real entry point on the CPU mesh:
    the step gathers from the device cache, augments in-program, and the
    run finishes with sane metrics."""
    from vit_reranking_tpu.cli.train_baseline import main

    r = main([
        "--dataset", "synthetic", "--synthetic_size", "32",
        "--synthetic_classes", "4", "--synthetic_per_class", "8",
        "--kernels", "1", "--bs", "8",
        "--arch", "resnet50_normalize", "--loss", "margin",
        "--batch_mining", "distance", "--n_epochs", "1", "--evalevery", "1",
        "--lr", "0.0001", "--cache_device",
        "--group", "cachedev", "--save_path", str(tmp_path),
    ])
    assert 0.0 <= r <= 100.0


def test_extract_device_chunked_parity():
    """chunk_images bounds the in-program pool copy (SOP-scale OOM fix,
    RESULTS.md round 4): chunked extraction must match unchunked exactly."""
    import jax.numpy as jnp
    import numpy as np

    from vit_reranking_tpu.engine.extract import extract_features_device
    from vit_reranking_tpu import models as archs

    class _Opt:
        embed_dim = 16
        bf16 = False
        narrow_sm = False
        blk_ind = 0

    model = archs.select("resnet50_normalize", _Opt())
    import jax

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (20, 32, 32, 3)), jnp.uint8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 32, 32, 3)), train=False
    )
    full = extract_features_device(
        model, variables, imgs, batch_size=4, grid_size=1, uint8_input=True
    )
    chunked = extract_features_device(
        model, variables, imgs, batch_size=4, grid_size=1, uint8_input=True,
        chunk_images=8,
    )
    for k in full:
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(chunked[k]), atol=1e-6, err_msg=k
        )


def test_auto_chunk_images_bounds():
    """auto_chunk_images derives a bounded, batch-multiple chunk when the
    pool's layout copy would blow the budget (VERDICT r4 item 2), and 0
    (= single program) when it fits."""
    import jax.numpy as jnp

    from vit_reranking_tpu.engine.extract import (
        _CHUNK_BUDGET_FRACTION,
        auto_chunk_images,
    )

    imgs = jnp.zeros((1000, 32, 32, 3), jnp.uint8)  # 3072 B/image, ~2.9 MB
    # Budget so that only ~100 images' copy fits the allowed fraction.
    per = 32 * 32 * 3
    budget = int(100 * per / _CHUNK_BUDGET_FRACTION)
    chunk = auto_chunk_images(imgs, batch_size=32, memory_budget_bytes=budget)
    assert 0 < chunk < 1000
    assert chunk % 32 == 0
    assert chunk * per <= budget * _CHUNK_BUDGET_FRACTION + per
    # Whole pool fits: no chunking.
    assert auto_chunk_images(imgs, 32, memory_budget_bytes=10 * imgs.nbytes) == 0
    # Unknown budget (CPU): no chunking.
    assert auto_chunk_images(imgs, 32, memory_budget_bytes=0) == 0
    # Tiny budget still returns at least one batch, never 0-divide.
    assert auto_chunk_images(imgs, 32, memory_budget_bytes=1) == 32


def test_extract_device_auto_chunk_parity():
    """chunk_images=None auto-chunks from the (injected) memory budget and
    matches the explicit single-program path bit-exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_reranking_tpu.engine.extract import extract_features_device
    from vit_reranking_tpu import models as archs

    class _Opt:
        embed_dim = 16
        bf16 = False
        narrow_sm = False
        blk_ind = 0

    model = archs.select("resnet50_normalize", _Opt())
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 256, (24, 32, 32, 3)), jnp.uint8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 32, 32, 3)), train=False
    )
    full = extract_features_device(
        model, variables, imgs, batch_size=4, grid_size=1, uint8_input=True,
        chunk_images=0,
    )
    per = 32 * 32 * 3
    auto = extract_features_device(
        model, variables, imgs, batch_size=4, grid_size=1, uint8_input=True,
        memory_budget_bytes=per * 10,  # forces a bounded auto chunk
    )
    for k in full:
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(auto[k]), atol=1e-6, err_msg=k
        )
