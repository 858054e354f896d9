"""Rollout attention-filter fast path + device-resident extraction.

The Pallas VMEM-resident bisection (ops/rollout.py::filter_threshold_pallas)
must be bit-identical to the XLA value-bisection branch of
filter_attention_map — same seeds, same mid/count arithmetic — so the rollout
parity tests (test_cvt_parity.py) transfer to the TPU fast path unchanged.
These tests pin that equivalence in interpret mode on the CPU mesh; the
compiled-Mosaic check lives in test_tpu_kernel.py (opt-in, real chip).
"""

from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.rollout import filter_attention_map, filter_threshold_pallas


def _xla_bisect_filter(flat, k, iters=40):
    """The XLA branch of filter_attention_map, verbatim semantics."""

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        count = jnp.sum((flat <= mid[:, None]).astype(jnp.int32), axis=1)
        lo = jnp.where(count < k, mid, lo)
        hi = jnp.where(count < k, hi, mid)
        return lo, hi

    lo0 = jnp.min(flat, axis=1)
    hi0 = jnp.max(flat, axis=1)
    _, kth = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    return jnp.where(flat <= kth[:, None], 0.0, flat)


def test_pallas_filter_bitwise_matches_xla_bisection():
    rng = np.random.default_rng(0)
    for B, N in [(3, 1024), (2, 128 * 9)]:  # lane-multiple widths
        flat = jax.nn.softmax(
            jnp.asarray(rng.standard_normal((B, N), np.float32)), axis=-1
        )
        k = int(N * 0.1)
        ref = np.asarray(_xla_bisect_filter(flat, k))
        out = np.asarray(filter_threshold_pallas(flat, k, interpret=True))
        assert np.array_equal(ref, out)
        assert (out == 0).sum() == B * k


def test_pallas_filter_padded_width():
    # N not a multiple of 128 (CvT stage-1: 784*196) exercises the +inf
    # tail masking
    rng = np.random.default_rng(1)
    B, N = 2, 700
    flat = jnp.asarray(rng.standard_normal((B, N), np.float32))
    k = int(N * 0.1)
    ref = np.asarray(_xla_bisect_filter(flat, k))
    out = np.asarray(filter_threshold_pallas(flat, k, interpret=True))
    assert np.array_equal(ref, out)


def test_filter_attention_map_small_path_unchanged():
    # the <=65536 top_k branch must agree with bisection up to ties
    rng = np.random.default_rng(2)
    attn = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((2, 3, 48, 48), np.float32)), axis=-1
    )
    out = np.asarray(filter_attention_map(attn, discard_ratio=0.1, head_fusion="min"))
    flat = np.asarray(jnp.min(attn, axis=1)).reshape(2, -1)
    k = int(48 * 48 * 0.1)
    assert ((out.reshape(2, -1) == 0).sum(1) == k).all()
    # surviving entries untouched
    mask = out.reshape(2, -1) != 0
    assert np.allclose(out.reshape(2, -1)[mask], flat[mask])


def test_extract_device_matches_loader_path():
    from vit_reranking_tpu.engine.extract import (
        extract_features,
        extract_features_device,
    )
    from vit_reranking_tpu.models import select

    rng = jax.random.PRNGKey(0)
    model = select("cvt_13_normalize", SimpleNamespace(embed_dim=16))
    images = jax.random.normal(rng, (6, 224, 224, 3), jnp.float32)
    variables = model.init(rng, images[:1], train=False, ret_attn=True)

    host_imgs = np.asarray(images)
    loader = [
        (np.zeros(4, np.int64), host_imgs[:4], np.arange(4)),
        (np.zeros(2, np.int64), host_imgs[4:], np.arange(4, 6)),
    ]
    ref = extract_features(
        model, variables, loader, use_rollout=True, pad_batch=4
    )
    # batch_size=4 with N=10 exercises the wrap-padded tail batch
    dev = extract_features_device(
        model, variables, images, batch_size=4, use_rollout=True
    )
    for key in ("bank", "center", "rollout"):
        np.testing.assert_allclose(
            ref[key], np.asarray(dev[key]), rtol=2e-5, atol=2e-6
        )


def test_extract_device_smaller_than_batch():
    """N < batch_size wrap-pads via take(arange % N) — a plain images[:pad]
    came up short and crashed the reshape (review regression)."""
    from vit_reranking_tpu.engine.extract import extract_features_device
    from vit_reranking_tpu.models import select

    rng = jax.random.PRNGKey(1)
    model = select("resnet50_normalize", SimpleNamespace(embed_dim=8))
    images = jax.random.normal(rng, (3, 64, 64, 3), jnp.float32)
    variables = model.init(rng, images[:1], train=False)
    out = extract_features_device(model, variables, images, batch_size=8)
    assert out["bank"].shape[0] == 3
    assert np.all(np.isfinite(np.asarray(out["center"])))
