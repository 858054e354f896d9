"""Multi-device rerank: the query axis shards over the data mesh
(SURVEY.md section 2.10 — the TPU-native replacement for "sequence
parallelism" is distributing the gallery/query axes, not ring attention).
Runs on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_reranking_tpu.ops.similarity import calc_similarity_rollout
from vit_reranking_tpu.ops.topk import pairwise_topk
from vit_reranking_tpu.parallel.mesh import create_mesh


def test_query_sharded_rerank_matches_single_device():
    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.default_rng(0)
    N, C, R, K = 64, 16, 9, 8
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((N, R))).astype(np.float32)

    fb_j, c_j, r_j = map(jnp.asarray, (fb, centers, roll))
    _, top = pairwise_topk(c_j, c_j, k=K, mask_self=True)

    def rerank_all(fb_q, c_q, r_q, top_q):
        def one(anchor, center, rr, idx):
            s, _ = calc_similarity_rollout(
                center, anchor, rr, c_j[idx], fb_j[idx], r_j[idx], stage=1
            )
            return s

        return jax.vmap(one)(fb_q, c_q, r_q, top_q)

    # single device
    ref = np.asarray(rerank_all(fb_j, c_j, r_j, top))

    # queries sharded over the data axis; gallery (closure) replicated
    qsh = NamedSharding(mesh, P("data"))
    fb_s = jax.device_put(fb_j, NamedSharding(mesh, P("data", None, None)))
    c_s = jax.device_put(c_j, NamedSharding(mesh, P("data", None)))
    r_s = jax.device_put(r_j, NamedSharding(mesh, P("data", None)))
    top_s = jax.device_put(top, NamedSharding(mesh, P("data", None)))
    with mesh:
        out = jax.jit(
            rerank_all,
            out_shardings=NamedSharding(mesh, P("data", None)),
        )(fb_s, c_s, r_s, top_s)
    # result is actually sharded over 8 devices
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_gallery_sharded_topk_matches_single_device():
    """Distributed brute-force kNN: gallery sharded over the 8-device data
    axis, exact all_gather merge == single-device pairwise_topk."""
    from vit_reranking_tpu.parallel.sharded_topk import sharded_pairwise_topk

    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.default_rng(1)
    Q, N, C, K = 24, 64, 16, 10
    g = rng.standard_normal((N, C)).astype(np.float32)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    q = g[:Q]

    v0, i0 = pairwise_topk(jnp.asarray(q), jnp.asarray(g), k=K, mask_self=True)
    v1, i1 = sharded_pairwise_topk(
        mesh, jnp.asarray(q), jnp.asarray(g), k=K, mask_self=True
    )
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_gallery_sharded_topk_padded_rows():
    """N not a multiple of the mesh: wrap in pad_to_multiple + n_valid."""
    from vit_reranking_tpu.parallel.mesh import pad_to_multiple
    from vit_reranking_tpu.parallel.sharded_topk import sharded_pairwise_topk

    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.default_rng(2)
    Q, N, C, K = 8, 61, 16, 5
    # force ALL real scores negative (q > 0 elementwise, g < 0): a zero pad
    # row (ip = 0) would displace real candidates from the last shard's head
    # if it were masked only after selection
    g = (-np.abs(rng.standard_normal((N, C))) - 0.1).astype(np.float32)
    q = (np.abs(rng.standard_normal((Q, C))) + 0.1).astype(np.float32)
    gp, n_real = pad_to_multiple(jnp.asarray(g), 8, axis=0)
    assert n_real == N

    v0, i0 = pairwise_topk(jnp.asarray(q), jnp.asarray(g), k=K)
    v1, i1 = sharded_pairwise_topk(mesh, jnp.asarray(q), gp, k=K, n_valid=N)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6, atol=1e-7)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))


def test_sharded_rerank_evaluate_matches_single_device():
    """The full distributed eval engine (gallery-sharded kNN -> query-sharded
    OT rerank -> metrics) must reproduce rerank_evaluate exactly."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate
    from vit_reranking_tpu.engine.sharded_eval import sharded_rerank_evaluate

    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.default_rng(5)
    N, C, R, K = 60, 16, 9, 8  # N % 8 != 0: exercises both pad paths
    labels = np.arange(N) % 6
    base = rng.standard_normal((6, C, R)).astype(np.float32)
    fb = base[labels] + 0.4 * rng.standard_normal((N, C, R)).astype(np.float32)
    fb = np.asarray(fb / np.linalg.norm(fb, axis=1, keepdims=True), np.float32)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((N, R))).astype(np.float32)
    fb_j, c_j, r_j = map(jnp.asarray, (fb, centers, roll))

    ref = rerank_evaluate(
        fb_j, c_j, labels, rollout=r_j, trunc_nums=(0, K), method="rollout",
        flags={"use_ot": True}, use_fused=False,
    )
    # default dispatch = fused Pallas kernel per device shard (interpret mode
    # on the CPU mesh); use_fused=False pins the XLA fallback too
    for fused in (None, False):
        out = sharded_rerank_evaluate(
            mesh, fb_j, c_j, labels, rollout=r_j, trunc_nums=(0, K),
            method="rollout", flags={"use_ot": True}, use_fused=fused,
        )
        for m in ("r1", "rp", "mapr"):
            for t in (0, K):
                assert abs(ref[m][t] - out[m][t]) < 1e-4, (
                    fused, m, t, ref[m][t], out[m][t],
                )


def test_sharded_rerank_evaluate_featvit_fused_matches_single_device():
    """featvit method through the sharded fused path (incl. partial OT via
    the kernel's group-exit mode) == single-device engine."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate
    from vit_reranking_tpu.engine.sharded_eval import sharded_rerank_evaluate

    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.default_rng(7)
    N, C, R, K = 48, 16, 9, 6
    labels = np.arange(N) % 6
    base = rng.standard_normal((6, C, R)).astype(np.float32)
    fb = base[labels] + 0.4 * rng.standard_normal((N, C, R)).astype(np.float32)
    fb = np.asarray(fb / np.linalg.norm(fb, axis=1, keepdims=True), np.float32)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    fb_j, c_j = jnp.asarray(fb), jnp.asarray(centers)

    for flags in (
        {"use_ot": True, "use_inverse": True, "temperature": 0.1},
        {"use_ot": True, "ot_part": 0.5},
    ):
        ref = rerank_evaluate(
            fb_j, c_j, labels, trunc_nums=(0, K), method="featvit", flags=flags,
        )
        out = sharded_rerank_evaluate(
            mesh, fb_j, c_j, labels, trunc_nums=(0, K), method="featvit",
            flags=flags,
        )
        for m in ("r1", "rp", "mapr"):
            for t in (0, K):
                assert abs(ref[m][t] - out[m][t]) < 1e-4, (
                    flags, m, t, ref[m][t], out[m][t],
                )


def test_sharded_rerank_evaluate_rejects_bad_args():
    import pytest
    from vit_reranking_tpu.engine.sharded_eval import sharded_rerank_evaluate

    mesh = create_mesh(jax.devices()[:8])
    fb = jnp.ones((16, 4, 9))
    c = jnp.ones((16, 4))
    with pytest.raises(ValueError, match="rollout saliency"):
        sharded_rerank_evaluate(mesh, fb, c, np.arange(16) % 4)
    with pytest.raises(ValueError, match="supports methods"):
        sharded_rerank_evaluate(mesh, fb, c, np.arange(16) % 4, method="qk")
