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
