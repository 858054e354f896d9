"""Fused Pallas rerank kernel vs the XLA reference path (interpret mode on
the CPU test mesh; the real-TPU runs are covered by bench.py and the driver)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_reranking_tpu.ops.rerank_pallas import (
    fused_featvit_rerank_scores,
    fused_rollout_rerank_scores,
)
from vit_reranking_tpu.ops.similarity import calc_similarity, calc_similarity_rollout


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    Q, K, C, R = 16, 8, 32, 49
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100)
    top = np.argsort(-sims, 1)[:, :K].astype(np.int32)
    return tuple(map(jnp.asarray, (fb, centers, roll, top)))


def test_fused_rollout_matches_xla(problem):
    fb, centers, roll, top = problem
    Q = fb.shape[0]

    def one(i):
        s, _ = calc_similarity_rollout(
            centers[i], fb[i], roll[i], centers[top[i]], fb[top[i]], roll[top[i]],
            stage=1,
        )
        return s

    ref = jax.vmap(one)(jnp.arange(Q))
    out = fused_rollout_rerank_scores(
        fb, centers, roll, top, query_tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "flags",
    [dict(use_uniform=True), dict(use_inverse=True, temperature=0.1), dict()],
)
def test_fused_featvit_matches_xla(problem, flags):
    fb, centers, roll, top = problem
    Q = fb.shape[0]

    def one(i):
        s, _ = calc_similarity(
            fb[i], centers[i], fb[top[i]], centers[top[i]], stage=1,
            use_cls_token=True, **flags,
        )
        return s

    ref = jax.vmap(one)(jnp.arange(Q))
    out = fused_featvit_rerank_scores(
        fb, centers, top, query_tile=16, use_cls_token=True, interpret=True, **flags
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_rerank_evaluate_fused_vs_xla_metrics():
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    rng = np.random.default_rng(1)
    N, C, R, ncls = 128, 16, 49, 8
    protos = rng.standard_normal((ncls, C)).astype(np.float32)
    labels = np.repeat(np.arange(ncls), N // ncls)
    fb = protos[labels][:, :, None] + 0.8 * rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    fb, centers, labels = jnp.asarray(fb), jnp.asarray(centers), jnp.asarray(labels)

    kw = dict(
        trunc_nums=(0, 8), method="featvit",
        flags=dict(use_uniform=True, use_cls_token=True), query_block=32,
    )
    res_fused = rerank_evaluate(fb, centers, labels, use_fused=True, **kw)
    res_xla = rerank_evaluate(fb, centers, labels, use_fused=False, **kw)
    for m in ("r1", "rp", "mapr"):
        assert abs(res_fused[m][8] - res_xla[m][8]) < 0.5, (m, res_fused[m], res_xla[m])


@pytest.mark.parametrize("ot_part", [0.5, 0.8])
def test_fused_partial_ot_matches_xla_rollout(problem, ot_part):
    """Partial OT now rides the fused kernel via the group-exit mode: one
    query's candidates per grid step, batch-mean Sinkhorn exit exactly like
    the reference (diml.py:50-52, dustbin construction diml.py:56-75)."""
    fb, centers, roll, top = problem
    Q = fb.shape[0]

    def one(i):
        s, _ = calc_similarity_rollout(
            centers[i], fb[i], roll[i], centers[top[i]], fb[top[i]], roll[top[i]],
            stage=1, ot_part=ot_part,
        )
        return s

    ref = jax.vmap(one)(jnp.arange(Q))
    out = fused_rollout_rerank_scores(
        fb, centers, roll, top, query_tile=16, ot_part=ot_part, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    # exact rank agreement within each query's candidate list
    assert (
        np.argsort(-np.asarray(out), axis=1) == np.argsort(-np.asarray(ref), axis=1)
    ).all()


@pytest.mark.parametrize("ot_part", [0.5, 0.8])
def test_fused_partial_ot_matches_xla_featvit(problem, ot_part):
    fb, centers, roll, top = problem
    Q = fb.shape[0]

    def one(i):
        s, _ = calc_similarity(
            fb[i], centers[i], fb[top[i]], centers[top[i]], stage=1,
            use_cls_token=True, use_uniform=True, ot_part=ot_part,
        )
        return s

    ref = jax.vmap(one)(jnp.arange(Q))
    out = fused_featvit_rerank_scores(
        fb, centers, top, query_tile=16, use_cls_token=True, use_uniform=True,
        ot_part=ot_part, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    assert (
        np.argsort(-np.asarray(out), axis=1) == np.argsort(-np.asarray(ref), axis=1)
    ).all()


def test_rerank_evaluate_auto_fuses_partial_ot():
    """Engine auto-dispatch: ot_part < 1 with K <= 128 lanes must take the
    fused path and agree with the XLA path on metrics."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    rng = np.random.default_rng(3)
    N, C, R, ncls = 96, 16, 49, 6
    protos = rng.standard_normal((ncls, C)).astype(np.float32)
    labels = np.repeat(np.arange(ncls), N // ncls)
    fb = protos[labels][:, :, None] + 0.8 * rng.standard_normal((N, C, R)).astype(
        np.float32
    )
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    fb, centers, labels = jnp.asarray(fb), jnp.asarray(centers), jnp.asarray(labels)

    kw = dict(
        trunc_nums=(0, 8), method="featvit",
        flags=dict(use_uniform=True, use_cls_token=True, ot_part=0.8),
        query_block=32,
    )
    res_fused = rerank_evaluate(fb, centers, labels, **kw)  # auto: fused
    res_xla = rerank_evaluate(fb, centers, labels, use_fused=False, **kw)
    for m in ("r1", "rp", "mapr"):
        assert abs(res_fused[m][8] - res_xla[m][8]) < 1e-6, (
            m, res_fused[m], res_xla[m],
        )


def test_fused_partial_ot_wide_k_rank_agreement():
    """Partial OT at K > 128 pair lanes: multi-step group packing — the
    query's candidates span ceil(K/P) grid steps, exit residual per 128-lane
    chunk (the closest realization of the reference's full-K batch-mean exit
    without cross-step communication).  Scores must track the XLA reference
    path closely and the metric-relevant head ranking must agree
    (VERDICT r2 item 7)."""
    from vit_reranking_tpu.ops.rerank_pallas import PAIR_LANES, fused_rerank_tile
    from vit_reranking_tpu.ops.similarity import calc_similarity_rollout

    rng = np.random.default_rng(11)
    T, K, C, R = 4, 256, 16, 16
    assert K > PAIR_LANES
    N = 300
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((N, R))).astype(np.float32)
    top = np.stack([rng.permutation(N)[:K] for _ in range(T)]).astype(np.int32)
    fb_j, c_j, r_j, top_j = map(jnp.asarray, (fb, centers, roll, top))

    from vit_reranking_tpu.ops.rerank_pallas import rollout_marginals

    ot_part = 0.5
    u, v = rollout_marginals(r_j[jnp.arange(T)], r_j[top_j])
    out = fused_rerank_tile(
        fb_j[:T], fb_j[top_j], u, v, ot_part=ot_part, interpret=True,
    )
    assert out.shape == (T, K)

    def one(i):
        s, _ = calc_similarity_rollout(
            c_j[i], fb_j[i], r_j[i], c_j[top_j[i]], fb_j[top_j[i]], r_j[top_j[i]],
            stage=1, ot_part=ot_part,
        )
        return s

    ref = jax.vmap(one)(jnp.arange(T))
    out, ref = np.asarray(out), np.asarray(ref)
    # scores agree to chunk-vs-batch exit tolerance (measured ~5e-4)
    np.testing.assert_allclose(out, ref, rtol=0.02, atol=2e-3)
    # the metric-relevant head is identical; the full 256-permutation may
    # swap near-tied tails
    for i in range(T):
        assert set(np.argsort(-out[i])[:10]) == set(np.argsort(-ref[i])[:10])
    agree = (np.argsort(-out, axis=1) == np.argsort(-ref, axis=1)).mean()
    assert agree > 0.85, agree


def test_rerank_evaluate_partial_wide_k_fuses_with_warning(caplog):
    """Engine dispatch at ot_part < 1, trunc > 128: takes the fused dense
    path (no silent ~14x XLA fallback) and logs the granularity note."""
    import logging

    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    rng = np.random.default_rng(4)
    N, C, R, ncls = 272, 8, 9, 8
    protos = rng.standard_normal((ncls, C)).astype(np.float32)
    labels = np.repeat(np.arange(ncls), N // ncls)
    fb = protos[labels][:, :, None] + 0.8 * rng.standard_normal((N, C, R)).astype(
        np.float32
    )
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((N, R))).astype(np.float32)
    fb, centers, roll = jnp.asarray(fb), jnp.asarray(centers), jnp.asarray(roll)
    labels = jnp.asarray(labels)

    kw = dict(
        trunc_nums=(0, 136), method="rollout", rollout=roll,
        flags=dict(ot_part=0.5), query_block=68,
    )
    with caplog.at_level(logging.WARNING):
        res_fused = rerank_evaluate(fb, centers, labels, **kw)  # auto: fused
    assert any("pair lanes" in r.message for r in caplog.records)
    res_xla = rerank_evaluate(fb, centers, labels, use_fused=False, **kw)
    for m in ("r1", "rp", "mapr"):
        assert abs(res_fused[m][136] - res_xla[m][136]) < 0.5, (
            m, res_fused[m], res_xla[m],
        )


def test_fused_qg_matches_xla_separate_banks():
    """Query != gallery variant (MSLS val semantics, val.py:162-187): the
    fused kernel must match the per-query XLA calc_similarity with the MSLS
    default flags (use_minus + cls_token + temperature 0.1)."""
    from vit_reranking_tpu.ops.rerank_pallas import fused_featvit_rerank_scores_qg

    rng = np.random.default_rng(3)
    Nq, Ng, K, C, R = 12, 40, 8, 24, 49
    qb = rng.standard_normal((Nq, C, R)).astype(np.float32)
    qb /= np.linalg.norm(qb, axis=1, keepdims=True)
    gb = rng.standard_normal((Ng, C, R)).astype(np.float32)
    gb /= np.linalg.norm(gb, axis=1, keepdims=True)
    qc = qb.mean(-1); qc /= np.linalg.norm(qc, -1, keepdims=True)
    gc = gb.mean(-1); gc /= np.linalg.norm(gc, -1, keepdims=True)
    top = np.argsort(-(qc @ gc.T), 1)[:, :K].astype(np.int32)
    qb_j, qc_j, gb_j, gc_j, top_j = map(jnp.asarray, (qb, qc, gb, gc, top))

    flags = dict(use_minus=True, use_cls_token=True, temperature=0.1)
    out = np.asarray(fused_featvit_rerank_scores_qg(
        qb_j, qc_j, gb_j, gc_j, top_j, query_tile=8, interpret=True, **flags
    ))

    def one(i):
        s, _ = calc_similarity(
            qb_j[i], qc_j[i], gb_j[top_j[i]], gc_j[top_j[i]], stage=1, **flags
        )
        return s

    ref = np.asarray(jax.vmap(one)(jnp.arange(Nq)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "flags",
    [dict(scale=1.0 / 8.0), dict(scale=1.0), dict(scale=1.0 / 8.0, use_exp=True, temperature=0.5),
     dict(scale=1.0, use_uniform=True)],
)
def test_fused_qk_matches_xla(flags):
    """The qk method (attention-map OT kernel + feature-similarity score,
    reference calc_similarity_vit/cvt) through the separate-cost kernel input
    must match the per-query XLA path."""
    from vit_reranking_tpu.ops.rerank_pallas import fused_qk_rerank_scores
    from vit_reranking_tpu.ops.similarity import calc_similarity_qk

    rng = np.random.default_rng(4)
    N, K, C, R, H, D = 16, 8, 24, 49, 3, 16
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    q = rng.standard_normal((N, H, R + 1, D)).astype(np.float32)
    k = rng.standard_normal((N, H, R + 1, D)).astype(np.float32)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100)
    top = np.argsort(-sims, 1)[:, :K].astype(np.int32)
    fb_j, q_j, k_j, top_j, c_j = map(jnp.asarray, (fb, q, k, top, centers))

    out = np.asarray(fused_qk_rerank_scores(
        fb_j, q_j, k_j, top_j, query_tile=8, interpret=True, **flags
    ))

    def one(i):
        s, _ = calc_similarity_qk(
            c_j[i], fb_j[i], q_j[i], c_j[top_j[i]], fb_j[top_j[i]],
            k_j[top_j[i]], stage=1,
            use_uniform=flags.get("use_uniform", False),
            use_exp=flags.get("use_exp", False),
            temperature=flags.get("temperature", 1.0),
            scale=flags["scale"],
        )
        return s

    ref = np.asarray(jax.vmap(one)(jnp.arange(N)))
    # per-pair vs batch-mean exit granularity gives ~1e-5 value wiggle for
    # full OT (documented, rank-identical); assert values close AND ranks equal
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=1e-4)
    assert np.array_equal(np.argsort(-out, axis=1), np.argsort(-ref, axis=1))


def test_rerank_evaluate_qk_fused_vs_xla_metrics():
    """Engine-level: method='qk' now auto-dispatches to the fused kernel;
    metrics must agree with the XLA path."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    rng = np.random.default_rng(6)
    N, C, R, H, D, K = 48, 16, 49, 2, 12, 8
    labels = np.arange(N) % 6
    base = rng.standard_normal((6, C, R)).astype(np.float32)
    fb = base[labels] + 0.5 * rng.standard_normal((N, C, R)).astype(np.float32)
    fb = np.asarray(fb / np.linalg.norm(fb, axis=1, keepdims=True), np.float32)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    q = rng.standard_normal((N, H, R + 1, D)).astype(np.float32)
    k = rng.standard_normal((N, H, R + 1, D)).astype(np.float32)
    fb_j, c_j, q_j, k_j = map(jnp.asarray, (fb, centers, q, k))

    kwargs = dict(
        rollout=q_j, rollout_g=k_j, trunc_nums=(0, K), method="qk",
        flags={"use_ot": True, "qk_scale": 1.0 / 8.0}, query_block=16,
    )
    ref = rerank_evaluate(fb_j, c_j, labels, use_fused=False, **kwargs)
    out = rerank_evaluate(fb_j, c_j, labels, use_fused=True, **kwargs)
    for m in ("r1", "rp", "mapr"):
        for t in (0, K):
            assert abs(ref[m][t] - out[m][t]) < 0.2, (m, t, ref[m][t], out[m][t])


def test_qk_method_without_k_bank_falls_back_to_xla():
    """rollout_g=None must keep the old XLA fallback (gal_roll substitution),
    not crash in the fused qk path."""
    from vit_reranking_tpu.engine.rerank_eval import rerank_evaluate

    rng = np.random.default_rng(7)
    N, C, R, H, D = 24, 8, 49, 2, 8
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    qk_bank = rng.standard_normal((N, H, R + 1, D)).astype(np.float32)
    res = rerank_evaluate(
        jnp.asarray(fb), jnp.asarray(centers), np.arange(N) % 4,
        rollout=jnp.asarray(qk_bank), rollout_g=None,
        trunc_nums=(0, 8), method="qk", flags={"use_ot": True}, query_block=8,
    )
    assert np.isfinite(res["r1"][8])


@pytest.mark.parametrize("seed,R,K,tile", [(0, 16, 4, 4), (1, 49, 12, 8), (2, 25, 7, 16)])
def test_fused_rollout_geometry_fuzz(seed, R, K, tile):
    """Shape/geometry fuzz: non-square-friendly K, tiles that don't divide N,
    tiny grids — fused must track the XLA path everywhere."""
    rng = np.random.default_rng(seed)
    N, C = 22, 12  # deliberately not a multiple of tile
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    roll = np.abs(rng.standard_normal((N, R))).astype(np.float32)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100)
    top = np.argsort(-sims, 1)[:, :K].astype(np.int32)
    fb_j, c_j, r_j, top_j = map(jnp.asarray, (fb, centers, roll, top))

    for ot_part in (1.0, 0.7):
        out = np.asarray(fused_rollout_rerank_scores(
            fb_j, c_j, r_j, top_j, query_tile=tile, ot_part=ot_part,
            interpret=True,
        ))
        def one(i):
            s, _ = calc_similarity_rollout(
                c_j[i], fb_j[i], r_j[i], c_j[top_j[i]], fb_j[top_j[i]],
                r_j[top_j[i]], stage=1, ot_part=ot_part)
            return s
        ref = np.asarray(jax.vmap(one)(jnp.arange(N)))
        assert out.shape == (N, K)
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=1e-4)


def test_einsum_direct_packing_matches_moveaxis_pack():
    """query_tile == PAIR_LANES takes the einsum-direct packed layout
    ('tcm,tkcs->ksmt', queries on lanes, no pad) — scores must equal the
    moveaxis-packed path exactly (same per-lane computation, only the lane
    assignment differs) and track the XLA reference."""
    from vit_reranking_tpu.ops.rerank_pallas import fused_rerank_tile

    rng = np.random.default_rng(11)
    T, K, C, R = 8, 5, 16, 7
    an = rng.standard_normal((T, C, R)).astype(np.float32)
    an /= np.linalg.norm(an, axis=1, keepdims=True)
    fb = rng.standard_normal((T, K, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=2, keepdims=True)
    u = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    u /= u.sum(-1, keepdims=True)
    v = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    v /= v.sum(-1, keepdims=True)
    an_j, fb_j, u_j, v_j = map(jnp.asarray, (an, fb, u, v))

    # P == T -> einsum-direct fast path; P != T -> moveaxis pack
    fast = fused_rerank_tile(
        an_j, fb_j, u_j, v_j, iters=50, interpret=True, P=T, group_exit=False
    )
    packed = fused_rerank_tile(
        an_j, fb_j, u_j, v_j, iters=50, interpret=True, P=16, group_exit=False
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(packed), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("ot_part", [1.0, 0.5], ids=["full", "partial-0.5"])
def test_bf16_stream_close_to_f32(problem, ot_part):
    """stream_dtype="bfloat16" (the fast mode: packed S streams through HBM
    in bf16, Sinkhorn math stays f32) must track the f32 path to bf16
    rounding of S — measured on the chip: max |dS| ~2e-4 full OT / ~3e-7
    partial, final-rank top-1 agreement 0.998/1.000 at Q=4096 on worst-case
    random data (scripts/ablate_rerank_dtype.py); e2e R@K parity vs the
    reference's own evaluate() is gated in tests/test_e2e_parity.py."""
    fb, centers, roll, top = problem
    kw = dict(query_tile=16, ot_part=ot_part, interpret=True)
    s32 = np.asarray(fused_rollout_rerank_scores(fb, centers, roll, top, **kw))
    s16 = np.asarray(
        fused_rollout_rerank_scores(
            fb, centers, roll, top, stream_dtype="bfloat16", **kw
        )
    )
    # S in [-1, 1] rounds to bf16 (2^-8 ulp); the OT plan renormalizes, so
    # score error stays near S's own rounding
    assert np.abs(s32 - s16).max() < 3e-3
    # the einsum-direct fast path (query_tile == 128 lanes) shares the same
    # cast logic; geometry fuzz covers it via test_fused_rollout_geometry_fuzz


@pytest.mark.parametrize("ot_part", [1.0, 0.5], ids=["full", "partial-0.5"])
def test_pack_gather_bit_exact_vs_prerounded_bank(ot_part):
    """pack_gather gathers candidate rows from an int32 view of the bf16
    bank (adjacent-pair bitcast, 4-byte gather of half the bytes).  The
    pack/unpack roundtrip is a pure layout reinterpretation, so scores must
    be BIT-IDENTICAL to the plain bf16-stream path fed the pre-rounded
    bank, and within bf16 input-rounding noise of the unpacked path."""
    from vit_reranking_tpu.ops.rerank_pallas import (
        _pack_bank_pairs,
        _unpack_bank_pairs,
        fused_rollout_rerank_scores,
    )

    rng = np.random.default_rng(11)
    N, K, C, R = 64, 8, 16, 49
    fb = rng.standard_normal((N, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    rollout = np.abs(rng.standard_normal((N, R))).astype(np.float32)
    top = rng.integers(0, N, size=(N, K), dtype=np.int32)
    fbj, rj, tj = map(jnp.asarray, (fb, rollout, top))
    cj = fbj.mean(-1)

    packed = _pack_bank_pairs(fbj)
    assert packed.dtype == jnp.int32 and packed.shape == (N, C * R // 2)
    np.testing.assert_array_equal(
        np.asarray(_unpack_bank_pairs(packed, C, R)),
        np.asarray(fbj.astype(jnp.bfloat16)),
    )

    kw = dict(
        query_tile=32, interpret=True, stream_dtype="bfloat16",
        ot_part=ot_part,
    )
    s_pack = np.asarray(
        fused_rollout_rerank_scores(fbj, cj, rj, tj, pack_gather=True, **kw)
    )
    s_pre = np.asarray(
        fused_rollout_rerank_scores(
            fbj.astype(jnp.bfloat16).astype(jnp.float32), cj, rj, tj,
            pack_gather=False, **kw,
        )
    )
    s_plain = np.asarray(
        fused_rollout_rerank_scores(fbj, cj, rj, tj, pack_gather=False, **kw)
    )
    assert np.isfinite(s_pack).all()
    np.testing.assert_array_equal(s_pack, s_pre)
    assert np.abs(s_pack - s_plain).max() < 5e-3  # bf16 input rounding only


@pytest.mark.parametrize("ot_part", [1.0, 0.5], ids=["full", "partial-0.5"])
@pytest.mark.parametrize("with_cost", [False, True], ids=["plain", "cost"])
def test_sublane_padding_is_bit_neutral(ot_part, with_cost):
    """pad_sublanes tile-aligns the packed stream by zero-padding the anchor
    patch axis (R_m 49 -> 56/64) and masking the dead columns in-kernel
    (m_valid).  Every padded term contributes exact 0.0 to both Sinkhorn
    reductions; only the SIMD regrouping of the reduction changes (49 vs 56
    summands), so real lanes must match the unpadded kernel to ~1 ulp —
    full OT, partial OT (dustbin beyond the pad), and separate-cost."""
    from vit_reranking_tpu.ops.rerank_pallas import fused_rerank_tile

    rng = np.random.default_rng(3)
    T, K, C, R = 8, 5, 16, 49
    an = rng.standard_normal((T, C, R)).astype(np.float32)
    an /= np.linalg.norm(an, axis=1, keepdims=True)
    fb = rng.standard_normal((T, K, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=2, keepdims=True)
    u = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    u /= u.sum(-1, keepdims=True)
    v = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    v /= v.sum(-1, keepdims=True)
    cost = None
    if with_cost:
        cost = jnp.asarray(
            np.tanh(rng.standard_normal((T, K, R, R))).astype(np.float32)
        )
    an_j, fb_j, u_j, v_j = map(jnp.asarray, (an, fb, u, v))

    kw = dict(iters=50, ot_part=ot_part, interpret=True, P=16, cost=cost)
    padded = fused_rerank_tile(an_j, fb_j, u_j, v_j, pad_sublanes=True, **kw)
    plain = fused_rerank_tile(an_j, fb_j, u_j, v_j, pad_sublanes=False, **kw)
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(plain), rtol=2e-6, atol=2e-7
    )
    assert np.isfinite(np.asarray(padded)).all()


def test_sublane_padding_bf16_stream_matches():
    """The bf16 stream with padding must match the unpadded bf16 stream to
    the same ~1-ulp reduction-order tolerance (the einsum rounds
    identically; pad columns are exact zeros in bf16 as well)."""
    from vit_reranking_tpu.ops.rerank_pallas import fused_rerank_tile

    rng = np.random.default_rng(5)
    T, K, C, R = 8, 5, 16, 49
    an = rng.standard_normal((T, C, R)).astype(np.float32)
    fb = rng.standard_normal((T, K, C, R)).astype(np.float32)
    u = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    u /= u.sum(-1, keepdims=True)
    v = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    v /= v.sum(-1, keepdims=True)
    an_j, fb_j, u_j, v_j = map(jnp.asarray, (an, fb, u, v))

    kw = dict(iters=50, interpret=True, P=16, stream_dtype="bfloat16")
    padded = fused_rerank_tile(an_j, fb_j, u_j, v_j, pad_sublanes=True, **kw)
    plain = fused_rerank_tile(an_j, fb_j, u_j, v_j, pad_sublanes=False, **kw)
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(plain), rtol=2e-6, atol=2e-7
    )
