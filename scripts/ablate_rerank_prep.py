"""Attribute fused-rerank device time: gather vs einsum vs pack vs Sinkhorn.

bench_rerank_scaling.py showed the Sinkhorn loop is NOT the bound (capping
iterations at 12 gains only ~14% at Q=4096); ~80% of device time is the XLA
prep.  Candidate costs per 256-query tile:
  * gather fb_g = feature_bank[top_inds[idx]]: 642 MB materialization;
  * S einsum 'tcm,tkcs->tksm': batch (T,K)=25600 of TINY (49x128)@(128x49)
    matmuls — poor MXU shape (49/128 rows+cols per pass, f32 HIGHEST);
  * an alternative big-matmul shape 'txc,tcm->txm' with x=K*R=4900 rows
    (bank pre-transposed to (N, R, C) once);
  * the lanes pack moveaxis (0.5 GB/tile);
  * the Sinkhorn kernel at iters in {1, 100-earlyexit}.

Each stage is timed as a separate jitted program over the same 16-tile
lax.map; arrays are jit args (axon remote-compile 413s on big closures).

Run alone on the chip: python scripts/ablate_rerank_prep.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.rerank_pallas import (
    PAIR_LANES,
    _pack_pairs,
    rollout_marginals,
    sinkhorn_scores_packed,
)

Q, K, C, R = 4096, 100, 128, 49
TILE = 256
HI = jax.lax.Precision.HIGHEST


def make_problem(rng):
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    rollout = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100.0)
    part = np.argpartition(-sims, K, axis=1)[:, :K]
    order = np.take_along_axis(sims, part, 1).argsort(1)[:, ::-1]
    top = np.take_along_axis(part, order, 1).astype(np.int32)
    return map(jnp.asarray, (fb, centers, rollout, top))


def tiles(n):
    nt = -(-Q // TILE)
    return jnp.asarray((np.arange(nt * TILE) % Q).reshape(nt, TILE))


def timed(fn, n_rep=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n_rep


@functools.partial(jax.jit, static_argnums=(3,))
def stage_gather(fb, top, idx_all, _tag):
    def one(idx):
        fb_g = fb[top[idx]]
        return jnp.sum(fb_g)

    return jnp.sum(jax.lax.map(one, idx_all))


@functools.partial(jax.jit, static_argnums=(3,))
def stage_einsum_small(fb, top, idx_all, _tag):
    def one(idx):
        fb_g = fb[top[idx]]
        S = jnp.einsum(
            "tcm,tkcs->tksm", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )
        return jnp.sum(S)

    return jnp.sum(jax.lax.map(one, idx_all))


@functools.partial(jax.jit, static_argnums=(3,))
def stage_einsum_big(fbT, top, idx_all, _tag):
    # fbT: (N, R, C); gathered (T, K, R, C) reshapes to (T, K*R, C) with no
    # transpose, giving a (4900 x 128) @ (128 x 49) matmul per query
    def one(idx):
        fb_g = fbT[top[idx]].reshape(TILE, K * R, C)
        anchors = jnp.swapaxes(fbT[idx], 1, 2)  # (T, C, R_m)
        S = jnp.einsum(
            "txc,tcm->txm", fb_g, anchors,
            preferred_element_type=jnp.float32, precision=HI,
        )
        return jnp.sum(S)

    return jnp.sum(jax.lax.map(one, idx_all))


@functools.partial(jax.jit, static_argnums=(3,))
def stage_pack(fb, top, idx_all, _tag):
    def one(idx):
        fb_g = fb[top[idx]]
        S = jnp.einsum(
            "tcm,tkcs->tksm", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )
        Sp = _pack_pairs(S.reshape(TILE * K, R, R), PAIR_LANES)
        return jnp.sum(Sp)

    return jnp.sum(jax.lax.map(one, idx_all))


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def stage_full(fb, rollout, top, idx_all, iters, lanes, loop="while"):
    def one(idx):
        fb_g = fb[top[idx]]
        S = jnp.einsum(
            "tcm,tkcs->tksm", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )
        u, v = rollout_marginals(rollout[idx], rollout[top[idx]])
        Sp = _pack_pairs(S.reshape(TILE * K, R, R), lanes)
        up = _pack_pairs(u.reshape(TILE * K, R), lanes)
        vp = _pack_pairs(v.reshape(TILE * K, R), lanes)
        sc = sinkhorn_scores_packed(Sp, up, vp, iters=iters, loop=loop)
        return jnp.sum(sc)

    return jnp.sum(jax.lax.map(one, idx_all))


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stream_multi_kernel(S_ref, o_ref, *, G):
    # G packed steps per grid step: one big input DMA + one output DMA
    # instead of G small ones
    for g in range(G):
        S = S_ref[g]
        c = S[0]
        r = S[:, 0, :]
        t1 = jnp.sum(S * c[None, :, :], axis=1)
        o_ref[g] = jnp.sum(r * t1, axis=0)[None, :]


@functools.partial(jax.jit, static_argnums=(3,))
def stage_stream_multi(fb, top, idx_all, G):
    def one(idx):
        fb_g = fb[top[idx]]
        S = jnp.einsum(
            "tcm,tkcs->tksm", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )
        Sp = _pack_pairs(S.reshape(TILE * K, R, R), PAIR_LANES)
        nsteps = Sp.shape[0]
        assert nsteps % G == 0, (nsteps, G)
        out = pl.pallas_call(
            functools.partial(_stream_multi_kernel, G=G),
            grid=(nsteps // G,),
            in_specs=[
                pl.BlockSpec(
                    (G, R, R, PAIR_LANES), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (G, 1, PAIR_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nsteps, 1, PAIR_LANES), jnp.float32),
        )(Sp)
        return jnp.sum(out)

    return jnp.sum(jax.lax.map(one, idx_all))


@functools.partial(jax.jit, static_argnums=(3,))
def stage_packed_einsum_stream(fb, top, idx_all, _tag):
    """Einsum emits the packed (K, R_s, R_m, T=128) layout directly
    ('tcm,tkcs->ksmt' with a 128-query tile): pairs-on-lanes with NO
    moveaxis transpose and NO pad.  Measures whether XLA folds the output
    permutation into the dot (vs the _pack_pairs transpose materialization).
    """
    def one(idx):
        fb_g = fb[top[idx]]
        Sp = jnp.einsum(
            "tcm,tkcs->ksmt", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )  # (K, R_s, R_m, 128)
        nsteps = Sp.shape[0]
        out = pl.pallas_call(
            functools.partial(_stream_kernel, do_exp=False),
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(
                    (1, R, R, PAIR_LANES), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, PAIR_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nsteps, 1, PAIR_LANES), jnp.float32),
        )(Sp)
        return jnp.sum(out)

    return jnp.sum(jax.lax.map(one, idx_all))


def _stream_kernel(S_ref, o_ref, *, do_exp):
    S = S_ref[0]
    if do_exp:
        S = jnp.exp(-(1.0 - S) / 0.05)
    if S.ndim == 3:
        # mirror the production epilogue's exact op pattern (plain
        # sum-then-sum trips a Mosaic relayout error; the broadcast
        # multiplies keep every intermediate in a concrete layout)
        c = S[0]  # (R_m, P) stand-in for the column scaling
        r = S[:, 0, :]  # (R_s, P) stand-in for the row scaling
        t1 = jnp.sum(S * c[None, :, :], axis=1)  # (R_s, P)
        o_ref[0] = jnp.sum(r * t1, axis=0)[None, :]
    else:
        t1 = S[: S.shape[0] // 2] * S[S.shape[0] // 2 : 2 * (S.shape[0] // 2)]
        o_ref[0] = jnp.sum(t1, axis=0)[None, :]


@functools.partial(jax.jit, static_argnums=(3, 4))
def stage_stream(fb, top, idx_all, flat, do_exp):
    """Pure kernel-streaming cost: read each packed S block, reduce to (1,P).

    ``flat`` packs S as (nsteps, R*R, P) instead of (nsteps, R, R, P).
    """
    def one(idx):
        fb_g = fb[top[idx]]
        S = jnp.einsum(
            "tcm,tkcs->tksm", fb[idx], fb_g,
            preferred_element_type=jnp.float32, precision=HI,
        )
        if flat:
            Sp = _pack_pairs(S.reshape(TILE * K, R * R), PAIR_LANES)
            blk = (1, R * R, PAIR_LANES)
            idx_map = lambda i: (i, 0, 0)
        else:
            Sp = _pack_pairs(S.reshape(TILE * K, R, R), PAIR_LANES)
            blk = (1, R, R, PAIR_LANES)
            idx_map = lambda i: (i, 0, 0, 0)
        nsteps = Sp.shape[0]
        out = pl.pallas_call(
            functools.partial(_stream_kernel, do_exp=do_exp),
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(blk, idx_map, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, 1, PAIR_LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nsteps, 1, PAIR_LANES), jnp.float32),
        )(Sp)
        return jnp.sum(out)

    return jnp.sum(jax.lax.map(one, idx_all))


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    fb, centers, rollout, top = make_problem(rng)
    fbT = jax.device_put(jnp.swapaxes(fb, 1, 2))  # (N, R, C)
    idx_all = tiles(Q)

    experiments = [
        ("gather only", lambda: stage_gather(fb, top, idx_all, 0)),
        ("gather+einsum (small mm)", lambda: stage_einsum_small(fb, top, idx_all, 0)),
        ("gather+einsum (big mm, pre-T bank)", lambda: stage_einsum_big(fbT, top, idx_all, 0)),
        ("gather+einsum+pack", lambda: stage_pack(fb, top, idx_all, 0)),
    ]
    for lanes in (128, 256, 512):
        for iters in (1, 100):
            experiments.append((
                f"full, P={lanes}, iters={iters}",
                lambda it=iters, ln=lanes: stage_full(fb, rollout, top, idx_all, it, ln),
            ))
    if "--lanes-only" in sys.argv:
        experiments = experiments[4:]
    if "--stream-only" in sys.argv:
        experiments = [
            (
                f"stream flat={fl} exp={ex}",
                lambda fl=fl, ex=ex: stage_stream(fb, top, idx_all, fl, ex),
            )
            for fl in (False, True)
            for ex in (False, True)
        ]
    if "--multi-only" in sys.argv:
        experiments = [
            (
                f"stream multi G={G}",
                lambda G=G: stage_stream_multi(fb, top, idx_all, G),
            )
            for G in (1, 2, 4)
        ]
    if "--packed-einsum" in sys.argv:
        nt128 = -(-Q // 128)
        idx128 = jnp.asarray((np.arange(nt128 * 128) % Q).reshape(nt128, 128))
        experiments = [
            (
                "stream, moveaxis pack (tile 256)",
                lambda: stage_stream(fb, top, idx_all, False, False),
            ),
            (
                "stream, einsum-direct pack (tile 128)",
                lambda: stage_packed_einsum_stream(fb, top, idx128, 0),
            ),
        ]
    if "--loop-only" in sys.argv:
        experiments = [
            (
                f"full, P=128, {loop} iters={it}",
                lambda it=it, loop=loop: stage_full(
                    fb, rollout, top, idx_all, it, 128, loop
                ),
            )
            for loop, it in (
                ("fori", 1), ("fori", 12), ("fori", 31), ("while", 31),
            )
        ]
    for name, fn in experiments:
        dt = timed(fn)
        print(f"{name:38s}: {dt*1e3:7.1f} ms/rep  ({Q*K/dt/1e6:6.2f}M pairs/s)")


if __name__ == "__main__":
    main()
