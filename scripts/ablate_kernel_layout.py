"""Ablate fused-kernel packing/exit choices at the bench geometry.

Two experiments, each with the tile loop inside ONE jitted program (16 tiles
per dispatch) so per-dispatch RTT (~30-60 ms on this host, CLAUDE.md) doesn't
mask kernel differences:

1. (kept as a negative-result record) ``dual layout``: shipping a transposed
   copy of the OT kernel so the per-iteration column contraction runs as a
   leading-axis reduction instead of a sublane reduction.  Measured on the
   v5e: +1.5% full OT, 2x SLOWER for partial OT — Mosaic's sublane reduce is
   not the bottleneck.  The kernel change was reverted; this script now only
   measures experiment 2.

2. ``group_exit`` granularity for FULL OT: per-pair freeze packs lanes densely
   (128 mixed-query pairs/step) but each grid step loops until its SLOWEST
   lane's own residual crosses the threshold (~29 iters at bench geometry);
   the reference's batch-mean exit (group packing, one query's K=100
   candidates per step, 28 pad lanes) stops the whole step when the MEAN
   residual crosses (~12 iters) — and is bit-matching reference semantics
   (utilities/diml.py:50-52).  This measures whether the 2.4x loop-work
   saving beats the 22% lane waste.

Run alone on the chip: python scripts/ablate_kernel_layout.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.rerank_pallas import fused_rerank_tile

T, K, C, R = 256, 100, 128, 49
NTILES = 16


def make_tile(rng):
    an = rng.standard_normal((T, C, R)).astype(np.float32)
    an /= np.linalg.norm(an, axis=1, keepdims=True)
    fb = rng.standard_normal((T, K, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=2, keepdims=True)
    u = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    u /= u.sum(-1, keepdims=True)
    v = np.abs(rng.standard_normal((T, K, R)).astype(np.float32))
    v /= v.sum(-1, keepdims=True)
    return map(jnp.asarray, (an, fb, u, v))


def timed(fn, n_rep=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n_rep


# NOTE: arrays must be jit ARGUMENTS, not closures — the axon remote-compile
# serializes closure constants into the compile request (HTTP 413 at this
# tile's 642 MB gathered bank)
@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def scored(an, fb, u, v, ot_part, group_exit, interpret, ntiles):
    def one(i):
        # tie each tile to the loop index (u is renormalized by Sinkhorn
        # anyway) so XLA can't hoist the map body
        ui = u * (1.0 + 1e-6 * i.astype(jnp.float32))
        return fused_rerank_tile(
            an, fb, ui, v, ot_part=ot_part, interpret=interpret,
            group_exit=group_exit,
        )

    res = jax.lax.map(one, jnp.arange(ntiles))
    return jnp.sum(res), res[0]


def main():
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    an, fb, u, v = make_tile(rng)

    for ot_part in (1.0, 0.5):
        outs = {}
        for group_exit in (False, True):
            args = (an, fb, u, v, ot_part, group_exit, interpret, NTILES)
            dt = timed(lambda a=args: scored(*a)[0])
            pps = NTILES * T * K / dt
            outs[group_exit] = np.asarray(scored(*args)[1])
            print(
                f"ot_part={ot_part} group_exit={int(group_exit)}:"
                f" {dt*1e3:7.1f} ms -> {pps/1e6:6.2f}M pairs/s"
            )
        d = np.max(np.abs(outs[False] - outs[True]))
        print(f"  max |score diff| per-pair vs group exit: {d:.2e}")


if __name__ == "__main__":
    main()
