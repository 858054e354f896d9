"""Split the fused-rerank KERNEL-side cost: S stream vs exp vs Sinkhorn loop.

probe_pallas_bw_variants.py (round 3) showed the Pallas input stream runs
~146 GB/s on the production unaligned (1,49,49,128) bf16 blocks vs ~395 GB/s
with the sublane dim padded to 64 — a potential ~2x on the stream.  Whether
that matters depends on how much of the kernel call is the stream vs the
Sinkhorn VPU loop.  This script times the production einsum-direct path at
a fixed iteration count sweep; the slope is the per-iteration loop cost and
the intercept is stream + exp + score (iter-independent).

Run alone on the chip: python scripts/ablate_kernel_split.py [--q 8192]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.rerank_pallas import fused_rollout_rerank_scores

K, C, R = 100, 128, 49


def make_problem(rng, Q):
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    rollout = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    top_inds = rng.integers(0, Q, size=(Q, K), dtype=np.int32)
    return fb, centers, rollout, top_inds


def timed(fn, n_rep=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n_rep


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def scored(fb_j, c_j, r_j, inds, iters, stream_dtype, loop):
    from vit_reranking_tpu.ops import rerank_pallas as rp

    out = fused_rollout_rerank_scores(
        fb_j, c_j, r_j, inds, ot_part=1.0, iters=iters,
        stream_dtype=stream_dtype,
    )
    return jnp.sum(out)


def main():
    Q = 8192
    for i, a in enumerate(sys.argv):
        if a == "--q":
            Q = int(sys.argv[i + 1])
    print(f"backend={jax.default_backend()} Q={Q}", flush=True)
    rng = np.random.default_rng(0)
    fb, centers, rollout, top_inds = make_problem(rng, Q)
    fb_j, c_j, r_j = map(jnp.asarray, (fb, centers, rollout))
    inds = jnp.asarray(top_inds)

    # RTT floor
    @jax.jit
    def empty(x):
        return x + 1.0

    one = jnp.float32(0.0)
    dt = timed(lambda: empty(one))
    print(f"  RTT floor (empty jit + 4B read)     : {dt*1e3:7.1f} ms", flush=True)

    for sd in ("bfloat16", "float32"):
        for iters in (100, 12, 6, 1):
            fn = lambda it=iters, s=sd: scored(fb_j, c_j, r_j, inds, it, s, "while")
            dt = timed(fn)
            print(
                f"  {sd:8s} iters={iters:3d} (early-exit)  : {dt*1e3:7.1f} ms/rep "
                f"({Q*K/dt/1e6:6.2f}M pairs/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
