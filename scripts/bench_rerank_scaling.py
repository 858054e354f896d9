"""Attribute the north-star bench time: device work vs per-dispatch RTT.

bench.py times Q=1024 queries x K=100 pairs per jitted call, one host
transfer per rep.  On this platform a dispatch + 4-byte host read costs
~30-60 ms of RPC latency (CLAUDE.md), which is the same order as the
measured ~68 ms/rep — so the recorded pairs/s may be dominated by fixed
per-call overhead rather than kernel throughput.  This script measures:

  1. pairs/s at Q in {1024, 4096, 16384} (same protocol otherwise) — if
     per-rep time grows sublinearly with Q, the fixed-RTT hypothesis holds
     and the large-Q number is the honest sustained throughput (it matches
     the SOP-60k sweep's 2.46M pairs/s if so);
  2. the same with iters=12 fixed (no early exit) vs iters=100 early-exit —
     how much of device time is the Sinkhorn loop on random data;
  3. an empty jitted program + 4-byte transfer — the pure RTT floor.

Run alone on the chip (single-tenant): python scripts/bench_rerank_scaling.py
"""

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
    if Q > 20000:
        # SOP-scale: the host-side Q x Q similarity + partition costs minutes
        # on this 1-core host; random candidate sets time the kernel the same
        top_inds = rng.integers(0, Q, size=(Q, K), dtype=np.int32)
    else:
        sims = centers @ centers.T
        np.fill_diagonal(sims, -100.0)
        part = np.argpartition(-sims, K, axis=1)[:, :K]
        order = np.take_along_axis(sims, part, 1).argsort(1)[:, ::-1]
        top_inds = np.take_along_axis(part, order, 1).astype(np.int32)
    return fb, centers, rollout, top_inds


def timed(fn, n_rep=5):
    np.asarray(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n_rep


def main():
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}")

    # 3) pure RTT floor
    @jax.jit
    def nothing():
        return jnp.float32(0.0)

    rtt = timed(nothing, n_rep=10)
    print(f"RTT floor (empty program + 4B transfer): {rtt*1e3:.1f} ms")

    import functools

    # arrays are jit ARGUMENTS, not closures (axon remote-compile 413s on
    # >100 MB closure constants)
    @functools.partial(jax.jit, static_argnums=(4, 5, 6))
    def scored_fn(fb_j, c_j, r_j, inds, iters, stream_dtype, ot_part):
        out = fused_rollout_rerank_scores(
            fb_j, c_j, r_j, inds, ot_part=ot_part, iters=iters,
            interpret=interpret, stream_dtype=stream_dtype,
        )
        return jnp.sum(out)

    for Q in (1024, 4096, 16384, 61440):
        rng = np.random.default_rng(0)
        fb, centers, rollout, top_inds = make_problem(rng, Q)
        fb_j, c_j = jnp.asarray(fb), jnp.asarray(centers)
        r_j, inds = jnp.asarray(rollout), jnp.asarray(top_inds)

        # stream_dtype sweep (VERDICT r4 item 5: the SOP-61k sustained
        # number predated the bf16 similarity stream); bf16 is the bench.py
        # default, f32 the bit-faithful --precise path
        cases = [(100, "float32", 1.0, "f32 earlyexit100"),
                 (100, "bfloat16", 1.0, "bf16 earlyexit100"),
                 (100, "bfloat16", 0.8, "bf16 partial0.8")]
        if Q <= 20000:
            cases.append((12, "float32", 1.0, "f32 fixed12"))
        for iters, sdt, part, tag in cases:
            scored = lambda it=iters, s=sdt, p=part: scored_fn(
                fb_j, c_j, r_j, inds, it, s, p)
            dt = timed(scored)
            pps = Q * K / dt
            dev = max(dt - rtt, 1e-9)
            print(
                f"Q={Q:6d} {tag:17s}: {dt*1e3:7.1f} ms/rep -> {pps/1e6:6.2f}M pairs/s"
                f"  (minus RTT: {Q*K/dev/1e6:6.2f}M)", flush=True
            )


if __name__ == "__main__":
    main()
