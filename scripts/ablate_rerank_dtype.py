"""bf16-S streaming for the fused rerank: perf + parity on the real chip.

RESULTS.md round-3 established the fused kernel's cost is byte-proportional
to the one-time packed-S stream (a compute-free streaming kernel costs the
same as the full kernel at iters=1).  stream_dtype="bfloat16" halves those
bytes (producer einsum write + kernel read) and drops the producer einsum
from HIGHEST (multi-pass f32 refinement) to one bf16 MXU pass.  This script
measures, per variant:
  * rep time + pairs/s at the bench protocol geometry;
  * score parity + rank agreement vs the f32 bit-faithful path, including
    the final-rank rule (argsort of sim + approx_sim, the splice input —
    reference eval_cvt_diml.py:357-365).

Run alone on the chip: python scripts/ablate_rerank_dtype.py [--q 4096]
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
HI = jax.lax.Precision.HIGHEST


def make_problem(rng, Q):
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
    approx = np.take_along_axis(sims, top, 1).astype(np.float32)
    return map(jnp.asarray, (fb, centers, rollout, top)), approx


def timed(fn, n_rep=5):
    np.asarray(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn())
    return (time.perf_counter() - t0) / n_rep


@functools.partial(jax.jit, static_argnames=("ot_part", "stream_dtype"))
def checksum(fb, c, r, top, ot_part, stream_dtype):
    return jnp.sum(
        fused_rollout_rerank_scores(
            fb, c, r, top, ot_part=ot_part, stream_dtype=stream_dtype,
        )
    )


@functools.partial(jax.jit, static_argnames=("stream_dtype", "bank_dtype"))
def producer_only(fb, top, stream_dtype, bank_dtype="float32"):
    """Gather + packed einsum + trivial XLA reduce: the non-kernel cost.

    bank_dtype="bfloat16" stores the feature bank (the gather SOURCE) in
    bf16 before the per-tile candidate gather — the gather moves Q*K rows of
    C*R features (~41 GB/sweep f32 at the bench protocol), the producer's
    dominant HBM traffic.

    NEGATIVE RESULT (v5e, Q=4096): the bf16-bank gather runs 2.4x SLOWER
    than gathering f32 rows (104.2 vs 43.6 ms/rep) and drags the full fused
    path below even the f32 stream (169.6 vs 154.1 ms) — XLA's row gather
    does not vectorize well at 2-byte element width on this platform, losing
    far more than the halved bytes save.  The production fast mode therefore
    keeps the bank f32 and narrows only at the einsum (whose MXU passes
    round to bf16 anyway) + the packed-S stream."""
    dt = jnp.dtype(stream_dtype)
    prec = jax.lax.Precision.DEFAULT if dt == jnp.bfloat16 else HI
    fb = fb.astype(jnp.dtype(bank_dtype))
    Qn = fb.shape[0]
    idx_all = jnp.arange(Qn).reshape(-1, 128)

    def one(idx):
        Sp = jnp.einsum(
            "tcm,tkcs->ksmt", fb[idx], fb[top[idx]],
            preferred_element_type=dt, precision=prec,
        )
        return jnp.sum(Sp.astype(jnp.float32))

    return jnp.sum(jax.lax.map(one, idx_all))


def main():
    Q = 4096
    if "--q" in sys.argv:
        Q = int(sys.argv[sys.argv.index("--q") + 1])
    print(f"backend={jax.default_backend()} Q={Q}")
    (fb, centers, rollout, top), approx = make_problem(np.random.default_rng(0), Q)

    experiments = [
        ("producer f32 HIGHEST", lambda: producer_only(fb, top, "float32")),
        ("producer bf16 DEFAULT", lambda: producer_only(fb, top, "bfloat16")),
        ("producer bf16 + bank", lambda: producer_only(fb, top, "bfloat16", "bfloat16")),
        ("full OT f32 (prod)", lambda: checksum(fb, centers, rollout, top, 1.0, "float32")),
        ("full OT bf16 stream", lambda: checksum(fb, centers, rollout, top, 1.0, "bfloat16")),
        ("partial .5 f32 (prod)", lambda: checksum(fb, centers, rollout, top, 0.5, "float32")),
        ("partial .5 bf16 stream", lambda: checksum(fb, centers, rollout, top, 0.5, "bfloat16")),
    ]
    for name, fn in experiments:
        dt = timed(fn)
        print(f"{name:26s}: {dt*1e3:7.1f} ms/rep  ({Q*K/dt/1e6:6.2f}M pairs/s)")

    # parity: scores + final-rank agreement (rank rule = sim + approx_sim)
    for ot_part in (1.0, 0.5):
        s32 = np.asarray(
            fused_rollout_rerank_scores(fb, centers, rollout, top, ot_part=ot_part)
        )
        s16 = np.asarray(
            fused_rollout_rerank_scores(
                fb, centers, rollout, top, ot_part=ot_part, stream_dtype="bfloat16"
            )
        )
        r32 = np.argsort(-(s32 + approx), axis=1)
        r16 = np.argsort(-(s16 + approx), axis=1)
        top1 = (r32[:, 0] == r16[:, 0]).mean()
        top10 = np.mean([
            len(np.intersect1d(r32[i, :10], r16[i, :10])) / 10 for i in range(Q)
        ])
        print(
            f"parity ot_part={ot_part}: max|dS|={np.abs(s32-s16).max():.2e} "
            f"rms={np.sqrt(((s32-s16)**2).mean()):.2e} "
            f"final-rank top1={top1:.4f} top10={top10:.4f}"
        )


if __name__ == "__main__":
    main()
