"""A/B the sublane padding of the packed-S stream in the REAL fused pipeline.

probe_pallas_bw_variants.py (round 3) measured the standalone Pallas input
stream at ~146 GB/s on the production unaligned (1, 49, 49, 128) bf16 blocks
vs ~395 GB/s with the sublane dim padded to the VMEM tile (56 f32 / 64 bf16).
``fused_rerank_tile(pad_sublanes=...)`` applies that padding in the real
pipeline — but there the producer einsum writes the padded bytes too
(+14% f32 / +31% bf16) and the Sinkhorn VPU loop pays the padded width, so
whether the isolated stream win survives is an empirical question this
script answers at the bench geometry (Q=16384, K=100, R=49, C=128).

Run alone on the chip (single-tenant TPU; each variant compiles ~2 min).

MEASURED (v5e, round 3): pad=1 LOSES in the real pipeline — bf16 full OT
4.18 -> 3.83 M pairs/s (-8%), bf16 partial 0.5 7.20 -> 6.53 (-9%), f32 full
2.88 -> 2.91 (+1%, noise).  The producer einsum writes the padded bytes and
the Sinkhorn VPU loop pays the padded width; together they outweigh the
aligned-DMA gain.  ``pad_sublanes`` therefore defaults off.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.rerank_pallas import fused_rollout_rerank_scores

Q, K, C, R = 16384, 100, 128, 49


def make_problem(rng):
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    rollout = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    top_inds = rng.integers(0, Q, size=(Q, K), dtype=np.int32)
    return fb, rollout, top_inds


def main():
    rng = np.random.default_rng(0)
    fb, rollout, top_inds = make_problem(rng)
    interpret = jax.default_backend() != "tpu"

    @functools.partial(jax.jit, static_argnums=(3, 4, 5))
    def scored(fb_j, r_j, inds, ot_part, stream_dtype, pad):
        out = fused_rollout_rerank_scores(
            fb_j, fb_j.mean(-1), r_j, inds, ot_part=ot_part,
            interpret=interpret, stream_dtype=stream_dtype, pad_sublanes=pad,
        )
        return jnp.sum(out)

    args = (jnp.asarray(fb), jnp.asarray(rollout), jnp.asarray(top_inds))
    variants = [
        (1.0, "bfloat16"), (0.5, "bfloat16"), (1.0, "float32"),
    ]
    for ot_part, sd in variants:
        for pad in (False, True):
            np.asarray(scored(*args, ot_part, sd, pad))  # compile + warm
            t0 = time.perf_counter()
            n_rep = 5
            for _ in range(n_rep):
                np.asarray(scored(*args, ot_part, sd, pad))
            dt = (time.perf_counter() - t0) / n_rep
            print(
                f"ot_part={ot_part} stream={sd:8s} pad={int(pad)}: "
                f"{dt * 1e3:8.1f} ms/rep  {Q * K / dt / 1e6:6.2f} M pairs/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
