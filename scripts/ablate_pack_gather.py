"""A/B the int32-packed bf16 bank gather (``pack_gather``) at bench geometry.

The producer's dominant HBM traffic is the per-tile candidate row gather
(~82 GB/rep read+write at Q=16384 in f32).  ``ablate_rerank_dtype.py``
showed a bf16 bank gather runs 2.4x SLOWER (2-byte gathers don't vectorize
on this platform); ``_pack_bank_pairs`` instead views adjacent bf16 pairs
as one int32 so the gather rides the 4-byte path while moving half the
bytes, and the einsum unpacks bit-exactly.

Run alone on the chip (single-tenant TPU).
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


def main():
    rng = np.random.default_rng(0)
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    rollout = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    top_inds = rng.integers(0, Q, size=(Q, K), dtype=np.int32)
    interpret = jax.default_backend() != "tpu"

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def scored(fb_j, r_j, inds, ot_part, pack):
        out = fused_rollout_rerank_scores(
            fb_j, fb_j.mean(-1), r_j, inds, ot_part=ot_part,
            interpret=interpret, stream_dtype="bfloat16", pack_gather=pack,
        )
        return jnp.sum(out)

    args = (jnp.asarray(fb), jnp.asarray(rollout), jnp.asarray(top_inds))
    for ot_part in (1.0, 0.5):
        for pack in (False, True):
            np.asarray(scored(*args, ot_part, pack))  # compile + warm
            t0 = time.perf_counter()
            n_rep = 5
            for _ in range(n_rep):
                np.asarray(scored(*args, ot_part, pack))
            dt = (time.perf_counter() - t0) / n_rep
            print(
                f"ot_part={ot_part} pack={int(pack)}: {dt * 1e3:8.1f} ms/rep"
                f"  {Q * K / dt / 1e6:6.2f} M pairs/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
