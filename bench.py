"""North-star benchmark: query-gallery pairs/sec for the Sinkhorn OT rerank.

Protocol (BASELINE.md): rerank Q queries x K=100 gallery candidates, 7x7=49
patch tokens, C=128 channels, rollout marginals, full OT (ot_part=1.0),
100-iteration Sinkhorn — the flagship `--use_rollout` path of
reference evaluation/eval_cvt_diml.py:316-365.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference's own implementation
(utilities/diml.py, imported from /root/reference when present) running its
per-query loop on this host — torch-CPU, since no CUDA device exists here;
falls back to a recorded constant when the reference checkout is absent.
"""

import functools
import json
import os
import sys
import time

import numpy as np

# Q amortizes this host's fixed per-dispatch RTT (~27 ms measured,
# scripts/bench_rerank_scaling.py) so the recorded number is the kernel's
# sustained throughput, matching the SOP-scale eval sweep; the per-rep
# host-forced transfer protocol is unchanged.
Q, K, C, R = 16384, 100, 128, 49
REFERENCE = "/root/reference"
# torch-CPU reference throughput measured on this host (pairs/sec); used when
# /root/reference is not mounted so the ratio stays comparable across rounds
FALLBACK_BASELINE_PPS = 20000.0


def make_problem(rng):
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    rollout = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    return fb, centers, rollout


def bench_tpu(fb, centers, rollout, top_inds, ot_part=1.0, stream_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from vit_reranking_tpu.ops.rerank_pallas import fused_rollout_rerank_scores

    interpret = jax.default_backend() != "tpu"

    # arrays are jit ARGUMENTS, not closures: the axon remote-compile ships
    # closure constants inside the compile request (HTTP 413 past ~100 MB)
    @functools.partial(jax.jit, static_argnums=(4, 5))
    def scored(fb_j, c_j, r_j, inds, ot_part, stream_dtype):
        out = fused_rollout_rerank_scores(
            fb_j, c_j, r_j, inds, ot_part=ot_part, interpret=interpret,
            stream_dtype=stream_dtype,
        )
        # checksum depends on every score -> forces full execution, but the
        # per-rep host transfer is 4 bytes instead of the full result
        # (device->host rides a ~22 MB/s tunnel here; the kernel itself is
        # what this benchmark times)
        return jnp.sum(out)

    args = (
        jnp.asarray(fb), jnp.asarray(centers), jnp.asarray(rollout),
        jnp.asarray(top_inds), ot_part, stream_dtype,
    )
    # NOTE: under the axon remote runtime block_until_ready() can return
    # before execution completes — force a host transfer to time honestly
    np.asarray(scored(*args))  # compile + warm
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = np.asarray(scored(*args))
    dt = (time.perf_counter() - t0) / n_rep
    return Q * K / dt


def bench_reference_torch(fb, centers, rollout, top_inds, n_queries=32, ot_part=1.0):
    """Run the reference's own calc_similarity_cvt_rollout per-query loop."""
    if not os.path.isdir(REFERENCE):
        return None
    sys.path.insert(0, REFERENCE)
    try:
        import importlib.util as iu

        spec = iu.spec_from_file_location(
            "ref_diml", os.path.join(REFERENCE, "utilities/diml.py")
        )
        ref = iu.module_from_spec(spec)
        spec.loader.exec_module(ref)
        import torch

        fb_t = torch.tensor(fb)
        c_t = torch.tensor(centers)
        r_t = torch.tensor(rollout)
        dev = torch.device("cpu")

        def one(i):
            idx = torch.tensor(top_inds[i])
            ref.calc_similarity_cvt_rollout(
                c_t[i], fb_t[i], r_t[i], c_t[idx], fb_t[idx], r_t[idx],
                stage=1, use_ot=True, ot_part=ot_part, device=dev,
            )

        one(0)  # warm up
        t0 = time.perf_counter()
        for i in range(n_queries):
            one(i)
        dt = time.perf_counter() - t0
        return n_queries * K / dt
    except Exception:
        return None


def main():
    # default = the flagship full-OT protocol (ONE JSON line, driver
    # contract); --variant partial benches the ot_part=0.5 dustbin path
    # (reference scripts sweep --ot_part 0.5/0.8, scripts/diml/*.sh)
    ot_part = 0.5 if "--variant=partial" in sys.argv or "partial" in sys.argv[1:] else 1.0
    # default = the production fast mode (bf16 similarity stream, f32 Sinkhorn
    # math): the kernel is byte-bound on the one-time packed-S stream and the
    # mode is parity-gated e2e against the reference's own evaluate() at the
    # protocol's R@K +-0.2 (tests/test_e2e_parity.py rollout-bf16-stream;
    # scores track f32 to ~2e-4, final-rank top-1 agreement 0.998 on
    # worst-case random data).  --precise pins the bit-faithful f32 stream.
    stream_dtype = "float32" if "--precise" in sys.argv else "bfloat16"

    rng = np.random.default_rng(0)
    fb, centers, rollout = make_problem(rng)
    sims = centers @ centers.T
    np.fill_diagonal(sims, -100.0)
    # top-K via argpartition: a full row argsort of the Q x Q matrix costs
    # minutes at Q=16k on this single-core host
    part = np.argpartition(-sims, K, axis=1)[:, :K]
    order = np.take_along_axis(sims, part, 1).argsort(1)[:, ::-1]
    top_inds = np.take_along_axis(part, order, 1).astype(np.int32)

    pps = bench_tpu(
        fb, centers, rollout, top_inds, ot_part=ot_part, stream_dtype=stream_dtype
    )
    base = bench_reference_torch(fb, centers, rollout, top_inds, ot_part=ot_part)
    if base is None:
        base = FALLBACK_BASELINE_PPS
    kind = "full OT" if ot_part == 1.0 else f"partial OT {ot_part}"
    if stream_dtype == "bfloat16":
        kind += ", bf16 stream"
    metric = (
        "ot_rerank_pairs_per_sec"
        if ot_part == 1.0
        else "ot_rerank_partial_pairs_per_sec"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pps, 1),
                "unit": f"query-gallery pairs/sec (K=100, R=49, C=128, {kind}, 100 it)",
                "vs_baseline": round(pps / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
