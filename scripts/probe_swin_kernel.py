"""Isolated A/B of the Swin window-attention op at stage shapes: XLA
materializing path vs the window-resident kernel (ops/swin_attention_pallas).

The full-model ablation (profile_swin_r4.log) showed the kernel ~neutral
despite removing all probability HBM traffic — this probe times the op ALONE
(10 chained reps inside one jit program via lax.scan, so the per-dispatch
RTT of this host amortizes away) to attribute where the kernel's time goes.

Usage: python scripts/probe_swin_kernel.py [--stage 0] [--bs 64] [--bwd]
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


# Swin-T at 224px: (nW, T, D, heads) per stage
STAGES = {
    0: (64, 49, 32, 3),
    1: (16, 49, 32, 6),
    2: (4, 49, 32, 12),
    3: (1, 49, 32, 24),
}


def xla_attn(q, k, v, bias, mask, scale, narrow=True):
    G, nW, T, D = q.shape
    H = bias.shape[0]
    B = G // H
    s = jnp.einsum(
        "gwtd,gwsd->gwts", q, k,
        preferred_element_type=None if narrow else jnp.float32,
    ) * scale
    s = s + jnp.repeat(bias, B, axis=0)[:, None].astype(s.dtype)
    if mask is not None:
        s = s + mask[None].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gwts,gwsd->gwtd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--mask", action="store_true",
                    help="include the shifted-window mask")
    args = ap.parse_args()

    from vit_reranking_tpu.ops.swin_attention_pallas import (
        swin_window_attention,
        swin_window_attention_packed,
    )

    nW, T, D, H = STAGES[args.stage]
    G = H * args.bs
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((G, nW, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((G, nW, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((G, nW, T, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((H, T, T)), jnp.float32)
    mask = None
    if args.mask:
        m = rng.integers(0, 2, size=(nW, T, 1))
        mask = jnp.asarray(
            np.where(m == m.transpose(0, 2, 1), 0.0, -100.0), jnp.float32
        )
    scale = D ** -0.5
    nbytes = 3 * q.nbytes  # q/k/v read once is the op's byte floor

    def chain(fn):
        # 10 serially-dependent reps in ONE program: per-rep = t / reps
        if args.bwd:
            def step(qq, _):
                g = jax.grad(
                    lambda qq: jnp.sum(fn(qq).astype(jnp.float32) ** 2)
                )(qq)
                return g.astype(qq.dtype), ()
        else:
            def step(qq, _):
                return fn(qq).astype(qq.dtype), ()

        @jax.jit
        def run(qq):
            out, _ = jax.lax.scan(step, qq, None, length=args.reps)
            return jnp.sum(out.astype(jnp.float32))

        return run

    cases = {
        "xla": chain(lambda qq: xla_attn(qq, k, v, bias, mask, scale)),
        "xla_f32sm": chain(
            lambda qq: xla_attn(qq, k, v, bias, mask, scale, narrow=False)
        ),
        "kernel": chain(
            lambda qq: swin_window_attention(qq, k, v, bias, mask, scale)
        ),
        "kernel_packed": chain(
            lambda qq: swin_window_attention_packed(qq, k, v, bias, mask, scale)
        ),
    }
    tag = "fwd+bwd" if args.bwd else "fwd"
    for name, run in cases.items():
        t0 = time.time()
        np.asarray(run(q))
        tc = time.time() - t0
        t0 = time.time()
        np.asarray(run(q))
        t = (time.time() - t0) / args.reps
        gbps = nbytes / t / 1e9
        print(
            f"stage{args.stage} {name}: {t*1e3:.3f} ms/{tag} "
            f"({gbps:.0f} GB/s of qkv floor; compile {tc:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
