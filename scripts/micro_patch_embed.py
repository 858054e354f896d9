"""Micro-bench the stage-0 patch-embed conv (7x7 stride-4 pad-2 on C=3) and
a space-to-depth reformulation of the SAME weights.

TPU convs with C_in=3 waste MXU lanes (channels pad to the native tile).
The 7x7/s4 conv only ever reads 2x2 adjacent 4x4 blocks of the padded
input, so it is exactly a 2x2/s1 conv over the 4x4 space-to-depth grid
(228 = 4*57 -> (57, 57, 48)) with the kernel scattered into a
(2, 2, 48, 64) tensor (positions 4*bi+ri with ri > 6-4*bi are zero).
48-channel contraction keeps the MXU dense; FLOPs grow 7x7x3 -> 2x2x48
(9408 -> 12288 mults/output) but the op is bandwidth/layout-bound, not
FLOP-bound, at C_in=3.

MEASURED (v5e, bs=112, bf16): direct fwd+bwd 24.95 ms vs s2d 24.10 ms —
both at the ~24 ms sync-RTT floor of this host, i.e. the patch-embed conv
is ALREADY effectively free (XLA's own C_in=3 handling suffices) and the
s2d rewrite is not worth wiring into the model.  Kept as the measurement
record + a template should a future input pipeline feed larger images.

Usage: python scripts/micro_patch_embed.py [--bs 112] [--bf16]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.time() - t0) / reps


def s2d_patch_embed(x, w, b, dtype):
    """7x7/s4/p2 conv via space-to-depth.  x: (B, 224, 224, 3) f32,
    w: (7, 7, 3, 64), b: (64,)."""
    B, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    Hp = (H + 4) // 4
    x = x.reshape(B, Hp, 4, Hp, 4, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Hp, 16 * C).astype(dtype)  # (B, 57, 57, 48)

    # scatter the 7x7 kernel into the 2x2-of-4x4 block layout
    # w2[bi, bj, ri, rj, c, o] = w[4bi+ri, 4bj+rj, c, o] (zero past row/col 6)
    w2 = jnp.zeros((2, 2, 4, 4, C, w.shape[-1]), w.dtype)
    w2 = w2.at[0, 0, 0:4, 0:4].set(w[0:4, 0:4])
    w2 = w2.at[0, 1, 0:4, 0:3].set(w[0:4, 4:7])
    w2 = w2.at[1, 0, 0:3, 0:4].set(w[4:7, 0:4])
    w2 = w2.at[1, 1, 0:3, 0:3].set(w[4:7, 4:7])
    w2 = w2.reshape(2, 2, 16 * C, w.shape[-1]).astype(dtype)

    y = jax.lax.conv_general_dilated(
        x, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=112)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.bs, 224, 224, 3)).astype(np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((7, 7, 3, 64)).astype(np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal((64,)).astype(np.float32))

    def direct(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), window_strides=(4, 4),
            padding=[(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(dtype)

    y0 = np.asarray(direct(x, w, b), np.float32)
    y1 = np.asarray(s2d_patch_embed(x, w, b, dtype), np.float32)
    err = np.max(np.abs(y0 - y1)) / (np.max(np.abs(y0)) + 1e-9)
    print(f"s2d vs direct rel err: {err:.2e} (shapes {y0.shape} vs {y1.shape})")
    assert y0.shape == y1.shape

    @jax.jit
    def f_direct(x, w, b):
        return jnp.sum(direct(x, w, b).astype(jnp.float32) ** 2)

    @jax.jit
    def f_s2d(x, w, b):
        return jnp.sum(s2d_patch_embed(x, w, b, dtype).astype(jnp.float32) ** 2)

    @jax.jit
    def g_direct(x, w, b):
        l, gr = jax.value_and_grad(
            lambda w: jnp.sum(direct(x, w, b).astype(jnp.float32) ** 2))(w)
        return l + jnp.sum(gr.astype(jnp.float32) ** 2)

    @jax.jit
    def g_s2d(x, w, b):
        l, gr = jax.value_and_grad(
            lambda w: jnp.sum(s2d_patch_embed(x, w, b, dtype).astype(jnp.float32) ** 2))(w)
        return l + jnp.sum(gr.astype(jnp.float32) ** 2)

    for name, fn in [("direct fwd", f_direct), ("s2d fwd", f_s2d),
                     ("direct fwd+bwd", g_direct), ("s2d fwd+bwd", g_s2d)]:
        t = timed(fn, x, w, b, reps=args.reps)
        print(f"{name}: {t*1e3:.2f} ms (incl. sync RTT)", flush=True)


if __name__ == "__main__":
    main()
