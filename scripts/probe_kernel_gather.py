"""Gating probe for fusing the rerank producer into the Pallas kernel
(VERDICT r3 item 1): can a kernel's OWN scattered-row DMA (scalar-prefetched
indices, double-buffered make_async_copy) match XLA's gather?

The fused-producer design only wins if the kernel gathers candidate rows from
HBM itself (skipping the materialized gather + packed-S round trip,
RESULTS.md round-3 roofline: XLA's gather runs 353 GB/s — the scattered-row
DMA floor for 25 KB rows).  This measures that primitive in isolation:

  grid step i = one query: DMA K=100 scattered (R_pad, C) rows of a
  (N, R_pad, C) bank into VMEM, double-buffered across grid steps (step i
  prefetches step i+1's rows), consume with a cheap checksum.

vs the XLA baseline: bank[idx] gather + same checksum (materializes the
gathered tensor — the cost the fusion would remove).

Usage: python scripts/probe_kernel_gather.py [--q 2048] [--contig] [--reps 5]
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, bank_ref, out_ref, buf, sems, *, K, Q):
    i = pl.program_id(0)

    def start_batch(q, slot):
        for k in range(K):
            pltpu.make_async_copy(
                bank_ref.at[idx_ref[q, k]], buf.at[slot, k], sems.at[slot, k]
            ).start()

    @pl.when(i == 0)
    def _():
        start_batch(0, 0)

    cur = jax.lax.rem(i, 2)

    @pl.when(i + 1 < Q)
    def _():
        start_batch(i + 1, jax.lax.rem(i + 1, 2))

    for k in range(K):
        pltpu.make_async_copy(
            bank_ref.at[idx_ref[i, k]], buf.at[cur, k], sems.at[cur, k]
        ).wait()

    # cheap consume (sublane 0 only): the probe measures DMA rate, not VPU
    out_ref[0, 0, :] = jnp.sum(buf[cur, :, 0, :], axis=0)


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def kernel_gather(bank, idx, K=100, interpret=False):
    N, Rp, C = bank.shape
    Q = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, C), lambda i, idx_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, K, Rp, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, K=K, Q=Q),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, 1, C), jnp.float32),
        interpret=interpret,
    )(idx, bank)


@functools.partial(jax.jit, static_argnames=("K", "tile"))
def kernel_gather_tiled(bank, idx, K=100, tile=1024):
    """Production shape: lax.map over tiles of ``tile`` queries per
    pallas_call (the scalar-prefetch idx block must stay under the 1 MB SMEM
    budget — 2048x100 int32 overflows it, measured)."""
    Q = idx.shape[0]
    nt = Q // tile
    idx_t = idx.reshape(nt, tile, K)
    out = jax.lax.map(lambda ix: kernel_gather(bank, ix, K=K), idx_t)
    return out.reshape(Q, 1, -1)


@functools.partial(jax.jit, static_argnames=("tile",))
def xla_gather(bank, idx, tile=1024):
    """Production-shaped baseline: lax.map over query tiles (one materialized
    (tile, K, Rp, C) gather per tile — the full-Q gather is 23 GB and OOMs)."""
    Q, K = idx.shape
    nt = Q // tile
    idx_t = idx.reshape(nt, tile, K)

    def one(ix):
        g = bank[ix]
        return jnp.sum(g[:, :, 0, :], axis=1)

    return jax.lax.map(one, idx_t).reshape(Q, -1)


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--r", type=int, default=56)   # R=49 padded to the tile
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--contig", action="store_true",
                    help="sequential indices (pure DMA rate, no scatter)")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.standard_normal((args.n, args.r, args.c)), jnp.float32)
    if args.contig:
        idx = (np.arange(args.q * args.k) % args.n).reshape(args.q, args.k)
    else:
        idx = rng.integers(0, args.n, size=(args.q, args.k))
    idx = jnp.asarray(idx, jnp.int32)

    row_bytes = args.r * args.c * 4
    total = args.q * args.k * row_bytes

    if args.interpret or args.q <= 1024:
        out_k = kernel_gather(bank, idx, K=args.k, interpret=args.interpret)
    else:
        out_k = kernel_gather_tiled(bank, idx, K=args.k, tile=1024)
    out_x = xla_gather(bank, idx)
    np.testing.assert_allclose(
        np.asarray(out_k[:, 0, :]), np.asarray(out_x), rtol=1e-3, atol=1e-4
    )
    print("parity OK")
    if args.interpret:
        return

    tile = min(args.q, 1024)
    t_k, _ = timed(
        lambda: kernel_gather_tiled(bank, idx, K=args.k, tile=tile),
        reps=args.reps,
    )
    t_x, _ = timed(lambda: xla_gather(bank, idx), reps=args.reps)
    print(f"geometry: Q={args.q} K={args.k} row={row_bytes/1024:.1f}KB "
          f"read={total/1e9:.2f}GB contig={args.contig}")
    print(f"pallas in-kernel DMA: {t_k*1e3:8.1f} ms  "
          f"{total/t_k/1e9:7.1f} GB/s (read-only)")
    print(f"xla gather+checksum:  {t_x*1e3:8.1f} ms  "
          f"{total/t_x/1e9:7.1f} GB/s read "
          f"({2*total/t_x/1e9:.1f} GB/s read+write)")


if __name__ == "__main__":
    main()
