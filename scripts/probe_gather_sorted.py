"""Probe: does sorting candidate indices speed up the producer's row gather?

The fused rerank's producer gathers Q*K = 1.6M rows of (C=128, R=49) f32
(~82 GB read+write per bench rep) with random top-K indices, one 128-query
tile at a time inside lax.map (mirrored here — a single materialized gather
would be 47 GB and OOM the 16 GB HBM).  XLA's gather has
`indices_are_sorted`; this probe measures whether per-tile-sorted index
order (plus the flag, via `.at[].get`) changes the sustained rate on v5e.
Run alone on the chip.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

Q, K, C, R, T = 16384, 100, 128, 49, 128


def timed(fn, *a, n_rep=5):
    np.asarray(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n_rep


def main():
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.standard_normal((Q, C, R)).astype(np.float32))
    inds = rng.integers(0, Q, size=(Q, K), dtype=np.int32)
    gb = Q * K * C * R * 4 * 2 / 1e9  # read + write

    variants = {
        "random": jnp.asarray(inds.reshape(Q // T, T * K)),
        "tile-sorted": jnp.asarray(
            np.sort(inds.reshape(Q // T, T * K), axis=-1)
        ),
    }

    @functools.partial(jax.jit, static_argnums=(2,))
    def g(fb_j, i_j, sorted_flag):
        def tile(ix):
            rows = fb_j.at[ix].get(indices_are_sorted=sorted_flag)
            return jnp.sum(rows, dtype=jnp.float32)

        return jnp.sum(jax.lax.map(tile, i_j))

    for name, i_j in variants.items():
        for flag in ((False,) if name == "random" else (False, True)):
            dt = timed(g, fb, i_j, flag)
            print(
                f"gather {name:12s} flag={int(flag)}: {dt*1e3:7.1f} ms"
                f"  {gb/dt:6.0f} GB/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
