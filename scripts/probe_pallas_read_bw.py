"""Pure Pallas HBM->VMEM read bandwidth on a device-created packed array.

Separates the pallas_call's own input streaming rate from producer-side
costs (gather/einsum/transpose materialization) that earlier ablations
could not distinguish.  Run alone on the chip.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSTEPS, R, P = 3200, 49, 128  # 1.97 GB f32


def _kernel(S_ref, o_ref):
    S = S_ref[0]
    c = S[0]
    r = S[:, 0, :]
    t1 = jnp.sum(S * c[None, :, :], axis=1)
    o_ref[0] = jnp.sum(r * t1, axis=0)[None, :]


@jax.jit
def make():
    return jax.random.normal(jax.random.PRNGKey(0), (NSTEPS, R, R, P), jnp.float32)


@jax.jit
def stream(Sp):
    out = pl.pallas_call(
        _kernel,
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((1, R, R, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTEPS, 1, P), jnp.float32),
    )(Sp)
    return jnp.sum(out)


@jax.jit
def xla_read(Sp):
    # XLA reference read: same bytes through a fused reduce
    return jnp.sum(Sp * Sp)


def timed(fn, *a, n_rep=5):
    np.asarray(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n_rep


def main():
    print(f"backend={jax.default_backend()}")
    Sp = make()
    gb = Sp.size * 4 / 1e9
    for name, fn in (("pallas stream", stream), ("xla fused reduce", xla_read)):
        dt = timed(fn, Sp)
        print(f"{name:18s}: {dt*1e3:7.1f} ms -> {gb/dt:6.1f} GB/s ({gb:.2f} GB)")


if __name__ == "__main__":
    main()
