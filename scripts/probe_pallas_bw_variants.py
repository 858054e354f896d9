"""Pallas HBM->VMEM streaming bandwidth vs block layout — variants probe.

Round-3 state: the fused rerank is byte-bound on its one-time packed-S
stream, but the Pallas input stream measures ~183 GB/s while an XLA fused
reduce over the same bytes hits ~634 GB/s (scripts/probe_pallas_read_bw.py).
This probe isolates WHY: block geometry (unaligned 49-sublane rows, leading
block dims), multi-step slabs, dimension semantics, and dtype.

Buffers are created once per (shape, dtype) group — axon compiles cost ~2min
each, so the variant list is grouped to reuse them.  Run alone on the chip
(single-tenant TPU; serialize with other compiles).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *a, n_rep=5):
    np.asarray(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n_rep


def checksum_kernel(S_ref, o_ref):
    S = S_ref[...].astype(jnp.float32)
    # out block is (1, 1, lanes): a 2D (1, lanes) out spec trips Mosaic's
    # "last two dims divisible by 8 or full" rule on the sublane dim
    o_ref[...] = jnp.sum(S, axis=tuple(range(S.ndim - 1)))[None, None, :]


def make_stream(shape, block, semantics=None):
    nsteps = shape[0] // block[0]
    zeros = (0,) * (len(shape) - 1)
    kwargs = {}
    if semantics is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,)
        )

    @jax.jit
    def stream(Sp):
        out = pl.pallas_call(
            checksum_kernel,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(block, lambda i: (i,) + zeros, memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (1, 1, shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nsteps, 1, shape[-1]), jnp.float32),
            **kwargs,
        )(Sp)
        return jnp.sum(out)

    return stream


def make_einsum_stream(K, R, T, dtype, block0=1):
    """The production situation: the S stream is an einsum OUTPUT inside the
    same program ('tcm,tkcs->ksmt'), not a resident HBM array — isolates any
    layout/copy penalty XLA pays to hand a dot output to a pallas_call."""
    prec = (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    @jax.jit
    def run(anchors, fb_g):
        Sp = jnp.einsum(
            "tcm,tkcs->ksmt", anchors, fb_g,
            preferred_element_type=dtype, precision=prec,
        )  # (K, R, R, T)
        out = pl.pallas_call(
            checksum_kernel,
            grid=(K // block0,),
            in_specs=[
                pl.BlockSpec(
                    (block0, R, R, T), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((K // block0, 1, T), jnp.float32),
        )(Sp)
        return jnp.sum(out)

    return run


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    f32, bf16 = jnp.float32, jnp.bfloat16
    quick = "--quick" in sys.argv

    # (group label, shape, dtype, [(case name, block, semantics), ...])
    GROUPS = [
        ("kernel geometry f32", (3200, 49, 49, 128), f32, [
            ("baseline (1,49,49,128)", (1, 49, 49, 128), None),
            ("slab x4 (4,49,49,128)", (4, 49, 49, 128), None),
            ("slab x8 (8,49,49,128)", (8, 49, 49, 128), None),
            ("arbitrary semantics", (1, 49, 49, 128), "arbitrary"),
            ("parallel semantics", (1, 49, 49, 128), "parallel"),
        ]),
        ("aligned sublanes f32", (3200, 49, 56, 128), f32, [
            ("sublane 49->56 (1,49,56,128)", (1, 49, 56, 128), None),
        ]),
        ("flat 2D f32", (3200 * 49 * 49, 128), f32, [
            ("flat (2401,128)", (2401, 128), None),
            ("flat (2048,128)", (2048, 128), None),
            ("flat (8192,128)", (8192, 128), None),
        ]),
        ("wide lanes f32", (800, 49, 49, 512), f32, [
            ("wide (1,49,49,512)", (1, 49, 49, 512), None),
        ]),
        ("kernel geometry bf16", (3200, 49, 49, 128), bf16, [
            ("baseline (1,49,49,128)", (1, 49, 49, 128), None),
            ("slab x4 (4,49,49,128)", (4, 49, 49, 128), None),
        ]),
        ("aligned sublanes bf16", (3200, 49, 64, 128), bf16, [
            ("sublane 49->64 (1,49,64,128)", (1, 49, 64, 128), None),
        ]),
        ("flat 2D bf16", (3200 * 49 * 49, 128), bf16, [
            ("flat (2048,128)", (2048, 128), None),
        ]),
    ]
    if quick:
        # decisive subset (axon compiles are ~2 min each): reproduce the f32
        # baseline, test bf16 on the same geometry, and the three fix
        # candidates (slab, aligned sublanes, flat 2D)
        GROUPS = [
            ("kernel geometry f32", (3200, 49, 49, 128), f32, [
                ("baseline (1,49,49,128)", (1, 49, 49, 128), None),
            ]),
            ("kernel geometry bf16", (3200, 49, 49, 128), bf16, [
                ("baseline (1,49,49,128)", (1, 49, 49, 128), None),
                ("slab x4 (4,49,49,128)", (4, 49, 49, 128), None),
            ]),
            ("aligned sublanes bf16", (3200, 49, 64, 128), bf16, [
                ("sublane 49->64 (1,49,64,128)", (1, 49, 64, 128), None),
            ]),
            ("flat 2D bf16", (3200 * 49 * 49, 128), bf16, [
                ("flat (2048,128)", (2048, 128), None),
            ]),
        ]

    for label, shape, dtype, cases in GROUPS:
        itemsize = jnp.dtype(dtype).itemsize

        @jax.jit
        def make(shape=shape, dtype=dtype):
            x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
            return x.astype(dtype)

        Sp = make()
        Sp.block_until_ready()
        print(f"-- {label}", flush=True)
        for name, block, semantics in cases:
            # bytes actually streamed (a non-dividing block truncates steps)
            nsteps = shape[0] // block[0]
            gb = nsteps * int(np.prod(block)) * itemsize / 1e9
            stream = make_stream(shape, block, semantics)
            try:
                dt = timed(stream, Sp)
                print(f"  {name:36s}: {dt*1e3:7.1f} ms -> {gb/dt:6.1f} GB/s ({gb:.2f} GB)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:36s}: FAILED {type(e).__name__}: {str(e)[:110]}", flush=True)
        del Sp

    # --- production situation: S is an einsum output in the SAME program ----
    # bench tile geometry: T=128 queries on lanes, K=1600 candidate steps,
    # anchors (T, C, R), bank slice (T, K', C, R) with K'=K//T ... use a flat
    # (T, K, C, R) gather-free stand-in of the same einsum shape.
    T, Kst, C, R = 128, 1600, 128, 49
    rngk = jax.random.PRNGKey(1)
    anchors = jax.random.normal(rngk, (T, C, R), jnp.float32)
    fb_g = jax.random.normal(rngk, (T, Kst, C, R), jnp.float32)
    anchors.block_until_ready()
    print("-- einsum-produced stream (in-program, 'ksmt')", flush=True)

    def make_einsum_only(dtype):
        prec = (
            jax.lax.Precision.DEFAULT
            if dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )

        @jax.jit
        def run(anchors, fb_g):
            Sp = jnp.einsum(
                "tcm,tkcs->ksmt", anchors, fb_g,
                preferred_element_type=dtype, precision=prec,
            )
            return jnp.sum(Sp.astype(jnp.float32))

        return run

    for dname, dtype in (("f32", f32), ("bf16", bf16)):
        gb = Kst * R * R * T * jnp.dtype(dtype).itemsize / 1e9
        run = make_einsum_only(dtype)
        dt = timed(run, anchors, fb_g)
        print(
            f"  einsum-only {dname} (xla reduce)     : "
            f"{dt*1e3:7.1f} ms ({gb:.2f} GB of S)",
            flush=True,
        )
    for dname, dtype in (("f32", f32), ("bf16", bf16)):
        for b0 in (1, 4):
            gb = Kst * R * R * T * jnp.dtype(dtype).itemsize / 1e9
            run = make_einsum_stream(Kst, R, T, dtype, block0=b0)
            try:
                dt = timed(run, anchors, fb_g)
                print(
                    f"  einsum->stream {dname} block0={b0:1d}        : "
                    f"{dt*1e3:7.1f} ms -> {gb/dt:6.1f} GB/s of S ({gb:.2f} GB)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"  einsum->stream {dname} block0={b0}: FAILED {str(e)[:110]}", flush=True)


if __name__ == "__main__":
    main()
