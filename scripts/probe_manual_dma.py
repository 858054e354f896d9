"""Raw HBM->VMEM DMA bandwidth via a hand-rolled double-buffered pipeline.

probe_pallas_bw_variants.py shows the AUTO-pipelined pallas_call input
stream running at ~56-91 GB/s on this chip while an XLA fused reduce reads
the same bytes at ~634 GB/s.  This probe bypasses the auto-pipeline: the
input stays in HBM (memory_space=ANY) and the kernel issues explicit
pltpu.make_async_copy chunks into a 2-slot VMEM scratch — measuring what the
DMA engine itself can sustain, per chunk size.

Run alone on the chip.
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


def timed(fn, *a, n_rep=5):
    np.asarray(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        np.asarray(fn(*a))
    return (time.perf_counter() - t0) / n_rep


def make_manual_stream(total_rows, row, chunk_rows, dtype, reduce_chunk=True):
    """Stream a (total_rows, row... ) array by chunks of chunk_rows."""
    num_chunks = total_rows // chunk_rows

    def kernel(hbm_ref, out_ref):
        def body(scratch, acc, sem_ref):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(ci * chunk_rows, chunk_rows)],
                    scratch.at[slot],
                    sem_ref.at[slot],
                )

            get_dma(0, 0).start()
            acc[...] = jnp.zeros_like(acc)

            def loop_body(ci, carry):
                cur = jax.lax.rem(ci, 2)
                nxt = jax.lax.rem(ci + 1, 2)

                @pl.when(ci + 1 < num_chunks)
                def _start_next():
                    get_dma(nxt, ci + 1).start()

                get_dma(cur, ci).wait()
                if reduce_chunk:
                    # touch every element (VPU add) so the read can't be elided
                    acc[...] = acc[...] + jnp.sum(
                        scratch[cur].astype(jnp.float32), axis=0
                    )[None, :]
                return carry

            jax.lax.fori_loop(0, num_chunks, loop_body, 0)
            out_ref[...] = acc[...]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, chunk_rows, row), dtype),
            acc=pltpu.VMEM((1, row), jnp.float32),
            sem_ref=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, row), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
        return jnp.sum(out)

    return run


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    ROW = 128
    for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        itemsize = jnp.dtype(dtype).itemsize
        total_rows = (2 * 1024**3) // (ROW * itemsize)  # ~2 GB payload
        total_rows = (total_rows // (16 * 1024)) * (16 * 1024)

        @jax.jit
        def make(total_rows=total_rows, dtype=dtype):
            x = jax.random.normal(
                jax.random.PRNGKey(0), (total_rows, ROW), jnp.float32
            )
            return x.astype(dtype)

        x = make()
        x.block_until_ready()
        gb = total_rows * ROW * itemsize / 1e9
        # chunk sizes: 1.2 MB (the production block), 4.8 MB, 16 KB row-ish
        for chunk_rows in (2048, 8192, 512):
            run = make_manual_stream(total_rows, ROW, chunk_rows, dtype)
            mb = chunk_rows * ROW * itemsize / 1e6
            try:
                dt = timed(run, x)
                print(
                    f"  manual {dname} chunk={mb:6.2f} MB: {dt*1e3:7.1f} ms -> "
                    f"{gb/dt:6.1f} GB/s ({gb:.2f} GB)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"  manual {dname} chunk={mb:.2f} MB: FAILED {str(e)[:140]}", flush=True)
        del x


if __name__ == "__main__":
    main()
