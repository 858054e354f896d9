"""Opt-in real-TPU Mosaic compilation test for the fused rerank kernel.

The main suite runs on a forced-CPU virtual mesh (conftest.py), so Pallas
kernels are only exercised in interpret mode there; bench.py covers the
compiled kernel implicitly.  This test makes Mosaic regressions visible in
CI-style runs: RUN_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_kernel.py

It spawns a clean subprocess (the conftest's in-process CPU switch cannot be
undone) where the axon TPU backend is the default, and asserts fused-vs-XLA
score parity for full AND partial OT on the compiled kernel.
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.tpu

_PROBE = textwrap.dedent(
    """
    import numpy as np
    import jax, jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    from vit_reranking_tpu.ops.rerank_pallas import fused_rollout_rerank_scores
    from vit_reranking_tpu.ops.similarity import calc_similarity_rollout

    rng = np.random.default_rng(0)
    Q, K, C, R = 128, 100, 64, 49
    fb = rng.standard_normal((Q, C, R)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=1, keepdims=True)
    centers = fb.mean(-1); centers /= np.linalg.norm(centers, -1, keepdims=True)
    roll = np.abs(rng.standard_normal((Q, R))).astype(np.float32)
    sims = centers @ centers.T; np.fill_diagonal(sims, -100)
    top = np.argsort(-sims, 1)[:, :K].astype(np.int32)
    fb_j, c_j, r_j, top_j = map(jnp.asarray, (fb, centers, roll, top))

    for ot_part in (1.0, 0.8):
        out = np.asarray(fused_rollout_rerank_scores(
            fb_j, c_j, r_j, top_j, query_tile=128, ot_part=ot_part))
        def one(i):
            s, _ = calc_similarity_rollout(
                c_j[i], fb_j[i], r_j[i], c_j[top_j[i]], fb_j[top_j[i]],
                r_j[top_j[i]], stage=1, ot_part=ot_part)
            return s
        ref = np.asarray(jax.vmap(one)(jnp.arange(16)))
        d = np.abs(out[:16] - ref).max()
        assert d < 1e-4, (ot_part, d)
        print(f"ot_part={ot_part}: max diff {d:.2e} OK")

    # VMEM-resident rollout filter: compiled Mosaic vs the XLA bisection
    # must be bit-identical (ops/rollout.py::filter_threshold_pallas)
    from vit_reranking_tpu.ops.rollout import filter_threshold_pallas
    flat = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((4, 3136, 784)).astype(np.float32)), -1
    ).reshape(4, -1)
    kk = int(flat.shape[1] * 0.1)
    def xla_bisect(flat, k, iters=40):
        def body(_, c):
            lo, hi = c
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((flat <= mid[:, None]).astype(jnp.int32), axis=1)
            return jnp.where(cnt < k, mid, lo), jnp.where(cnt < k, hi, mid)
        lo, hi = jnp.min(flat, 1), jnp.max(flat, 1)
        _, kth = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return jnp.where(flat <= kth[:, None], 0.0, flat)
    a = np.asarray(jax.jit(lambda x: xla_bisect(x, kk))(flat))
    b = np.asarray(filter_threshold_pallas(flat, kk))
    assert np.array_equal(a, b), np.abs(a - b).max()
    print("filter_threshold_pallas: bit-identical OK")
    """
)


@pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="real-TPU Mosaic test; set RUN_TPU_TESTS=1 (single-tenant chip)",
)
def test_fused_kernel_compiles_on_tpu():
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
