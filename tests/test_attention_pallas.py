"""KV-resident fused attention (ops/attention_pallas.py): forward and
gradient parity vs the XLA materializing softmax path, at CvT's stage-0/1
shape regime (interpret mode on the CPU mesh; compiled-Mosaic coverage in
tests/test_tpu_kernel.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.attention_pallas import (
    cvt_attention,
    kv_resident_attention,
)


def xla_attention(q, k, v, scale):
    s = jnp.einsum(
        "bld,btd->blt", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "blt,btd->bld", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@pytest.mark.parametrize(
    "T,Tkv,D", [(392, 98, 64), (784, 196, 64), (64, 16, 64)],
    ids=["stage0-like", "stage1", "tiny"],
)
def test_forward_parity(T, Tkv, D):
    rng = np.random.default_rng(0)
    BH = 3
    q = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.float32)
    scale = 64.0 ** -0.5
    ours = kv_resident_attention(q, k, v, scale, True)
    ref = xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    BH, T, Tkv, D = 2, 128, 48, 64
    q = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.float32)
    scale = 0.125

    def loss_ours(q, k, v):
        return jnp.sum(kv_resident_attention(q, k, v, scale, True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, scale) * w)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_gradient_parity_bf16():
    """bf16 inputs (the production compute dtype): grads track the XLA bf16
    path within bf16 noise."""
    rng = np.random.default_rng(2)
    BH, T, Tkv, D = 2, 64, 32, 64
    q = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, Tkv, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.bfloat16)
    scale = 0.125

    def loss_ours(q, k, v):
        return jnp.sum(
            kv_resident_attention(q, k, v, scale, True).astype(jnp.float32)
            * w.astype(jnp.float32)
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            xla_attention(q, k, v, scale).astype(jnp.float32)
            * w.astype(jnp.float32)
        )

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, ("dq", "dk", "dv")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(1e-3, np.abs(b).max())
        assert np.abs(a - b).max() / denom < 0.05, name


def test_cvt_wrapper_dispatch(monkeypatch):
    import vit_reranking_tpu.ops.attention_pallas as ap

    # small shapes for the test: lift the measured-on-v5e size gate
    monkeypatch.setattr(ap, "KV_RESIDENT_MIN_SCORES", 0)
    rng = np.random.default_rng(3)
    B, H, T, Tkv, D = 2, 3, 64, 16, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Tkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Tkv, D)), jnp.float32)
    out = cvt_attention(q, k, v, 0.1, interpret=True)
    ref = jax.vmap(lambda q, k, v: xla_attention(q, k, v, 0.1))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # unqualifying shape (T not a multiple of 8, e.g. 197 with cls) -> None
    q2 = jnp.zeros((1, 1, 197, 64), jnp.float32)
    k2 = jnp.zeros((1, 1, 50, 64), jnp.float32)
    assert cvt_attention(q2, k2, k2, 0.1, interpret=True) is None
    # below the measured win threshold (small probability tensor) -> None
    monkeypatch.setattr(ap, "KV_RESIDENT_MIN_SCORES", 500_000)
    assert cvt_attention(q, k, v, 0.1, interpret=True) is None
