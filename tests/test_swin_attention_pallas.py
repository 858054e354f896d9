"""Window-resident fused attention (ops/swin_attention_pallas.py): forward
and gradient parity — including the relative-position-bias gradient — vs the
XLA materializing path at Swin-T's window shapes (interpret mode on the CPU
mesh; compiled-Mosaic coverage in scripts/tpu_mosaic_tests.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_reranking_tpu.ops.swin_attention_pallas import (
    swin_attention,
    swin_window_attention,
    swin_window_attention_packed,
)

VARIANTS = {"batched": swin_window_attention,
            "packed": swin_window_attention_packed}


def xla_window_attention(q, k, v, bias, mask, scale):
    """q/k/v (G, nW, T, D), bias (H, T, T) with G = H*B, mask (nW, T, T)."""
    G, nW, T, D = q.shape
    H = bias.shape[0]
    B = G // H
    s = jnp.einsum("gwtd,gwsd->gwts", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + jnp.repeat(bias, B, axis=0)[:, None].astype(jnp.float32)
    if mask is not None:
        s = s + mask[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("gwts,gwsd->gwtd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _mk(rng, G, nW, T, D, H, dtype=jnp.float32, with_mask=True):
    q = jnp.asarray(rng.standard_normal((G, nW, T, D)), dtype)
    k = jnp.asarray(rng.standard_normal((G, nW, T, D)), dtype)
    v = jnp.asarray(rng.standard_normal((G, nW, T, D)), dtype)
    bias = jnp.asarray(rng.standard_normal((H, T, T)), jnp.float32)
    mask = None
    if with_mask:
        # region mask like _shift_attn_mask: 0 / -100 blocks
        m = rng.integers(0, 2, size=(nW, T, 1))
        mask = jnp.asarray(
            np.where(m == m.transpose(0, 2, 1), 0.0, -100.0), jnp.float32
        )
    return q, k, v, bias, mask


@pytest.mark.parametrize("variant", list(VARIANTS), ids=list(VARIANTS))
@pytest.mark.parametrize("with_mask", [False, True], ids=["nomask", "mask"])
@pytest.mark.parametrize(
    "nW,T,D,H,B", [(16, 49, 32, 3, 2), (4, 49, 32, 2, 3), (8, 16, 8, 2, 2)],
    ids=["stage1-like", "stage2-like", "tiny"],
)
def test_forward_parity(nW, T, D, H, B, with_mask, variant):
    rng = np.random.default_rng(0)
    q, k, v, bias, mask = _mk(rng, H * B, nW, T, D, H, with_mask=with_mask)
    scale = D ** -0.5
    ours = VARIANTS[variant](q, k, v, bias, mask, scale, True)
    ref = xla_window_attention(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("variant", list(VARIANTS), ids=list(VARIANTS))
@pytest.mark.parametrize("with_mask", [False, True], ids=["nomask", "mask"])
def test_gradient_parity(with_mask, variant):
    """dq/dk/dv AND dbias (the rel-pos table is a trained param — its grad
    accumulates across revisited output blocks in the kernel; the packed
    variant recovers it through the block-diagonal add term's autodiff)."""
    rng = np.random.default_rng(1)
    nW, T, D, H, B = 8, 49, 32, 2, 2
    q, k, v, bias, mask = _mk(rng, H * B, nW, T, D, H, with_mask=with_mask)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    scale = D ** -0.5

    def loss_ours(q, k, v, bias):
        return jnp.sum(VARIANTS[variant](q, k, v, bias, mask, scale, True) * w)

    def loss_ref(q, k, v, bias):
        return jnp.sum(xla_window_attention(q, k, v, bias, mask, scale) * w)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ours, g_ref, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, err_msg=name
        )


@pytest.mark.parametrize("variant", list(VARIANTS), ids=list(VARIANTS))
def test_gradient_parity_bf16(variant):
    rng = np.random.default_rng(2)
    nW, T, D, H, B = 4, 49, 32, 2, 2
    q, k, v, bias, mask = _mk(rng, H * B, nW, T, D, H, dtype=jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    scale = D ** -0.5

    def loss_ours(q, k, v, bias):
        return jnp.sum(
            VARIANTS[variant](q, k, v, bias, mask, scale, True)
            .astype(jnp.float32) * w
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            xla_window_attention(q, k, v, bias, mask, scale)
            .astype(jnp.float32) * w
        )

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ours, g_ref, ("dq", "dk", "dv", "dbias")):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(1e-3, np.abs(b).max())
        assert np.abs(a - b).max() / denom < 0.05, name


def test_wrapper_layout_and_dispatch():
    """swin_attention's (Bw, H, T, D) <-> kernel layout round trip matches a
    direct per-window XLA attention, masked and unmasked; gating returns
    None for nW < SWIN_KERNEL_MIN_WINDOWS."""
    rng = np.random.default_rng(3)
    B, nW, H, T, D = 2, 4, 3, 49, 32
    Bw = B * nW
    q = jnp.asarray(rng.standard_normal((Bw, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Bw, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Bw, H, T, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, T, T)), jnp.float32)
    m = rng.integers(0, 2, size=(nW, T, 1))
    mask = jnp.asarray(
        np.where(m == m.transpose(0, 2, 1), 0.0, -100.0), jnp.float32
    )
    scale = D ** -0.5

    # XLA reference in the model's own layout (models/swin.py XLA branch)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[None]
    sm = s.reshape(B, nW, H, T, T) + mask[None, :, None]
    p = jax.nn.softmax(sm.reshape(Bw, H, T, T), axis=-1)
    ref = jnp.einsum("bhts,bhsd->bhtd", p, v,
                     preferred_element_type=jnp.float32)

    out = swin_attention(q, k, v, bias, mask, scale, n_windows=nW,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # unmasked: n_windows carries the pack geometry
    p0 = jax.nn.softmax(s, axis=-1)
    ref0 = jnp.einsum("bhts,bhsd->bhtd", p0, v,
                      preferred_element_type=jnp.float32)
    out0 = swin_attention(q, k, v, bias, None, scale, n_windows=nW,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-5)

    # stage-3-like global attention (one window) gates off
    assert swin_attention(q[:B], k[:B], v[:B], bias, None, scale,
                          n_windows=1, interpret=True) is None


def test_model_flat_proj_parity(monkeypatch):
    """SwinNetwork with SWIN_FLAT_PROJ=1 (qkv/proj Denses on the unpadded
    flat (B, L, C) rows, window partition/reverse moved onto the qkv/output
    tensors) matches the windowed default — per-token Denses commute with the
    roll/partition permutations.  Shifted blocks included (the mask geometry
    must line up after the move)."""
    import vit_reranking_tpu.models.swin as swin_mod

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    model = swin_mod.SwinNetwork(embed_dim=32, dim=24, depths=(2, 2),
                                 num_heads=(3, 6), drop_path_rate=0.0)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = model.apply(v, x, train=False)[0]

    monkeypatch.setattr(swin_mod, "USE_SWIN_FLAT_PROJ", True)
    ours = model.apply(v, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    # parameter tree is unchanged (same init works for both paths)
    g_ref = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, x, train=False)[0] ** 2))(v["params"])
    monkeypatch.setattr(swin_mod, "USE_SWIN_FLAT_PROJ", False)
    g_base = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, x, train=False)[0] ** 2))(v["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_base)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_model_kernel_parity(monkeypatch):
    """SwinNetwork forward with the kernel forced on (interpret) matches the
    XLA path — full model, shifted blocks included."""
    import vit_reranking_tpu.models.swin as swin_mod

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    model = swin_mod.SwinNetwork(embed_dim=32, dim=24, depths=(2, 2),
                                 num_heads=(3, 6), drop_path_rate=0.0)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = model.apply(v, x, train=False)[0]

    monkeypatch.setattr(swin_mod, "USE_SWIN_WINDOW_KERNEL", True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import vit_reranking_tpu.ops.swin_attention_pallas as swa

    orig = swa.swin_attention
    monkeypatch.setattr(
        swa, "swin_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    ours = model.apply(v, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
