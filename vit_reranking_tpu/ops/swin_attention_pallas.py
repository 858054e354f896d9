"""Window-resident fused attention for Swin's shape regime.

Swin-T's train step measured 83.5 ms vs DeiT-S's 24.8 at near-equal FLOPs;
the ablation (scripts/ablate_swin_cost.py, test_results/profile_swin_r4.log)
attributes ~33 ms of the fwd+bwd to the attention score/softmax/PV path —
NOT to the window-partition transposes or rolls (both ablate at/above base).
The cost is the same disease the CvT kernel fixed (ops/attention_pallas.py):
probability-tensor HBM traffic, made ~2.6x worse here by the lane pad
(T = 49 tokens pads to 128 lanes on every (.., 49, 49) score/prob tensor).

Unlike CvT, every window is an INDEPENDENT 49x49 attention (T == T_kv), so
the whole per-window problem lives in VMEM and the backward needs no
cross-step dK/dV accumulation.  Kernel shape contract (head-slowest layout):

  q/k/v: (G, nW, T, D) where G = num_heads * B_images, nW = windows/image
  bias:  (H_heads, T, T) f32 — relative-position bias, PRE-GATHERED from the
         (2w-1)^2 table outside (tiny); its gradient IS emitted (the table
         is a trained param): per-(window-block, head) partials accumulated
         in the revisited output block, reduced to (H, T, T) by the caller.
  mask:  (nW, T, T) f32 or None — the shifted-window region mask
         (swin.py::_shift_attn_mask).  Grid iterates (window-block SLOW,
         G fast) so the mask block index is unchanged across the inner G
         steps and Pallas elides its re-fetch: the mask is read nW/P times
         per call, not once per grid step.

  forward:  s = q @ k^T * scale + bias + mask (f32), softmax in VMEM,
            out = p @ v.  HBM: q/k/v read once, out written once — the
            (.., T, T) tensor never exists in HBM in either direction.
  backward: recompute p from q/k (cheaper than storing it), then
            dq = ds k, dk = ds^T q, dv = p^T do, dbias = sum_P ds
            accumulated over the G axis into a (nW/P, H, T, T) partial.

Reference semantics: architectures/swin.py WindowAttention (timm Swin-T);
this repo's XLA path is models/swin.py::WindowAttention — parity tested in
tests/test_swin_attention_pallas.py (interpret mode) and on the real chip
by scripts/tpu_mosaic_tests.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_pack(nW: int, T: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Windows per grid step: largest divisor of nW whose padded f32 score
    block fits the VMEM budget (scores dominate: (P, T, T) f32 padded to
    (P, 8-mult, 128-mult))."""
    rows = -(-T // 8) * 8
    lanes = -(-T // 128) * 128
    per_win = rows * lanes * 4 * 4  # ~4 f32 temps of the score shape
    cap = max(budget_bytes // per_win, 1)
    best = 1
    for p in range(1, min(nW, 32) + 1):
        if nW % p == 0 and p <= cap:
            best = p
    return best


def _attn_probs(q, k, bias, mask_ref, scale):
    """(P, T, T) f32 probabilities, entirely in VMEM."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    s = s + bias[None].astype(jnp.float32)
    if mask_ref is not None:
        s = s + mask_ref[...].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, has_mask):
    mask_ref, o_ref = rest if has_mask else (None, rest[0])
    q = q_ref[0]  # (P, T, D)
    v = v_ref[0]
    p = _attn_probs(q, k_ref[0], bias_ref[0], mask_ref, scale).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, *rest, scale, n_inner):
    if len(rest) == 6:
        mask_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
    else:
        mask_ref = None
        do_ref, dq_ref, dk_ref, dv_ref, dbias_ref = rest
    g = pl.program_id(1)  # inner (G) index — dbias block revisited across it
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    p = _attn_probs(q, k, bias_ref[0], mask_ref, scale)  # (P, T, T) f32

    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (P, T, T)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp

    dq_ref[0] = (jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    # dk = (ds * scale)^T @ q per window: contract the t (query) axis
    dk_ref[0] = (jax.lax.dot_general(
        ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)

    # bias grad: sum over the pack now, accumulate over the inner (G) steps
    # that share this head's (block_i, head) output block (the block stays
    # resident until its index g // n_inner changes)
    part = jnp.sum(ds, axis=0)  # (T, T) f32

    @pl.when(g % n_inner == 0)
    def _():
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    dbias_ref[0, 0] += part


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def swin_window_attention(q, k, v, bias, mask, scale: float,
                          interpret: bool = False):
    """softmax(q k^T * scale + bias + mask) v per window, probs VMEM-only.

    q/k/v: (G, nW, T, D) with G = H_heads * B (head SLOWEST: g // B = head);
    bias: (H_heads, T, T) f32; mask: (nW, T, T) f32 or None.
    Returns (G, nW, T, D) in q's dtype.  Differentiable in q, k, v, bias.
    """
    out, _ = _swa_fwd(q, k, v, bias, mask, scale, interpret)
    return out


def _swa_specs(q, bias, mask):
    G, nW, T, D = q.shape
    H = bias.shape[0]
    B = G // H
    P = _pick_pack(nW, T)
    qkv_spec = pl.BlockSpec((1, P, T, D), lambda i, g: (g, i, 0, 0))
    bias_spec = pl.BlockSpec((1, T, T), lambda i, g: (g // B, 0, 0))
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    if mask is not None:
        in_specs.append(pl.BlockSpec((P, T, T), lambda i, g: (i, 0, 0)))
    return (nW // P, G), P, B, qkv_spec, in_specs


def _swa_fwd(q, k, v, bias, mask, scale, interpret):
    grid, _, _, qkv_spec, in_specs = _swa_specs(q, bias, mask)
    ops = (q, k, v, bias) + (() if mask is None else (mask,))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, has_mask=mask is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(*ops)
    return out, (q, k, v, bias, mask)


def _swa_bwd(scale, interpret, res, do):
    q, k, v, bias, mask = res
    T = q.shape[2]
    H = bias.shape[0]
    grid, P, B, qkv_spec, in_specs = _swa_specs(q, bias, mask)
    nblk = grid[0]
    dbias_spec = pl.BlockSpec((1, 1, T, T), lambda i, g: (i, g // B, 0, 0))
    ops = (q, k, v, bias) + (() if mask is None else (mask,))
    dq, dk, dv, dbias_part = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_inner=B),
        grid=grid,
        in_specs=in_specs + [qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, dbias_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((nblk, H, T, T), jnp.float32),
        ],
        interpret=interpret,
    )(*ops, do)
    dbias = jnp.sum(dbias_part, axis=0).astype(bias.dtype)  # (H, T, T)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias, dmask


swin_window_attention.defvjp(_swa_fwd, _swa_bwd)


# ---------------------------------------------------------------------------
# Packed variant: ONE block-diagonal (P*T, P*T) matmul per grid step.
#
# The per-window variant above measured 3.2x SLOWER than XLA at stage-0
# shapes (test_results/profile_swin_r4.log): its batched dot lowers to P
# tiny (49, 32) @ (32, 49) matmuls per grid step and per-matmul issue
# overhead dominates.  Here the P windows' tokens concatenate into one
# (P*T, D) operand and the score matmul runs ONCE per step; cross-window
# products are garbage but cost only VMEM flops (the MXU is idle either
# way), and a precomputed additive term handles everything at once:
# block-diagonal rel-pos bias + shift mask + (-1e9) on cross-window entries
# (softmax then exactly reproduces the per-window distribution).  The
# additive term's gradient carries the bias-table gradient back out.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(q_ref, k_ref, v_ref, add_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # (PT, D)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + add_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, add_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dadd_ref, *, scale, n_inner):
    g = pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + add_ref[0, 0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (PT, PT) f32

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq_ref[0, 0] = (jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)

    @pl.when(g % n_inner == 0)
    def _():
        dadd_ref[0, 0] = jnp.zeros_like(dadd_ref[0, 0])

    dadd_ref[0, 0] += ds


def _pick_pack_packed(nW: int, T: int,
                      budget_bytes: int = 3 * 1024 * 1024) -> int:
    """Windows per packed step: largest divisor of nW whose (PT, PT) f32
    score block fits the budget."""
    best = 1
    for p in range(1, min(nW, 16) + 1):
        if nW % p == 0:
            lanes = -(-(p * T) // 128) * 128
            rows = -(-(p * T) // 8) * 8
            if rows * lanes * 4 <= budget_bytes:
                best = p
    return best


def _packed_add_term(bias, mask, P, nblk):
    """(H, nblk, PT, PT) f32: block-diagonal bias + shift mask, -1e9 on
    cross-window entries."""
    H, T, _ = bias.shape
    eye = jnp.eye(P, dtype=jnp.float32)
    off = (1.0 - jnp.einsum("ts,pq->ptqs", jnp.ones((T, T), jnp.float32), eye)
           ).reshape(P * T, P * T) * -1e9
    big = jnp.einsum("hts,pq->hptqs", bias.astype(jnp.float32), eye)
    big = big.reshape(H, P * T, P * T) + off  # (H, PT, PT)
    big = jnp.broadcast_to(big[:, None], (H, nblk, P * T, P * T))
    if mask is not None:
        mb = mask.astype(jnp.float32).reshape(nblk, P, T, T)
        mbig = jnp.einsum("npts,pq->nptqs", mb, eye).reshape(
            nblk, P * T, P * T)
        big = big + mbig[None]
    return big


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _packed_attention(qp, kp, vp, add, scale, B, interpret=False):
    """qp/kp/vp: (G, nblk, PT, D); add: (H, nblk, PT, PT) f32 with
    G = H * B.  Returns (G, nblk, PT, D)."""
    out, _ = _packed_fwd(qp, kp, vp, add, scale, B, interpret)
    return out


def _packed_specs(qp, B):
    G, nblk, PT, D = qp.shape
    qkv_spec = pl.BlockSpec((1, 1, PT, D), lambda i, g: (g, i, 0, 0))
    add_spec = pl.BlockSpec((1, 1, PT, PT), lambda i, g: (g // B, i, 0, 0))
    return (nblk, G), qkv_spec, add_spec


def _packed_fwd(qp, kp, vp, add, scale, B, interpret):
    grid, qkv_spec, add_spec = _packed_specs(qp, B)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, add_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
        interpret=interpret,
    )(qp, kp, vp, add)
    return out, (qp, kp, vp, add)


def _packed_bwd(scale, B, interpret, res, do):
    qp, kp, vp, add = res
    G, nblk, PT, D = qp.shape
    H = add.shape[0]
    grid, qkv_spec, add_spec = _packed_specs(qp, B)
    dadd_spec = pl.BlockSpec((1, 1, PT, PT), lambda i, g: (i, g // B, 0, 0))
    dq, dk, dv, dadd = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, scale=scale, n_inner=B),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, add_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, dadd_spec],
        out_shape=[
            jax.ShapeDtypeStruct(qp.shape, qp.dtype),
            jax.ShapeDtypeStruct(kp.shape, kp.dtype),
            jax.ShapeDtypeStruct(vp.shape, vp.dtype),
            jax.ShapeDtypeStruct((nblk, H, PT, PT), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, add, do)
    # dadd: (nblk, H, PT, PT) partials -> (H, nblk, PT, PT)
    return dq, dk, dv, jnp.swapaxes(dadd, 0, 1)


_packed_attention.defvjp(_packed_fwd, _packed_bwd)


def swin_window_attention_packed(q, k, v, bias, mask, scale: float,
                                 interpret: bool = False):
    """Same contract as swin_window_attention (q/k/v (G, nW, T, D), bias
    (H, T, T), mask (nW, T, T) or None), via the packed block-diagonal
    kernel.  Differentiable in q, k, v, bias."""
    G, nW, T, D = q.shape
    H = bias.shape[0]
    B = G // H
    P = _pick_pack_packed(nW, T)
    nblk = nW // P
    PT = P * T

    qp = q.reshape(G, nblk, PT, D)
    kp = k.reshape(G, nblk, PT, D)
    vp = v.reshape(G, nblk, PT, D)
    add = _packed_add_term(bias, mask, P, nblk)

    out = _packed_attention(qp, kp, vp, add, scale, B, interpret)
    return out.reshape(G, nW, T, D)


# dispatch gate: per-step grid overhead must amortize over packed windows;
# with nW < 4 (Swin-T stage 3: global 49-token attention, one "window") the
# grid degenerates to one tiny attention per step and the XLA path wins.
SWIN_KERNEL_MIN_WINDOWS = 4

# packed (block-diagonal single-matmul) vs per-window batched-dot kernel;
# the per-window variant measured 3.2x slower than XLA (tiny-matmul issue
# overhead) and exists for A/B only.  SWIN_KERNEL_VARIANT=batched overrides.
import os as _os

SWIN_KERNEL_PACKED = _os.environ.get("SWIN_KERNEL_VARIANT", "packed") != "batched"


def swin_attention(q, k, v, bias, mask, scale: float, n_windows: int = 1,
                   interpret: bool = False):
    """(Bw, H, T, D) wrapper used by models/swin.py: Bw = B * nW window
    batches (window fastest — window_partition order), H heads; reorders to
    the kernel's head-slowest (G, nW, T, D) layout, dispatches when the
    shape qualifies, returns None when it does not (caller falls back to
    the XLA path).

    bias: (H, T, T); mask: (nW, T, T) or None; n_windows: windows per image
    (must equal mask.shape[0] when a mask is given).
    """
    Bw, H, T, D = q.shape
    nW = mask.shape[0] if mask is not None else n_windows
    if Bw % nW or T != k.shape[2] or D % 8 or T < 2:
        return None
    if nW < SWIN_KERNEL_MIN_WINDOWS:
        return None
    B = Bw // nW

    def to_kernel(t):
        # (B*nW, H, T, D) -> (H, B, nW, T, D) -> (H*B, nW, T, D)
        t = t.reshape(B, nW, H, T, D).transpose(2, 0, 1, 3, 4)
        return t.reshape(H * B, nW, T, D)

    fn = swin_window_attention_packed if SWIN_KERNEL_PACKED else \
        swin_window_attention
    out = fn(
        to_kernel(q), to_kernel(k), to_kernel(v),
        bias.astype(jnp.float32),
        None if mask is None else mask.astype(jnp.float32),
        scale, interpret,
    )
    out = out.reshape(H, B, nW, T, D).transpose(1, 2, 0, 3, 4)
    return out.reshape(Bw, H, T, D)
