"""KV-resident fused attention for CvT's shape regime (VERDICT r3 item 5).

The canonical CvT-13 train step's residual cost is attention-probability HBM
traffic: stage 0 materializes (112, 1, 3136, 784) scores+probs per pass
(~8 ms residual after narrow_sm, RESULTS.md round 3).  The generic flash
kernel (jax flash_attention) measured 1.6x SLOWER here — its online-softmax
blocking, f32 internals and 128-padding are built for LONG kv sequences.
CvT's kv is TINY: 784 x 64 (stage 0) / 196 x 64 (stage 1) = 100/25 KB —
the ENTIRE kv fits in VMEM, so attention needs no online softmax at all:

  forward:  grid (B*H, T/Bq); per step the full k/v blocks are resident,
    s = q_blk @ k^T (f32 accumulate), plain softmax in VMEM, out = p @ v.
    HBM: q/k/v read once, out written once — the (T, T_kv) tensor never
    exists in HBM.
  backward: same residency; dK/dV accumulate in VMEM scratch across the
    q-block grid steps (revisited output block written at the last step),
    p recomputed from q/k (cheaper than storing it).

Numerics: s/softmax in f32 regardless of input dtype (slightly STRONGER
than the narrow_sm XLA path, which keeps bf16 scores; both accumulate the
matmuls in f32 on the MXU).  Kernel applies to cls-token-free stages with
attn_drop == 0 (CvT-13 stages 0/1 — reference cvt.py:169-214; stage 2's
cls token and tiny 50-token kv stay on the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bq(T: int, Tkv: int, budget: int = 2 * 1024 * 1024) -> int:
    """Largest divisor of T (multiple of 8) whose f32 score block fits the
    VMEM budget."""
    lanes = -(-Tkv // 128) * 128
    cap = max(budget // (lanes * 4), 8)
    best = 8
    for b in range(8, min(T, 1024) + 1, 8):
        if T % b == 0 and b <= cap:
            best = b
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (Tkv, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Bq, Tkv) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, nq):
    iq = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # (Bq, Tkv) f32

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Tkv)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    ds = ds * scale

    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    # dK/dV accumulate over the q-block steps in f32 VMEM scratch
    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tkv, D)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def kv_resident_attention(q, k, v, scale: float, interpret: bool = False):
    """softmax(q @ k^T * scale) @ v without materializing probabilities.

    q: (BH, T, D); k/v: (BH, Tkv, D).  T must be a multiple of 8; the whole
    (Tkv, D) kv block must fit VMEM (CvT stages 0/1: 100/25 KB — trivially).
    Returns (BH, T, D) in q's dtype.
    """
    out, _ = _fwd(q, k, v, scale, interpret)
    return out


def _fwd(q, k, v, scale, interpret):
    BH, T, D = q.shape
    Tkv = k.shape[1]
    Bq = _pick_bq(T, Tkv)
    nq = T // Bq
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, Bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Bq, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out, (q, k, v)


def _bwd(scale, interpret, res, do):
    q, k, v = res
    BH, T, D = q.shape
    Tkv = k.shape[1]
    Bq = _pick_bq(T, Tkv)
    nq = T // Bq
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, nq=nq),
        grid=(BH, nq),
        in_specs=[
            pl.BlockSpec((1, Bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Bq, D), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Bq, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Tkv, D), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Tkv, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tkv, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tkv, D), jnp.float32),
            pltpu.VMEM((Tkv, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


kv_resident_attention.defvjp(_fwd, _bwd)


# dispatch threshold: the kernel pays per-step grid overhead and half-lane
# (D=64) matmuls; it wins where the ELIMINATED (T, T_kv) HBM traffic is
# large.  Measured on the v5e (bf16+narrow_sm fwd+bwd, bs=112,
# test_results/kvres_attention_r4.log): stage 0 (3136x784 = 2.46M scores)
# 49.1 -> 38.9 ms (-21%); stage 1 (784x196 = 154k scores) 38.5 -> 43.5 ms
# (LOSES — the probability tensor is already small).  Gate on score count.
KV_RESIDENT_MIN_SCORES = 500_000


def cvt_attention(q, k, v, scale: float, interpret: bool = False):
    """(B, H, T, D) wrapper used by models/cvt.py: merges batch x heads,
    dispatches to the kv-resident kernel when the shape qualifies, returns
    None when it does not (caller falls back to the XLA path)."""
    B, H, T, D = q.shape
    Tkv = k.shape[2]
    if T % 8 or D % 64 or Tkv < 8:
        return None
    if T * Tkv < KV_RESIDENT_MIN_SCORES:
        return None
    qm = q.reshape(B * H, T, D)
    km = k.reshape(B * H, Tkv, D)
    vm = v.reshape(B * H, Tkv, D)
    out = kv_resident_attention(qm, km, vm, scale, interpret)
    return out.reshape(B, H, T, D)
