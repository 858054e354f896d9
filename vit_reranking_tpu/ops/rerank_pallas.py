"""Fused Pallas Sinkhorn-rerank kernel — the performance-critical path.

Division of labor (what each engine is good at):
  * XLA builds the (pairs, R, R) patch-similarity tensor S with one large MXU
    einsum and packs it into a lanes=pairs layout (R_s, R_m, P).
  * Pallas runs the 100 Sinkhorn scaling iterations entirely in VMEM and
    reduces straight to the final ``sum(T * S)`` scores — S/K are read from
    HBM exactly once, instead of on every iteration like the pure-XLA path
    (ops/similarity.py), which is ~100x the HBM traffic.

Layout: pairs ride the 128-lane axis, R_m rides sublanes, R_s is the unrolled
leading axis — every loop op is a full-width VPU elementwise or reduction
with no padding waste (R=49 would waste 2.6x as a trailing dim).

Early-exit semantics: the reference freezes a whole query's candidate batch
when the *batch-mean* residual crosses 1e-1 (utilities/diml.py:50-52).  The
kernel supports both granularities:
  * per-pair freeze (default for full OT): each lane freezes on its own mean
    residual — strictly finer-grained, verified rank-identical for full OT;
  * per-query batch-mean freeze (``group_valid=K``): one grid step holds ONE
    query's K candidates on the lanes (padded to 128), the residual is the
    masked mean over all K candidates' scaling rows — bit-matching the
    reference's exit rule, which matters for the slower-converging partial
    OT (the round-1 verdict's 8x perf cliff on ``--ot_part 0.5/0.8``).
The XLA path remains the bit-faithful reference implementation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIR_LANES = 128  # pairs per grid step (P); multiple of 128 (tuned on v5e:
# 128 -> ~900k pairs/s vs 256 -> ~800k; 512 exceeds VMEM)


def _sublane_tile(dtype) -> int:
    """Mosaic's VMEM sublane tile for ``dtype`` ((8*packing, 128) tiles)."""
    return 8 * max(1, 4 // jnp.dtype(dtype).itemsize)


def _m_padded(R: int, dtype) -> int:
    """R_m rounded up to the sublane tile.  The packed S stream's
    second-minor dim is R_m=49; Mosaic DMAs unaligned 49-row blocks at
    ~146-169 GB/s on v5e vs ~395 GB/s tile-aligned (measured,
    scripts/probe_pallas_bw_variants.py round 3) — padding the column axis
    to 56 (f32) / 64 (bf16) trades +14/31% bytes for ~2x ISOLATED stream
    rate.  In the real pipeline the trade is NEGATIVE (see
    ``fused_rerank_tile``): the producer einsum also writes the padded
    bytes and the Sinkhorn VPU loop pays the padded width, so
    ``pad_sublanes`` defaults off (kept as a measured negative result,
    scripts/ablate_pad_sublanes.py)."""
    t = _sublane_tile(dtype)
    return -(-R // t) * t


def _pack_bank_pairs(bank: jnp.ndarray) -> jnp.ndarray:
    """(N, C, R) -> (N, C*R//2) int32 of adjacent bf16 pairs (row-major).

    The producer's dominant HBM traffic is the per-tile candidate row gather
    (~82 GB/rep read+write at the Q=16384 bench geometry in f32).  Storing
    the bank in bf16 halves that, but XLA's row gather does not vectorize at
    2-byte element width on this platform — measured 2.4x SLOWER than
    gathering f32 rows (RESULTS.md round 3, 'producer bf16 + bank').  A
    4-byte gather of the SAME bf16 payload rides the f32 gather path while
    moving half the bytes: round to bf16 once, view adjacent element pairs
    of each row-major (C, R) row as one int32.  bitcast + reshape are
    layout-preserving, so :func:`_unpack_bank_pairs` reproduces the bf16
    rows bit-exactly; on TPU the einsum's MXU pass rounds f32 inputs to
    bf16 anyway, so pre-rounding does not change the bf16-stream scores.

    MEASURED NEGATIVE (v5e, Q=16384 bench geometry,
    scripts/ablate_pack_gather.py): 2.2x slower full OT (392 -> 851 ms/rep),
    3.0x slower partial (224 -> 680).  Same failure mode as the raw bf16
    gather: a materialized bf16 einsum operand uses (16, 128) VMEM tiling,
    so XLA inserts a relayout pass over the unpacked tensor that costs more
    than the gather bytes saved — the f32 gather feeding the MXU (which
    rounds in hardware) is the effective floor for gather traffic on this
    platform.  ``pack_gather`` ships default-off."""
    N, C, R = bank.shape
    b = bank.astype(jnp.bfloat16).reshape(N, (C * R) // 2, 2)
    return jax.lax.bitcast_convert_type(b, jnp.int32)


def _unpack_bank_pairs(rows: jnp.ndarray, C: int, R: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_bank_pairs` after a row gather: (..., C*R//2)
    int32 -> (..., C, R) bf16, bit-exact."""
    b = jax.lax.bitcast_convert_type(rows, jnp.bfloat16)  # (..., CR/2, 2)
    return b.reshape(*rows.shape[:-1], C, R)


def _sinkhorn_score_kernel(
    S_ref, u_ref, v_ref, *rest, iters, thresh, ot_temp, ot_part=1.0,
    group_valid=None, has_cost=False, loop="while", m_valid=None,
):
    """rest = (C_ref, out_ref) when ``has_cost`` — C carries a SEPARATE
    cost/attention map for the OT kernel (the qk method builds K from the
    pair's q·k attention, reference diml.py:235-258, while the score still
    contracts against the feature similarity S) — else (out_ref,) and the
    kernel derives from S itself.

    ``m_valid``: when the packed stream's column axis R_m is padded up to the
    VMEM sublane tile (so the HBM DMA is tile-aligned — ~2x the stream rate
    on v5e, scripts/probe_pallas_bw_variants.py), only columns < m_valid are
    real anchor patches.  Padded columns carry S=0/v=0 from the producer; the
    kernel zeroes their OT-kernel entries and pins their column scaling to 0,
    so every padded term contributes exact 0.0 to both reductions — real
    lanes match the unpadded kernel to ~1 ulp (only the SIMD regrouping of
    the sublane reduction changes; tests/test_rerank_pallas.py)."""
    if has_cost:
        C_ref, out_ref = rest
        Km = jnp.exp(-(1.0 - C_ref[0].astype(jnp.float32)) / ot_temp)
    else:
        (out_ref,) = rest
    # the S/C streams may arrive as bf16 (stream_dtype fast mode — halves
    # the one-time HBM read that bounds this kernel); every loop op and the
    # final contraction stay f32
    S = S_ref[0].astype(jnp.float32)  # (R_s, R_m, P)
    u = u_ref[0]  # (R_s, P)
    v = v_ref[0]  # (R_m, P)
    if not has_cost:
        Km = jnp.exp(-(1.0 - S) / ot_temp)

    if ot_part <= 0.999:
        # partial OT via one dustbin row+col (reference diml.py:56-75): kernel
        # entries = 1 - ot_part, corner = 0, marginals append 1 - ot_part.
        # S pads with zeros so the final sum(T*S) automatically ignores the
        # dustbin (the caller crops T[:R,:R] in the reference).
        bin_mass = 1.0 - ot_part
        Rs1, Rm1 = S.shape[0] + 1, S.shape[1] + 1
        S = jnp.pad(S, ((0, 1), (0, 1), (0, 0)))
        Km = jnp.pad(Km, ((0, 1), (0, 1), (0, 0)), constant_values=bin_mass)
        # zero the dustbin corner without a scatter (unsupported in Mosaic)
        rows = jax.lax.broadcasted_iota(jnp.int32, (Rs1, Rm1, S.shape[-1]), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Rs1, Rm1, S.shape[-1]), 1)
        corner = (rows == Rs1 - 1) & (cols == Rm1 - 1)
        Km = jnp.where(corner, 0.0, Km)
        u = jnp.pad(u, ((0, 1), (0, 0)), constant_values=bin_mass)
        v = jnp.pad(v, ((0, 1), (0, 0)), constant_values=bin_mass)

    if m_valid is not None:
        # columns in [m_valid, W) are sublane padding — except the dustbin
        # column at W-1 under partial OT, which is real.  Zero their kernel
        # entries (exact-0 contributions to both reductions) and arrange for
        # their scaling update to divide by 1 instead of a zero column sum.
        W, P_ = v.shape
        col2 = jax.lax.broadcasted_iota(jnp.int32, (W, P_), 0)
        vmask2 = (col2 < m_valid).astype(jnp.float32)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (S.shape[0], W, P_), 1)
        kmask3 = (col3 < m_valid).astype(jnp.float32)
        if ot_part <= 0.999:
            vmask2 = jnp.maximum(vmask2, (col2 == W - 1).astype(jnp.float32))
            kmask3 = jnp.maximum(kmask3, (col3 == W - 1).astype(jnp.float32))
        Km = Km * kmask3
        ktr_guard = 1.0 - vmask2  # +1 on dead columns only
    else:
        ktr_guard = None

    r0 = jnp.ones_like(u)
    c0 = jnp.ones_like(v)
    # float freeze mask (bool carries fail to legalize in the Mosaic loop)
    done0 = jnp.zeros((1, u.shape[-1]), dtype=jnp.float32)

    if group_valid is not None:
        # lanes >= group_valid are padding within this query's step; exclude
        # them from the batch-mean residual (reference averages over the real
        # K candidates only, diml.py:50)
        lane = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        lane_mask = (lane < group_valid).astype(jnp.float32)
        denom = float(u.shape[0] * group_valid)

    n_lanes = jnp.float32(done0.shape[-1])

    def cond(carry):
        # stop when every lane is frozen: frozen lanes are masked no-ops, so
        # breaking early is bit-identical to running out the trip count — and
        # matches the reference's actual behavior (its `break` fires after
        # ~10-15 iterations on real data, diml.py:50-52); ~8x less loop work
        # than a fixed 100-trip fori_loop at thresh=1e-1.
        i, r, c, done = carry
        running = jnp.sum(jnp.sum(done, axis=-1, keepdims=True), axis=0, keepdims=True)
        return jnp.logical_and(i < iters, running[0, 0] < n_lanes)

    def body(carry):
        i, r, c, done = carry
        # Kc[s, p] = sum_m Km[s, m, p] c[m, p]   (sublane reduction)
        Kc = jnp.sum(Km * c[None, :, :], axis=1)
        r_new = done * r + (1.0 - done) * (u / Kc)
        # Ktr[m, p] = sum_s Km[s, m, p] r[s, p]  (leading-axis reduction)
        Ktr = jnp.sum(Km * r_new[:, None, :], axis=0)
        if ktr_guard is not None:
            # dead columns have Ktr == 0 exactly (their Km is 0); divide by 1
            # there so c stays v (= 0) instead of NaN.  Real columns add 0.0,
            # which is bit-neutral (Ktr > 0 always).
            Ktr = Ktr + ktr_guard
        c_new = done * c + (1.0 - done) * (v / Ktr)
        if group_valid is not None:
            # reference exit rule: mean over the whole candidate batch
            err = jnp.sum(jnp.abs(r_new - r) * lane_mask) / denom  # scalar
            done = jnp.maximum(
                done,
                jnp.broadcast_to((err < thresh).astype(jnp.float32), done.shape),
            )
        else:
            err = jnp.mean(jnp.abs(r_new - r), axis=0, keepdims=True)  # per pair
            done = jnp.maximum(done, (err < thresh).astype(jnp.float32))
        return i + 1, r_new, c_new, done

    if loop == "fori":
        # static trip count: bit-identical to the while_loop (frozen lanes
        # are masked no-ops) but keeps the kernel's schedule fully static
        _, r, c, _ = jax.lax.fori_loop(
            0, iters, lambda i, carry: body(carry), (jnp.int32(0), r0, c0, done0)
        )
    else:
        _, r, c, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), r0, c0, done0)
        )

    # score = sum_sm r K c S without a 3D temporary: contract m first
    t1 = jnp.sum((Km * S) * c[None, :, :], axis=1)  # (R_s, P)
    out_ref[0] = jnp.sum(r * t1, axis=0)[None, :]  # (1, P)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "interpret", "group_valid",
        "loop", "m_valid",
    ),
)
def sinkhorn_scores_packed(
    S_packed: jnp.ndarray,
    u_packed: jnp.ndarray,
    v_packed: jnp.ndarray,
    iters: int = 100,
    thresh: float = 1e-1,
    ot_temp: float = 0.05,
    ot_part: float = 1.0,
    interpret: bool = False,
    group_valid: Optional[int] = None,
    C_packed: Optional[jnp.ndarray] = None,
    loop: str = "while",
    m_valid: Optional[int] = None,
) -> jnp.ndarray:
    """sum(T * S) per pair from packed inputs.

    Args:
      S_packed: (nsteps, R_s, R_m, P) patch similarities, pairs on lanes.
      u_packed: (nsteps, R_s, P); v_packed: (nsteps, R_m, P).
      group_valid: when set, each step is ONE query's candidates on lanes
        [0, group_valid) and the Sinkhorn early exit uses the batch-mean
        residual over those lanes (reference diml.py:50-52 semantics).
      C_packed: optional separate similarity for the OT kernel
        (K = exp(-(1-C)/temp)); the score still contracts against S.  Used
        by the qk method, where K comes from the pair's q·k attention
        (reference diml.py:235-258) while the score uses feature similarity.
      m_valid: when R_m is sublane-padded (tile-aligned HBM stream), the
        count of real anchor-patch columns; padded columns must carry
        S=0 / v=0 (see :func:`_sinkhorn_score_kernel`).
    Returns: (nsteps, P) scores.
    """
    nsteps, Rs, Rm, P = S_packed.shape
    has_cost = C_packed is not None
    if m_valid is not None and m_valid >= Rm:
        m_valid = None  # no padding present
    kernel = functools.partial(
        _sinkhorn_score_kernel, iters=iters, thresh=thresh, ot_temp=ot_temp,
        ot_part=ot_part, group_valid=group_valid, has_cost=has_cost,
        loop=loop, m_valid=m_valid,
    )
    S_spec = pl.BlockSpec((1, Rs, Rm, P), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        S_spec,
        pl.BlockSpec((1, Rs, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Rm, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    # bf16 S/C streams pass through untouched (the kernel upcasts in VMEM);
    # anything else is pinned to f32 — the bit-faithful default
    keep = lambda x: x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)
    args = [
        keep(S_packed),
        u_packed.astype(jnp.float32),
        v_packed.astype(jnp.float32),
    ]
    if has_cost:
        in_specs.append(S_spec)
        args.append(keep(C_packed))
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, 1, P), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=nsteps * P * iters * 4 * Rs * Rm,
            bytes_accessed=(1 + has_cost) * S_packed.size * S_packed.dtype.itemsize
            + out_shapebytes(nsteps, P),
            transcendentals=nsteps * P * Rs * Rm,
        ),
        interpret=interpret,
    )(*args)
    return out[:, 0, :]


def out_shapebytes(nsteps, P):
    return nsteps * P * 4


def rollout_marginals(
    rollout_q: jnp.ndarray, rollout_g: jnp.ndarray, eps: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, R) query + (Q, K, R) gathered gallery rollout saliency -> (u, v)
    marginals of the flagship path (reference diml.py:348-354)."""
    u = jax.nn.relu(rollout_g)
    u = u / (jnp.sum(u, axis=-1, keepdims=True) + eps)
    v_row = jax.nn.relu(rollout_q)
    v_row = v_row / (jnp.sum(v_row, axis=-1, keepdims=True) + eps)
    v = jnp.broadcast_to(v_row[:, None, :], u.shape)
    return u, v


def _pack_pairs(x: jnp.ndarray, P: int) -> jnp.ndarray:
    """(Npairs, ...) -> (nsteps, ..., P) with pairs on the last axis; the
    pair count pads up to a multiple of P (padded pairs are dropped by the
    caller after unpacking)."""
    n = x.shape[0]
    pad = (-n) % P
    if pad:
        x = jnp.concatenate([x, jnp.ones((pad, *x.shape[1:]), x.dtype)], axis=0)
    rest = x.shape[1:]
    nsteps = x.shape[0] // P
    x = x.reshape(nsteps, P, *rest)
    return jnp.moveaxis(x, 1, -1)


def _pack_groups(x: jnp.ndarray, P: int) -> jnp.ndarray:
    """(T, K, ...) -> (T, ..., P): each step carries ONE query's K candidates
    on the lanes, padded up to P with ones (excluded from the group-mean exit
    by ``group_valid`` and dropped by the caller)."""
    T, K = x.shape[0], x.shape[1]
    pad = P - K
    if pad:
        x = jnp.concatenate([x, jnp.ones((T, pad, *x.shape[2:]), x.dtype)], axis=1)
    return jnp.moveaxis(x, 1, -1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "interpret", "P",
        "group_exit", "stream_dtype", "pad_sublanes",
    ),
)
def fused_rerank_tile(
    anchors, fb_g, u, v, iters=100, thresh=1e-1, ot_temp=0.05, ot_part=1.0,
    interpret=False, P=PAIR_LANES, group_exit=None, cost=None,
    stream_dtype="float32", pad_sublanes=False,
):
    """One query tile: anchors (T, C, R), fb_g (T, K, C, R), u/v (T, K, R).
    Returns (T, K) scores.

    stream_dtype="bfloat16" streams the packed similarity S (and ``cost``)
    through HBM in bf16 — the kernel's bound is that one-time stream, so this
    halves its bytes; the producer einsum then runs at DEFAULT precision (one
    bf16 MXU pass instead of HIGHEST's multi-pass refinement) since its output
    rounds to bf16 anyway.  All Sinkhorn loop math stays f32 in VMEM.  The
    f32 default remains the bit-faithful path.

    group_exit selects the reference's per-query batch-mean Sinkhorn exit
    (one query per grid step, diml.py:50-52); defaults to on for partial OT
    where exit granularity changes results, off for full OT where per-pair
    freeze is rank-identical and packs lanes fully.  When K > P the query's
    candidates span ceil(K/P) grid steps (wrap-padded to full chunks) and the
    exit residual is the mean over each P-lane chunk — the closest
    realization of the reference's full-K batch mean without cross-step
    communication (measured: max |score diff| ~5e-4 vs the XLA batch-mean
    path at K=256/ot_part=0.5, 100% top-10 agreement;
    tests/test_rerank_pallas.py).  With group_exit off, pairs pack densely.

    ``cost`` (T, K, R, R) optionally carries a separate similarity for the OT
    kernel (qk method: the pair's q·k attention map, diml.py:235-258)."""
    T, K, C, R = fb_g.shape
    s_dt = jnp.dtype(stream_dtype)
    s_prec = (
        jax.lax.Precision.DEFAULT if s_dt == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    if cost is not None:
        cost = cost.astype(s_dt)
    if group_exit is None:
        group_exit = ot_part <= 0.999
    # tile-align the packed stream's sublane axis (R_m): pad the ANCHOR patch
    # axis with zero-feature patches so S gains exact-0 columns (and v / cost
    # zero columns); the kernel masks them via m_valid — real lanes match to
    # ~1 ulp while the HBM blocks become (…, R_pad, P) aligned DMAs
    # (~2x ISOLATED stream rate, scripts/probe_pallas_bw_variants.py).
    # MEASURED NEGATIVE in the real pipeline (scripts/ablate_pad_sublanes.py,
    # v5e, Q=16384 bench geometry): bf16 full OT 4.18 -> 3.83 M pairs/s
    # (-8%), partial 7.20 -> 6.53 (-9%), f32 2.88 -> 2.91 (+1%, noise) —
    # the producer einsum writes the +14% f32 / +31% bf16 padded bytes and
    # the Sinkhorn VPU loop pays the padded width, which together outweigh
    # the aligned-DMA rate gain.  Default OFF; kept selectable for future
    # geometries where R is further from the tile.
    R_pad = _m_padded(R, s_dt) if pad_sublanes else R
    m_valid = R if R_pad != R else None
    if R_pad != R:
        mp = ((0, 0), (0, 0), (0, R_pad - R))
        anchors = jnp.pad(anchors, mp)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, R_pad - R)))
        if cost is not None:
            cost = jnp.pad(cost, ((0, 0), (0, 0), (0, 0), (0, R_pad - R)))
    if not group_exit and cost is None and T == P:
        # Fast path (measured 1.35x at the bench geometry): the einsum emits
        # the packed pairs-on-lanes layout DIRECTLY — queries ride the lane
        # axis, one grid step per candidate rank k, no pad.  The _pack_pairs
        # moveaxis below is a strided transpose that XLA must materialize
        # when its consumer is a pallas_call (~16 GB of extra HBM traffic at
        # SOP-bench scale); with 'ksmt' output XLA folds the permutation
        # into the dot epilogue (scripts/ablate_rerank_prep.py).
        Sp = jnp.einsum(
            "tcm,tkcs->ksmt", anchors, fb_g,
            preferred_element_type=s_dt, precision=s_prec,
        )  # (K, R_s, R_pad, T)
        up = jnp.transpose(u, (1, 2, 0))  # (K, R, T)
        vp = jnp.transpose(v, (1, 2, 0))
        scores = sinkhorn_scores_packed(
            Sp, up, vp, iters=iters, thresh=thresh, ot_temp=ot_temp,
            ot_part=ot_part, interpret=interpret, m_valid=m_valid,
        )  # (K, T)
        return jnp.transpose(scores, (1, 0))
    S = jnp.einsum(
        "tcm,tkcs->tksm", anchors, fb_g,
        preferred_element_type=s_dt, precision=s_prec,
    )  # (T, K, R_s, R_pad)
    if group_exit and K > P:
        # multi-step group packing: chunk the K candidates into full P-lane
        # steps (wrapping real pairs into the tail pad so every lane in a
        # chunk is a genuine problem of the same query and the chunk-mean
        # exit is unbiased)
        nch = -(-K // P)
        wrap = jnp.arange(nch * P) % K
        grp = lambda x: x[:, wrap].reshape(T * nch, P, *x.shape[2:])
        scores = sinkhorn_scores_packed(
            _pack_groups(grp(S), P), _pack_groups(grp(u), P),
            _pack_groups(grp(v), P),
            iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
            interpret=interpret, group_valid=P, m_valid=m_valid,
            C_packed=None if cost is None else _pack_groups(grp(cost), P),
        )
        return scores.reshape(T, nch * P)[:, :K]
    if group_exit:
        Sp = _pack_groups(S, P)
        up = _pack_groups(u, P)
        vp = _pack_groups(v, P)
        Cp = None if cost is None else _pack_groups(cost, P)
        scores = sinkhorn_scores_packed(
            Sp, up, vp, iters=iters, thresh=thresh, ot_temp=ot_temp,
            ot_part=ot_part, interpret=interpret, group_valid=K, C_packed=Cp,
            m_valid=m_valid,
        )
        return scores[:, :K]
    Sp = _pack_pairs(S.reshape(T * K, R, R_pad), P)
    up = _pack_pairs(u.reshape(T * K, R), P)
    vp = _pack_pairs(v.reshape(T * K, R_pad), P)
    Cp = None if cost is None else _pack_pairs(cost.reshape(T * K, R, R_pad), P)
    scores = sinkhorn_scores_packed(
        Sp, up, vp, iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
        interpret=interpret, C_packed=Cp, m_valid=m_valid,
    )
    flat = jnp.moveaxis(scores, -1, 1).reshape(-1)[: T * K]
    return flat.reshape(T, K)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "query_tile", "use_uniform",
        "interpret", "stream_dtype", "pad_sublanes", "pack_gather",
    ),
)
def fused_rollout_rerank_scores(
    feature_bank: jnp.ndarray,
    centers: jnp.ndarray,
    rollout: jnp.ndarray,
    top_inds: jnp.ndarray,
    ot_temp: float = 0.05,
    iters: int = 100,
    thresh: float = 1e-1,
    query_tile: int = 128,
    use_uniform: bool = False,
    ot_part: float = 1.0,
    interpret: bool = False,
    stream_dtype: str = "float32",
    pad_sublanes: bool = False,
    pack_gather: Optional[bool] = None,
) -> jnp.ndarray:
    """Flagship rollout rerank over all queries, tiled to bound the gather.

    feature_bank (N, C, R) normalized, rollout (N, R), top_inds (N, K).
    Returns (N, K) OT scores aligned with top_inds.

    The tile loop runs as ``lax.map`` inside ONE compiled program: a host-side
    loop of per-tile dispatches costs ~30-60 ms of dispatch latency each on
    this platform (236 tiles at SOP scale ~ 7-14 s of pure overhead), and
    per-tile host dispatch also defeats XLA's cross-tile pipelining.

    pack_gather gathers candidate rows from an int32-packed bf16 copy of
    the bank (half the gather bytes) — measured 2-3x SLOWER end-to-end on
    v5e (bf16 relayout dominates; see :func:`_pack_bank_pairs`), so it
    defaults OFF and exists as the documented negative result.
    """
    N, C, R = feature_bank.shape
    K = top_inds.shape[1]
    P = PAIR_LANES
    if pack_gather is None:
        pack_gather = False
    pack_gather = pack_gather and (C * R) % 2 == 0
    bank = _pack_bank_pairs(feature_bank) if pack_gather else feature_bank
    nt = -(-N // query_tile)
    idx_all = (jnp.arange(nt * query_tile) % N).reshape(nt, query_tile)

    def tile(idx):
        return _rollout_tile(
            bank, rollout, top_inds, idx,
            iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
            use_uniform=use_uniform, interpret=interpret, P=P,
            stream_dtype=stream_dtype, pad_sublanes=pad_sublanes,
            bank_dims=(C, R) if pack_gather else None,
        )

    out = jax.lax.map(tile, idx_all)  # (nt, query_tile, K)
    return out.reshape(nt * query_tile, K)[:N]


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "query_tile", "use_uniform",
        "use_inverse", "use_minus", "use_soft", "use_cls_token", "temperature",
        "interpret", "stream_dtype",
    ),
)
def fused_featvit_rerank_scores(
    feature_bank: jnp.ndarray,
    centers: jnp.ndarray,
    top_inds: jnp.ndarray,
    ot_temp: float = 0.05,
    iters: int = 100,
    thresh: float = 1e-1,
    query_tile: int = 128,
    use_uniform: bool = False,
    use_inverse: bool = False,
    use_minus: bool = False,
    use_soft: bool = False,
    use_cls_token: bool = False,
    temperature: float = 1.0,
    ot_part: float = 1.0,
    interpret: bool = False,
    stream_dtype: str = "float32",
) -> jnp.ndarray:
    """Fused rerank with cross-attention marginals (the calc_similarity
    stage-1 path, reference diml.py:77-147).  One compiled program — see
    :func:`fused_rollout_rerank_scores` for why the tile loop is lax.map."""
    N, C, R = feature_bank.shape
    K = top_inds.shape[1]
    P = PAIR_LANES
    nt = -(-N // query_tile)
    idx_all = (jnp.arange(nt * query_tile) % N).reshape(nt, query_tile)

    def tile(idx):
        return _featvit_tile(
            feature_bank, centers, top_inds, idx,
            iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
            use_uniform=use_uniform, use_inverse=use_inverse,
            use_minus=use_minus, use_soft=use_soft,
            use_cls_token=use_cls_token, temperature=temperature,
            interpret=interpret, P=P, stream_dtype=stream_dtype,
        )

    out = jax.lax.map(tile, idx_all)
    return out.reshape(nt * query_tile, K)[:N]


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "query_tile", "use_uniform", "use_exp",
        "temperature", "scale", "interpret", "stream_dtype",
    ),
)
def fused_qk_rerank_scores(
    feature_bank: jnp.ndarray,
    q_bank: jnp.ndarray,
    k_bank: jnp.ndarray,
    top_inds: jnp.ndarray,
    iters: int = 100,
    thresh: float = 1e-1,
    query_tile: int = 128,
    use_uniform: bool = False,
    use_exp: bool = False,
    temperature: float = 1.0,
    scale: float = 1.0 / 8.0,
    interpret: bool = False,
    stream_dtype: str = "float32",
) -> jnp.ndarray:
    """Fused rerank for the q/k-attention method (reference
    calc_similarity_vit/cvt, diml.py:206-320, full OT): the OT kernel comes
    from the pair's q·k attention map while the score contracts against the
    feature similarity — the kernel's separate-cost input carries the
    attention map.  q_bank/k_bank: (N, heads, T+1, D) raw projections of the
    probed block; marginals are the cls row/column of the pair's attention.
    """
    from .similarity import l2_normalize

    N, C, R = feature_bank.shape
    K = top_inds.shape[1]
    P = PAIR_LANES
    eps = 1e-5
    # per-image head-mean + L2 normalization happens once, not per pair
    q_mean = l2_normalize(jnp.mean(q_bank, axis=1), axis=-1)  # (N, T+1, D)
    k_mean = l2_normalize(jnp.mean(k_bank, axis=1), axis=-1)
    nt = -(-N // query_tile)
    idx_all = (jnp.arange(nt * query_tile) % N).reshape(nt, query_tile)

    def tile(idx):
        inds = top_inds[idx]
        # dp[t, k, s, m] = k_mean[gallery s-token] . q_mean[anchor m-token]
        dp = jnp.einsum(
            "tmc,tksc->tksm", q_mean[idx], k_mean[inds],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale
        if use_uniform:
            u = jnp.full((idx.shape[0], K, R), 1.0 / R, jnp.float32)
            v = u
        elif use_exp:
            u = jnp.exp(-jax.nn.relu(dp[:, :, 1:, 0]) / temperature)
            u = u / (jnp.sum(u, axis=-1, keepdims=True) + eps)
            v = jnp.exp(-jax.nn.relu(dp[:, :, 0, 1:]) / temperature)
            v = v / (jnp.sum(v, axis=-1, keepdims=True) + eps)
        else:
            u = jax.nn.relu(dp[:, :, 1:, 0])
            u = u / (jnp.sum(u, axis=-1, keepdims=True) + eps)
            v = jax.nn.relu(dp[:, :, 0, 1:])
            v = v / (jnp.sum(v, axis=-1, keepdims=True) + eps)
        return fused_rerank_tile(
            feature_bank[idx], feature_bank[inds], u, v,
            iters=iters, thresh=thresh, ot_temp=0.05, ot_part=1.0,
            interpret=interpret, P=P, cost=dp[:, :, 1:, 1:],
            stream_dtype=stream_dtype,
        )

    out = jax.lax.map(tile, idx_all)
    return out.reshape(nt * query_tile, K)[:N]


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "query_tile", "use_uniform",
        "use_inverse", "use_minus", "use_soft", "use_cls_token", "temperature",
        "interpret", "stream_dtype",
    ),
)
def fused_featvit_rerank_scores_qg(
    query_bank: jnp.ndarray,
    query_centers: jnp.ndarray,
    gallery_bank: jnp.ndarray,
    gallery_centers: jnp.ndarray,
    top_inds: jnp.ndarray,
    ot_temp: float = 0.05,
    iters: int = 100,
    thresh: float = 1e-1,
    query_tile: int = 128,
    use_uniform: bool = False,
    use_inverse: bool = False,
    use_minus: bool = False,
    use_soft: bool = False,
    use_cls_token: bool = False,
    temperature: float = 1.0,
    ot_part: float = 1.0,
    interpret: bool = False,
    stream_dtype: str = "float32",
) -> jnp.ndarray:
    """Query != gallery variant of :func:`fused_featvit_rerank_scores`
    (MSLS place recognition: distinct query/database sets, reference
    training_tools/val.py:162-187).  top_inds (Nq, K) index the gallery."""
    Nq = query_bank.shape[0]
    K = top_inds.shape[1]
    P = PAIR_LANES
    nt = -(-Nq // query_tile)
    idx_all = (jnp.arange(nt * query_tile) % Nq).reshape(nt, query_tile)

    def tile(idx):
        return _featvit_tile(
            gallery_bank, gallery_centers, top_inds, idx,
            iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
            use_uniform=use_uniform, use_inverse=use_inverse,
            use_minus=use_minus, use_soft=use_soft,
            use_cls_token=use_cls_token, temperature=temperature,
            interpret=interpret, P=P, stream_dtype=stream_dtype,
            query_bank=query_bank, query_centers=query_centers,
        )

    out = jax.lax.map(tile, idx_all)
    return out.reshape(nt * query_tile, K)[:Nq]


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "use_uniform", "use_inverse",
        "use_minus", "use_soft", "use_cls_token", "temperature", "interpret", "P",
        "stream_dtype",
    ),
)
def _featvit_tile(
    feature_bank, centers, top_inds, idx,
    iters, thresh, ot_temp, ot_part, use_uniform, use_inverse, use_minus,
    use_soft, use_cls_token, temperature, interpret, P,
    query_bank=None, query_centers=None, stream_dtype="float32",
):
    from .similarity import cross_attention_marginals, l2_normalize

    # query==gallery (DML eval) unless a separate query bank is given
    # (MSLS: distinct query/database sets, training_tools/val.py:74-118)
    if query_bank is None:
        query_bank, query_centers = feature_bank, centers
    K = top_inds.shape[1]
    R = feature_bank.shape[2]
    anchors = query_bank[idx]  # (T, C, R)
    fb_g = feature_bank[top_inds[idx]]  # (T, K, C, R)
    c_g = centers[top_inds[idx]]  # (T, K, C)

    def marg(anchor, anchor_center, fb, fbc):
        if not use_cls_token:
            anchor_center = jnp.mean(anchor, axis=1)
            fbc = jnp.mean(fb, axis=-1)
        anchor_center = l2_normalize(anchor_center, axis=-1)
        fbc = l2_normalize(fbc, axis=-1)
        u, v, _ = cross_attention_marginals(
            anchor, anchor_center, fb, fbc,
            use_uniform=use_uniform, use_inverse=use_inverse,
            use_minus=use_minus, use_soft=use_soft, temperature=temperature,
        )
        return u, v

    u, v = jax.vmap(marg)(anchors, query_centers[idx], fb_g, c_g)
    return fused_rerank_tile(
        anchors, fb_g, u, v,
        iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
        interpret=interpret, P=P, stream_dtype=stream_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "thresh", "ot_temp", "ot_part", "use_uniform", "interpret",
        "P", "stream_dtype", "pad_sublanes", "bank_dims",
    ),
)
def _rollout_tile(
    feature_bank, rollout, top_inds, idx,
    iters, thresh, ot_temp, ot_part, use_uniform, interpret, P,
    stream_dtype="float32", pad_sublanes=False, bank_dims=None,
):
    K = top_inds.shape[1]
    if bank_dims is not None:
        # feature_bank carries int32-packed bf16 rows (_pack_bank_pairs):
        # gather at 4-byte width, unpack to bf16 after (bit-exact view)
        C, R = bank_dims
        anchors = _unpack_bank_pairs(feature_bank[idx], C, R)
        fb_g = _unpack_bank_pairs(feature_bank[top_inds[idx]], C, R)
    else:
        R = feature_bank.shape[2]
        anchors = feature_bank[idx]
        fb_g = feature_bank[top_inds[idx]]  # (T, K, C, R)
    if use_uniform:
        u = jnp.full((idx.shape[0], K, R), 1.0 / R, jnp.float32)
        v = u
    else:
        u, v = rollout_marginals(rollout[idx], rollout[top_inds[idx]])
    return fused_rerank_tile(
        anchors, fb_g, u, v,
        iters=iters, thresh=thresh, ot_temp=ot_temp, ot_part=ot_part,
        interpret=interpret, P=P, stream_dtype=stream_dtype,
        pad_sublanes=pad_sublanes,
    )
