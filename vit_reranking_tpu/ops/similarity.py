"""DIML structural-similarity rerank kernels (the `calc_similarity*` family).

TPU-native re-design of reference utilities/diml.py:77-472.  All functions are
pure, jit-able, and vmap-able over the query axis; the evaluation engine vmaps
them over tiles of queries so the whole rerank runs as one compiled program
instead of the reference's per-query Python loop.

Conventions (match the reference exactly for parity):
  * anchor (query) patch features:  ``(C, R)``  — channels x patches
  * feature bank (gallery) tile:    ``(N, C, R)``
  * patch-similarity tensor:        ``S[n, s, m] = fb[n, :, s] . anchor[:, m]``
    i.e. rows index gallery patches, columns index anchor patches
    (einsum 'cm,ncs->nsm', reference diml.py:100)
  * marginal u is over gallery patches (rows), v over anchor patches (cols)
  * OT kernel: ``K = exp(-(1 - S) / ot_temp)``, ot_temp default 0.05
  * rerank score: ``sum(T * S)`` over both patch axes
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .sinkhorn import sinkhorn, sinkhorn_partial

_EPS = 1e-5


class OTAux(NamedTuple):
    """Visualization payload mirroring the reference's `(u, v, T, sim_r, cc)` tuple."""

    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray
    sim_r: jnp.ndarray
    cc: Optional[jnp.ndarray]


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def global_similarity(anchor_center: jnp.ndarray, fb_center: jnp.ndarray) -> jnp.ndarray:
    """Stage-0 global cosine similarity: (C,) x (N, C) -> (N,).

    Reference diml.py:84 (`einsum('c,nc->n')`).
    """
    return jnp.einsum("c,nc->n", anchor_center, fb_center, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _normalized_marginal(att: jnp.ndarray) -> jnp.ndarray:
    return att / (jnp.sum(att, axis=-1, keepdims=True) + _EPS)


def cross_attention_marginals(
    anchor: jnp.ndarray,
    anchor_center: jnp.ndarray,
    fb: jnp.ndarray,
    fb_center: jnp.ndarray,
    *,
    use_uniform: bool = False,
    use_inverse: bool = False,
    use_minus: bool = False,
    use_soft: bool = False,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Build OT marginals (u over gallery patches, v over anchor patches).

    Variants mirror reference diml.py:104-133:
      uniform: 1/R everywhere.
      inverse: relu(cross-attention) -> exp(-att / temperature) -> normalize.
      minus:   1 - relu(cross-attention) -> normalize.
      soft:    softmax(cross-attention) -> normalize.
      default: relu(cross-attention) -> normalize.

    Returns ``(u, v, cc)`` with cc the raw cross-correlation kept for
    visualization in some variants (None otherwise).
    """
    N, _, R = fb.shape
    dtype = jnp.float32
    # saliency of each gallery patch w.r.t. the anchor's global embedding
    att_u = jnp.einsum(
        "c,ncr->nr", anchor_center, fb,
        preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
    )
    # saliency of each anchor patch w.r.t. each gallery's global embedding
    att_v = jnp.einsum(
        "cr,nc->nr", anchor, fb_center,
        preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
    )

    cc = None
    if use_uniform:
        u = jnp.full((N, R), 1.0 / R, dtype)
        v = jnp.full((N, R), 1.0 / R, dtype)
    elif use_minus:
        # note: minus overrides inverse in the reference (diml.py:80-81)
        cc = att_u
        u = _normalized_marginal(1.0 - jax.nn.relu(att_u))
        v = _normalized_marginal(1.0 - jax.nn.relu(att_v))
    elif use_inverse:
        u = _normalized_marginal(jnp.exp(-jax.nn.relu(att_u) / temperature))
        v = _normalized_marginal(jnp.exp(-jax.nn.relu(att_v) / temperature))
    elif use_soft:
        cc = att_v
        u = _normalized_marginal(jax.nn.softmax(att_u, axis=-1))
        v = _normalized_marginal(jax.nn.softmax(att_v, axis=-1))
    else:
        cc = att_v
        u = _normalized_marginal(jax.nn.relu(att_u))
        v = _normalized_marginal(jax.nn.relu(att_v))
    return u, v, cc


def patch_similarity(anchor: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
    """S[n, s, m] = fb patch s . anchor patch m  (reference diml.py:100)."""
    return jnp.einsum("cm,ncs->nsm", anchor, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _ot_plan(S, u, v, ot_temp, ot_part, iters, thresh):
    K = jnp.exp(-(1.0 - S) / ot_temp)
    if ot_part > 0.999:
        T = sinkhorn(K, u, v, iters=iters, thresh=thresh)
        return T, T
    T_ext = sinkhorn_partial(K, u, v, ot_part=ot_part, iters=iters, thresh=thresh)
    R = S.shape[-1]
    return T_ext[..., :R, :R], T_ext


def calc_similarity(
    anchor: Optional[jnp.ndarray],
    anchor_center: jnp.ndarray,
    fb: Optional[jnp.ndarray],
    fb_center: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    use_inverse: bool = False,
    temperature: float = 1.0,
    use_cls_token: bool = False,
    ot_temp: float = 0.05,
    use_minus: bool = False,
    ot_part: float = 1.0,
    use_soft: bool = False,
    iters: int = 100,
    thresh: float = 1e-1,
) -> Tuple[jnp.ndarray, Optional[OTAux]]:
    """THE rerank kernel (reference utilities/diml.py:77-147).

    stage 0: global cosine similarity of centers.
    stage 1: OT-weighted patch similarity ``sum(T * S)`` with marginals from
    cross-attention saliency (or the uniform/inverse/minus/soft variants).
    """
    if stage == 0:
        return global_similarity(anchor_center, fb_center), None

    if not use_cls_token:
        anchor_center = jnp.mean(anchor, axis=1)
        fb_center = jnp.mean(fb, axis=-1)
    anchor_center = l2_normalize(anchor_center, axis=-1)
    fb_center = l2_normalize(fb_center, axis=-1)

    S = patch_similarity(anchor, fb)
    u, v, cc = cross_attention_marginals(
        anchor,
        anchor_center,
        fb,
        fb_center,
        use_uniform=use_uniform,
        use_inverse=use_inverse,
        use_minus=use_minus,
        use_soft=use_soft,
        temperature=temperature,
    )
    T, T_ext = _ot_plan(S, u, v, ot_temp, ot_part, iters, thresh)
    sim_r = T * S
    sim = jnp.sum(sim_r, axis=(-2, -1))
    T_out = T if ot_part > 0.999 else T_ext
    return sim, OTAux(u, v, T_out, sim_r, cc)


def calc_similarity_rollout(
    anchor_center: jnp.ndarray,
    anchor: jnp.ndarray,
    anchor_rollout: jnp.ndarray,
    fb_center: jnp.ndarray,
    fb: jnp.ndarray,
    fb_rollout: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    ot_temp: float = 0.05,
    use_ot: bool = True,
    ot_part: float = 1.0,
    iters: int = 100,
    thresh: float = 1e-1,
) -> Tuple[jnp.ndarray, Optional[OTAux]]:
    """Rerank with attention-rollout saliency marginals — the `--use_rollout`
    flagship path (reference utilities/diml.py:323-366, readme.md:11).

    ``anchor_rollout (R,)`` and ``fb_rollout (N, R)`` are per-image rollout
    saliency vectors (see ops/rollout.py).
    """
    if stage == 0:
        return global_similarity(anchor_center, fb_center), None

    N, _, R = fb.shape
    S = patch_similarity(anchor, fb)
    if use_uniform:
        u = jnp.full((N, R), 1.0 / R, jnp.float32)
        v = jnp.full((N, R), 1.0 / R, jnp.float32)
    else:
        u = _normalized_marginal(jax.nn.relu(fb_rollout.astype(jnp.float32)))
        v_att = jax.nn.relu(jnp.broadcast_to(anchor_rollout.astype(jnp.float32), (N, R)))
        v = _normalized_marginal(v_att)
    T, T_ext = _ot_plan(S, u, v, ot_temp, ot_part, iters, thresh)
    sim_r = T * S
    sim = jnp.sum(sim_r, axis=(-2, -1))
    T_out = T if ot_part > 0.999 else T_ext
    return sim, OTAux(u, v, T_out, sim_r, None)


def calc_distance(
    anchor: jnp.ndarray,
    anchor_center: jnp.ndarray,
    fb: jnp.ndarray,
    fb_center: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    use_exp: bool = True,
    temperature: float = 1.0,
    use_cls_token: bool = False,
    iters: int = 100,
    thresh: float = 1e-1,
):
    """L2-distance analog used by DIML training-style evaluation
    (reference utilities/diml.py:149-203).

    Note the reference transposes here: S uses 'cm,ncs->nms' (anchor rows) and
    runs ``Sinkhorn(K, v, u)``; we reproduce that orientation.
    """
    if stage == 0:
        d = jnp.sqrt(jnp.sum((anchor_center - fb_center) ** 2, axis=-1) + 1e-6)
        return d, None

    N, C, R = fb.shape
    if not use_cls_token:
        anchor_center = jnp.mean(anchor, axis=-1)
        fb_center = jnp.mean(fb, axis=-1)
    anchor_center = l2_normalize(anchor_center, axis=-1)
    fb_center = l2_normalize(fb_center, axis=-1)
    anchor = l2_normalize(anchor, axis=0)
    fb = l2_normalize(fb, axis=1)

    # anchor rows, gallery cols in this variant
    S = jnp.einsum("cm,ncs->nms", anchor, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    diff = anchor[None, :, :, None] - fb[:, :, None, :]  # (N, C, R_a, R_f)
    dist = jnp.sqrt(jnp.sum(diff**2, axis=1) + 1e-6)  # (N, R_a, R_f)

    K = jnp.exp(-(1.0 - S) / 0.05)

    att_u = jax.nn.relu(jnp.einsum("c,ncr->nr", anchor_center, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
    att_v = jax.nn.relu(jnp.einsum("cr,nc->nr", anchor, fb_center, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
    if use_uniform:
        u = jnp.full((N, R), 1.0 / R, jnp.float32)
        v = jnp.full((N, R), 1.0 / R, jnp.float32)
    elif use_exp:
        u = _normalized_marginal(jnp.exp(-att_u / temperature))
        v = _normalized_marginal(jnp.exp(-att_v / temperature))
    else:
        u = _normalized_marginal(att_u)
        v = _normalized_marginal(att_v)

    # reference swaps marginals for this orientation: Sinkhorn(K, v, u)
    T = sinkhorn(K, v, u, iters=iters, thresh=thresh)
    d = jnp.sum(T * dist, axis=(-2, -1))
    return d, (u, v, jnp.swapaxes(T, -1, -2), jnp.swapaxes(S, -1, -2))


def calc_similarity_qk(
    anchor_center: jnp.ndarray,
    anchor: jnp.ndarray,
    anchor_q: jnp.ndarray,
    fb_center: jnp.ndarray,
    fb: jnp.ndarray,
    fb_k: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    use_exp: bool = False,
    temperature: float = 1.0,
    scale: float = 1.0 / 8.0,
    use_ot: bool = True,
    iters: int = 100,
    thresh: float = 1e-1,
):
    """Marginals from raw q/k attention of a chosen transformer block.

    Unifies reference `calc_similarity_vit` (diml.py:206-263, scale=1/8) and
    `calc_similarity_cvt` (diml.py:266-320, scale=1).  ``anchor_q`` is the
    query projection of the anchor image ``(heads, R+1, D)``, ``fb_k`` the key
    projections of the gallery tile ``(N, R+1, heads, D)``-or-(N, heads, R+1, D)
    — we take mean over heads like the reference (q.mean(0), k.mean(1)).
    With ``use_ot=False`` the plan is the dual-softmax
    ``softmax(dp, -1) * softmax(dp, -2)`` (diml.py:309-312).
    """
    if stage == 0:
        return global_similarity(anchor_center, fb_center), None

    N, _, R = fb.shape
    S = patch_similarity(anchor, fb)

    q = jnp.mean(anchor_q, axis=0)  # (R+1, D)
    k = jnp.mean(fb_k, axis=1)  # (N, R+1, D)
    q = l2_normalize(q, axis=-1)
    k = l2_normalize(k, axis=-1)
    dp = jnp.einsum("mc,nsc->nsm", q, k, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) * scale

    dp_patch = dp[:, 1:, 1:]
    if use_ot:
        K = jnp.exp(-(1.0 - dp_patch) / 0.05)
        if use_uniform:
            u = jnp.full((N, R), 1.0 / R, jnp.float32)
            v = jnp.full((N, R), 1.0 / R, jnp.float32)
        elif use_exp:
            u = _normalized_marginal(jnp.exp(-jax.nn.relu(dp[:, 1:, 0]) / temperature))
            v = _normalized_marginal(jnp.exp(-jax.nn.relu(dp[:, 0, 1:]) / temperature))
        else:
            u = _normalized_marginal(jax.nn.relu(dp[:, 1:, 0]))
            v = _normalized_marginal(jax.nn.relu(dp[:, 0, 1:]))
        T = sinkhorn(K, u, v, iters=iters, thresh=thresh)
    else:
        u = jnp.full((N, R), 1.0 / R, jnp.float32)
        v = jnp.full((N, R), 1.0 / R, jnp.float32)
        T = jax.nn.softmax(dp_patch, axis=-1) * jax.nn.softmax(dp_patch, axis=-2)

    sim_r = T * S
    sim = jnp.sum(sim_r, axis=(-2, -1))
    return sim, OTAux(u, v, T, sim_r, None)


def calc_similarity_featvit(
    anchor_feat: jnp.ndarray,
    fb_feat: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    use_self: bool = False,
    use_cam: bool = False,
    anchor_cam: Optional[jnp.ndarray] = None,
    fb_cam: Optional[jnp.ndarray] = None,
    grid: Optional[int] = None,
    iters: int = 100,
    thresh: float = 1e-1,
):
    """ViT token-feature rerank: cls token is the center, rest are patches.

    Reference utilities/diml.py:368-422.  ``anchor_feat (C, R+1)``,
    ``fb_feat (N, C, R+1)`` with the cls token at patch index 0.  ``use_self``
    derives marginals from each image's own cls<->patch attention; ``use_cam``
    uses precomputed Grad-CAM maps pooled to the grid.
    """
    anchor_center = anchor_feat[:, 0]
    fb_center = fb_feat[:, :, 0]
    if stage == 0:
        return global_similarity(anchor_center, fb_center), None

    anchor = anchor_feat[:, 1:]
    fb = fb_feat[:, :, 1:]
    N, _, R = fb.shape
    S = patch_similarity(anchor, fb)

    if use_uniform:
        u = jnp.full((N, R), 1.0 / R, jnp.float32)
        v = jnp.full((N, R), 1.0 / R, jnp.float32)
    elif use_self:
        u = _normalized_marginal(
            jax.nn.relu(jnp.einsum("nc,ncr->nr", fb_center, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
        )
        v_row = _normalized_marginal(
            jax.nn.relu(jnp.einsum("c,cr->r", anchor_center, anchor, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))[None, :]
        )
        v = jnp.broadcast_to(v_row, (N, R))
    elif use_cam:
        if anchor_cam is None or fb_cam is None:
            raise ValueError("CAM map is none")
        from .pooling import adaptive_avg_pool2d  # local import to avoid cycle

        g = int(R**0.5)
        u = adaptive_avg_pool2d(fb_cam[:, None], (g, g)).reshape(N, R)
        u = _normalized_marginal(u)
        a = adaptive_avg_pool2d(anchor_cam[None, None], (g, g)).reshape(1, R)
        v = jnp.broadcast_to(_normalized_marginal(a), (N, R))
    else:
        u = _normalized_marginal(
            jax.nn.relu(jnp.einsum("c,ncr->nr", anchor_center, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
        )
        v = _normalized_marginal(
            jax.nn.relu(jnp.einsum("cr,nc->nr", anchor, fb_center, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
        )

    K = jnp.exp(-(1.0 - S) / 0.05)
    T = sinkhorn(K, u, v, iters=iters, thresh=thresh)
    sim_r = T * S
    sim = jnp.sum(sim_r, axis=(-2, -1))
    return sim, OTAux(u, v, T, sim_r, None)


def calc_similarity_mhvit(
    anchor_feat: jnp.ndarray,
    fb_feat: jnp.ndarray,
    stage: int,
    use_uniform: bool = False,
    nhead: int = 12,
    iters: int = 100,
    thresh: float = 1e-1,
):
    """Per-head OT, max over heads of T*S (reference utilities/diml.py:424-472).

    Heads run as one batched Sinkhorn (N*h batch) instead of the reference's
    per-head Python loop.
    """
    anchor_center = anchor_feat[:, 0]
    fb_center = fb_feat[:, :, 0]
    if stage == 0:
        return global_similarity(anchor_center, fb_center), None

    anchor = anchor_feat[:, 1:]
    fb = fb_feat[:, :, 1:]
    N, C, R = fb.shape
    ndim = C // nhead

    a_c = anchor_center.reshape(nhead, ndim)
    f_c = fb_center.reshape(N, nhead, ndim)
    a = anchor.reshape(nhead, ndim, R)
    f = fb.reshape(N, nhead, ndim, R)

    S = jnp.einsum("hdm,nhds->nhsm", a, f, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    K = jnp.exp(-(1.0 - S) / 0.05)

    if use_uniform:
        u = jnp.full((N, nhead, R), 1.0 / R, jnp.float32)
        v = jnp.full((N, nhead, R), 1.0 / R, jnp.float32)
    else:
        att_u = jax.nn.relu(jnp.einsum("hd,nhdr->nhr", a_c, f, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
        att_v = jax.nn.relu(jnp.einsum("hdr,nhd->nhr", a, f_c, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST))
        u = att_u / (jnp.sum(att_u, axis=2, keepdims=True) + _EPS)
        v = att_v / (jnp.sum(att_v, axis=2, keepdims=True) + _EPS)

    # batched over (N, heads); per-head early-exit mask like the reference's
    # per-head Sinkhorn calls
    T = jax.vmap(lambda Kh, uh, vh: sinkhorn(Kh, uh, vh, iters=iters, thresh=thresh), in_axes=1, out_axes=1)(
        K, u, v
    )
    weighted = T * S
    sim = jnp.sum(jnp.max(weighted, axis=1), axis=(-2, -1))
    return sim, (u, v)
