"""MSLS place-recognition losses (reference training_tools/loss.py, MIT
upstream lineage): relational KD (distance + angle), supervised contrastive,
Hinton KD over triplet logits, and cross-batch-memory (XBM) triplet losses.

The XBM losses' per-query variable-length positive/negative index sets become
boolean masks built host-side by the MSLS engine; everything else runs as one
masked device computation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_P = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def pdist(e: jnp.ndarray, squared: bool = False, eps: float = 1e-12) -> jnp.ndarray:
    """(reference loss.py:40-50): zero diagonal, eps-clamped."""
    sq = jnp.sum(e * e, axis=1)
    prod = jnp.einsum("ic,jc->ij", e, e, **_P)
    res = jnp.maximum(sq[:, None] + sq[None, :] - 2 * prod, eps)
    if not squared:
        res = jnp.sqrt(res)
    n = e.shape[0]
    return res * (1.0 - jnp.eye(n, dtype=res.dtype))


def rkd_distance(student: jnp.ndarray, teacher: jnp.ndarray) -> jnp.ndarray:
    """Relational KD on pairwise distances (loss.py:52-69)."""
    t_d = jax.lax.stop_gradient(pdist(teacher))
    t_mean = jnp.sum(t_d) / jnp.maximum(jnp.sum((t_d > 0).astype(jnp.float32)), 1.0)
    t_d = t_d / t_mean
    s_d = pdist(student)
    s_mean = jnp.sum(s_d) / jnp.maximum(jnp.sum((s_d > 0).astype(jnp.float32)), 1.0)
    s_d = s_d / s_mean
    return smooth_l1(s_d, t_d)


def rkd_angle(student: jnp.ndarray, teacher: jnp.ndarray) -> jnp.ndarray:
    """Relational KD on angles (loss.py:71-90)."""

    def angles(e):
        d = e[None, :, :] - e[:, None, :]  # (N, N, C)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=2, keepdims=True), 1e-12)
        return jnp.einsum("ijc,ikc->ijk", d, d, **_P).reshape(-1)

    t = jax.lax.stop_gradient(angles(teacher))
    s = angles(student)
    return smooth_l1(s, t)


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """Supervised contrastive loss (loss.py:94-180).  features (B, V, C)."""
    if features.ndim == 2:
        features = features[:, None, :]
    B, V, C = features.shape
    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(B, dtype=jnp.float32)
    elif labels is not None:
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast = features.transpose(1, 0, 2).reshape(V * B, C)
    if contrast_mode == "one":
        anchor = features[:, 0]
        a_count = 1
    elif contrast_mode == "all":
        anchor = contrast
        a_count = V
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = jnp.einsum("ic,jc->ij", anchor, contrast, **_P) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    mask = jnp.tile(mask, (a_count, V))
    # mask out self-contrast (anchor i vs contrast i)
    idx = jnp.arange(anchor.shape[0])
    logits_mask = jnp.ones((anchor.shape[0], B * V)).at[idx, idx].set(0.0)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / (jnp.sum(mask, axis=1) + 1e-8)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)


def hkd_loss(
    student_out: jnp.ndarray,
    teacher_out: jnp.ndarray,
    bs: int,
    temperature: float,
) -> jnp.ndarray:
    """Hinton KD over (query, positive, negatives) triplet logits
    (loss.py:185-219).  Inputs stacked [queries(bs), positives(bs), negs]."""
    n, d = student_out.shape
    n_neg = n - 2 * bs
    q_s, p_s, n_s = jnp.split(student_out, [bs, 2 * bs])
    q_t, p_t, n_t = jnp.split(teacher_out, [bs, 2 * bs])
    pn_s = jnp.concatenate([p_s[:, None, :], n_s.reshape(bs, -1, d)], axis=1)
    pn_t = jnp.concatenate([p_t[:, None, :], n_t.reshape(bs, -1, d)], axis=1)
    prob_s = jnp.einsum("bd,bkd->bk", q_s, pn_s, **_P)
    prob_t = jnp.einsum("bd,bkd->bk", q_t, pn_t, **_P)
    log_p_s = jax.nn.log_softmax(prob_s / temperature, axis=1)
    p_t_soft = jax.nn.softmax(prob_t / temperature, axis=1)
    # KLDivLoss(reduction='batchmean'): sum over classes / batch
    kl = jnp.sum(p_t_soft * (jnp.log(jnp.maximum(p_t_soft, 1e-30)) - log_p_s)) / bs
    return kl * temperature * temperature


def xbm_triplet_loss(
    inputs_col: jnp.ndarray,
    inputs_row: jnp.ndarray,
    query_rows: jnp.ndarray,
    pos_mask: jnp.ndarray,
    neg_mask: jnp.ndarray,
    margin: float = 0.1,
) -> jnp.ndarray:
    """Cross-batch-memory triplet loss (loss.py:221-300), mask-based.

    Args:
      inputs_col: (n, d) current batch embeddings (queries live here).
      inputs_row: (m, d) memory embeddings.
      query_rows: (nq,) indices of queries within inputs_col.
      pos_mask / neg_mask: (nq, m) bools marking each query's positives /
        allowed negatives within the memory (the engine builds these from the
        MSLS UTM metadata, replacing the reference's per-query isin() loops).
    """
    sim = jnp.einsum("nd,md->nm", inputs_col, inputs_row, **_P)
    qsim = sim[query_rows]  # (nq, m)
    inf = jnp.float32(jnp.inf)

    has_pos = jnp.any(pos_mask, axis=1)
    max_neg = jnp.max(jnp.where(neg_mask, qsim, -inf), axis=1)
    max_pos = jnp.max(jnp.where(pos_mask, qsim, -inf), axis=1)

    pos_keep = pos_mask & (qsim < (max_neg + margin)[:, None])
    neg_keep = neg_mask & (qsim > (jnp.maximum(0.4, max_pos) - margin)[:, None])

    npos = jnp.sum(pos_keep.astype(jnp.float32), axis=1)
    nneg = jnp.sum(neg_keep.astype(jnp.float32), axis=1)
    pos_loss = jnp.sum(jnp.where(pos_keep, 1.0 - qsim, 0.0), axis=1) / jnp.maximum(npos, 1.0)
    neg_loss = jnp.sum(jnp.where(neg_keep, qsim, 0.0), axis=1) / jnp.maximum(nneg, 1.0)
    per_q = jnp.where(has_pos, pos_loss + neg_loss, 0.0)
    return jnp.sum(per_q) / jnp.maximum(query_rows.shape[0], 1)


def ada_xbm_triplet_loss(
    inputs_col: jnp.ndarray,
    inputs_row: jnp.ndarray,
    query_rows: jnp.ndarray,
    pos_rows: jnp.ndarray,
    neg_mask: jnp.ndarray,
    margin: float = 0.1,
) -> jnp.ndarray:
    """Adaptive XBM triplet (loss.py:303-394): fixed positive per query, all
    violating memory negatives contribute a TripletMarginLoss term
    (margin = sqrt(0.1), p=2) normalized by the violation count."""
    sim = jnp.einsum("nd,md->nm", inputs_col, inputs_row, **_P)
    qsim = sim[query_rows]  # (nq, m)
    pos_sim = jnp.take_along_axis(
        qsim, pos_rows[:, None], axis=1
    )[:, 0]  # (nq,)
    violate = neg_mask & (qsim > (pos_sim - margin)[:, None])

    q = inputs_col[query_rows]  # (nq, d)
    p = inputs_row[pos_rows]  # (nq, d)
    d_ap = jnp.linalg.norm(q - p, axis=1)  # (nq,)
    # distance of each query to every memory row
    d_an = jnp.sqrt(
        jnp.maximum(
            jnp.sum(q**2, 1)[:, None] + jnp.sum(inputs_row**2, 1)[None, :]
            - 2 * jnp.einsum("nd,md->nm", q, inputs_row, **_P),
            1e-12,
        )
    )
    tl = jax.nn.relu(d_ap[:, None] - d_an + margin**0.5)
    total = jnp.sum(jnp.where(violate, tl, 0.0))
    count = jnp.sum(violate.astype(jnp.float32))
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def msls_triplet_loss(
    q: jnp.ndarray, p: jnp.ndarray, negs: jnp.ndarray, margin: float = 0.1
) -> jnp.ndarray:
    """Plain torch TripletMarginLoss(margin^0.5, p=2) over (q, p, nNeg negs)
    as used by the MSLS baseline epoch (training_tools/train_epoch.py:136-141).
    q, p: (B, d); negs: (B, nNeg, d)."""
    d_ap = jnp.linalg.norm(q - p, axis=-1)  # (B,)
    d_an = jnp.linalg.norm(q[:, None, :] - negs, axis=-1)  # (B, nNeg)
    return jnp.mean(jax.nn.relu(d_ap[:, None] - d_an + margin**0.5))
