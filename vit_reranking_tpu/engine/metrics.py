"""Retrieval metrics — Recall@1, R-Precision, MAP@R — fully batched on device.

Protocol matches reference evaluation/metrics.py:3-47 exactly, including the
convention that ``num_pos`` counts the query itself (the self-match is pushed to
the bottom of the ranking by the caller's ``sim[idx] = -100`` mask, reference
evaluation/eval_cvt_diml.py:327).  Instead of the reference's per-query Python
loop, everything here is a masked (Q, N) computation under jit.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def metrics_from_ranks(
    final_tops: jnp.ndarray,
    query_labels: jnp.ndarray,
    gallery_labels: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Per-query metrics from ranked gallery indices.

    Args:
      final_tops: (Q, N) int — gallery indices in descending score order
        (reference `get_metrics_rank`, evaluation/metrics.py:26-47).
      query_labels: (Q,)
      gallery_labels: (N,)

    Returns per-query arrays `r1`, `rp`, `mapr`, each (Q,) float32.
    """
    Q, N = final_tops.shape
    g = gallery_labels[final_tops]  # (Q, N) labels in rank order
    eq = (g == query_labels[:, None]).astype(jnp.float32)

    r1 = eq[:, 0]
    num_pos = jnp.sum(
        (gallery_labels[None, :] == query_labels[:, None]).astype(jnp.float32), axis=-1
    )  # includes the query itself, like the reference
    ks = jnp.arange(N, dtype=jnp.float32)
    kmask = (ks[None, :] < num_pos[:, None]).astype(jnp.float32)

    rp = jnp.sum(eq * kmask, axis=-1) / num_pos
    precision_at_k = jnp.cumsum(eq, axis=-1) * eq / (ks[None, :] + 1.0)
    mapr = jnp.sum(precision_at_k * kmask, axis=-1) / num_pos
    return {"r1": r1, "rp": rp, "mapr": mapr}


def metrics_from_scores(
    sims: jnp.ndarray,
    query_labels: jnp.ndarray,
    gallery_labels: jnp.ndarray,
    mask_diagonal: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Metrics straight from a (Q, N) score matrix (reference `get_metrics`).

    With ``mask_diagonal`` the self-similarity is set to -100 before ranking
    (queries assumed to be the gallery in the same order), matching
    train_baseline.py:275-278.
    """
    if mask_diagonal:
        Q, N = sims.shape
        sims = jnp.where(jnp.eye(N, dtype=bool)[:Q], -100.0, sims)
    tops = jnp.argsort(-sims, axis=-1)
    return metrics_from_ranks(tops, query_labels, gallery_labels)


def summarize(per_query: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Dataset-level numbers in percent, matching the reference's
    division by N/100 (evaluation/eval_cvt_diml.py:402-405)."""
    return {k: float(jnp.mean(v)) * 100.0 for k, v in per_query.items()}


def recall_at_ks(
    ranked_gallery_indices: jnp.ndarray,
    positives_mask: jnp.ndarray,
    ks: Sequence[int] = (1, 5, 10, 20, 50, 100),
) -> Dict[int, float]:
    """MSLS-style Recall@N: a query scores at k if ANY of its top-k ranked
    gallery items is a true positive (reference training_tools/val.py:211-251).

    Args:
      ranked_gallery_indices: (Q, >=max(ks)) ranked indices.
      positives_mask: (Q, N_gallery) bool — UTM ground truth.
    """
    ks = sorted(ks)
    kmax = ks[-1]
    top = ranked_gallery_indices[:, :kmax]
    hit = jnp.take_along_axis(positives_mask, top, axis=1)  # (Q, kmax)
    any_hit = jnp.cumsum(hit.astype(jnp.int32), axis=1) > 0
    has_pos = positives_mask.any(axis=1)
    n_valid = jnp.maximum(jnp.sum(has_pos.astype(jnp.float32)), 1.0)
    out = {}
    for k in ks:
        out[k] = float(jnp.sum(jnp.where(has_pos, any_hit[:, k - 1], False)) / n_valid * 100.0)
    return out
