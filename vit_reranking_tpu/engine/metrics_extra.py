"""RevisitDML evaluation-metric suite (the reference's `--evaluation_metrics`
flags, parameters.py:57-59): e_recall@k, NMI, F1, mAP variants, intra/inter
distances, rho-spectrum.  The reference consumes these through an external
`metric_computer` that is absent from its repo; semantics follow the
RevisitDML convention the flags name."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.kmeans import kmeans
from ..ops.topk import pairwise_topk


def e_recall_at_k(top_labels: np.ndarray, query_labels: np.ndarray, k: int) -> float:
    """Fraction of queries with >=1 same-class item in the top-k."""
    hit = (top_labels[:, :k] == query_labels[:, None]).any(axis=1)
    return float(hit.mean())


def nmi_score(assignments: np.ndarray, labels: np.ndarray) -> float:
    """Normalized mutual information between cluster assignments and labels."""
    from sklearn.metrics import normalized_mutual_info_score

    return float(normalized_mutual_info_score(labels, assignments))


def f1_score_clusters(assignments: np.ndarray, labels: np.ndarray) -> float:
    """Pairwise F1 over co-cluster / co-class agreement (RevisitDML f1)."""
    a = assignments[:, None] == assignments[None, :]
    l = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(labels), k=1)
    a, l = a[iu], l[iu]
    tp = np.sum(a & l)
    precision = tp / max(np.sum(a), 1)
    recall = tp / max(np.sum(l), 1)
    return float(2 * precision * recall / max(precision + recall, 1e-12))


def mean_average_precision(
    top_labels: np.ndarray, query_labels: np.ndarray, n_pos: np.ndarray, mode: str = "c"
) -> float:
    """mAP variants: 'c' caps at each query's class count (mAP_c), 'lim' at
    min(class count, available), '1000' at 1000 retrievals."""
    Q, K = top_labels.shape
    eq = (top_labels == query_labels[:, None]).astype(np.float64)
    ks = np.arange(1, K + 1)
    prec = np.cumsum(eq, axis=1) / ks[None, :]
    if mode == "1000":
        cap = np.full(Q, min(1000, K))
    else:
        cap = np.minimum(n_pos, K)
    mask = ks[None, :] <= cap[:, None]
    ap = np.sum(prec * eq * mask, axis=1) / np.maximum(np.sum(eq * mask, axis=1), 1)
    return float(ap.mean())


def dist_stats(embeds: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """dists@intra / dists@inter / dists@intra_over_inter."""
    x = jnp.asarray(embeds)
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum(x * x, 1)[:, None] + jnp.sum(x * x, 1)[None, :]
            - 2 * jnp.einsum("ic,jc->ij", x, x, preferred_element_type=jnp.float32),
            0,
        )
    )
    d = np.asarray(d)
    same = labels[:, None] == labels[None, :]
    iu = np.triu_indices(len(labels), k=1)
    same_u, d_u = same[iu], d[iu]
    intra = float(d_u[same_u].mean()) if same_u.any() else 0.0
    inter = float(d_u[~same_u].mean()) if (~same_u).any() else 0.0
    return {
        "dists@intra": intra,
        "dists@inter": inter,
        "dists@intra_over_inter": intra / max(inter, 1e-12),
    }


def rho_spectrum(embeds: np.ndarray, k: int = 1) -> float:
    """KL(uniform || normalized singular-value spectrum with the top |k|
    values removed); rho_spectrum@0 keeps the full spectrum, @-1 removes none
    and is reported on the raw spectrum (RevisitDML convention)."""
    s = np.linalg.svd(embeds - embeds.mean(0), compute_uv=False)
    if k > 0:
        s = s[k:]
    p = s / max(s.sum(), 1e-12)
    p = np.maximum(p, 1e-12)
    u = np.full_like(p, 1.0 / len(p))
    return float(np.sum(u * np.log(u / p)))


def compute_standard(
    embeds: np.ndarray,
    labels: np.ndarray,
    metrics: Sequence[str] = (
        "e_recall@1", "e_recall@2", "e_recall@4", "nmi", "f1",
        "mAP_1000", "mAP_lim", "mAP_c",
        "dists@intra", "dists@inter", "dists@intra_over_inter",
        "rho_spectrum@0", "rho_spectrum@-1", "rho_spectrum@1", "rho_spectrum@2",
        "rho_spectrum@10",
    ),
    seed: int = 0,
) -> Dict[str, float]:
    """One-stop computation of every requested metric on (N, D) embeddings."""
    labels = np.asarray(labels)
    n_classes = len(np.unique(labels))
    N = len(labels)
    want = set(metrics)
    out: Dict[str, float] = {}

    recall_ks = sorted(int(m.split("@")[1]) for m in want if m.startswith("e_recall@"))
    need_rank = recall_ks or any(m.startswith("mAP") for m in want)
    if need_rank:
        _, counts = np.unique(labels, return_counts=True)
        kmax = int(min(N - 1, max(recall_ks + [counts.max(), 1000 if "mAP_1000" in want else 0])))
        x = jnp.asarray(embeds)
        _, inds = pairwise_topk(x, x, k=kmax, mask_self=True)
        top_labels = labels[np.asarray(inds)]
        n_pos = np.asarray([(labels == l).sum() - 1 for l in labels])
        for k in recall_ks:
            out[f"e_recall@{k}"] = e_recall_at_k(top_labels, labels, k)
        if "mAP_c" in want:
            out["mAP_c"] = mean_average_precision(top_labels, labels, n_pos, "c")
        if "mAP_lim" in want:
            out["mAP_lim"] = mean_average_precision(top_labels, labels, n_pos, "lim")
        if "mAP_1000" in want:
            out["mAP_1000"] = mean_average_precision(top_labels, labels, n_pos, "1000")

    if "nmi" in want or "f1" in want:
        _, assign = kmeans(
            jnp.asarray(embeds), n_classes, jax.random.PRNGKey(seed), iters=25
        )
        assign = np.asarray(assign)
        if "nmi" in want:
            out["nmi"] = nmi_score(assign, labels)
        if "f1" in want:
            out["f1"] = f1_score_clusters(assign, labels)

    if any(m.startswith("dists@") for m in want):
        out.update({k: v for k, v in dist_stats(embeds, labels).items() if k in want})
    for m in want:
        if m.startswith("rho_spectrum@"):
            out[m] = rho_spectrum(embeds, k=int(m.split("@")[1]))
    return out
