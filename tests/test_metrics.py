"""Retrieval metric tests vs hand-computed rankings and a torch-style loop oracle."""

import numpy as np
import jax.numpy as jnp

from vit_reranking_tpu.engine.metrics import (
    metrics_from_ranks,
    metrics_from_scores,
    recall_at_ks,
    summarize,
)


def loop_oracle(tops, query_label, gallery_labels):
    """Per-query loop mirroring reference evaluation/metrics.py:26-47."""
    r1 = 1.0 if gallery_labels[tops[0]] == query_label else 0.0
    num_pos = int(np.sum(gallery_labels == query_label))
    eq = (gallery_labels[tops[:num_pos]] == query_label).astype(np.float64)
    rp = eq.sum() / num_pos
    prec = np.cumsum(eq) * eq / (np.arange(num_pos) + 1)
    mapr = prec.mean()
    return r1, rp, mapr


def test_matches_loop_oracle():
    rng = np.random.default_rng(0)
    N = 40
    labels = rng.integers(0, 5, N)
    sims = rng.standard_normal((N, N)).astype(np.float32)
    out = metrics_from_scores(jnp.asarray(sims), jnp.asarray(labels), jnp.asarray(labels))
    masked = sims.copy()
    np.fill_diagonal(masked, -100.0)
    for q in range(N):
        tops = np.argsort(-masked[q], kind="stable")
        r1, rp, mapr = loop_oracle(tops, labels[q], labels)
        assert abs(float(out["r1"][q]) - r1) < 1e-6
        assert abs(float(out["rp"][q]) - rp) < 1e-5
        assert abs(float(out["mapr"][q]) - mapr) < 1e-5


def test_perfect_ranking():
    # gallery sorted so all positives come first -> rp = mapr = 1
    labels = np.array([0, 0, 0, 1, 1, 1])
    tops = np.array([[0, 1, 2, 3, 4, 5]])
    out = metrics_from_ranks(jnp.asarray(tops), jnp.asarray(labels[:1]), jnp.asarray(labels))
    assert float(out["r1"][0]) == 1.0
    assert float(out["rp"][0]) == 1.0
    assert float(out["mapr"][0]) == 1.0


def test_summarize_percent_scaling():
    per_q = {"r1": jnp.asarray([1.0, 0.0, 1.0, 1.0])}
    assert abs(summarize(per_q)["r1"] - 75.0) < 1e-6


def test_recall_at_ks():
    # 3 queries, 6 gallery items; positives masks
    ranked = jnp.asarray([[0, 1, 2, 3, 4, 5], [5, 4, 3, 2, 1, 0], [2, 0, 1, 3, 4, 5]])
    pos = np.zeros((3, 6), bool)
    pos[0, 0] = True  # hit @1
    pos[1, 0] = True  # ranked last -> only hit @6
    pos[2, 1] = True  # ranked third -> hit @5? index 1 is at rank 2 (0-based)
    out = recall_at_ks(ranked, jnp.asarray(pos), ks=(1, 5))
    assert abs(out[1] - 100.0 / 3) < 1e-4
    assert abs(out[5] - 200.0 / 3) < 1e-4


def test_metrics_extra_hand_values():
    """Value oracles for the RevisitDML metric suite (hand-computed)."""
    from vit_reranking_tpu.engine.metrics_extra import (
        dist_stats,
        e_recall_at_k,
        f1_score_clusters,
        mean_average_precision,
    )

    # e_recall@k: q0 hits at rank1, q1 at rank2, q2 never
    top_labels = np.array([[1, 0, 0], [0, 2, 0], [0, 1, 0]])
    q_labels = np.array([1, 2, 3])
    assert e_recall_at_k(top_labels, q_labels, 1) == 1.0 / 3
    assert e_recall_at_k(top_labels, q_labels, 2) == 2.0 / 3
    assert e_recall_at_k(top_labels, q_labels, 3) == 2.0 / 3

    # pairwise F1: labels {0,0,1,1}, clusters {0,1,1,1}
    # co-class pairs: (0,1),(2,3) -> 2 ; co-cluster pairs: (1,2),(1,3),(2,3) -> 3
    # tp (both): (2,3) -> 1 ; precision 1/3, recall 1/2, F1 = 2*(1/6)/(5/6)=0.4
    f1 = f1_score_clusters(np.array([0, 1, 1, 1]), np.array([0, 0, 1, 1]))
    assert abs(f1 - 0.4) < 1e-12

    # mAP_c: q0 has n_pos=2, hits at ranks 1 and 3 (rank3 > cap=2 -> dropped)
    # AP = (1/1) / 1 = 1.0 ; q1 n_pos=1, hit at rank 2 > cap=1 -> AP = 0
    tl = np.array([[5, 0, 5], [0, 7, 0]])
    ql = np.array([5, 7])
    n_pos = np.array([2, 1])
    mapc = mean_average_precision(tl, ql, n_pos, mode="c")
    assert abs(mapc - 0.5) < 1e-12

    # dist_stats on colinear points: labels {0,0,1} at x=0,1,3
    emb = np.array([[0.0], [1.0], [3.0]], np.float32)
    labs = np.array([0, 0, 1])
    ds = dist_stats(emb, labs)
    assert abs(ds["dists@intra"] - 1.0) < 1e-5          # |0-1|
    assert abs(ds["dists@inter"] - 2.5) < 1e-5          # (|0-3|+|1-3|)/2
    assert abs(ds["dists@intra_over_inter"] - 0.4) < 1e-5
