"""Kernel layer: pure-XLA reference implementations + Pallas fast paths."""

from .sinkhorn import sinkhorn, sinkhorn_partial, sinkhorn_plan_from_scores
from .similarity import (
    OTAux,
    calc_distance,
    calc_similarity,
    calc_similarity_featvit,
    calc_similarity_mhvit,
    calc_similarity_qk,
    calc_similarity_rollout,
    cross_attention_marginals,
    global_similarity,
    l2_normalize,
    patch_similarity,
)
from .pooling import adaptive_avg_pool2d, grid_resize_tokens, upsample_bilinear_ac
from .topk import pairwise_topk, similarity_matrix
