"""Training + evaluation engines."""

from .metrics import metrics_from_ranks, metrics_from_scores, recall_at_ks, summarize
