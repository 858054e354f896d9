"""vit_reranking_tpu — a TPU-native (JAX/XLA/Pallas/pjit) retrieval + reranking framework.

Built from scratch with the capabilities of the PyTorch reference `cazhang/vit-reranking`:
deep-metric-learning image retrieval (margin loss + distance-weighted mining) with
DIML-style structural reranking (entropic Sinkhorn optimal transport over patch-token
cost matrices, with cross-attention / attention-rollout marginals), plus the MSLS
place-recognition stack (NetVLAD teacher -> CvT student distillation).

Layer map (mirrors SURVEY.md section 7):
    core/      typed configs, PRNG plumbing, checkpointing, torch->jax converters, logging
    parallel/  device mesh + sharding utilities (data axis over ICI; spare model axis)
    ops/       kernel layer: batched Sinkhorn OT (XLA + Pallas), similarity family,
               attention rollout, blocked pairwise top-k, k-means
    models/    CvT-13 / DeiT-small / Swin-T / ResNet-50(+DIML) / NetVLAD / PatchNetVLAD
    data/      CUB200/Cars196/SOP datasets, batch samplers, MSLS + hard-negative subcache
    losses/    margin(+DIML), triplet, multisimilarity(+DIML), and the RevisitDML set
    miners/    distance-weighted (vectorized on device), semihard, softhard, ...
    engine/    jitted train step, rerank evaluation pipeline, retrieval metrics
    cli/       entry points with the reference's flag names
"""

__version__ = "0.1.0"
