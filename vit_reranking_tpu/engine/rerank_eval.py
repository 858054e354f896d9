"""The rerank evaluation engine — stage-0 retrieval + OT rerank + metrics,
fully on device.

TPU-native re-design of reference evaluation/eval_cvt_diml.py:196-416 (and the
eval_diml / eval_swin_diml / eval_attn_diml siblings): the reference loops
queries one at a time in Python with a 100-iteration Sinkhorn per query; here
queries are processed in vmapped tiles inside one compiled program, the
gallery never materializes an N x N matrix (blocked top-k), and metrics reduce
once at the end.

Memory note (SOP scale, SURVEY.md section 5): metrics only inspect the first
``num_pos <= Kmax`` ranked entries, so the full ranking is never needed — we
keep a top-``Kmax`` head per query where ``Kmax >= max(trunc_nums, max class
size)``, splice the reranked top-``trunc`` into it, and compute R@1 / RP /
MAP@R from the head alone.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.similarity import (
    calc_distance,
    calc_similarity,
    calc_similarity_featvit,
    calc_similarity_mhvit,
    calc_similarity_qk,
    calc_similarity_rollout,
)
from ..ops.topk import pairwise_topk
from .metrics import metrics_from_ranks


def _rerank_tile(
    anchor, anchor_center, anchor_rollout, fb, fb_center, fb_rollout, method, flags
):
    """OT-rerank one query against its top-K candidates. vmapped over queries.

    For method 'qk' the *_rollout slots carry the q/k attention projections
    instead: anchor_rollout = q (heads, T+1, D), fb_rollout = k (K, heads,
    T+1, D) (reference calc_similarity_vit/cvt, diml.py:206-320)."""
    if method == "qk":
        sim, _ = calc_similarity_qk(
            anchor_center, anchor, anchor_rollout, fb_center, fb, fb_rollout,
            stage=1,
            use_uniform=flags.get("use_uniform", False),
            use_exp=flags.get("use_inverse", False),
            temperature=flags.get("temperature", 1.0),
            scale=flags.get("qk_scale", 1.0 / 8.0),
            use_ot=flags.get("use_ot", True),
        )
    elif method == "cam":
        # Grad-CAM marginals (reference eval_attn_diml.py:157-158 feeding
        # calc_similarity_featvit use_cam, diml.py:405-412); the *_rollout
        # slots carry grid-flattened CAM maps (R,) / (K, R)
        K, R = fb_rollout.shape[0], anchor.shape[-1]
        g = int(round(R ** 0.5))
        # the use_cam branch ignores the cls/center token (marginals come
        # from the CAM maps alone, diml.py:405-412), so pad a zero cls column
        # — centers may live in a different (head-projected) dim than the bank
        a_feat = jnp.concatenate([jnp.zeros_like(anchor[:, :1]), anchor], axis=1)
        f_feat = jnp.concatenate([jnp.zeros_like(fb[:, :, :1]), fb], axis=2)
        sim, _ = calc_similarity_featvit(
            a_feat, f_feat, stage=1, use_cam=True,
            anchor_cam=anchor_rollout.reshape(g, g),
            fb_cam=fb_rollout.reshape(K, g, g),
        )
    elif method == "mhvit":
        # per-head OT, max over heads (reference diml.py:424-472, dormant —
        # wired behind --use_mh).  The feature contract prepends the center
        # as the cls token slot the reference indexes; when the global
        # embedding lives in a different (head-projected) dim than the bank
        # (e.g. raw conv feature banks), the patch mean stands in for it.
        nhead = flags.get("mh_heads", 12)
        if anchor.shape[0] % nhead:
            raise ValueError(
                f"mhvit: mh_heads={nhead} must divide the feature channel "
                f"dim C={anchor.shape[0]} (per-head OT splits C into heads; "
                "set --mh_heads to a divisor, e.g. 8 for C=2048 banks)"
            )
        ac = (
            anchor_center if anchor_center.shape[-1] == anchor.shape[0]
            else jnp.mean(anchor, axis=-1)
        )
        fc = (
            fb_center if fb_center.shape[-1] == fb.shape[1]
            else jnp.mean(fb, axis=-1)
        )
        a_feat = jnp.concatenate([ac[:, None], anchor], axis=1)
        f_feat = jnp.concatenate([fc[:, :, None], fb], axis=2)
        sim, _ = calc_similarity_mhvit(
            a_feat, f_feat, stage=1,
            use_uniform=flags.get("use_uniform", False),
            nhead=nhead,
        )
    elif method == "dist":
        # OT-weighted pairwise L2 (reference diml.py:149-203, dormant —
        # wired behind --use_dist).  Distance: lower is better, so the
        # rerank score is its negation (the engine ranks by score +
        # global sim).
        d, _ = calc_distance(
            anchor, anchor_center, fb, fb_center, stage=1,
            use_uniform=flags.get("use_uniform", False),
            use_exp=flags.get("use_inverse", True),
            temperature=flags.get("temperature", 1.0),
            use_cls_token=flags.get("use_cls_token", False),
        )
        sim = -d
    elif method == "rollout":
        sim, _ = calc_similarity_rollout(
            anchor_center, anchor, anchor_rollout, fb_center, fb, fb_rollout,
            stage=1,
            use_uniform=flags.get("use_uniform", False),
            use_ot=flags.get("use_ot", True),
            ot_part=flags.get("ot_part", 1.0),
        )
    else:  # 'featvit' — the calc_similarity cross-attention path
        sim, _ = calc_similarity(
            anchor, anchor_center, fb, fb_center, stage=1,
            use_uniform=flags.get("use_uniform", False),
            use_inverse=flags.get("use_inverse", False),
            temperature=flags.get("temperature", 1.0),
            use_cls_token=flags.get("use_cls_token", False),
            ot_temp=flags.get("ot_temp", 0.05),
            use_minus=flags.get("use_minus", False),
            use_soft=flags.get("use_soft", False),
            ot_part=flags.get("ot_part", 1.0),
        )
    return sim


def rerank_evaluate(
    feature_bank: jnp.ndarray,
    feature_bank_center: jnp.ndarray,
    labels: jnp.ndarray,
    rollout: Optional[jnp.ndarray] = None,
    rollout_g: Optional[jnp.ndarray] = None,
    trunc_nums: Sequence[int] = (0, 100),
    method: str = "featvit",
    flags: Optional[dict] = None,
    query_block: int = 128,
    head_k: Optional[int] = None,
    use_fused: Optional[bool] = None,
    approx_topk: bool = False,
    stream_dtype: str = "float32",
) -> Dict[str, Dict[int, float]]:
    """Full evaluation: returns {'r1'|'rp'|'mapr': {trunc: percent}}.

    Args:
      feature_bank: (N, C, R) patch features, already normalized over C
        (reference eval_cvt_diml.py:304).
      feature_bank_center: (N, C) global embeddings, normalized.
      labels: (N,) int labels; queries == gallery with self-masking.
      rollout: (N, R) rollout saliency when method == 'rollout'.
      trunc_nums: 0 = global-only; k = OT-rerank top-k then splice
        (reference eval_cvt_diml.py:359-365).
      stream_dtype: "bfloat16" streams the fused kernel's packed similarity
        through HBM in bf16 (~1.4x at bench scale; Sinkhorn math stays f32;
        e2e R@K parity within the +-0.2 protocol tolerance —
        tests/test_e2e_parity.py::test_flagship_eval_parity_bf16_stream).
        Ignored on the XLA fallback path.  Default f32 is bit-faithful.
    """
    flags = dict(flags or {})
    N = feature_bank.shape[0]
    labels = jnp.asarray(labels)

    # head must cover the largest class (metrics look at first num_pos) and
    # the largest requested truncation
    _, counts = np.unique(np.asarray(labels), return_counts=True)
    max_pos = int(counts.max())
    K = int(max(trunc_nums))
    Kmax = head_k or min(N, max(max_pos, K, 1) + 1)
    Kmax = max(Kmax, K)

    # approx_topk: per-block approx_max_k stage-0 (~2.4x at SOP scale,
    # empirical recall 1.0 at the 0.99 target; ops/topk.py) — opt-in, the
    # default stays exact-faiss-parity
    vals, approx_tops = pairwise_topk(
        feature_bank_center, feature_bank_center, k=Kmax, mask_self=True,
        approx=approx_topk,
    )

    results = {m: {} for m in ("r1", "rp", "mapr")}

    if K > 0:
        top_inds = approx_tops[:, :K]
        top_vals = vals[:, :K]

        ot_part = float(flags.get("ot_part", 1.0))
        # The fused Pallas path covers full AND partial (dustbin) OT.  Full OT
        # packs pairs densely with a per-pair early-exit freeze (verified
        # rank-identical to the reference's batch exit); partial OT uses the
        # kernel's group-exit mode — one query's K candidates per grid step,
        # batch-mean residual exit exactly like the reference
        # (utilities/diml.py:50-52) — when K fits the 128 pair lanes.  For
        # K > 128 lanes the query's candidates span multiple grid steps and
        # the exit residual is per 128-lane chunk instead of the full-K batch
        # mean (measured ~5e-4 score diff, 100% top-10 agreement at
        # K=256/ot_part=0.5; tests/test_rerank_pallas.py) — announced loudly
        # below rather than silently dropping ~14x to the XLA path.
        from ..ops.rerank_pallas import PAIR_LANES

        if ot_part <= 0.999 and K > PAIR_LANES and use_fused is None and \
                flags.get("use_ot", True) and method in ("rollout", "featvit"):
            import logging

            logging.getLogger(__name__).warning(
                "partial OT with trunc %d > %d pair lanes: fused kernel exit "
                "residual is per %d-lane chunk (reference uses the full-K "
                "batch mean); pass use_fused=False for the bit-faithful XLA "
                "path", K, PAIR_LANES, PAIR_LANES,
            )
        if use_fused is None:
            use_fused = flags.get("use_ot", True) and (
                method in ("rollout", "featvit")
                # qk is full-OT only (no ot_part in its signature) and needs
                # both the q and k banks (rollout_g=None falls back to the
                # XLA branch's gal_roll substitution)
                or (method == "qk" and rollout is not None and rollout_g is not None)
                # cam: the XLA reference path (featvit use_cam) has no
                # ot_part and ignores use_uniform — only fuse the exact
                # full-OT default configuration
                or (method == "cam" and rollout is not None
                    and rollout.shape[-1] == feature_bank.shape[-1]
                    and ot_part > 0.999 and not flags.get("use_uniform", False))
            )
        interpret = jax.default_backend() != "tpu"

        if use_fused:
            from ..ops.rerank_pallas import (
                fused_featvit_rerank_scores,
                fused_qk_rerank_scores,
                fused_rollout_rerank_scores,
            )

            if method == "qk":
                # rollout/rollout_g slots carry the q/k projections
                ot_sims = fused_qk_rerank_scores(
                    feature_bank, rollout, rollout_g, top_inds,
                    query_tile=query_block,
                    use_uniform=flags.get("use_uniform", False),
                    use_exp=flags.get("use_inverse", False),
                    temperature=flags.get("temperature", 1.0),
                    scale=flags.get("qk_scale", 1.0 / 8.0),
                    interpret=interpret, stream_dtype=stream_dtype,
                )
            elif method in ("rollout", "cam"):
                # CAM maps are per-image saliency exactly like rollout
                # (diml.py:405-412): relu+normalize == plain normalize since
                # activation-CAM is already non-negative (utils/cam.py:42)
                ot_sims = fused_rollout_rerank_scores(
                    feature_bank, feature_bank_center, rollout, top_inds,
                    query_tile=query_block,
                    use_uniform=flags.get("use_uniform", False),
                    ot_part=ot_part,
                    interpret=interpret, stream_dtype=stream_dtype,
                )
            else:
                ot_sims = fused_featvit_rerank_scores(
                    feature_bank, feature_bank_center, top_inds,
                    query_tile=query_block,
                    use_uniform=flags.get("use_uniform", False),
                    use_inverse=flags.get("use_inverse", False),
                    use_minus=flags.get("use_minus", False),
                    use_soft=flags.get("use_soft", False),
                    use_cls_token=flags.get("use_cls_token", False),
                    temperature=flags.get("temperature", 1.0),
                    ot_part=ot_part,
                    interpret=interpret, stream_dtype=stream_dtype,
                )
        else:
            rerank_one = functools.partial(_rerank_tile, method=method, flags=flags)
            # anchor-side aux bank (rollout saliency, or ViT q projections);
            # gallery-side bank defaults to the same (k projections for 'qk')
            dummy_roll = rollout if rollout is not None else jnp.zeros((N, 1))
            gal_roll = rollout_g if rollout_g is not None else dummy_roll

            # one compiled program for every tile (lax.map): host-side
            # per-tile dispatch costs ~30-60 ms each on this platform
            nt = -(-N // query_block)
            idx_all = (jnp.arange(nt * query_block) % N).reshape(nt, query_block)

            @jax.jit
            def all_tiles(idx_all, feature_bank, feature_bank_center, roll, gal, tops):
                def one(idx):
                    inds = tops[idx]
                    return jax.vmap(rerank_one)(
                        feature_bank[idx], feature_bank_center[idx], roll[idx],
                        feature_bank[inds], feature_bank_center[inds], gal[inds],
                    )

                return jax.lax.map(one, idx_all)

            tiles = all_tiles(
                idx_all, feature_bank, feature_bank_center, dummy_roll, gal_roll,
                top_inds,
            )
            ot_sims = tiles.reshape(nt * query_block, -1)[:N]  # (N, K)

        # rerank within the head by ot_sim + global sim (eval_cvt_diml.py:357)
        order = jnp.argsort(-(ot_sims + top_vals), axis=1)
        reranked = jnp.take_along_axis(top_inds, order, axis=1)

    for trunc in trunc_nums:
        if trunc == 0:
            final = approx_tops
        else:
            final = jnp.concatenate(
                [reranked[:, :trunc], approx_tops[:, trunc:]], axis=1
            )
        per_q = metrics_from_ranks(final, labels, labels)
        for m in results:
            results[m][trunc] = float(jnp.mean(per_q[m])) * 100.0

    return results
