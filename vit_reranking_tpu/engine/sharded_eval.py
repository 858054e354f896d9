"""Distributed rerank evaluation — the whole eval pipeline over a device mesh.

Production shape of the eval at pod scale (SURVEY.md sections 2.10/5): the
single-chip engine (engine/rerank_eval.py) already never materializes N x N,
but every stage can also distribute over the ``data`` mesh axis:

  stage 0  gallery-sharded exact kNN        parallel/sharded_topk.py
           (each device scores its gallery shard, all_gather of the
           per-shard heads over ICI, exact merge)
  stage 1  query-sharded OT rerank          queries split over devices,
           (embarrassingly parallel)        bank replicated per device
  metrics  computed on the merged ranks     one reduction at the end

The rerank stage dispatches to the fused Pallas kernel per device shard
(shard_map over the query axis; the kernel runs in ``interpret`` mode on
non-TPU backends so the CPU-mesh tests exercise the same program), matching
the single-chip engine's own dispatch (engine/rerank_eval.py) — on real
multi-chip hardware the distributed eval keeps the ~14x the fused kernel
wins over the pure-XLA path.  Partial OT past 128 pair lanes stays fused via
the multi-step group packing (chunk-mean exit; a warning notes the
granularity difference), same as the single-chip engine; pass
``use_fused=False`` for the bit-faithful XLA path.
Results are identical to the single-device ``rerank_evaluate`` — pinned by
tests/test_sharded_rerank.py on the 8-device CPU mesh through both paths.

The reference has no distributed evaluation at all (single-process
nn.DataParallel, train_baseline.py:88); this module is the TPU-native
replacement for scaling it.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.similarity import calc_similarity, calc_similarity_rollout
from ..parallel.mesh import DATA_AXIS, pad_to_multiple
from ..parallel.sharded_topk import sharded_pairwise_topk
from .metrics import metrics_from_ranks


def sharded_rerank_evaluate(
    mesh: Mesh,
    feature_bank: jnp.ndarray,
    feature_bank_center: jnp.ndarray,
    labels,
    rollout: Optional[jnp.ndarray] = None,
    trunc_nums: Sequence[int] = (0, 100),
    method: str = "rollout",
    flags: Optional[dict] = None,
    head_k: Optional[int] = None,
    use_fused: Optional[bool] = None,
    stream_dtype: str = "float32",
) -> Dict[str, Dict[int, float]]:
    """Mesh-distributed version of ``rerank_evaluate`` (same result contract:
    {'r1'|'rp'|'mapr': {trunc: percent}}).

    feature_bank (N, C, R) / centers (N, C) / rollout (N, R) may live on any
    devices; they are placed query-sharded (P('data')) for the rerank and fed
    shard-wise to the distributed kNN.

    stream_dtype="bfloat16" streams each shard's packed similarity in bf16
    (same fast mode as the single-chip engine — see rerank_evaluate).
    """
    flags = dict(flags or {})
    if method not in ("rollout", "featvit"):
        raise ValueError(
            f"sharded_rerank_evaluate supports methods 'rollout'/'featvit', "
            f"got {method!r} (use the single-chip rerank_evaluate for qk/cam)"
        )
    if method == "rollout" and rollout is None:
        raise ValueError("method='rollout' requires a rollout saliency bank")
    N = feature_bank.shape[0]
    labels = jnp.asarray(labels)
    ndev = mesh.shape[DATA_AXIS]

    _, counts = np.unique(np.asarray(labels), return_counts=True)
    max_pos = int(counts.max())
    K = int(max(trunc_nums))
    Kmax = head_k or min(N, max(max_pos, K, 1) + 1)
    Kmax = max(Kmax, K)

    # --- stage 0: gallery-sharded exact kNN ------------------------------
    gal, n_real = pad_to_multiple(feature_bank_center, ndev, axis=0)
    vals, approx_tops = sharded_pairwise_topk(
        mesh, feature_bank_center, gal, k=Kmax, mask_self=True, n_valid=n_real
    )

    results = {m: {} for m in ("r1", "rp", "mapr")}

    if K > 0:
        top_inds = approx_tops[:, :K]
        top_vals = vals[:, :K]

        # Same dispatch predicate as the single-chip engine
        # (engine/rerank_eval.py): fused kernel whenever use_ot, incl.
        # partial OT past 128 lanes (multi-step group packing, warned).
        from ..ops.rerank_pallas import PAIR_LANES, _featvit_tile, _rollout_tile

        ot_part = float(flags.get("ot_part", 1.0))
        if use_fused is None:
            use_fused = flags.get("use_ot", True)
            if use_fused and ot_part <= 0.999 and K > PAIR_LANES:
                import logging

                logging.getLogger(__name__).warning(
                    "partial OT with trunc %d > %d pair lanes: fused kernel "
                    "exit residual is per %d-lane chunk (see "
                    "engine/rerank_eval.py); pass use_fused=False for the "
                    "bit-faithful XLA path", K, PAIR_LANES, PAIR_LANES,
                )
        interpret = jax.default_backend() != "tpu"

        def _rerank_one(anchor, center, aux, inds):
            if method == "rollout":
                s, _ = calc_similarity_rollout(
                    center, anchor, aux,
                    feature_bank_center[inds], feature_bank[inds], rollout[inds],
                    stage=1,
                    use_uniform=flags.get("use_uniform", False),
                    use_ot=flags.get("use_ot", True),
                    ot_part=flags.get("ot_part", 1.0),
                )
            else:
                s, _ = calc_similarity(
                    anchor, center, feature_bank[inds], feature_bank_center[inds],
                    stage=1,
                    use_uniform=flags.get("use_uniform", False),
                    use_inverse=flags.get("use_inverse", False),
                    temperature=flags.get("temperature", 1.0),
                    use_cls_token=flags.get("use_cls_token", False),
                    ot_temp=flags.get("ot_temp", 0.05),
                    use_minus=flags.get("use_minus", False),
                    ot_part=flags.get("ot_part", 1.0),
                )
            return s

        qpad = (-N) % ndev
        wrap = jnp.arange(N + qpad) % N
        aux_bank = rollout if rollout is not None else jnp.zeros((N, 1))

        if use_fused:
            # Query-sharded fused rerank: each device runs the Pallas kernel
            # on its query-id shard, gathering from the replicated bank —
            # mirrors fused_*_rerank_scores (ops/rerank_pallas.py) with the
            # tile loop per shard inside shard_map.
            n_local = (N + qpad) // ndev
            # tile == PAIR_LANES so each shard takes the einsum-direct
            # packed fast path of fused_rerank_tile (queries on lanes, no
            # moveaxis transpose) exactly like the single-chip engine
            qt = min(PAIR_LANES, n_local)
            ntl = -(-n_local // qt)

            def local_fn(ids, fb, centers, aux, tops):
                ids = ids.reshape(-1)  # (n_local,) global query ids
                idx_all = ids[(jnp.arange(ntl * qt) % n_local)].reshape(ntl, qt)

                def tile(idx):
                    if method == "rollout":
                        return _rollout_tile(
                            fb, aux, tops, idx,
                            iters=100, thresh=1e-1, ot_temp=0.05,
                            ot_part=ot_part,
                            use_uniform=flags.get("use_uniform", False),
                            interpret=interpret, P=PAIR_LANES,
                            stream_dtype=stream_dtype,
                        )
                    return _featvit_tile(
                        fb, centers, tops, idx,
                        iters=100, thresh=1e-1,
                        ot_temp=flags.get("ot_temp", 0.05), ot_part=ot_part,
                        use_uniform=flags.get("use_uniform", False),
                        use_inverse=flags.get("use_inverse", False),
                        use_minus=flags.get("use_minus", False),
                        use_soft=flags.get("use_soft", False),
                        use_cls_token=flags.get("use_cls_token", False),
                        temperature=flags.get("temperature", 1.0),
                        interpret=interpret, P=PAIR_LANES,
                        stream_dtype=stream_dtype,
                    )

                out = jax.lax.map(tile, idx_all)  # (ntl, qt, K)
                return out.reshape(ntl * qt, K)[:n_local]

            ids = jax.device_put(wrap, NamedSharding(mesh, P(DATA_AXIS)))
            with mesh:
                ot_sims = jax.jit(
                    shard_map(
                        local_fn,
                        mesh=mesh,
                        in_specs=(P(DATA_AXIS), P(), P(), P(), P()),
                        out_specs=P(DATA_AXIS, None),
                        # pallas_call's out_shape carries no varying-mesh-axes
                        # annotation, so the vma check cannot see through it
                        check_vma=False,
                    )
                )(ids, feature_bank, feature_bank_center, aux_bank, top_inds)[:N]
        else:
            def rerank_all(fb_q, c_q, aux_q, top_q):
                return jax.vmap(_rerank_one)(fb_q, c_q, aux_q, top_q)

            # queries sharded over data; the bank stays replicated (closure)
            fb_s = jax.device_put(
                feature_bank[wrap], NamedSharding(mesh, P(DATA_AXIS, None, None))
            )
            c_s = jax.device_put(
                feature_bank_center[wrap], NamedSharding(mesh, P(DATA_AXIS, None))
            )
            a_s = jax.device_put(aux_bank[wrap], NamedSharding(mesh, P(DATA_AXIS, None)))
            t_s = jax.device_put(top_inds[wrap], NamedSharding(mesh, P(DATA_AXIS, None)))
            with mesh:
                ot_sims = jax.jit(
                    rerank_all, out_shardings=NamedSharding(mesh, P(DATA_AXIS, None))
                )(fb_s, c_s, a_s, t_s)[:N]

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
