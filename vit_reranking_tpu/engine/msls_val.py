"""MSLS validation: per-city global retrieval + optional DIML rerank +
Recall@N vs UTM ground truth (reference training_tools/val.py:68-252).

The reference loops queries one at a time through calc_similarity; here the
rerank runs as a vmapped tile per city.  Global retrieval uses the on-device
einsum + argsort exactly like the reference's "tensor solution"
(val.py:154-160); the faiss index it also builds is dead code there.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.similarity import calc_similarity, l2_normalize

# batches per compiled super-chunk: per-dispatch cost on this platform is
# ~30-60 ms, so embedding a 19k-image MSLS city pool one jitted batch at a
# time spends more on dispatch than on compute; lax.map-ing 32 batches into
# ONE program cuts dispatches 32x (same one-dispatch redesign as
# engine/extract.py::extract_features_device).  Host memory stays bounded:
# only chunk_frames images are resident at once.
_CHUNK_BATCHES = 32


@functools.lru_cache(maxsize=4)
def _make_pool_extract(extract_fn, batch: int, with_vars: bool):
    """ONE compiled program embedding `nb` fixed-size batches via lax.map.

    Cached per (extract_fn, batch): pass a STABLE function (hoisted out of
    the epoch loop) or the chunk program retraces every call.  With
    ``with_vars`` the parameters flow in as a runtime jit argument, so
    per-epoch parameter updates reuse one executable and the cache never
    pins old parameter pytrees in device memory."""

    if with_vars:

        @jax.jit
        def run(variables, images):  # (nb*batch, H, W, 3)
            nb = images.shape[0] // batch
            batches = images.reshape(nb, batch, *images.shape[1:])
            c, d = jax.lax.map(lambda b: extract_fn(variables, b), batches)
            c = c.reshape(nb * batch, *c.shape[2:])
            d = None if d is None else d.reshape(nb * batch, *d.shape[2:])
            return c, d

        return run

    @jax.jit
    def run(images):  # (nb*batch, H, W, 3)
        nb = images.shape[0] // batch
        batches = images.reshape(nb, batch, *images.shape[1:])
        c, d = jax.lax.map(lambda b: extract_fn(b), batches)
        c = c.reshape(nb * batch, *c.shape[2:])
        d = None if d is None else d.reshape(nb * batch, *d.shape[2:])
        return c, d

    return run


def _chunk_geometry(n_names: int, L: int, batch: int) -> Tuple[int, int]:
    """(keys_per_chunk, chunk_frames) for the super-chunk layout below.

    Exposed so oracles can mirror the EXACT per-forward frame geometry:
    sequence chunks hold keys_per_chunk*L frames zero-padded to chunk_frames,
    so the (batch,)-sized forwards inside one chunk program slice frames at
    chunk-relative offsets.  A host loop that batches frames with any OTHER
    geometry sees ULP-level embedding differences on TPU (batch-shape-
    dependent matmul tiling), which flip near-tied ranks — parity checks
    must reproduce this layout (scripts/stress_msls_val.py does)."""
    n_flat = n_names * L
    n_batches = -(-n_flat // batch)
    nb_chunk = min(_CHUNK_BATCHES, n_batches)
    chunk_frames = nb_chunk * batch
    if L > chunk_frames:
        # one key's frames must fit a single chunk (the pad below only
        # rounds UP to chunk_frames): widen the chunk to the next batch
        # multiple of L
        chunk_frames = -(-L // batch) * batch
    return max(chunk_frames // L, 1), chunk_frames


def _embed_names(eval_set, names, extract_fn, batch=16, variables=None):
    """Load keys by name via the dataset and embed them through compiled
    super-chunks.  extract_fn(images) -> (centers (B, D), dense (B, C, R) or
    None); it is traced (not dispatched) inside the chunk program.  When
    ``variables`` is given the contract is extract_fn(variables, images) and
    the parameters are a runtime argument of the compiled program (preferred
    for in-training validation: no retrace per epoch, no parameter pinning).

    Sequence keys (comma-joined frames, tasks im2seq/seq2im/seq2seq) load as
    (L, H, W, 3) stacks; frames flatten into fixed (batch,)-sized forwards,
    the global descriptor is the L2-normalized mean of the frame embeddings,
    and the dense rerank features come from the CENTER frame (the sequence's
    identity frame — matches the center-frame semantics of the reference's
    arrangement/filtering, training_tools/msls.py:126-133)."""
    from ..data.msls import MSLS

    if not len(names):
        return np.zeros((0, 1), np.float32), None
    run = _make_pool_extract(extract_fn, batch, variables is not None)
    if variables is not None:
        run = functools.partial(run, variables)

    # probe the first key for the sequence shape
    first = eval_set.load_image_array(names[0])
    seq = first.ndim == 4
    L = first.shape[0] if seq else 1
    keys_per_chunk, chunk_frames = _chunk_geometry(len(names), L, batch)

    c_parts, d_parts = [], []
    for s in range(0, len(names), keys_per_chunk):
        sub = names[s : s + keys_per_chunk]
        items = [eval_set.load_image_array(n) for n in sub]
        arr = np.stack(items)  # (k, H, W, 3) or (k, L, H, W, 3)
        flat = arr.reshape(-1, *arr.shape[-3:])
        m = flat.shape[0]
        if m < chunk_frames:
            flat = np.concatenate(
                [flat, np.zeros((chunk_frames - m, *flat.shape[1:]), flat.dtype)]
            )
        c, d = run(jnp.asarray(flat))
        c_parts.append(np.asarray(c)[:m])
        if d is not None:
            d_parts.append(np.asarray(d)[:m])
    c = np.concatenate(c_parts, 0)
    d = np.concatenate(d_parts, 0) if d_parts else None
    if seq:
        centers = MSLS.aggregate_seq(c, L)  # item-major frame layout
        dense = None if d is None else d.reshape(len(names), L, *d.shape[1:])[:, L // 2]
    else:
        centers, dense = c, d
    return centers, dense


def recall_at_n(pred_list, gt, n_values, n_queries):
    """Recall@N vs UTM ground truth (reference val.py:211-251), vectorized:
    per city one (nq, kk, G) broadcast compare + cumulative-hit reduction on
    device instead of the reference's per-row python loop.  ``pred_list`` is
    one (nq_city, kk) index array per city; ``gt`` the concatenated per-query
    positive lists (ragged).  Value-matches the reference loop exactly
    (tests/test_msls.py::test_recall_at_n_matches_reference_loop)."""
    correct = np.zeros(len(n_values))
    qix = 0
    for city_preds in pred_list:
        nq, kk = city_preds.shape
        g = gt[qix : qix + nq]
        gmax = max((len(x) for x in g), default=0)
        gtpad = np.full((nq, max(gmax, 1)), -1, np.int64)
        for i, x in enumerate(g):
            gtpad[i, : len(x)] = x
        hits = jnp.any(
            jnp.asarray(city_preds)[:, :, None] == jnp.asarray(gtpad)[:, None, :],
            axis=-1,
        )  # (nq, kk)
        hit_by_rank = jnp.cumsum(hits, axis=1) > 0
        cols = [min(n, kk) - 1 for n in n_values]
        correct += np.asarray(jnp.sum(hit_by_rank[:, jnp.asarray(cols)], axis=0))
        qix += nq
    return correct / max(n_queries, 1)


def msls_val(
    eval_set,
    extract_fn: Callable,
    trunc_nums: Sequence[int] = (0, 100),
    n_values: Sequence[int] = (1, 5, 10, 20, 50, 100),
    batch: int = 16,
    rerank_flags: Optional[dict] = None,
    visual_dir: Optional[str] = None,
    vis_every: int = 10,
    variables=None,
) -> Dict[str, float]:
    """Returns {'globalR_N': ..., 'dimlR_N': ...} recall dict.

    rerank_flags default to the reference's val settings (val.py:177-187):
    use_minus=True, use_cls_token=True, temperature=0.1, ot_part=1.0.
    ``visual_dir`` saves the reranked-top-1 OT heatmap panel for every
    ``vis_every``-th query per city (reference val.py:188-190).
    ``variables`` switches the extract contract to extract_fn(variables,
    images) with the parameters as a runtime jit argument — see
    :func:`_embed_names`.
    """
    flags = dict(
        use_uniform=False, use_inverse=False, temperature=0.1,
        use_cls_token=True, ot_temp=0.05, use_minus=True, ot_part=1.0,
    )
    flags.update(rerank_flags or {})
    trunc_nums = list(trunc_nums)
    K = max(trunc_nums)
    n_values = list(n_values)
    nmax = max(n_values)

    qFeat, qDense = _embed_names(
        eval_set, list(eval_set.qImages), extract_fn, batch, variables=variables
    )
    dbFeat, dbDense = _embed_names(
        eval_set, list(eval_set.dbImages), extract_fn, batch, variables=variables
    )
    if qDense is None or dbDense is None:
        trunc_nums = [0]
        K = 0
    else:
        qDense = np.asarray(l2_normalize(jnp.asarray(qDense), axis=1))
        dbDense = np.asarray(l2_normalize(jnp.asarray(dbDense), axis=1))

    gt = eval_set.all_pos_indices
    predictions, final_preds = [], []

    qTot = dbTot = 0
    for qEnd, dbEnd in zip(eval_set.qEndPosList, eval_set.dbEndPosList):
        qF = jnp.asarray(qFeat[qTot : qTot + qEnd])
        dbF = jnp.asarray(dbFeat[dbTot : dbTot + dbEnd])
        sim = jnp.einsum(
            "nc,mc->nm", qF, dbF,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        kk = min(max(nmax, K), dbEnd)
        preds = jnp.argsort(-sim, axis=1)[:, :kk]

        if K > 0 and qEnd == 0:
            # empty city (restrictive filtering): nothing to rerank
            final_preds.append(np.asarray(preds))
        elif K > 0:
            qD = jnp.asarray(qDense[qTot : qTot + qEnd])
            dbD = jnp.asarray(dbDense[dbTot : dbTot + dbEnd])
            Keff = min(K, dbEnd)
            top = preds[:, :Keff]

            from ..ops.rerank_pallas import PAIR_LANES

            use_fused = flags.get("use_ot", True) and (
                flags.get("ot_part", 1.0) > 0.999 or Keff <= PAIR_LANES
            )
            if use_fused:
                # fused Pallas kernel, query != gallery banks (verified
                # score-equal to the XLA path, tests/test_rerank_pallas.py)
                from ..ops.rerank_pallas import fused_featvit_rerank_scores_qg

                ot = fused_featvit_rerank_scores_qg(
                    qD, qF, dbD, dbF, top,
                    query_tile=min(256, int(qEnd)),
                    use_uniform=flags.get("use_uniform", False),
                    use_inverse=flags.get("use_inverse", False),
                    use_minus=flags.get("use_minus", False),
                    use_soft=flags.get("use_soft", False),
                    use_cls_token=flags.get("use_cls_token", True),
                    temperature=flags.get("temperature", 1.0),
                    ot_temp=flags.get("ot_temp", 0.05),
                    ot_part=flags.get("ot_part", 1.0),
                    interpret=jax.default_backend() != "tpu",
                )
            else:

                def one(i):
                    s, _ = calc_similarity(
                        qD[i], qF[i], dbD[top[i]], dbF[top[i]], stage=1, **flags
                    )
                    return s

                ot = jax.vmap(one)(jnp.arange(qEnd))
            adj = ot + jnp.take_along_axis(sim, top, axis=1)
            order = jnp.argsort(-adj, axis=1)
            rerank = jnp.take_along_axis(top, order, axis=1)
            final = jnp.concatenate([rerank, preds[:, Keff:]], axis=1)
            final_preds.append(np.asarray(final))

            if visual_dir:
                from ..utils.visual import visual_heatmap_msls

                q_names = eval_set.qImages[qTot : qTot + qEnd]
                db_names = eval_set.dbImages[dbTot : dbTot + dbEnd]
                for qi in range(0, int(qEnd), max(int(vis_every), 1)):
                    top1 = int(np.asarray(rerank[qi, 0]))
                    rank_in_top = int(np.asarray(order[qi, 0]))
                    _, aux = calc_similarity(
                        qD[qi], qF[qi], dbD[top[qi]], dbF[top[qi]], stage=1,
                        **flags,
                    )
                    pick = lambda a: np.asarray(a)[rank_in_top]
                    q_im = eval_set.load_image_array(q_names[qi])
                    db_im = eval_set.load_image_array(db_names[top1])
                    center = lambda a: a[a.shape[0] // 2] if np.asarray(a).ndim == 4 else a
                    visual_heatmap_msls(
                        center(q_im), center(db_im),
                        pick(aux.u), pick(aux.v), pick(aux.T), pick(aux.sim_r),
                        save_path=f"{visual_dir}/heatmap_city{len(final_preds)-1}_q{qi:04d}.png",
                        use_cls_token=flags.get("use_cls_token", True),
                    )

        predictions.append(np.asarray(preds))
        qTot += qEnd
        dbTot += dbEnd

    def recalls(pred_list):
        return recall_at_n(pred_list, gt, n_values, len(eval_set.qIdx))

    out = {}
    g = recalls(predictions)
    for i, n in enumerate(n_values):
        out[f"globalR_{n}"] = float(g[i])
    if final_preds:
        f = recalls(final_preds)
        for i, n in enumerate(n_values):
            out[f"dimlR_{n}"] = float(f[i])
    return out
