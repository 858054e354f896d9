"""Feature-bank extraction: jitted batched embedding of a whole dataset.

Phase A of the rerank evaluation (reference eval_cvt_diml.py:225-305): run the
model over the eval loader, collect
  * global embedding centers (N, C)
  * patch feature bank (N, C, R) — head-projected token maps pooled to the
    DIML grid in eval mode (eval_cvt_diml.py:265-276), or the model's per-patch
    output in training mode (eval_cvt_diml.py:280-285)
  * rollout saliency (N, R) when requested
then L2-normalize over the channel axis (eval_cvt_diml.py:304-305).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pooling import grid_resize_tokens
from ..ops.rollout import rollout_saliency
from ..ops.similarity import l2_normalize


import functools


def _make_embed_body(
    model, grid_size: int = 7, use_rollout: bool = False, training_mode: bool = False,
    use_qk: bool = False, uint8_input: bool = False,
):
    """Un-jitted embed body shared by the per-batch and whole-dataset paths.

    ``uint8_input`` normalizes raw uint8 pixel batches in-program (the
    device-resident eval cache stores pools pre-normalization to quarter the
    HBM footprint, data/device_cache.py::DeviceEvalCache)."""

    def embed(variables, images):
        if uint8_input:
            from ..data.device_cache import _MEAN, _STD

            images = (images.astype(jnp.float32) / 255.0 - _MEAN) / _STD
        out, (enc_out, no_avg_feat), aux = model.apply(
            variables, images, train=False, ret_attn=use_rollout or use_qk
        )
        res: Dict[str, jnp.ndarray] = {}
        if training_mode:
            # DIML models: out IS the per-patch map (B, g, g, D)
            B = out.shape[0]
            per = out.reshape(B, -1, out.shape[-1]).transpose(0, 2, 1)  # (B, D, R)
            res["bank"] = per
            res["center"] = enc_out
        else:
            tokens = aux.get("head_tokens")
            if tokens is None:
                # generic path: project tokens through nothing; use raw map
                tokens = no_avg_feat
            B, L, D = tokens.shape
            s = int(round(L**0.5))
            fmap = tokens.transpose(0, 2, 1).reshape(B, D, s, s)
            fmap = grid_resize_tokens(fmap, grid_size)
            res["bank"] = fmap.reshape(B, D, grid_size * grid_size)
            res["center"] = out
        if use_rollout:
            res["rollout"] = rollout_saliency(aux["rollout_maps"])
        if use_qk:
            # q/k projections of the probed block (eval_attn_diml.py:18-38)
            res["q"] = aux["q"]
            res["k"] = aux["k"]
        return res

    return embed


@functools.lru_cache(maxsize=32)
def make_embed_fn(
    model, grid_size: int = 7, use_rollout: bool = False, training_mode: bool = False,
    use_qk: bool = False,
):
    """Returns a jitted fn(variables, images) -> dict of per-batch features.

    Cached on (model, flags): Flax modules hash by field values, so repeated
    extractions (per-epoch eval, benchmarks) reuse the compiled executable
    instead of re-tracing a fresh jit wrapper each call."""
    return jax.jit(_make_embed_body(model, grid_size, use_rollout, training_mode, use_qk))


@functools.lru_cache(maxsize=32)
def make_extract_all_fn(
    model, batch_size: int, grid_size: int = 7, use_rollout: bool = False,
    training_mode: bool = False, use_qk: bool = False, uint8_input: bool = False,
):
    """ONE compiled program that embeds a whole (device-resident) dataset.

    ``lax.map`` over fixed-size batches bounds activation memory exactly like
    a host loop, but the entire extraction — every batch, the concatenation,
    the final L2 norms — is a single dispatch.  That matters doubly here:
    per-op dispatch on this platform costs tens of ms, and a host-side loop
    serializes on it (measured: a python loop over jitted per-batch embeds
    runs ~6x slower than this at identical device work).
    """
    body = _make_embed_body(
        model, grid_size, use_rollout, training_mode, use_qk, uint8_input
    )

    @jax.jit
    def extract_all(variables, images):  # (nb*B, H, W, C), nb*B static
        nb = images.shape[0] // batch_size
        batches = images.reshape(nb, batch_size, *images.shape[1:])
        res = jax.lax.map(lambda b: body(variables, b), batches)
        out = {k: v.reshape(nb * batch_size, *v.shape[2:]) for k, v in res.items()}
        out["bank"] = l2_normalize(out["bank"], axis=1)
        out["center"] = l2_normalize(out["center"], axis=1)
        return out

    return extract_all


def extract_features(
    model,
    variables,
    loader,
    grid_size: int = 7,
    use_rollout: bool = False,
    training_mode: bool = False,
    use_qk: bool = False,
    pad_batch: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Run the embed fn over a loader; returns numpy arrays
    {'bank' (N,C,R), 'center' (N,C), 'labels' (N,), 'rollout' (N,R)?,
    'q'/'k' (N,heads,T+1,hd)?}.

    Batches are padded to a fixed size to avoid shape-churn recompiles."""
    embed = make_embed_fn(model, grid_size, use_rollout, training_mode, use_qk)
    banks, centers, rolls, qs, ks, labels = [], [], [], [], [], []
    pending = None  # one-batch pipeline: device compute overlaps host copy

    def _flush(res, n):
        # slice on host — slicing on device would rematerialize and defeat
        # the async copy already in flight
        banks.append(np.asarray(res["bank"])[:n])
        centers.append(np.asarray(res["center"])[:n])
        if use_rollout:
            rolls.append(np.asarray(res["rollout"])[:n])
        if use_qk:
            qs.append(np.asarray(res["q"])[:n])
            ks.append(np.asarray(res["k"])[:n])

    for lab, images, idx in loader:
        n = images.shape[0]
        B = pad_batch or n
        if n < B:
            images = np.concatenate(
                [images, np.zeros((B - n, *images.shape[1:]), images.dtype)], 0
            )
        res = embed(variables, jnp.asarray(images))
        # start the device->host copies without blocking, then drain the
        # previous batch while this one computes/transfers
        for v in res.values():
            v.copy_to_host_async()
        if pending is not None:
            _flush(*pending)
        pending = (res, n)
        labels.append(np.asarray(lab))
    if pending is not None:
        _flush(*pending)
    bank = np.concatenate(banks, 0)
    center = np.concatenate(centers, 0)
    out = {
        "bank": np.asarray(l2_normalize(jnp.asarray(bank), axis=1)),
        "center": np.asarray(l2_normalize(jnp.asarray(center), axis=1)),
        "labels": np.concatenate(labels, 0),
    }
    if use_rollout:
        out["rollout"] = np.concatenate(rolls, 0)
    if use_qk:
        out["q"] = np.concatenate(qs, 0)
        out["k"] = np.concatenate(ks, 0)
    return out


# Fraction of the free device memory the one-program extraction may spend on
# XLA's whole-operand layout copy (see extract_features_device docstring).
# Conservative: leaves headroom for activations, the output bank, and the
# fragmentation slack the TPU allocator needs at SOP scale.
_CHUNK_BUDGET_FRACTION = 0.45


# Usable HBM per chip when memory_stats() is unavailable (the axon remote
# runtime returns None for it).  v5e carries 16 GiB; ~15.75 GB is allocatable
# in practice (measured: 18.65 GB layout failed against a 15.75 GB limit,
# test_results/stress_sop_r4.log).  Override with VITRR_HBM_BYTES.
_FALLBACK_HBM_BYTES = {"tpu": int(15.75 * 2**30)}


def _device_free_bytes(arr) -> Optional[int]:
    """Free HBM on the device holding ``arr`` (None when unknown, e.g. CPU).

    When the runtime exposes no memory_stats (axon), falls back to the
    device-kind HBM size minus the pool itself — the pool is by far the
    dominant resident at the scales where chunking matters."""
    import os

    try:
        devs = list(arr.devices()) if hasattr(arr, "devices") else []
        dev = devs[0] if devs else jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return max(
                0, int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
            )
        env = os.environ.get("VITRR_HBM_BYTES")
        total = int(env) if env else _FALLBACK_HBM_BYTES.get(dev.platform)
        if total:
            return max(0, total - int(getattr(arr, "nbytes", 0)))
    except Exception:
        return None
    return None


def auto_chunk_images(
    images, batch_size: int, memory_budget_bytes: Optional[int] = None
) -> int:
    """Pick a ``chunk_images`` bound for :func:`extract_features_device`.

    Returns 0 (= do not chunk) when the whole pool's layout copy fits the
    budget or the budget is unknown; otherwise the largest batch-multiple
    whose operand copy stays under ``_CHUNK_BUDGET_FRACTION`` of free HBM.
    Exists so product call sites (cli/train_baseline.py, cli/train_diml.py,
    cli/test_diml.py) survive SOP scale without knowing about XLA's
    double-layout trap (test_results/stress_sop_r4.log)."""
    N = int(images.shape[0])
    if N <= batch_size:
        return 0
    budget = memory_budget_bytes
    if budget is None:
        budget = _device_free_bytes(images)
    if not budget:
        return 0
    bytes_per_image = int(np.prod(images.shape[1:])) * images.dtype.itemsize
    allowed = int(budget * _CHUNK_BUDGET_FRACTION)
    chunk = (allowed // max(bytes_per_image, 1)) // batch_size * batch_size
    chunk = max(chunk, batch_size)
    return 0 if chunk >= N else chunk


def extract_features_device(
    model,
    variables,
    images: jnp.ndarray,
    batch_size: int = 32,
    grid_size: int = 7,
    use_rollout: bool = False,
    training_mode: bool = False,
    use_qk: bool = False,
    uint8_input: bool = False,
    chunk_images: Optional[int] = None,
    memory_budget_bytes: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Device-resident Phase A: embed an (N, H, W, C) device array without any
    host round-trip.

    The loader path (:func:`extract_features`) exists for host datasets; on
    TPU the bank feeds straight into the device-side rerank
    (engine/rerank_eval.py), so shipping it through the host per batch is pure
    overhead — at SOP scale the whole bank (60k x 128 x 49 f32 = 1.5 GB) fits
    HBM comfortably.  The whole loop compiles to one program
    (:func:`make_extract_all_fn`); outputs are concatenated and L2-normalized
    on device (reference eval_cvt_diml.py:304-305).

    ``chunk_images`` (multiple of ``batch_size``) bounds how much of the pool
    one program touches: XLA inserts a LAYOUT COPY of the whole image operand
    inside the compiled loop (measured at SOP-60k: the 8.5 GB uint8 pool goes
    resident TWICE — 18.6 GB > 15.75 usable, OOM at compile;
    test_results/stress_sop_r4.log).  Chunking keeps (pool + one chunk's
    copy) resident instead; a handful of dispatches is still dispatch-cheap.

    ``chunk_images=None`` (default) AUTO-derives the bound from pool bytes vs
    free device memory (:func:`auto_chunk_images`) — a no-op on small pools,
    a bounded chunk at SOP scale.  Pass ``chunk_images=0`` to force the
    single-program path, or ``memory_budget_bytes`` to override the measured
    free-memory budget (used by tests).
    """
    N = images.shape[0]
    if chunk_images is None:
        chunk_images = auto_chunk_images(images, batch_size, memory_budget_bytes)
    if chunk_images and N > chunk_images:
        if chunk_images % batch_size:
            raise ValueError(
                f"chunk_images {chunk_images} must be a multiple of "
                f"batch_size {batch_size}"
            )
        parts = [
            extract_features_device(
                model, variables, images[s : s + chunk_images],
                batch_size=batch_size, grid_size=grid_size,
                use_rollout=use_rollout, training_mode=training_mode,
                use_qk=use_qk, uint8_input=uint8_input, chunk_images=0,
            )
            for s in range(0, N, chunk_images)
        ]
        return {
            k: jnp.concatenate([p[k] for p in parts], axis=0) for k in parts[0]
        }
    extract_all = make_extract_all_fn(
        model, batch_size, grid_size, use_rollout, training_mode, use_qk, uint8_input
    )
    pad = (-N) % batch_size
    if pad:  # wrap-pad the tail to a whole batch; cropped below.  take()
        # handles pad > N (datasets smaller than one batch), where a plain
        # images[:pad] would come up short
        images = jnp.take(images, jnp.arange(N + pad) % N, axis=0)
    out = extract_all(variables, images)
    if pad:
        out = {k: v[:N] for k, v in out.items()}
    return out
