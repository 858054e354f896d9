"""Gallery-sharded exact top-k — distributed brute-force kNN over the mesh.

The workload's scalable axis is the gallery N (SOP: 60k images -> an N x N
stage-0 similarity; SURVEY.md section 5 "long-context analog").  Two shardings
compose:

  * query-sharded rerank (tests/test_sharded_rerank.py): embarrassingly
    parallel, each device owns a query slice against a replicated gallery;
  * gallery-sharded retrieval (this module): each device owns a gallery
    shard — the right layout once the bank itself outgrows one chip's HBM
    (60k x 128 x 49 f32 = 1.5 GB is fine on a v5e; 1M images is not).

Per device: local blocked `pairwise_topk` over its shard (exact, faiss
IndexFlat semantics), then one `all_gather` of the (Q, k) heads over ICI and
an exact (Q, ndev*k) merge — the classic distributed-kNN reduction, NOT ring
attention (196-token sequences don't need sequence parallelism).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import pairwise_topk
from .mesh import DATA_AXIS


def sharded_pairwise_topk(
    mesh: Mesh,
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    k: int,
    metric: str = "ip",
    block_size: int = 8192,
    mask_self: bool = False,
    n_valid: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with the gallery row-sharded over the ``data`` mesh axis.

    Args:
      queries: (Q, C), replicated.
      gallery: (N, C) with N a multiple of the data-axis size (use
        ``mesh_utils.pad_to_multiple``; padded rows are excluded via
        ``n_valid``).  May already carry a ``P(DATA_AXIS, None)`` sharding —
        shard_map then consumes the shards in place with no reshuffle.
      mask_self: mask gallery row q for query q (global indexing), matching
        ``pairwise_topk(mask_self=True)`` on one device.
      n_valid: number of real gallery rows (defaults to N).  Each shard must
        keep >= k real rows.

    Returns (values (Q, k), indices (Q, k)), identical to the single-device
    ``pairwise_topk`` result (same merge order; exact reduction).
    """
    ndev = mesh.shape[DATA_AXIS]
    N = gallery.shape[0]
    assert N % ndev == 0, f"gallery rows {N} must divide the data axis {ndev}"
    local_n = N // ndev
    nv = N if n_valid is None else n_valid
    k_local = min(k, local_n)
    assert ndev * k_local >= k, f"{ndev} shards of {local_n} rows cannot yield top-{k}"

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def inner(q, g_local):
        shard = jax.lax.axis_index(DATA_AXIS)
        offs = shard * local_n
        # pad rows (global index >= n_valid) must be -inf BEFORE the local
        # selection — masking after top-k would let a zero-scoring pad row
        # displace a real negative-scoring candidate from the shard's head
        v, i = pairwise_topk(
            q, g_local, k=k_local, metric=metric, block_size=block_size,
            mask_self=mask_self, query_offset=-offs, n_valid=nv - offs,
        )
        gi = i + offs  # globalize the shard-local indices
        # exact merge of the ndev sorted heads over ICI
        v_all = jax.lax.all_gather(v, DATA_AXIS, axis=1, tiled=True)  # (Q, ndev*k)
        i_all = jax.lax.all_gather(gi, DATA_AXIS, axis=1, tiled=True)
        vv, sel = jax.lax.top_k(v_all, k)
        ii = jnp.take_along_axis(i_all, sel, axis=1)
        return vv, ii

    return inner(queries, gallery)
