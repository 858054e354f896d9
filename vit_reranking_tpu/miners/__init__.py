"""Batch miners — vectorized, device-resident triplet sampling.

Registry mirrors reference batchminer/__init__.py:4-22.  Each miner is a pure
function ``miner(key, embeddings, labels) -> Triplets`` drawing from the same
sampling *distribution* as the reference's per-anchor numpy loops, but via a
single batched categorical draw from a JAX PRNG key (accepted deviation: same
distribution, different RNG stream — SURVEY.md section 7.5).
"""

from .common import Triplets, TupleSets, pdist
from . import (
    distance,
    intra_random,
    lifted,
    npair,
    parametric,
    random as random_miner,
    random_distance,
    rho_distance,
    semihard,
    softhard,
)

BATCHMINING_METHODS = {
    "random": random_miner,
    "semihard": semihard,
    "softhard": softhard,
    "distance": distance,
    "rho_distance": rho_distance,
    "npair": npair,
    "parametric": parametric,
    "lifted": lifted,
    "random_distance": random_distance,
    "intra_random": intra_random,
}


def select(name, opt):
    """reference batchminer/__init__.py:16-22."""
    if name not in BATCHMINING_METHODS:
        raise NotImplementedError(f"Batchmining {name} not available!")
    return BATCHMINING_METHODS[name].BatchMiner(opt)
