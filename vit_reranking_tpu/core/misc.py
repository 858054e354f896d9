"""Small utilities (reference utilities/misc.py)."""

from __future__ import annotations

import jax


def gimme_params(params) -> int:
    """Total parameter count (reference utilities/misc.py:9-12)."""
    return sum(int(p.size) for p in jax.tree.leaves(params))
