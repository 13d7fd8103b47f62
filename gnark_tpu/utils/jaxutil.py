"""Small JAX utilities.

match_vma: align an initial loop-carry's varying-manual-axes (vma)
with a reference input so lax.scan/fori_loop carries type-check inside
shard_map (JAX >= 0.8 tracks device-varyingness in avals; a constant
init + varying body output is a type error otherwise).
"""

from __future__ import annotations

import jax


def match_vma(x, ref):
    """Mark x as varying over every manual axis ref varies over."""
    try:
        missing = jax.typeof(ref).vma - jax.typeof(x).vma
    except Exception:
        return x
    if missing:
        x = jax.lax.pvary(x, tuple(missing))
    return x


def tree_match_vma(tree, ref_leaf):
    return jax.tree_util.tree_map(lambda a: match_vma(a, ref_leaf), tree)
