"""Fixed-base batch scalar multiplication on device.

TPU analog of gnark-crypto's `BatchScalarMultiplicationG1/G2` (used by
Groth16 Setup for the one giant G1 batch and one G2 batch — reference:
backend/groth16/bn254/setup.go:222-233,300-302). One shared base point,
n scalars: a single double-and-add ladder where the doubling is shared
and the conditional add is a batched mixed-add with per-scalar bit
selection. 2*nbits batched EC ops total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnark_tpu.fields import LIMB_BITS
from gnark_tpu.utils.jaxutil import match_vma
from gnark_tpu.ec.weierstrass import (
    jac_add_mixed, jac_double, jac_inf, jac_select, jac_to_affine,
)


@functools.partial(jax.jit, static_argnums=(0, 2))
def batch_scalar_mul(f, base_affine, nbits: int, scalars):
    """[s_i] * base for each row of scalars.

    base_affine: (x, y) single affine point, field elements (no batch)
    scalars: (n, K) uint32 16-bit limbs, plain (non-Montgomery)
    Returns a Jacobian point batch of shape (n,).
    """
    n = scalars.shape[0]
    bx, by = base_affine

    def bcast(a):
        return jnp.broadcast_to(a[None], (n,) + a.shape)

    base = (bcast(bx), bcast(by), jnp.zeros((n,), bool))

    def body(i, R):
        R = jac_double(f, R)
        bit_idx = nbits - 1 - i
        limb = bit_idx // LIMB_BITS
        sh = (bit_idx % LIMB_BITS).astype(jnp.uint32)
        bit = (scalars[:, limb] >> sh) & 1
        Radd = jac_add_mixed(f, R, base)
        return jac_select(f, bit == 1, Radd, R)

    R0 = tuple(match_vma(a, scalars) for a in jac_inf(f, (n,)))
    return jax.lax.fori_loop(0, nbits, body, R0)


def batch_scalar_mul_affine(f, base_affine, nbits: int, scalars):
    """Like batch_scalar_mul but normalized to (x, y, inf)."""
    return jac_to_affine(f, batch_scalar_mul(f, base_affine, nbits, scalars))
