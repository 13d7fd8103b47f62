"""Batched short-Weierstrass point arithmetic on device (Jacobian).

Generic over the field object `f` (gnark_tpu.ff.FF for G1, ec.fp2.FF2
for G2), so one implementation covers every gnark group (the reference
gets this per-curve from gnark-crypto generated code; SURVEY.md §7
step 3). All curves have a = 0 (y^2 = x^3 + b), which the doubling
formula exploits.

Representations:
  * Jacobian point: tuple (X, Y, Z) of field elements; Z == 0 <=> inf.
  * Affine point:  tuple (x, y, inf) with inf a bool mask over the
    batch shape (no in-band (0,0) encoding — explicit masks are cheaper
    on TPU than field-wide compares and unambiguous for any b).

All ops are branchless (complete via selects) and shape-polymorphic
over leading batch dims; designed to sit inside jit/scan.

Formulas: EFD dbl-2009-l, add-2007-bl, madd-2007-bl.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# constructors / predicates
# ---------------------------------------------------------------------------

def jac_inf(f, shape=()):
    """Point at infinity: (1, 1, 0)."""
    one = f.ones(shape)
    return (one, one, f.zeros(shape))


def jac_is_inf(f, P):
    return f.is_zero(P[2])


def jac_select(f, cond, P, Q):
    """cond ? P : Q (cond over batch dims)."""
    return tuple(f.select(cond, a, b) for a, b in zip(P, Q))


def _batch_shape(f, x):
    """Batch shape of a field element array (strip limb dims)."""
    ndims = 2 if hasattr(f, "base") else 1  # FF2 elements end in (2, L)
    return x.shape[: x.ndim - ndims]


def affine_to_jacobian(f, A):
    """(x, y, inf) -> Jacobian with Z = inf ? 0 : 1."""
    x, y, inf = A
    bshape = _batch_shape(f, x)
    z = f.select(inf, f.zeros(bshape), f.ones(bshape))
    one = f.ones(bshape)
    X = f.select(inf, one, x)
    Y = f.select(inf, one, y)
    return (X, Y, z)


# ---------------------------------------------------------------------------
# core group ops
# ---------------------------------------------------------------------------

def jac_double(f, P):
    """dbl-2009-l (a=0): 2M + 5S. Handles inf naturally (Z3 = 0)."""
    X1, Y1, Z1 = P
    A = f.square(X1)
    B = f.square(Y1)
    C = f.square(B)
    t = f.square(f.add(X1, B))
    D = f.double(f.sub(f.sub(t, A), C))
    E = f.add(f.double(A), A)          # 3A
    F = f.square(E)
    X3 = f.sub(F, f.double(D))
    Y3 = f.sub(f.mul(E, f.sub(D, X3)), f.mul_small(C, 8))
    Z3 = f.double(f.mul(Y1, Z1))
    return (X3, Y3, Z3)


def jac_add(f, P, Q):
    """Complete Jacobian + Jacobian add (add-2007-bl + selects)."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = f.square(Z1)
    Z2Z2 = f.square(Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    r = f.double(f.sub(S2, S1))
    I = f.square(f.double(H))
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.square(r), J), f.double(V))
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.double(f.mul(S1, J)))
    Z3 = f.mul(f.sub(f.sub(f.square(f.add(Z1, Z2)), Z1Z1), Z2Z2), H)
    R = (X3, Y3, Z3)

    inf1 = f.is_zero(Z1)
    inf2 = f.is_zero(Z2)
    x_eq = f.is_zero(H)
    y_eq = f.is_zero(r)
    both = ~inf1 & ~inf2
    R = jac_select(f, both & x_eq & y_eq, jac_double(f, P), R)
    R = jac_select(f, both & x_eq & ~y_eq, jac_inf(f, _batch_shape(f, X3)), R)
    R = jac_select(f, inf1, Q, R)
    R = jac_select(f, inf2, P, R)
    return R


def jac_add_mixed(f, P, A):
    """Complete Jacobian + affine add (madd-2007-bl + selects).

    A = (x2, y2, inf2) with explicit infinity mask.
    """
    X1, Y1, Z1 = P
    x2, y2, inf2 = A
    Z1Z1 = f.square(Z1)
    U2 = f.mul(x2, Z1Z1)
    S2 = f.mul(f.mul(y2, Z1), Z1Z1)
    H = f.sub(U2, X1)
    HH = f.square(H)
    I = f.mul_small(HH, 4)
    J = f.mul(H, I)
    r = f.double(f.sub(S2, Y1))
    V = f.mul(X1, I)
    X3 = f.sub(f.sub(f.square(r), J), f.double(V))
    Y3 = f.sub(f.mul(r, f.sub(V, X3)), f.double(f.mul(Y1, J)))
    Z3 = f.sub(f.sub(f.square(f.add(Z1, H)), Z1Z1), HH)
    R = (X3, Y3, Z3)

    inf1 = f.is_zero(Z1)
    x_eq = f.is_zero(H)
    y_eq = f.is_zero(r)
    both = ~inf1 & ~inf2
    R = jac_select(f, both & x_eq & y_eq, jac_double(f, P), R)
    R = jac_select(f, both & x_eq & ~y_eq, jac_inf(f, _batch_shape(f, X3)), R)
    R = jac_select(f, inf1, affine_to_jacobian(f, A), R)
    R = jac_select(f, inf2, P, R)
    return R


def proj_to_jac(f, P):
    """Homogeneous projective (X : Y : Z) -> Jacobian (X*Z, Y*Z^2, Z).

    The projective identity (0 : 1 : 0) maps to Z = 0 == Jacobian
    infinity. Used by the MSM bucket kernel whose internal state is
    Renes-Costello projective (ec/pallas_ec.py) while the public MSM
    contract stays Jacobian."""
    X, Y, Z = P
    Z2 = f.square(Z)
    return (f.mul(X, Z), f.mul(Y, Z2), Z)


def jac_neg(f, P):
    return (P[0], f.neg(P[1]), P[2])


def jac_to_affine(f, P):
    """Batch-normalize Jacobian -> (x, y, inf). Uses batched Fermat inv."""
    X, Y, Z = P
    zi = f.inv(Z)                       # inv(0) = 0 by FF convention
    zi2 = f.square(zi)
    x = f.mul(X, zi2)
    y = f.mul(Y, f.mul(zi, zi2))
    return (x, y, f.is_zero(Z))


def scalar_mul_bits(f, P, bits_msb_first):
    """[k]P, k as an array/list of bits (MSB first), double-and-add.

    Runs as one lax.scan over the bits (compiles a single add+double
    body); batched over P's leading dims.
    """
    bits = jnp.asarray(np.asarray(bits_msb_first, dtype=np.uint32))
    bshape = _batch_shape(f, P[0])

    def body(R, bit):
        R = jac_double(f, R)
        Radd = jac_add(f, R, P)
        cond = jnp.broadcast_to(bit != 0, bshape)
        return jac_select(f, cond, Radd, R), None

    from gnark_tpu.utils.jaxutil import match_vma
    R0 = tuple(match_vma(a, P[0]) for a in jac_inf(f, bshape))
    R, _ = jax.lax.scan(body, R0, bits)
    return R
