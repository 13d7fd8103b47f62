"""Device Fp2 arithmetic: quadratic extension over a gnark_tpu.ff.FF.

Elements are shaped (..., 2, L): c0 + c1*u with u^2 = nr, each
coefficient an L-limb Montgomery residue. Exposes the same interface as
FF so gnark_tpu.ec.weierstrass works generically over either (G1 over
Fp, G2 over Fp2 — reference analog: gnark-crypto's e2 tower used by
backend/groth16 G2 MSMs, SURVEY.md §7 step 3 "G2 via Fp2 limbs").
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from gnark_tpu.ff import FF, get_ff


class FF2:
    """Fp2 = Fp[u]/(u^2 - nr) with nr a small negative integer."""

    def __init__(self, base: FF, nr: int):
        self.base = base
        self.p = base.p          # FieldParams of the base field
        self.n = base.n          # limbs per coefficient
        p = base.p.modulus
        nr_int = nr % p
        # nr is tiny and negative in practice (-1, -5): multiply by |nr|
        # with mul_small then negate, avoiding a full Montgomery mul.
        # nr may arrive as a reduced residue — recover the signed value.
        nr_signed = nr_int - p if nr_int > p // 2 else nr_int
        self._nr_small = nr_signed if -16 < nr_signed < 16 else None
        if self._nr_small is None:
            self._nr_mont = jnp.asarray(base.encode(nr_int))  # shape (L,)

    # -- helpers -----------------------------------------------------------

    def _c(self, a, i):
        return a[..., i, :]

    def _pack(self, c0, c1):
        return jnp.stack([c0, c1], axis=-2)

    def _mul_nr(self, x):
        k = self._nr_small
        if k is not None:
            if k >= 0:
                return self.base.mul_small(x, k)
            return self.base.neg(self.base.mul_small(x, -k))
        return self.base.mul(x, self._nr_mont)

    # -- host <-> device ---------------------------------------------------

    def encode(self, values):
        """Nested (c0, c1) int pairs -> (..., 2, L) array."""
        import numpy as np
        arr = np.asarray(values, dtype=object)
        assert arr.shape[-1] == 2
        return self.base.encode(arr.tolist())

    def decode(self, limbs):
        dec = self.base.decode(limbs)  # (..., 2) object array
        return dec

    def zeros(self, shape=()):
        return self.base.zeros(tuple(shape) + (2,))

    def ones(self, shape=()):
        one = self.base.ones(tuple(shape))
        zero = self.base.zeros(tuple(shape))
        return self._pack(one, zero)

    # -- ring ops ----------------------------------------------------------

    def add(self, a, b):
        return self._pack(self.base.add(self._c(a, 0), self._c(b, 0)),
                          self.base.add(self._c(a, 1), self._c(b, 1)))

    def sub(self, a, b):
        return self._pack(self.base.sub(self._c(a, 0), self._c(b, 0)),
                          self.base.sub(self._c(a, 1), self._c(b, 1)))

    def neg(self, a):
        return self._pack(self.base.neg(self._c(a, 0)),
                          self.base.neg(self._c(a, 1)))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        # Karatsuba: 3 base muls
        a0, a1 = self._c(a, 0), self._c(a, 1)
        b0, b1 = self._c(b, 0), self._c(b, 1)
        t0 = self.base.mul(a0, b0)
        t1 = self.base.mul(a1, b1)
        t2 = self.base.mul(self.base.add(a0, a1), self.base.add(b0, b1))
        c0 = self.base.add(t0, self._mul_nr(t1))
        c1 = self.base.sub(self.base.sub(t2, t0), t1)
        return self._pack(c0, c1)

    def square(self, a):
        # complex-style: (a0+a1)(a0+nr*a1) and a0*a1
        a0, a1 = self._c(a, 0), self._c(a, 1)
        t = self.base.mul(a0, a1)
        s = self.base.mul(self.base.add(a0, a1),
                          self.base.add(a0, self._mul_nr(a1)))
        c0 = self.base.sub(self.base.sub(s, t), self._mul_nr(t))
        c1 = self.base.add(t, t)
        return self._pack(c0, c1)

    def mul_small(self, a, k: int):
        return self._pack(self.base.mul_small(self._c(a, 0), k),
                          self.base.mul_small(self._c(a, 1), k))

    def mul_base(self, a, s):
        """Multiply by a base-field element s shaped (..., L)."""
        return self._pack(self.base.mul(self._c(a, 0), s),
                          self.base.mul(self._c(a, 1), s))

    # -- predicates / select -----------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    # -- inversion ----------------------------------------------------------

    def inv(self, a):
        """(a0 - a1 u) / (a0^2 - nr a1^2); inv(0) = 0 (base inv(0)=0)."""
        a0, a1 = self._c(a, 0), self._c(a, 1)
        d = self.base.sub(self.base.mul(a0, a0),
                          self._mul_nr(self.base.mul(a1, a1)))
        di = self.base.inv(d)
        return self._pack(self.base.mul(a0, di),
                          self.base.neg(self.base.mul(a1, di)))

    batch_inv = inv


@functools.lru_cache(maxsize=None)
def get_ff2(base_name: str, nr: int) -> FF2:
    return FF2(get_ff(base_name), nr)
