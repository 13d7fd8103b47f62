"""Fp2 arithmetic over stacked transposed limb blocks, for use INSIDE
TPU kernels — the quadratic-extension layer over ff/pallas_mont.TFF.

Layout: an Fp2 element block of T values is a (2L, T) uint32 array —
rows [0:L] hold the c0 limbs, rows [L:2L] the c1 limbs (matching the
host FF2 standard (n, 2, L) layout flattened and transposed). All ops
run in the lazy <= 2p class per component (see TFF), with the same
method surface the Renes-Costello projective formulas consume
(mul_lazy/add2p/sub2p/double2p/neg2p/sop2/canon), so the MSM bucket
kernel can run G2 (the reference's pk.G2.B MSM, prove.go:227) with the
same code path as G1.

Multiplication is Karatsuba with the nonresidue folded into lazy
subtracts: Fp2 = Fp[u]/(u^2 - nr) with nr in {-1, -5} for the gnark
curves (bn254/bls12-381: -1; bls12-377: -5)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gnark_tpu.ff.pallas_mont import TFF


class TFF2:
    """Fp2 ops over (2L, T) stacked blocks. `nrows` = 2L is the state
    row count kernels should use where TFF uses L."""

    def __init__(self, base: TFF, nr: int):
        self.base = base
        p = base.p.modulus
        nr_s = nr if nr <= p // 2 else nr - p
        assert nr_s < 0 and -nr_s <= 8, \
            f"nonresidue {nr_s} not in the folded small-negative range"
        self.nr_abs = -nr_s
        self.nrows = 2 * base.n

    # constants / binding ---------------------------------------------------

    def consts3(self):
        """(P, one, 2P) columns of shape (2L, 1): the per-component
        prime columns stacked; `one` is the Fp2 one (1, 0)."""
        P, one, P2 = self.base.consts3()
        z = np.zeros_like(one)
        return (np.concatenate([P, P]), np.concatenate([one, z]),
                np.concatenate([P2, P2]))

    def bind(self, pcol, onecol, p2col) -> "TFF2":
        import copy
        L = self.base.n
        t = copy.copy(self)
        t.base = self.base.bind(pcol[:L], onecol[:L], p2col[:L])
        return t

    def mont_col2(self, v0: int, v1: int) -> np.ndarray:
        """(2L, 1) column of the Fp2 constant (v0, v1), Montgomery."""
        return np.concatenate([self.base.mont_col(v0),
                               self.base.mont_col(v1)])

    # helpers ---------------------------------------------------------------

    def _split(self, a):
        L = self.base.n
        return a[:L], a[L:]

    @staticmethod
    def _cat(c0, c1):
        return jnp.concatenate([c0, c1], axis=0)

    def _mul_nr_abs(self, a):
        """|nr| * a in the 2p class (|nr| <= 8: add chain)."""
        b = self.base
        k = self.nr_abs
        if k == 1:
            return a
        r = None
        cur = a
        while k:
            if k & 1:
                r = cur if r is None else b.add2p(r, cur)
            k >>= 1
            if k:
                cur = b.double2p(cur)
        return r

    # per-component lifts ---------------------------------------------------

    def add2p(self, a, c):
        a0, a1 = self._split(a)
        c0, c1 = self._split(c)
        b = self.base
        return self._cat(b.add2p(a0, c0), b.add2p(a1, c1))

    def sub2p(self, a, c):
        a0, a1 = self._split(a)
        c0, c1 = self._split(c)
        b = self.base
        return self._cat(b.sub2p(a0, c0), b.sub2p(a1, c1))

    def double2p(self, a):
        return self.add2p(a, a)

    def neg2p(self, a):
        a0, a1 = self._split(a)
        b = self.base
        return self._cat(b.neg2p(a0), b.neg2p(a1))

    def canon(self, a):
        a0, a1 = self._split(a)
        b = self.base
        return self._cat(b.canon(a0), b.canon(a1))

    # multiplication --------------------------------------------------------

    def mul_lazy(self, a, c):
        """Karatsuba: 3 base products (one fused sop for c0)."""
        a0, a1 = self._split(a)
        c0, c1 = self._split(c)
        b = self.base
        t0 = b.mul_lazy(a0, c0)
        t1 = b.mul_lazy(a1, c1)
        # r0 = t0 + nr*t1 = t0 - |nr|*t1
        r0 = b.sub2p(t0, self._mul_nr_abs(t1))
        # r1 = (a0+a1)(c0+c1) - t0 - t1
        r1 = b.sub2p(b.sub2p(
            b.mul_lazy(b.add2p(a0, a1), b.add2p(c0, c1)), t0), t1)
        return self._cat(r0, r1)

    def sop2(self, a, c, d, e):
        """a*c + d*e over Fp2, fused per component:
        r0 = a0c0 - |nr| a1c1 + d0e0 - |nr| d1e1  (4-term base CIOS
             with the negative terms as neg2p operands)
        r1 = a0c1 + a1c0 + d0e1 + d1e0            (4-term base CIOS)"""
        b = self.base
        a0, a1 = self._split(a)
        c0, c1 = self._split(c)
        d0, d1 = self._split(d)
        e0, e1 = self._split(e)
        na1 = b.neg2p(self._mul_nr_abs(a1))
        nd1 = b.neg2p(self._mul_nr_abs(d1))
        r0 = b.sopk([(a0, c0), (na1, c1), (d0, e0), (nd1, e1)])
        r1 = b.sopk([(a0, c1), (a1, c0), (d0, e1), (d1, e0)])
        return self._cat(r0, r1)
