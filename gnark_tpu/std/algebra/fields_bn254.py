"""In-circuit BN254 tower fields over the EMULATED base field.

Reference: std/algebra/emulated/fields_bn254 — Fp2/Fp6/Fp12 towers for
the in-circuit BN254 pairing (recursion over a non-2-chain curve).

TPU-build design: instead of the reference's nested E2/E6/E12 structs,
Fp12 is the DIRECT sextic algebra Fp2[w]/(w^6 - xi), xi = 9 + u — the
same representation the host engines use (pairing/tate.py ExtField,
pairing/ate.py), so host values/hints drop straight into circuit
constants. Every coefficient of a product is certified with ONE
emulated sum-of-products carry chain (std/math/emulated.py), which is
the constraint-count analog of the reference's lazy-reduction
multivariate Eval (fields_bn254/e12.go Mul -> mulMod over polynomials).

Elements: EF2 = (Element, Element); EF12 = 6-tuple of EF2.
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.host import Fp, Fp2
from gnark_tpu.pairing.tate import ExtField, pow_in
from gnark_tpu.std.math import emulated as emu

P_MOD = emu.BN254_FP_EMU.modulus
XI = (9, 1)                      # w^6 = 9 + u;  u^2 = -1


def _host_ext():
    fp = Fp(P_MOD)
    fq = Fp2(fp, P_MOD - 1)
    return ExtField(fq, 6, XI)


@register_hint("bn254_fp12_inv")
def _fp12_inv(q, inputs):
    """48 limbs (12 Fp coords x 4 limbs, coords ordered
    (c_i0, c_i1) for w^i) -> inverse's 48 limbs."""
    k = emu.K
    ext = _host_ext()
    vals = [emu._val(inputs, k, k * i) % P_MOD for i in range(12)]
    e = tuple((vals[2 * i], vals[2 * i + 1]) for i in range(6))
    out = ext.inv(e)
    limbs = []
    for c0, c1 in out:
        for v in (c0, c1):
            limbs += [(v >> (emu.B * i)) & emu.MASK for i in range(k)]
    return limbs


class EF2:
    """Emulated Fp2 = Fp[u]/(u^2 + 1). Elements are pairs of
    emulated-Fp Elements."""

    def __init__(self, api, fe: emu.EmulatedField | None = None):
        self.api = api
        self.fe = fe or emu.EmulatedField(api, emu.BN254_FP_EMU)
        z, o = self.fe.zero, self.fe.one
        self.zero = (z, z)
        self.one = (o, z)

    def from_const(self, c) -> tuple:
        if isinstance(c, int):
            c = (c, 0)
        return (self.fe.from_const(c[0]), self.fe.from_const(c[1]))

    # -- linear ----------------------------------------------------------------

    def add(self, a, b):
        fe = self.fe
        return (fe.add(a[0], b[0]), fe.add(a[1], b[1]))

    def sub(self, a, b):
        fe = self.fe
        return (fe.sub(a[0], b[0]), fe.sub(a[1], b[1]))

    def neg(self, a):
        fe = self.fe
        return (fe.neg(a[0]), fe.neg(a[1]))

    def conj(self, a):
        return (a[0], self.fe.neg(a[1]))

    def mul_int(self, a, c: int):
        fe = self.fe
        return (fe.mul_const(a[0], c), fe.mul_const(a[1], c))

    # -- bilinear: the SoP workhorse ------------------------------------------

    def sum_of_products(self, terms):
        """sum c_t * a_t * b_t over Fp2, c_t small ints, certified with
        TWO Fp carry chains total."""
        p0, p1 = [], []
        for c, a, b in terms:
            p0 += [(c, a[0], b[0]), (-c, a[1], b[1])]
            p1 += [(c, a[0], b[1]), (c, a[1], b[0])]
        fe = self.fe
        return (fe.sum_of_products(p0), fe.sum_of_products(p1))

    def mul(self, a, b):
        return self.sum_of_products([(1, a, b)])

    def sqr(self, a):
        return self.sum_of_products([(1, a, a)])

    def mul_fp(self, a, s):
        """a * s, s an emulated-Fp Element."""
        fe = self.fe
        return (fe.sum_of_products([(1, a[0], s)]),
                fe.sum_of_products([(1, a[1], s)]))

    def mul_const2(self, a, c) -> tuple:
        """a * c with c a CONSTANT Fp2 value (big ints allowed: the
        constant folds into one operand of the products)."""
        c0 = self.fe.from_const(c[0])
        c1 = self.fe.from_const(c[1])
        fe = self.fe
        r0 = fe.sum_of_products([(1, a[0], c0), (-1, a[1], c1)])
        r1 = fe.sum_of_products([(1, a[0], c1), (1, a[1], c0)])
        return (r0, r1)

    def mul_by_xi(self, a):
        """a * (9 + u): (9a0 - a1, a0 + 9a1) — pure linear."""
        fe = self.fe
        return (fe.sum_of_products(lins=[(9, a[0]), (-1, a[1])]),
                fe.sum_of_products(lins=[(1, a[0]), (9, a[1])]))

    def inv(self, a):
        """1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2)."""
        fe = self.fe
        den = fe.sum_of_products([(1, a[0], a[0]), (1, a[1], a[1])])
        return (fe.div(a[0], den), fe.neg(fe.div(a[1], den)))

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def select(self, cond, a, b):
        fe = self.fe
        return (fe.select(cond, a[0], b[0]), fe.select(cond, a[1], b[1]))

    def is_zero(self, a):
        api = self.api
        return api.and_(self.fe.is_zero(a[0]), self.fe.is_zero(a[1]))

    def assert_eq(self, a, b):
        self.fe.assert_is_equal(a[0], b[0])
        self.fe.assert_is_equal(a[1], b[1])


class EF12:
    """Emulated Fp12 as Fp2[w]/(w^6 - xi) (direct sextic)."""

    def __init__(self, api):
        self.api = api
        self.f2 = EF2(api)
        self.fe = self.f2.fe
        self.zero = tuple(self.f2.zero for _ in range(6))
        self.one = tuple([self.f2.one] + [self.f2.zero] * 5)
        host = _host_ext()
        self.host = host
        p = P_MOD
        hf = host.base
        gamma = pow_in(hf, XI, (p - 1) // 6)
        gamma2 = pow_in(hf, XI, (p * p - 1) // 6)
        delta = pow_in(hf, XI, (p ** 6 - 1) // 6)
        self.gammas = [pow_in(hf, gamma, i) for i in range(6)]
        self.gammas2 = [pow_in(hf, gamma2, i) for i in range(6)]
        self.deltas = [pow_in(hf, delta, i) for i in range(6)]

    def from_const(self, e):
        """Host ExtField element (6 int-pairs) -> circuit constants."""
        return tuple(self.f2.from_const(tuple(c)) for c in e)

    def from_vars(self, coords):
        """12 circuit Fp Elements (c00,c01,c10,c11,...) -> EF12."""
        return tuple((coords[2 * i], coords[2 * i + 1]) for i in range(6))

    def add(self, a, b):
        return tuple(self.f2.add(x, y) for x, y in zip(a, b))

    def mul(self, a, b):
        return self._mul_like(a, b)

    def sqr(self, a):
        return self._mul_like(a, a)

    def _mul_like(self, a, b):
        fe = self.fe
        out = []
        for k in range(6):
            p0, p1 = [], []
            for i in range(6):
                for j in range(6):
                    m = i + j
                    ai, bj = a[i], b[j]
                    if m == k:
                        p0 += [(1, ai[0], bj[0]), (-1, ai[1], bj[1])]
                        p1 += [(1, ai[0], bj[1]), (1, ai[1], bj[0])]
                    elif m == k + 6:
                        # xi*(ai*bj) with xi = 9+u:
                        # c0 = 9(x0) - (x1); c1 = (x0) + 9(x1)
                        # where x0 = ai0bj0 - ai1bj1, x1 = ai0bj1+ai1bj0
                        p0 += [(9, ai[0], bj[0]), (-9, ai[1], bj[1]),
                               (-1, ai[0], bj[1]), (-1, ai[1], bj[0])]
                        p1 += [(1, ai[0], bj[0]), (-1, ai[1], bj[1]),
                               (9, ai[0], bj[1]), (9, ai[1], bj[0])]
            out.append((fe.sum_of_products(p0), fe.sum_of_products(p1)))
        return tuple(out)

    def mul_sparse013(self, f, l0, l1, l3):
        """f * (l0 + l1 w + l3 w^3): the ate line shape. l0/l1/l3 are
        EF2 elements (l0 typically with zero u-part)."""
        fe = self.fe
        sparse = {0: l0, 1: l1, 3: l3}
        out = []
        for k in range(6):
            p0, p1 = [], []
            for i in range(6):
                for j, lj in sparse.items():
                    m = i + j
                    fi = f[i]
                    if m == k:
                        p0 += [(1, fi[0], lj[0]), (-1, fi[1], lj[1])]
                        p1 += [(1, fi[0], lj[1]), (1, fi[1], lj[0])]
                    elif m == k + 6:
                        p0 += [(9, fi[0], lj[0]), (-9, fi[1], lj[1]),
                               (-1, fi[0], lj[1]), (-1, fi[1], lj[0])]
                        p1 += [(1, fi[0], lj[0]), (-1, fi[1], lj[1]),
                               (9, fi[0], lj[1]), (9, fi[1], lj[0])]
            out.append((fe.sum_of_products(p0), fe.sum_of_products(p1)))
        return tuple(out)

    # -- Frobenius ------------------------------------------------------------

    def frob(self, a):
        """a^p: conj each Fp2 coeff, times gamma^i constants."""
        f2 = self.f2
        return tuple(
            f2.mul_const2(f2.conj(ai), self.gammas[i])
            for i, ai in enumerate(a))

    def frob2(self, a):
        """a^(p^2): Fp2 fixed; times gamma2^i (constants, in Fp)."""
        f2 = self.f2
        return tuple(
            f2.mul_const2(ai, self.gammas2[i])
            for i, ai in enumerate(a))

    def conj6(self, a):
        """a^(p^6): the cyclotomic inverse after the easy part."""
        f2 = self.f2
        return tuple(
            f2.mul_const2(ai, self.deltas[i])
            for i, ai in enumerate(a))

    # -- inverse & equality ---------------------------------------------------

    def inv(self, a):
        api = self.api
        flat = []
        for c in a:
            for comp in c:
                flat.extend(comp.limbs)
        outs = api.new_hint("bn254_fp12_inv", 12 * emu.K, *flat)
        fe = self.fe
        coords = [fe.from_limb_vars(outs[emu.K * i:emu.K * (i + 1)])
                  for i in range(12)]
        r = self.from_vars(coords)
        self.assert_eq(self.mul(a, r), self.one)
        return r

    def div(self, a, b):
        return self.mul(a, self.inv(b))

    def select(self, cond, a, b):
        f2 = self.f2
        return tuple(f2.select(cond, x, y) for x, y in zip(a, b))

    def assert_eq(self, a, b):
        for x, y in zip(a, b):
            self.f2.assert_eq(x, y)

    def assert_one(self, a):
        self.assert_eq(a, self.one)
