"""In-circuit pairing tower fields over EMULATED base fields.

Reference: std/algebra/emulated/fields_bn254 + fields_bls12381 —
Fp2/Fp12 towers for in-circuit pairings over non-2-chain curves.

TPU-build design: instead of the reference's nested E2/E6/E12 structs,
Fp12 is the DIRECT sextic algebra Fp2[w]/(w^6 - xi) — the same
representation the host engines use (pairing/tate.py ExtField,
pairing/ate.py), so host values/hints drop straight into circuit
constants. Every coefficient of a product is certified with ONE
emulated sum-of-products carry chain (std/math/emulated.py), the
constraint-count analog of the reference's lazy-reduction multivariate
Eval (fields_bn254/e12.go Mul -> mulMod over polynomials).

Parametrized by TowerParams (BN254: u^2=-1, xi=9+u, 4 limbs;
BLS12-381: u^2=-1, xi=1+u, 6 limbs). Elements: EF2 =
(Element, Element); EF12 = 6-tuple of EF2.
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.host import Fp, Fp2
from gnark_tpu.pairing.tate import ExtField, pow_in
from gnark_tpu.std.math import emulated as emu


@dataclasses.dataclass(frozen=True)
class TowerParams:
    name: str
    fp: emu.EmuParams
    xi: tuple                 # (x0, x1), small ints


BN254_TOWER = TowerParams("bn254", emu.BN254_FP_EMU, (9, 1))
BLS12_381_TOWER = TowerParams("bls12_381", emu.BLS12_381_FP_EMU, (1, 1))

# back-compat aliases (the original module was BN254-only)
P_MOD = emu.BN254_FP_EMU.modulus
XI = (9, 1)


def _host_ext(tower: TowerParams = BN254_TOWER):
    p = tower.fp.modulus
    fp = Fp(p)
    fq = Fp2(fp, p - 1)
    return ExtField(fq, 6, tower.xi)


@register_hint("emu_fp12_inv")
def _fp12_inv(q, inputs):
    """[k, x0, x1, p_limbs(k), 12 coords x k limbs] -> inverse's
    12*k limbs. Coords ordered (c_i0, c_i1) for w^i."""
    k, x0, x1 = inputs[0], inputs[1], inputs[2]
    p = emu._val(inputs, k, 3)
    fp = Fp(p)
    ext = ExtField(Fp2(fp, p - 1), 6, (x0, x1))
    off = 3 + k
    vals = [emu._val(inputs, k, off + k * i) % p for i in range(12)]
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

    def __init__(self, api, fe: emu.EmulatedField | None = None,
                 tower: TowerParams = BN254_TOWER):
        self.api = api
        self.tower = tower
        self.fe = fe or emu.EmulatedField(api, tower.fp)
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
        """a * xi with xi = x0 + x1 u (small ints) — pure linear."""
        x0, x1 = self.tower.xi
        fe = self.fe
        return (fe.sum_of_products(lins=[(x0, a[0]), (-x1, a[1])]),
                fe.sum_of_products(lins=[(x1, a[0]), (x0, a[1])]))

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

    def __init__(self, api, tower: TowerParams = BN254_TOWER):
        self.api = api
        self.tower = tower
        self.f2 = EF2(api, tower=tower)
        self.fe = self.f2.fe
        self.zero = tuple(self.f2.zero for _ in range(6))
        self.one = tuple([self.f2.one] + [self.f2.zero] * 5)
        host = _host_ext(tower)
        self.host = host
        p = tower.fp.modulus
        hf = host.base
        xi = tower.xi
        gamma = pow_in(hf, xi, (p - 1) // 6)
        gamma2 = pow_in(hf, xi, (p * p - 1) // 6)
        delta = pow_in(hf, xi, (p ** 6 - 1) // 6)
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

    def _xi_fold(self, p0, p1, ai, bj):
        """Append the component terms of xi*(ai*bj) to p0/p1."""
        x0, x1 = self.tower.xi
        p0 += [(x0, ai[0], bj[0]), (-x0, ai[1], bj[1]),
               (-x1, ai[0], bj[1]), (-x1, ai[1], bj[0])]
        p1 += [(x1, ai[0], bj[0]), (-x1, ai[1], bj[1]),
               (x0, ai[0], bj[1]), (x0, ai[1], bj[0])]

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
                        self._xi_fold(p0, p1, ai, bj)
            out.append((fe.sum_of_products(p0), fe.sum_of_products(p1)))
        return tuple(out)

    def mul_sparse(self, f, parts: dict):
        """f * sum_j parts[j] w^j for a sparse dict of EF2 elements
        (line shapes: BN D-twist {0,1,3}; BLS M-twist {0,3,5})."""
        fe = self.fe
        out = []
        for k in range(6):
            p0, p1 = [], []
            for i in range(6):
                fi = f[i]
                for j, lj in parts.items():
                    m = i + j
                    if m == k:
                        p0 += [(1, fi[0], lj[0]), (-1, fi[1], lj[1])]
                        p1 += [(1, fi[0], lj[1]), (1, fi[1], lj[0])]
                    elif m == k + 6:
                        self._xi_fold(p0, p1, fi, lj)
            out.append((fe.sum_of_products(p0), fe.sum_of_products(p1)))
        return tuple(out)

    def mul_sparse013(self, f, l0, l1, l3):
        """f * (l0 + l1 w + l3 w^3) — the BN ate line shape."""
        return self.mul_sparse(f, {0: l0, 1: l1, 3: l3})

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
        k = self.fe.k
        x0, x1 = self.tower.xi
        flat = []
        for c in a:
            for comp in c:
                flat.extend(comp.limbs)
        outs = api.new_hint("emu_fp12_inv", 12 * k, k, x0, x1,
                            *self.fe.p_limbs, *flat)
        fe = self.fe
        coords = [fe.from_limb_vars(outs[k * i:k * (i + 1)])
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
