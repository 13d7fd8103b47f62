"""In-circuit BLS12-381 ate pairing over the EMULATED base field
(reference std/algebra/emulated/sw_bls12381).

Unlocks the EIP-4844 KZG point-evaluation precompile and the EVM
BLS12-381 precompile family (0x0b-0x11), plus recursion over
BLS12-381 artifacts.

Differences from the BN254 circuit (pairing_bn254.py):
- M-type twist: untwist divides by w^2/w^3, so the line shape is
  l0 + l3 w^3 + l5 w^5 (after scaling the line by the constant xi,
  which the final exponentiation kills — xi in Fp2 has
  xi^(p^6-1) = 1);
- loop = |x| with x = -0xd201000000010000 (negative seed: p^6
  conjugation before the final exponentiation, like the host engine);
- no psi-correction lines;
- final exponentiation: easy part + the HHT chain to
  3*(p^4-p^2+1)/r — this gadget computes e^3, a fixed odd power, so
  pairing-product checks are unchanged (same trick as the native
  pairing_bls12377 circuit; the exponent identity is pinned in tests).
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.curves_data import CURVES_DATA
from gnark_tpu.ec.host import Fp, Fp2
from gnark_tpu.std.algebra.fields_bn254 import BLS12_381_TOWER, EF12, _host_ext
from gnark_tpu.std.math import emulated as emu

X_SEED = CURVES_DATA["bls12_381"]["seed"]        # negative
P_MOD381 = BLS12_381_TOWER.fp.modulus


def _host_fp2():
    return Fp2(Fp(P_MOD381), P_MOD381 - 1)


@register_hint("bls381_fp2_div")
def _fp2_div381(q, inputs):
    """[k, a0,a1,b0,b1 x k limbs] -> (a/b) in Fp2, 2k limbs."""
    k = inputs[0]
    f2 = _host_fp2()
    a0, a1, b0, b1 = (emu._val(inputs, k, 1 + k * i) % P_MOD381
                      for i in range(4))
    if b0 == 0 and b1 == 0:
        r = (0, 0)
    else:
        r = f2.mul((a0, a1), f2.inv((b0, b1)))
    out = []
    for v in r:
        out += [(v >> (emu.B * i)) & emu.MASK for i in range(k)]
    return out


class G2Point381:
    __slots__ = ("x", "y")

    def __init__(self, x, y):
        self.x = x
        self.y = y


class PairingBLS12381:
    def __init__(self, api):
        self.api = api
        self.f12 = EF12(api, tower=BLS12_381_TOWER)
        self.f2 = self.f12.f2
        self.fe = self.f12.fe
        c = CURVES["bls12_381"]
        self.curve = c
        self.b2_const = tuple(c.b2)
        self.xi = BLS12_381_TOWER.xi

    # -- wellformedness --------------------------------------------------------

    def assert_on_g1(self, P):
        x, y = P
        fe = self.fe
        x2 = fe.sqr(x)
        d = fe.sum_of_products([(1, y, y), (-1, x2, x)],
                               const=-self.curve.b)
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)

    def assert_on_g2_curve(self, Q):
        f2 = self.f2
        x2 = f2.sqr(Q.x)
        lhs = f2.sum_of_products([(1, Q.y, Q.y), (-1, x2, Q.x)])
        f2.assert_eq(lhs, f2.from_const(self.b2_const))

    # -- twist affine arithmetic ------------------------------------------------

    def _fp2_div_hint(self, a, b):
        api = self.api
        k = self.fe.k
        flat = [*a[0].limbs, *a[1].limbs, *b[0].limbs, *b[1].limbs]
        outs = api.new_hint("bls381_fp2_div", 2 * k, k, *flat)
        fe = self.fe
        return (fe.from_limb_vars(outs[:k]),
                fe.from_limb_vars(outs[k:]))

    def _assert_zero2(self, e2):
        for comp in e2:
            for l in comp.limbs:
                self.api.assert_is_equal(l, 0)

    def g2_double(self, Q):
        f2, fe = self.f2, self.fe
        x, y = Q.x, Q.y
        x2 = f2.sqr(x)
        lam = self._fp2_div_hint(f2.mul_int(x2, 3), f2.mul_int(y, 2))
        self._assert_zero2(f2.sum_of_products([(2, y, lam), (-3, x, x)]))
        x3 = (fe.sum_of_products([(1, lam[0], lam[0]),
                                  (-1, lam[1], lam[1])],
                                 lins=[(-2, x[0])]),
              fe.sum_of_products([(2, lam[0], lam[1])],
                                 lins=[(-2, x[1])]))
        y3 = self._y3(lam, x, x3, y)
        return G2Point381(x3, y3), lam

    def g2_add(self, Q1, Q2):
        f2, fe = self.f2, self.fe
        lam = self._fp2_div_hint(f2.sub(Q2.y, Q1.y), f2.sub(Q2.x, Q1.x))
        chk = f2.sum_of_products([(1, lam, Q2.x), (-1, lam, Q1.x)])
        chk = (fe.sum_of_products(
                   lins=[(1, chk[0]), (-1, Q2.y[0]), (1, Q1.y[0])]),
               fe.sum_of_products(
                   lins=[(1, chk[1]), (-1, Q2.y[1]), (1, Q1.y[1])]))
        self._assert_zero2(chk)
        x3 = (fe.sum_of_products([(1, lam[0], lam[0]),
                                  (-1, lam[1], lam[1])],
                                 lins=[(-1, Q1.x[0]), (-1, Q2.x[0])]),
              fe.sum_of_products([(2, lam[0], lam[1])],
                                 lins=[(-1, Q1.x[1]), (-1, Q2.x[1])]))
        y3 = self._y3(lam, Q1.x, x3, Q1.y)
        return G2Point381(x3, y3), lam

    def _y3(self, lam, x1, x3, y1):
        fe = self.fe
        return (fe.sum_of_products(
                    [(1, lam[0], x1[0]), (-1, lam[0], x3[0]),
                     (-1, lam[1], x1[1]), (1, lam[1], x3[1])],
                    lins=[(-1, y1[0])]),
                fe.sum_of_products(
                    [(1, lam[0], x1[1]), (-1, lam[0], x3[1]),
                     (1, lam[1], x1[0]), (-1, lam[1], x3[0])],
                    lins=[(-1, y1[1])]))

    # -- lines (M-twist, xi-scaled) ---------------------------------------------

    def _line(self, lam, T, P):
        """xi * l(P) = yp*xi - (lam*xp) w^5 + (lam*xt - yt) w^3."""
        fe, f2 = self.fe, self.f2
        xp, yp = P
        xt, yt = T.x, T.y
        x0, x1 = self.xi
        l0 = (fe.mul_const(yp, x0), fe.mul_const(yp, x1))
        l5 = (fe.sum_of_products([(-1, lam[0], xp)]),
              fe.sum_of_products([(-1, lam[1], xp)]))
        l3 = (fe.sum_of_products([(1, lam[0], xt[0]),
                                  (-1, lam[1], xt[1])],
                                 lins=[(-1, yt[0])]),
              fe.sum_of_products([(1, lam[0], xt[1]),
                                  (1, lam[1], xt[0])],
                                 lins=[(-1, yt[1])]))
        return {0: l0, 3: l3, 5: l5}

    # -- Miller loop --------------------------------------------------------------

    def miller_loop(self, pairs):
        """prod_i f_{|x|, Q_i}(P_i), conj6 at the end (x < 0)."""
        f12 = self.f12
        state = [{"Q": Q, "T": Q, "P": P} for P, Q in pairs]
        f = None
        for bit in bin(abs(X_SEED))[3:]:
            if f is not None:
                f = f12.sqr(f)
            for st in state:
                Told = st["T"]
                st["T"], lam = self.g2_double(st["T"])
                line = self._line(lam, Told, st["P"])
                f = self._mul_line(f, line)
            if bit == "1":
                for st in state:
                    Told = st["T"]
                    st["T"], lam = self.g2_add(st["T"], st["Q"])
                    line = self._line(lam, Told, st["P"])
                    f = self._mul_line(f, line)
        return f12.conj6(f)

    def _mul_line(self, f, line):
        f12 = self.f12
        if f is None:
            e = [line.get(i, f12.f2.zero) for i in range(6)]
            return tuple(e)
        return f12.mul_sparse(f, line)

    # -- final exponentiation (e^3, HHT chain) ------------------------------------

    def _pow_abs_x(self, a):
        """a^|x| by square-and-multiply."""
        f12 = self.f12
        r = a
        for b in bin(abs(X_SEED))[3:]:
            r = f12.sqr(r)
            if b == "1":
                r = f12.mul(r, a)
        return r

    def _pow_x_cyclo(self, a):
        """a^x for the NEGATIVE seed, valid in the cyclotomic
        subgroup: conj6(a^|x|)."""
        return self.f12.conj6(self._pow_abs_x(a))

    def final_exponentiation(self, f):
        """f^(3*(p^12-1)/r): easy part + the chain
        (x-1)^2 (x+p)(x^2+p^2-1) + 3 (pairing_bls12377 structure)."""
        f12 = self.f12
        m = f12.mul(f12.conj6(f), f12.inv(f))
        m = f12.mul(f12.frob2(m), m)
        conj = f12.conj6
        a1 = f12.mul(self._pow_x_cyclo(m), conj(m))
        a2 = f12.mul(self._pow_x_cyclo(a1), conj(a1))
        b = f12.mul(self._pow_x_cyclo(a2), f12.frob(a2))
        c = self._pow_x_cyclo(self._pow_x_cyclo(b))
        e = f12.mul(f12.mul(c, f12.frob2(b)), conj(b))
        m3 = f12.mul(f12.sqr(m), m)
        return f12.mul(e, m3)

    # -- public API -----------------------------------------------------------------

    def pair(self, P, Q):
        """e(P, Q)^3 (fixed odd power; see module docstring)."""
        return self.final_exponentiation(self.miller_loop([(P, Q)]))

    def pairing_check(self, pairs):
        f = self.final_exponentiation(self.miller_loop(pairs))
        self.f12.assert_one(f)
