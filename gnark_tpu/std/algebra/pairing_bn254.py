"""In-circuit BN254 optimal-ate pairing over the EMULATED base field.

Reference: std/algebra/emulated/sw_bn254 (pairing.go MillerLoop /
FinalExponentiation / PairingCheck). This is the non-2-chain recursion
path: verify BN254 proofs inside a BN254-scalar-field circuit.

Design: affine Miller loop on the TWIST (slopes in Fp2 from hints,
certified by one zero sum-of-products each), line evaluations in the
sparse (l0, l1 w, l3 w^3) shape (D-twist untwist at w^2/w^3 — same
convention as the host engines, pairing/ate.py), multi-pairing with a
shared f accumulator, and the Beuchat et al. vectorial addition chain
for the hard part of the final exponentiation (validated against plain
exponentiation on the host; see tests).

Soundness caveat (same as the reference's affine formulas): slope
hints certify lam * den == num, which is vacuous when den == 0 — the
caller must ensure non-exceptional inputs (points on-curve, proof
points in their prime-order subgroups; use assert_on_g1/g2 and the
subgroup checks below)."""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.ec.curves_data import CURVES_DATA
from gnark_tpu.ec.host import Fp, Fp2
from gnark_tpu.pairing.tate import pow_in
from gnark_tpu.std.algebra.fields_bn254 import EF2, EF12, P_MOD, XI
from gnark_tpu.std.math import emulated as emu

X_SEED = CURVES_DATA["bn254"]["seed"]
ATE_LOOP = 6 * X_SEED + 2


def _host_fp2():
    return Fp2(Fp(P_MOD), P_MOD - 1)


@register_hint("bn254_fp2_div")
def _fp2_div(q, inputs):
    """[a0,a1,b0,b1] x K limbs -> (a/b) in Fp2, 2K limbs (0 if b=0)."""
    k = emu.K
    f2 = _host_fp2()
    a0, a1, b0, b1 = (emu._val(inputs, k, k * i) % P_MOD
                      for i in range(4))
    if b0 == 0 and b1 == 0:
        r = (0, 0)
    else:
        r = f2.mul((a0, a1), f2.inv((b0, b1)))
    out = []
    for v in r:
        out += [(v >> (emu.B * i)) & emu.MASK for i in range(k)]
    return out


class G2Point:
    __slots__ = ("x", "y")

    def __init__(self, x, y):
        self.x = x          # EF2 element
        self.y = y


class FixedG2:
    """A CONSTANT G2 point (vk/SRS element) with its Miller-loop lines
    precomputed on the host — the fixed-argument pairing optimization
    (reference sw_bn254 lineEvaluation precompute): every per-step
    slope/point becomes a circuit constant, so the only in-circuit
    work left is the two l1-component products per line."""

    __slots__ = ("q", "lines")

    def __init__(self, Q):
        self.q = Q
        self.lines = _host_lines(Q)


def _host_lines(Q):
    """Mirror of the circuit Miller loop on host twist coords:
    -> list of (lam, xt, yt) host-Fp2 triples, in consumption order."""
    f2 = _host_fp2()
    p = P_MOD

    def dbl(T):
        x, y = T
        lam = f2.mul(f2.mul((3, 0), f2.mul(x, x)),
                     f2.inv(f2.mul((2, 0), y)))
        x3 = f2.sub(f2.mul(lam, lam), f2.add(x, x))
        y3 = f2.sub(f2.mul(lam, f2.sub(x, x3)), y)
        return (x3, y3), lam

    def add(T, S):
        (x1, y1), (x2, y2) = T, S
        lam = f2.mul(f2.sub(y2, y1), f2.inv(f2.sub(x2, x1)))
        x3 = f2.sub(f2.sub(f2.mul(lam, lam), x1), x2)
        y3 = f2.sub(f2.mul(lam, f2.sub(x1, x3)), y1)
        return (x3, y3), lam

    g12 = pow_in(f2, XI, (p - 1) // 3)
    g13 = pow_in(f2, XI, (p - 1) // 2)
    g22 = pow_in(f2, XI, (p * p - 1) // 3)
    g23 = pow_in(f2, XI, (p * p - 1) // 2)
    lines = []
    T = Q
    for bit in bin(ATE_LOOP)[3:]:
        Told = T
        T, lam = dbl(T)
        lines.append((lam, Told[0], Told[1]))
        if bit == "1":
            Told = T
            T, lam = add(T, Q)
            lines.append((lam, Told[0], Told[1]))
    Q1 = (f2.mul(g12, f2.conj(Q[0])), f2.mul(g13, f2.conj(Q[1])))
    Q2 = (f2.mul(g22, Q[0]), f2.mul(g23, Q[1]))
    nQ2 = (Q2[0], f2.neg(Q2[1]))
    Told = T
    T, lam = add(T, Q1)
    lines.append((lam, Told[0], Told[1]))
    Told = T
    T, lam = add(T, nQ2)
    lines.append((lam, Told[0], Told[1]))
    return lines


class PairingBN254:
    """In-circuit pairing engine. G1 points are (Element, Element)
    pairs of emulated Fp; G2 points are G2Point of EF2 coords on the
    twist y^2 = x^3 + b/xi."""

    def __init__(self, api):
        self.api = api
        self.f12 = EF12(api)
        self.f2 = self.f12.f2
        self.fe = self.f12.fe
        hf = _host_fp2()
        p = P_MOD
        # twist-Frobenius constants: psi(x, y) = (g12*conj(x), g13*conj(y))
        self.g12 = pow_in(hf, XI, (p - 1) // 3)
        self.g13 = pow_in(hf, XI, (p - 1) // 2)
        self.g22 = pow_in(hf, XI, (p * p - 1) // 3)
        self.g23 = pow_in(hf, XI, (p * p - 1) // 2)
        c = CURVES["bn254"]
        self.b2_const = tuple(c.b2)

    # -- point wellformedness -------------------------------------------------

    def assert_on_g1(self, P):
        """y^2 == x^3 + 3 (G1 cofactor is 1, so this IS the subgroup
        check; reference sw_emulated AssertIsOnCurve)."""
        x, y = P
        fe = self.fe
        x2 = fe.sqr(x)
        d = fe.sum_of_products([(1, y, y), (-1, x2, x)], const=-3)
        for l in d.limbs:
            self.api.assert_is_equal(l, 0)

    def assert_on_g2_curve(self, Q):
        """y^2 == x^3 + b2 (curve membership only; the twist has a
        large cofactor — combine with assert_in_g2_subgroup)."""
        f2 = self.f2
        x2 = f2.sqr(Q.x)
        lhs = f2.sum_of_products([(1, Q.y, Q.y), (-1, x2, Q.x)])
        f2.assert_eq(lhs, f2.from_const(self.b2_const))

    def psi(self, Q, n: int = 1) -> G2Point:
        """Twist endomorphism psi^n (n in {1,2}): coordinate Frobenius
        + gamma constants."""
        f2 = self.f2
        if n == 1:
            return G2Point(f2.mul_const2(f2.conj(Q.x), self.g12),
                           f2.mul_const2(f2.conj(Q.y), self.g13))
        return G2Point(f2.mul_const2(Q.x, self.g22),
                       f2.mul_const2(Q.y, self.g23))

    def assert_in_g2_subgroup(self, Q):
        """psi(Q) == [6x^2]Q pins Q to the order-r subgroup (BN family
        endomorphism eigenvalue; reference gnark-crypto
        bn254.G2Affine.IsInSubGroup)."""
        s = 6 * X_SEED * X_SEED
        R = self._scalar_mul_g2(Q, s)
        PQ = self.psi(Q, 1)
        self.f2.assert_eq(PQ.x, R.x)
        self.f2.assert_eq(PQ.y, R.y)

    # -- twist affine arithmetic ----------------------------------------------

    def _fp2_div_hint(self, a, b):
        api = self.api
        flat = [*a[0].limbs, *a[1].limbs, *b[0].limbs, *b[1].limbs]
        outs = api.new_hint("bn254_fp2_div", 2 * emu.K, *flat)
        fe = self.fe
        return (fe.from_limb_vars(outs[:emu.K]),
                fe.from_limb_vars(outs[emu.K:]))

    def _assert_zero2(self, e2):
        for comp in e2:
            for l in comp.limbs:
                self.api.assert_is_equal(l, 0)

    def g2_double(self, Q):
        """-> (2Q, lam). lam = 3x^2 / 2y certified by
        2y*lam - 3x^2 == 0."""
        f2 = self.f2
        x, y = Q.x, Q.y
        x2 = f2.sqr(x)
        lam = self._fp2_div_hint(f2.mul_int(x2, 3), f2.mul_int(y, 2))
        chk = f2.sum_of_products([(2, y, lam), (-3, x, x)])
        self._assert_zero2(chk)
        fe = self.fe
        x3 = (fe.sum_of_products([(1, lam[0], lam[0]),
                                  (-1, lam[1], lam[1])],
                                 lins=[(-2, x[0])]),
              fe.sum_of_products([(2, lam[0], lam[1])],
                                 lins=[(-2, x[1])]))
        y3 = self._y3(lam, x, x3, y)
        return G2Point(x3, y3), lam

    def g2_add(self, Q1, Q2):
        """-> (Q1+Q2, lam) with lam = (y2-y1)/(x2-x1), certified by
        lam*(x2-x1) - (y2-y1) == 0. Exceptional when x1 == x2."""
        f2 = self.f2
        lam = self._fp2_div_hint(f2.sub(Q2.y, Q1.y), f2.sub(Q2.x, Q1.x))
        chk = f2.sum_of_products([(1, lam, Q2.x), (-1, lam, Q1.x)])
        chk = (self.fe.sum_of_products(
                   lins=[(1, chk[0]), (-1, Q2.y[0]), (1, Q1.y[0])]),
               self.fe.sum_of_products(
                   lins=[(1, chk[1]), (-1, Q2.y[1]), (1, Q1.y[1])]))
        self._assert_zero2(chk)
        fe = self.fe
        x3 = (fe.sum_of_products([(1, lam[0], lam[0]),
                                  (-1, lam[1], lam[1])],
                                 lins=[(-1, Q1.x[0]), (-1, Q2.x[0])]),
              fe.sum_of_products([(2, lam[0], lam[1])],
                                 lins=[(-1, Q1.x[1]), (-1, Q2.x[1])]))
        y3 = self._y3(lam, Q1.x, x3, Q1.y)
        return G2Point(x3, y3), lam

    def _y3(self, lam, x1, x3, y1):
        """y3 = lam*(x1 - x3) - y1 (Fp2, two chains)."""
        fe = self.fe
        return (fe.sum_of_products(
                    [(1, lam[0], x1[0]), (-1, lam[0], x3[0]),
                     (-1, lam[1], x1[1]), (1, lam[1], x3[1])],
                    lins=[(-1, y1[0])]),
                fe.sum_of_products(
                    [(1, lam[0], x1[1]), (-1, lam[0], x3[1]),
                     (1, lam[1], x1[0]), (-1, lam[1], x3[0])],
                    lins=[(-1, y1[1])]))

    def g2_neg(self, Q):
        return G2Point(Q.x, self.f2.neg(Q.y))

    def _scalar_mul_g2(self, Q, s: int) -> G2Point:
        """[s]Q by double-add (s a fixed host integer)."""
        R = Q
        for b in bin(s)[3:]:
            R, _ = self.g2_double(R)
            if b == "1":
                R, _ = self.g2_add(R, Q)
        return R

    # -- lines ----------------------------------------------------------------

    def _line(self, lam, T, P):
        """l(P) = yp - lam*xp w + (lam*xt - yt) w^3, P=(xp,yp) in G1.
        Returns the sparse013 triple of EF2 elements."""
        fe = self.fe
        xp, yp = P
        xt, yt = T.x, T.y
        l0 = (yp, fe.zero)
        l1 = (fe.sum_of_products([(-1, lam[0], xp)]),
              fe.sum_of_products([(-1, lam[1], xp)]))
        l3 = (fe.sum_of_products([(1, lam[0], xt[0]),
                                  (-1, lam[1], xt[1])],
                                 lins=[(-1, yt[0])]),
              fe.sum_of_products([(1, lam[0], xt[1]),
                                  (1, lam[1], xt[0])],
                                 lins=[(-1, yt[1])]))
        return l0, l1, l3

    # -- Miller loop ----------------------------------------------------------

    def miller_loop(self, pairs):
        """prod_i f_{6x+2, Q_i}(P_i) * psi-correction lines — shared f
        accumulator across pairs (one squaring per bit). Q_i may be a
        variable G2Point or a FixedG2 constant (precomputed lines)."""
        f12 = self.f12
        state = []
        for P, Q in pairs:
            if isinstance(Q, FixedG2):
                state.append({"fixed": iter(Q.lines), "P": P})
            else:
                state.append({"Q": Q, "T": Q, "P": P})
        f = None

        def step(st, kind):
            nonlocal f
            if "fixed" in st:
                lam, xt, yt = next(st["fixed"])
                line = self._line_const(lam, xt, yt, st["P"])
            else:
                Told = st["T"]
                if kind == "dbl":
                    st["T"], lam = self.g2_double(st["T"])
                else:
                    st["T"], lam = self.g2_add(st["T"], kind)
                line = self._line(lam, Told, st["P"])
            f = self._mul_line(f, line)

        for bit in bin(ATE_LOOP)[3:]:
            if f is not None:
                f = f12.sqr(f)
            for st in state:
                step(st, "dbl")
            if bit == "1":
                for st in state:
                    step(st, st.get("Q"))
        # BN psi-correction lines
        for st in state:
            if "fixed" in st:
                step(st, None)
                step(st, None)
                continue
            Q1 = self.psi(st["Q"], 1)
            Q2 = self.psi(st["Q"], 2)
            step(st, Q1)
            step(st, self.g2_neg(Q2))
        return f

    def _line_const(self, lam, xt, yt, P):
        """Line with CONSTANT (lam, xt, yt): l3 folds to a constant,
        l1 = -lam*xp needs two constant-by-variable products."""
        fe = self.fe
        f2h = _host_fp2()
        xp, yp = P
        l0 = (yp, fe.zero)
        lam0 = fe.from_const(lam[0])
        lam1 = fe.from_const(lam[1])
        l1 = (fe.sum_of_products([(-1, lam0, xp)]),
              fe.sum_of_products([(-1, lam1, xp)]))
        l3c = f2h.sub(f2h.mul(lam, xt), yt)
        l3 = self.f2.from_const(l3c)
        return l0, l1, l3

    def _mul_line(self, f, line):
        l0, l1, l3 = line
        f12 = self.f12
        if f is None:
            # first line: embed sparsely
            e = [l0, l1, f12.f2.zero, l3, f12.f2.zero, f12.f2.zero]
            return tuple(e)
        return f12.mul_sparse013(f, l0, l1, l3)

    # -- final exponentiation -------------------------------------------------

    def _pow_x(self, a):
        """a^x (x = BN seed) by square-and-multiply."""
        f12 = self.f12
        r = a
        for b in bin(X_SEED)[3:]:
            r = f12.sqr(r)
            if b == "1":
                r = f12.mul(r, a)
        return r

    def final_exponentiation(self, f):
        """f^((p^12-1)/r): easy part then the Beuchat et al. chain
        (host-validated against plain pow in tests/test_pairing.py)."""
        f12 = self.f12
        # easy: f^(p^6-1) = conj6(f) * f^-1; then ^(p^2+1)
        f = f12.mul(f12.conj6(f), f12.inv(f))
        f = f12.mul(f12.frob2(f), f)
        conj = f12.conj6            # cyclotomic inverse from here on
        fx = self._pow_x(f)
        fx2 = self._pow_x(fx)
        fx3 = self._pow_x(fx2)
        y0 = f12.mul(f12.mul(f12.frob(f), f12.frob2(f)),
                     f12.frob(f12.frob2(f)))
        y1 = conj(f)
        y2 = f12.frob2(fx2)
        y3 = conj(f12.frob(fx))
        y4 = conj(f12.mul(fx, f12.frob(fx2)))
        y5 = conj(fx2)
        y6 = conj(f12.mul(fx3, f12.frob(fx3)))
        t0 = f12.mul(f12.mul(f12.sqr(y6), y4), y5)
        t1 = f12.mul(f12.mul(y3, y5), t0)
        t0 = f12.mul(t0, y2)
        t1 = f12.sqr(f12.mul(f12.sqr(t1), t0))
        t0b = f12.mul(t1, y1)
        t1b = f12.mul(t1, y0)
        return f12.mul(f12.sqr(t0b), t1b)

    # -- public API -----------------------------------------------------------

    def pair(self, P, Q):
        return self.final_exponentiation(self.miller_loop([(P, Q)]))

    def pairing_check(self, pairs):
        """assert prod e(P_i, Q_i) == 1."""
        f = self.final_exponentiation(self.miller_loop(pairs))
        self.f12.assert_one(f)
