"""In-circuit RFC 9380 SSWU map-to-curve for BLS12-381 G1/G2 over the
emulated base field (reference std/algebra/emulated/sw_bls12381/
map_to_g1.go:78-185, map_to_g2.go:124-200).

MapToG1/MapToG2 = SSWU (hinted sqrt_ratio with the reference's
xor(b1,b2)==1 constraint scheme) + the DERIVED 11-/3-isogeny tables
(ec/sswu_data.py, see tools/derive_sswu.py) + cofactor clearing
(G1: constant-scalar [h_eff] = [1-z]; G2: the Budroni-Pintore psi
chain, map_to_g2.go:94-121).

Incomplete-add caveat (house style of this stdlib, same as the
reference's scalarMulBySeed): the constant-scalar ladders use
distinct-x adds whose divisions enforce a nonzero denominator, so an
exceptional acc == +/-pt collision makes the circuit UNSATISFIABLE
(a completeness gap, never a soundness one). For G1 the exceptional
set is the preimages of small-order points (3 | cofactor), matching
the reference's ClearCofactor structure (map_to_g1.go); for G2 the
two adds that are reachable with equal inputs (ClearCofactor steps
6/8, psi(P) == [seed]P on the r-torsion) use complete unified
addition like the reference (map_to_g2.go:111,115).
"""

from __future__ import annotations

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec import hash_to_curve as h2c
from gnark_tpu.ec.sswu_data import (G1_XDEN, G1_XNUM, G1_YDEN, G1_YNUM,
                                    G2_XDEN, G2_XNUM, G2_YDEN, G2_YNUM)
from gnark_tpu.std.algebra.fields_bn254 import BLS12_381_TOWER, EF2
from gnark_tpu.std.algebra.pairing_bls12381 import G2Point381
from gnark_tpu.std.math import emulated as emu

P381 = h2c.P
H_EFF_G1 = 1 - h2c.SEED               # 0xd201000000010001
ABS_SEED = -h2c.SEED                  # 0xd201000000010000


# ------------------------------------------------------------- hints --

@register_hint("sswu381_sqrt_ratio_g1")
def _sqrt_ratio_g1_hint(q, inputs):
    """[k, u(k), v(k)] -> [is_qr, y(k)] for u/v in Fp, Z = 11."""
    k = inputs[0]
    u = emu._val(inputs, k, 1) % P381
    v = emu._val(inputs, k, 1 + k) % P381
    ok, y = h2c._sqrt_ratio_fp(u, v, h2c.G1_Z)
    return [1 if ok else 0] + [(y >> (emu.B * i)) & emu.MASK
                               for i in range(k)]


@register_hint("sswu381_sqrt_ratio_g2")
def _sqrt_ratio_g2_hint(q, inputs):
    """[k, u0,u1,v0,v1 (k each)] -> [is_qr, y0(k), y1(k)] in Fp2."""
    k = inputs[0]
    u0, u1, v0, v1 = (emu._val(inputs, k, 1 + k * i) % P381
                      for i in range(4))
    ok, y = h2c._sqrt_ratio_fp2((u0, u1), (v0, v1), h2c.G2_Z)
    out = [1 if ok else 0]
    for c in y:
        out += [(c >> (emu.B * i)) & emu.MASK for i in range(k)]
    return out


# ---------------------------------------------------------------- G1 --

class MapToG1:
    """SSWU + isogeny + cofactor clearing on emulated BLS12-381 Fp."""

    def __init__(self, api):
        self.api = api
        self.f = emu.EmulatedField(api, emu.BLS12_381_FP_EMU)

    # -- field helpers ----------------------------------------------

    def _sgn0(self, a):
        ac = self.f.reduce_strict(a)
        return self.api.to_binary(ac.limbs[0], emu.B)[0]

    def _sqrt_ratio(self, u, v):
        f, api = self.f, self.api
        k = f.k
        flat = [k]
        for e in (u, v):
            flat += list(f.reduce_strict(e).limbs)
        outs = api.new_hint("sswu381_sqrt_ratio_g1", 1 + k, *flat)
        b = outs[0]
        api.assert_is_boolean(b)
        y = f.from_limb_vars(outs[1:])
        y2v = f.mul(f.mul(y, y), v)
        b1 = api.and_(b, f.is_zero(f.sub(y2v, u)))
        uz = f.mul_const(u, h2c.G1_Z)
        b2 = api.and_(api.is_zero(b), f.is_zero(f.sub(y2v, uz)))
        api.assert_is_equal(api.xor(b1, b2), 1)
        return b, y

    def map_to_curve(self, u):
        """SSWU onto the 11-isogenous curve E1' (RFC 9380 F.2)."""
        f, api = self.f, self.api
        A = f.from_const(h2c.G1_A)
        B = f.from_const(h2c.G1_B)
        Z = f.from_const(h2c.G1_Z)
        one = f.from_const(1)
        tv1 = f.mul(Z, f.mul(u, u))
        tv2 = f.add(f.mul(tv1, tv1), tv1)
        tv3 = f.mul(B, f.add(tv2, one))
        tv4 = f.mul(A, f.select(f.is_zero(tv2), Z, f.neg(tv2)))
        tv2 = f.mul(tv3, tv3)
        tv6 = f.mul(tv4, tv4)
        tv5 = f.mul(A, tv6)
        tv2 = f.mul(f.add(tv2, tv5), tv3)
        tv6 = f.mul(tv6, tv4)
        tv5 = f.mul(B, tv6)
        tv2 = f.add(tv2, tv5)
        x = f.mul(tv1, tv3)
        ok, y1 = self._sqrt_ratio(tv2, tv6)
        y = f.mul(f.mul(tv1, u), y1)
        x = f.select(ok, tv3, x)
        y = f.select(ok, y1, y)
        e1 = api.is_zero(api.sub(self._sgn0(u), self._sgn0(y)))
        y = f.select(e1, y, f.neg(y))
        x = f.div(x, tv4)
        return (x, y)

    def _horner(self, coeffs, x):
        f = self.f
        res = f.from_const(coeffs[-1])
        for c in reversed(coeffs[:-1]):
            res = f.add(f.mul(res, x), f.from_const(c))
        return res

    def isogeny(self, pt):
        """Evaluate the derived 11-isogeny E1' -> E (x maps as
        rational functions; reference map_to_g1.go:35-45)."""
        f = self.f
        x, y = pt
        xn = self._horner(G1_XNUM, x)
        xd = self._horner(G1_XDEN, x)
        yn = self._horner(G1_YNUM, x)
        yd = self._horner(G1_YDEN, x)
        X = f.div(xn, xd)
        Y = f.div(f.mul(y, yn), yd)
        return (X, Y)

    # -- curve arithmetic on E: y^2 = x^3 + 4 ------------------------

    def _dbl(self, Pt):
        f = self.f
        x1, y1 = Pt
        lam = f.div(f.mul_const(f.mul(x1, x1), 3), f.mul_const(y1, 2))
        x3 = f.sub(f.mul(lam, lam), f.mul_const(x1, 2))
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def _add(self, Pt, Q):
        f = self.f
        x1, y1 = Pt
        x2, y2 = Q
        lam = f.div(f.sub(y2, y1), f.sub(x2, x1))
        x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def clear_cofactor(self, pt):
        """[h_eff] pt, h_eff = 1 - z (eprint 2019/403 section 5;
        reference map_to_g1.go:56-76). Constant scalar -> unrolled
        double-and-add, MSB first.

        Completeness caveat (matches the reference G1 structure): the
        ladder uses INCOMPLETE adds, so a crafted u whose SSWU image
        is a small-order point (3 | G1 cofactor) can hit acc == +-pt,
        where _add's division by x2-x1 == 0 makes the circuit
        UNSATISFIABLE (a liveness failure, never a soundness hole —
        f.div constrains a nonzero divisor). Honest inputs land in the
        torsion-free image where the exceptional case cannot occur."""
        bits = bin(H_EFF_G1)[2:]
        acc = pt
        for b in bits[1:]:
            acc = self._dbl(acc)
            if b == "1":
                acc = self._add(acc, pt)
        return acc

    def map_to_g1(self, u):
        """Full MAP_FP_TO_G1 (EIP-2537 0x10)."""
        return self.clear_cofactor(self.isogeny(self.map_to_curve(u)))


# ---------------------------------------------------------------- G2 --

class MapToG2:
    """SSWU + 3-isogeny + BP cofactor clearing on the emulated
    BLS12-381 Fp2 twist."""

    def __init__(self, api):
        self.api = api
        self.f2 = EF2(api, tower=BLS12_381_TOWER)
        self.fe = self.f2.fe

    def _sgn0(self, a):
        """RFC 9380 4.1 for m=2 (reference map_to_g2.go:50-59)."""
        api = self.api
        a0 = self.fe.reduce_strict(a[0])
        a1 = self.fe.reduce_strict(a[1])
        sign0 = api.to_binary(a0.limbs[0], emu.B)[0]
        zero0 = self.fe.is_zero(a0)
        sign1 = api.to_binary(a1.limbs[0], emu.B)[0]
        return api.or_(sign0, api.and_(zero0, sign1))

    def _sqrt_ratio(self, u, v):
        f2, api = self.f2, self.api
        k = self.fe.k
        flat = [k]
        for e2 in (u, v):
            for c in e2:
                flat += list(self.fe.reduce_strict(c).limbs)
        outs = api.new_hint("sswu381_sqrt_ratio_g2", 1 + 2 * k, *flat)
        b = outs[0]
        api.assert_is_boolean(b)
        y = (self.fe.from_limb_vars(outs[1:1 + k]),
             self.fe.from_limb_vars(outs[1 + k:]))
        y2v = f2.mul(f2.sqr(y), v)
        zc = f2.from_const(h2c.G2_Z)
        b1 = api.and_(b, f2.is_zero(f2.sub(y2v, u)))
        b2 = api.and_(api.is_zero(b),
                      f2.is_zero(f2.sub(y2v, f2.mul(zc, u))))
        api.assert_is_equal(api.xor(b1, b2), 1)
        return b, y

    def map_to_curve(self, u):
        f2, api = self.f2, self.api
        A = f2.from_const(h2c.G2_A)
        B = f2.from_const(h2c.G2_B)
        Z = f2.from_const(h2c.G2_Z)
        one = f2.from_const((1, 0))
        tv1 = f2.mul(Z, f2.sqr(u))
        tv2 = f2.add(f2.sqr(tv1), tv1)
        tv3 = f2.mul(B, f2.add(tv2, one))
        tv4 = f2.mul(A, f2.select(f2.is_zero(tv2), Z, f2.neg(tv2)))
        tv2 = f2.sqr(tv3)
        tv6 = f2.sqr(tv4)
        tv5 = f2.mul(A, tv6)
        tv2 = f2.mul(f2.add(tv2, tv5), tv3)
        tv6 = f2.mul(tv6, tv4)
        tv5 = f2.mul(B, tv6)
        tv2 = f2.add(tv2, tv5)
        x = f2.mul(tv1, tv3)
        ok, y1 = self._sqrt_ratio(tv2, tv6)
        y = f2.mul(f2.mul(tv1, u), y1)
        x = f2.select(ok, tv3, x)
        y = f2.select(ok, y1, y)
        e1 = api.is_zero(api.sub(self._sgn0(u), self._sgn0(y)))
        y = f2.select(e1, y, f2.neg(y))
        x = self._div(x, tv4)
        return G2Point381(x, y)

    def _div(self, a, b):
        """Fp2 division via the registered bls381_fp2_div hint +
        product constraint.

        Soundness: r*b == a alone is unconstrained when b == 0 (the
        hint may return anything), so b != 0 is enforced too — like
        EmulatedField.div / the reference's emulated Div. Exceptional
        0/0 paths (e.g. crafted r-torsion SSWU images hitting equal-x
        adds) thus become unsatisfiable, never forgeable."""
        f2, api = self.f2, self.api
        k = self.fe.k
        flat = [k]
        for e2 in (a, b):
            for c in e2:
                flat += list(self.fe.reduce_strict(c).limbs)
        outs = api.new_hint("bls381_fp2_div", 2 * k, *flat)
        r = (self.fe.from_limb_vars(outs[:k]),
             self.fe.from_limb_vars(outs[k:]))
        api.assert_is_equal(f2.is_zero(b), 0)
        chk = f2.mul(r, b)
        self.fe.assert_is_equal(chk[0], a[0])
        self.fe.assert_is_equal(chk[1], a[1])
        return r

    def _horner2(self, coeffs, x):
        f2 = self.f2
        res = f2.from_const(coeffs[-1])
        for c in reversed(coeffs[:-1]):
            res = f2.add(f2.mul(res, x), f2.from_const(c))
        return res

    def isogeny(self, pt):
        f2 = self.f2
        x, y = pt.x, pt.y
        xn = self._horner2(G2_XNUM, x)
        xd = self._horner2(G2_XDEN, x)
        yn = self._horner2(G2_YNUM, x)
        yd = self._horner2(G2_YDEN, x)
        X = self._div(xn, xd)
        Y = f2.mul(y, self._div(yn, yd))
        return G2Point381(X, Y)

    # -- twist arithmetic --------------------------------------------

    def _dbl(self, Q):
        f2 = self.f2
        lam = self._div(f2.mul_int(f2.sqr(Q.x), 3), f2.mul_int(Q.y, 2))
        x3 = f2.sub(f2.sqr(lam), f2.mul_int(Q.x, 2))
        y3 = f2.sub(f2.mul(lam, f2.sub(Q.x, x3)), Q.y)
        return G2Point381(x3, y3)

    def _add(self, Q1, Q2):
        f2 = self.f2
        lam = self._div(f2.sub(Q2.y, Q1.y), f2.sub(Q2.x, Q1.x))
        x3 = f2.sub(f2.sub(f2.sqr(lam), Q1.x), Q2.x)
        y3 = f2.sub(f2.mul(lam, f2.sub(Q1.x, x3)), Q1.y)
        return G2Point381(x3, y3)

    def _neg(self, Q):
        return G2Point381(Q.x, self.f2.neg(Q.y))

    def _add_unified(self, Q1, Q2):
        """COMPLETE addition on the twist (reference map_to_g2.go:111,
        115 uses AddUnified at ClearCofactor steps 6 and 8): handles
        Q1 == Q2, Q1 == -Q2 and (0,0)-encoded identity operands,
        branchless via selects. Needed because psi(P) == [seed]P on
        the r-torsion, so a crafted u can force equal inputs there —
        incomplete adds would then be 0/0 divisions."""
        f2, api = self.f2, self.api
        x1, y1 = Q1.x, Q1.y
        x2, y2 = Q2.x, Q2.y
        p_inf = api.and_(f2.is_zero(x1), f2.is_zero(y1))
        q_inf = api.and_(f2.is_zero(x2), f2.is_zero(y2))
        same_x = f2.is_zero(f2.sub(x1, x2))
        same_y = f2.is_zero(f2.sub(y1, y2))
        is_dbl = api.and_(same_x, same_y)
        is_opp = api.and_(same_x, api.sub(1, same_y))

        one = f2.from_const((1, 0))
        den_add = f2.select(same_x, one, f2.sub(x2, x1))
        lam_add = self._div(f2.sub(y2, y1), den_add)
        den_dbl = f2.select(f2.is_zero(y1), one, f2.mul_int(y1, 2))
        lam_dbl = self._div(f2.mul_int(f2.sqr(x1), 3), den_dbl)
        lam = f2.select(is_dbl, lam_dbl, lam_add)

        x3 = f2.sub(f2.sub(f2.sqr(lam), x1), x2)
        y3 = f2.sub(f2.mul(lam, f2.sub(x1, x3)), y1)
        zero = f2.from_const((0, 0))
        x3 = f2.select(is_opp, zero, x3)
        y3 = f2.select(is_opp, zero, y3)
        x3 = f2.select(p_inf, x2, x3)
        y3 = f2.select(p_inf, y2, y3)
        x3 = f2.select(q_inf, f2.select(p_inf, zero, x1), x3)
        y3 = f2.select(q_inf, f2.select(p_inf, zero, y1), y3)
        return G2Point381(x3, y3)

    def _mul_seed(self, Q):
        """[z]Q with z the (negative) BLS12-381 seed: [|z|]Q then
        negate (reference scalarMulBySeed)."""
        bits = bin(ABS_SEED)[2:]
        acc = Q
        for b in bits[1:]:
            acc = self._dbl(acc)
            if b == "1":
                acc = self._add(acc, Q)
        return self._neg(acc)

    def _psi(self, Q):
        """psi(x,y) = (cx * conj(x), cy * conj(y)) — untwist-Frobenius-
        twist endomorphism; constants computed on host (not copied)."""
        f2 = self.f2
        cx = f2.from_const(h2c._PSI_CX)
        cy = f2.from_const(h2c._PSI_CY)
        return G2Point381(f2.mul(cx, f2.conj(Q.x)),
                          f2.mul(cy, f2.conj(Q.y)))

    def clear_cofactor(self, Q):
        """Budroni-Pintore (reference map_to_g2.go:94-121)."""
        t1 = self._mul_seed(Q)
        t2 = self._psi(Q)
        t3 = self._psi(self._psi(self._dbl(Q)))
        t3 = self._add(t3, self._neg(t2))
        # steps 6 and 8 use COMPLETE addition (reference
        # map_to_g2.go:111,115): t1 == t2 is reachable there because
        # psi(P) == [seed]P on the r-torsion.
        t2 = self._add_unified(t1, t2)
        t2 = self._mul_seed(t2)
        t3 = self._add_unified(t3, t2)
        t3 = self._add(t3, self._neg(t1))
        return self._add(t3, self._neg(Q))

    def map_to_g2(self, u):
        """Full MAP_FP2_TO_G2 (EIP-2537 0x11)."""
        return self.clear_cofactor(self.isogeny(self.map_to_curve(u)))
