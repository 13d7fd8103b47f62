"""In-circuit short-Weierstrass ops over EMULATED base fields
(reference std/algebra/emulated/sw_emulated).

Points are pairs of emulated Elements; incomplete affine formulas with
explicit distinctness/nonzero preconditions on the hot paths, plus a
COMPLETE add_unified (select-based, (0,0) identity encoding) for
precompile edge cases (reference sw_emulated AddUnified).

Curves: secp256k1 (for ECDSA), P-256 params included.
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.std.math import emulated as emu


@dataclasses.dataclass(frozen=True)
class SWParams:
    name: str
    fp: emu.EmuParams       # base field
    fr: emu.EmuParams       # scalar field
    a: int
    b: int
    gx: int
    gy: int


SECP256K1 = SWParams(
    name="secp256k1",
    fp=emu.SECP256K1_FP, fr=emu.SECP256K1_FR, a=0, b=7,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)

P256_FR = emu.EmuParams(
    "p256_fr",
    0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551)

P256 = SWParams(
    name="p256",
    fp=emu.P256_FP, fr=P256_FR,
    a=emu.P256_FP.modulus - 3,
    b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
    gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
)

_h = emu  # brevity


class EmulatedCurve:
    def __init__(self, api, params: SWParams):
        self.api = api
        self.params = params
        self.f = emu.EmulatedField(api, params.fp)

    def generator(self):
        return (self.f.from_const(self.params.gx),
                self.f.from_const(self.params.gy))

    def assert_on_curve(self, P) -> None:
        x, y = P
        f = self.f
        rhs = f.mul(f.mul(x, x), x)
        if self.params.a:
            rhs = f.add(rhs, f.mul(f.from_const(self.params.a), x))
        rhs = f.add(rhs, f.from_const(self.params.b))
        f.assert_is_equal(f.mul(y, y), rhs)

    def add_distinct(self, P, Q):
        """P + Q, requires x_P != x_Q (lambda division enforces it)."""
        f = self.f
        x1, y1 = P
        x2, y2 = Q
        lam = f.div(f.sub(y2, y1), f.sub(x2, x1))
        x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def double(self, P):
        f = self.f
        x1, y1 = P
        num = f.mul(f.from_const(3), f.mul(x1, x1))
        if self.params.a:
            num = f.add(num, f.from_const(self.params.a))
        lam = f.div(num, f.mul(f.from_const(2), y1))
        x3 = f.sub(f.mul(lam, lam), f.mul(f.from_const(2), x1))
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
        return (x3, y3)

    def add_unified(self, P, Q):
        """COMPLETE addition (reference sw_emulated AddUnified):
        handles P == Q (doubling), P == -Q and either operand being
        the (0, 0) identity encoding; branchless via selects."""
        f = self.f
        api = self.api
        x1, y1 = P
        x2, y2 = Q
        p_inf = api.and_(f.is_zero(x1), f.is_zero(y1))
        q_inf = api.and_(f.is_zero(x2), f.is_zero(y2))
        same_x = f.is_zero(f.sub(x1, x2))
        same_y = f.is_zero(f.sub(y1, y2))
        is_dbl = api.and_(same_x, same_y)
        is_opp = api.and_(same_x, api.sub(1, same_y))

        # denominators made nonzero on the branches that ignore them
        den_add = f.sub(x2, x1)
        one = f.from_const(1)
        den_add = f.select(same_x, one, den_add)
        lam_add = f.div(f.sub(y2, y1), den_add)
        num_dbl = f.sum_of_products([(3, x1, x1)])
        if self.params.a:
            num_dbl = f.add(num_dbl, f.from_const(self.params.a))
        den_dbl = f.mul_const(y1, 2)
        den_dbl = f.select(f.is_zero(y1), one, den_dbl)
        lam_dbl = f.div(num_dbl, den_dbl)
        lam = f.select(is_dbl, lam_dbl, lam_add)

        x3 = f.sum_of_products([(1, lam, lam)],
                               lins=[(-1, x1), (-1, x2)])
        y3 = f.sum_of_products([(1, lam, x1), (-1, lam, x3)],
                               lins=[(-1, y1)])
        zero = f.from_const(0)
        # P + (-P) = identity
        x3 = f.select(is_opp, zero, x3)
        y3 = f.select(is_opp, zero, y3)
        # identity operands
        x3 = f.select(p_inf, x2, x3)
        y3 = f.select(p_inf, y2, y3)
        x3 = f.select(q_inf, f.select(p_inf, zero, x1), x3)
        y3 = f.select(q_inf, f.select(p_inf, zero, y1), y3)
        return (x3, y3)

    def scalar_mul_bits(self, P, bits):
        """[k]P for k given as LSB-first circuit booleans, k >= 1.

        Montgomery-ladder-free double-and-add with select; the
        accumulator is offset by P to avoid the point at infinity
        (standard incomplete-formula trick), then P is subtracted.
        """
        f = self.f
        api = self.api
        acc = P                     # represents P + sum(...)
        cur = self.double(P) if len(bits) > 1 else P
        for i, b in enumerate(bits[1:], start=1):
            added = self.add_distinct(acc, cur)
            acc = (f.select(b, added[0], acc[0]),
                   f.select(b, added[1], acc[1]))
            if i + 1 < len(bits):
                cur = self.double(cur)
        # acc = P + k'P where k' = k with bit0 forced... correct for the
        # offset: if bit0 == 0, subtract P (acc currently P + (k-bit0)P)
        # subtracting P: add (x_P, -y_P)
        negP = (P[0], f.sub(f.from_const(0), P[1]))
        sub1 = self.add_distinct(acc, negP)
        return (f.select(bits[0], acc[0], sub1[0]),
                f.select(bits[0], acc[1], sub1[1]))


def ecdsa_verify(api, curve_params: SWParams, pub, msg_hash_limbs,
                 r_limbs, s_limbs, nbits: int = 256,
                 v_bit=None):
    """ECDSA verification (reference std/signature/ecdsa):

        u1 = H * s^-1 mod n ; u2 = r * s^-1 mod n
        R' = u1*G + u2*Q ;  assert R'.x == r (mod n)

    Scalars are emulated fr elements (limb witnesses); u1/u2 bit
    decompositions come from hints constrained by emulated equality.
    """
    curve = EmulatedCurve(api, curve_params)
    fr = emu.EmulatedField(api, curve_params.fr)

    H = fr.from_limb_vars(msg_hash_limbs)
    R = fr.from_limb_vars(r_limbs)
    S = fr.from_limb_vars(s_limbs)
    s_inv = fr.inverse(S)
    u1 = fr.mul(H, s_inv)
    u2 = fr.mul(R, s_inv)

    curve.assert_on_curve(pub)

    def scalar_bits(e):
        # bit-decompose each 64-bit limb (already range-checked)
        bits = []
        for l in e.limbs:
            bits.extend(api.to_binary(l, emu.B))
        return bits[:nbits]

    P1 = curve.scalar_mul_bits(curve.generator(), scalar_bits(u1))
    P2 = curve.scalar_mul_bits(pub, scalar_bits(u2))
    Rp = curve.add_distinct(P1, P2)

    # assert r == R'.x mod n, INCLUDING the R'.x >= n wraparound branch
    # (reference std/signature/ecdsa ecdsa.go). Emulated elements are
    # not canonical by construction, so first pin R'.x's canonical
    # representative (< p), then reduce it mod n limb-wise:
    #   R'.x mod n = sum_j (2^(64j) mod n) * limb_j   (mod n)
    n_mod = curve_params.fr.modulus

    def assert_bits_leq(bits, bound):
        # AND-chain over bound's zero bits (mustBeLessOrEqCst) in
        # public api ops so the test engine can execute it
        p_acc = 1
        for i in range(len(bits) - 1, -1, -1):
            if (bound >> i) & 1:
                p_acc = api.mul(p_acc, bits[i])
            else:
                api.assert_is_equal(api.mul(p_acc, bits[i]), 0)

    rx_bits = []
    for l in Rp[0].limbs:
        rx_bits.extend(api.to_binary(l, emu.B))
    assert_bits_leq(rx_bits, curve_params.fp.modulus - 1)
    # r and s must be canonical too (no r+n malleability)
    for limbs in (r_limbs, s_limbs):
        bits = []
        for l in limbs:
            bits.extend(api.to_binary(l, emu.B))
        assert_bits_leq(bits, n_mod - 1)
    redc = fr.from_const(0)
    for j, l in enumerate(Rp[0].limbs):
        lim = emu.Element([l] + [0] * (emu.K - 1))
        term = fr.mul(fr.from_const(pow(2, emu.B * j, n_mod)), lim)
        redc = fr.add(redc, term)
    fr.assert_is_equal(redc, R)
    if v_bit is not None:
        # recovery-id check (ECRECOVER): parity of the canonical R'.y
        yc = curve.f.reduce_strict(Rp[1])
        ybits = api.to_binary(yc.limbs[0], emu.B)
        api.assert_is_equal(ybits[0], v_bit)
    return Rp
