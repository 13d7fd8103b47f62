"""EVM precompile gadgets (reference std/evmprecompiles).

Implemented: 0x01 ECRECOVER, 0x02 SHA256, 0x04 IDENTITY, 0x05 MODEXP,
0x06 ECADD (BN254 G1), 0x07 ECMUL, 0x08 ECPAIR (BN254 pairing check),
0x100 P256VERIFY. The BN/secp/P-256 ops run over EMULATED base fields
so they compose inside any circuit field (the reference's
file-per-precompile layout maps onto these functions).
Also: 0x0a KZG point evaluation (EIP-4844) and the full BLS12-381
family 0x0b G1ADD / 0x0c G1MSM / 0x0d G2ADD / 0x0e G2MSM /
0x0f PAIRING / 0x10 MAP_FP_TO_G1 / 0x11 MAP_FP2_TO_G2 over the
emulated BLS12-381 tower — all 15 precompile gadget families of the
reference plus P256VERIFY.
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.constraint.hints import register_hint
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.std.algebra import sw_emulated as sw
from gnark_tpu.std.hash import sha256 as sha_gadget
from gnark_tpu.std.math import emulated as emu

BN254_G1 = sw.SWParams(
    name="bn254_g1",
    fp=emu.BN254_FP_EMU,
    fr=emu.EmuParams(
        "bn254_fr",
        21888242871839275222246405745257275088548364400416034343698204186575808495617),
    a=0, b=3, gx=1, gy=2,
    lam=0xB3C4D79D41A917585BFC41088D8DAAA78B17EA66B99C90DD,
    beta=0x59E26BCEA0D48BACD4F263F1ACDB5C4F5763473177FFFFFE,
)


def sha256(api, blocks_of_vars):
    """0x02: SHA-256 over pre-padded 512-bit blocks of 32-bit words."""
    return sha_gadget.sha256_of_words(api, blocks_of_vars)


def identity(api, values):
    """0x04: datacopy."""
    return list(values)


def ecadd(api, p1, p2):
    """0x06: BN254 G1 add. Points are pairs of emulated Elements
    (distinct, non-infinity — the reference's edge cases route through
    AddUnified; follow-up)."""
    curve = sw.EmulatedCurve(api, BN254_G1)
    curve.assert_on_curve(p1)
    curve.assert_on_curve(p2)
    return curve.add_distinct(p1, p2)


def ecmul(api, p, scalar_bits):
    """0x07: BN254 G1 scalar mul (scalar as LSB-first circuit bits,
    scalar >= 1)."""
    curve = sw.EmulatedCurve(api, BN254_G1)
    curve.assert_on_curve(p)
    return curve.scalar_mul_from_bits(p, scalar_bits)


@register_hint("ecrecover_pub")
def _ecrecover_pub(q, inputs):
    """Generic SW-curve public-key recovery.

    [k, p(k), n(k), a(k), b(k), gx(k), gy(k), h(k), r(k), s(k), v]
    -> Q = (x, y) as 2k limbs (0s on failure)."""
    k = inputs[0]

    def take(i):
        return emu._val(inputs, k, 1 + k * i)

    p, n, a, b, gx, gy, h, r, s = (take(i) for i in range(9))
    v = inputs[1 + 9 * k]

    def add(P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        (x1, y1), (x2, y2) = P, Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            lam = (3 * x1 * x1 + a) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        return (x3, (lam * (x1 - x3) - y1) % p)

    def mul(P, e):
        R = None
        while e:
            if e & 1:
                R = add(R, P)
            P = add(P, P)
            e >>= 1
        return R

    fail = [0] * (2 * k)
    if not (0 < r < n and 0 < s < n):
        return fail
    y2 = (pow(r, 3, p) + a * r + b) % p
    y = pow(y2, (p + 1) // 4, p) if p % 4 == 3 else None
    if y is None:
        # generic Tonelli-Shanks via sympy-free fallback
        from gnark_tpu.ec.host import Fp
        y = Fp(p).sqrt(y2)
    if y is None or y * y % p != y2:
        return fail
    if y & 1 != v:
        y = p - y
    R_pt = (r, y)
    rinv = pow(r, -1, n)
    u1 = (-h * rinv) % n
    u2 = (s * rinv) % n
    Q = add(mul((gx, gy), u1), mul(R_pt, u2))
    if Q is None:
        return fail
    out = []
    for c in Q:
        out += [(c >> (emu.B * i)) & emu.MASK for i in range(k)]
    return out


def ecrecover(api, h_limbs, v_bit, r_limbs, s_limbs,
              params: sw.SWParams = sw.SECP256K1):
    """0x01: recover the signing public key and PROVE it valid (the
    recovered point comes from a hint; the circuit then runs full
    ECDSA verification incl. the recovery-id parity check against it).
    Returns the public key as an emulated point."""
    k = emu.K

    def climbs(v):
        return [(v >> (emu.B * i)) & emu.MASK for i in range(k)]

    flat = ([k] + climbs(params.fp.modulus) + climbs(params.fr.modulus)
            + climbs(params.a % params.fp.modulus) + climbs(params.b)
            + climbs(params.gx) + climbs(params.gy)
            + list(h_limbs) + list(r_limbs) + list(s_limbs) + [v_bit])
    outs = api.new_hint("ecrecover_pub", 2 * k, *flat)
    f = emu.EmulatedField(api, params.fp)
    pub = (f.from_limb_vars(outs[:k]), f.from_limb_vars(outs[k:]))
    sw.ecdsa_verify(api, params, pub, h_limbs, r_limbs, s_limbs,
                    v_bit=v_bit)
    return pub


def modexp(api, base_limbs, exp_bits, mod_limbs, k: int = emu.K):
    """0x05: base^exp mod m with VARIABLE modulus (reference
    05-modexp.go over emulated variable-modulus arithmetic). exp_bits
    are MSB-first circuit booleans; m == 0 is unsupported (the circuit
    becomes unsatisfiable — EVM-level handling of zero moduli belongs
    to the caller)."""
    vm = emu.VarModField(api, k, mod_limbs)
    base = vm.from_limb_vars(base_limbs)
    one = emu.Element([1] + [0] * (k - 1))
    # acc starts at 1 mod m — for m == 1 the first mul reduces it to 0
    acc = one
    for b in exp_bits:
        acc = vm.mul(acc, acc)
        cand = vm.mul(acc, base)
        acc = vm.select(b, cand, acc)
    # final reduce pins acc < m even when exp == 0 (acc still == one)
    return vm.mul(acc, vm.from_limb_vars([1] + [0] * (k - 1)))


def ecpair(api, pairs):
    """0x08: BN254 pairing-product check — asserts
    prod e(P_i, Q_i) == 1 (on-curve + G2 subgroup checks included)."""
    from gnark_tpu.std.algebra.pairing_bn254 import PairingBN254
    pr = PairingBN254(api)
    for P, Q in pairs:
        pr.assert_on_g1(P)
        pr.assert_on_g2_curve(Q)
        pr.assert_in_g2_subgroup(Q)
    pr.pairing_check(pairs)


def p256_verify(api, pub, h_limbs, r_limbs, s_limbs):
    """0x100 (RIP-7212 P256VERIFY): ECDSA over NIST P-256."""
    sw.ecdsa_verify(api, sw.P256, pub, h_limbs, r_limbs, s_limbs)


# -- BLS12-381 family (EIP-2537 0x0b-0x0f, EIP-4844 0x0a) ---------------------

BLS381_G1 = sw.SWParams(
    name="bls12_381_g1",
    fp=emu.BLS12_381_FP_EMU,
    fr=emu.BLS12_381_FR_EMU,
    a=0, b=4,
    gx=0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    gy=0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    lam=0xAC45A4010001A40200000000FFFFFFFF,
    beta=0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC,
)


BLS_SEED = 0xD201000000010000        # |z| (the BLS12-381 seed is -z)


def bls_g1_assert_subgroup(api, curve, P):
    """EIP-2537 G1 subgroup check: P == -[z^2]phi(P) (the reference's
    AssertIsOnG1, sw_bls12381/g1.go:236-248 — sound because
    r | z^4 - z^2 + 1, so [z^2]phi acts as -1 exactly on the r-torsion
    component). Constant-scalar double-and-add over z^2's bits."""
    f = curve.f
    phi = (f.sum_of_products(
        [(1, f.from_const(BLS381_G1.beta), P[0])]), P[1])
    zz = BLS_SEED * BLS_SEED
    bits = bin(zz)[2:]
    acc = phi
    for b in bits[1:]:
        acc = curve.double(acc)
        if b == "1":
            acc = curve.add_distinct(acc, phi)
    # acc = [z^2]phi(P) must equal -P
    f.assert_is_equal(acc[0], P[0])
    f.assert_is_equal(acc[1], f.neg_nr(P[1]))


def bls_g1add(api, p1, p2):
    """0x0b: BLS12-381 G1 add (distinct points)."""
    curve = sw.EmulatedCurve(api, BLS381_G1)
    curve.assert_on_curve(p1)
    curve.assert_on_curve(p2)
    return curve.add_distinct(p1, p2)


def bls_g1msm(api, points, scalar_bits_list):
    """0x0c: BLS12-381 G1 MSM (scalars as LSB-first bit lists)."""
    curve = sw.EmulatedCurve(api, BLS381_G1)
    acc = None
    for p, bits in zip(points, scalar_bits_list):
        curve.assert_on_curve(p)
        bls_g1_assert_subgroup(api, curve, p)
        term = curve.scalar_mul_from_bits(p, bits)
        acc = term if acc is None else curve.add_distinct(acc, term)
    return acc


def bls_g2add(api, q1, q2):
    """0x0d: BLS12-381 G2 add (distinct points on the twist)."""
    from gnark_tpu.std.algebra.pairing_bls12381 import PairingBLS12381
    pr = PairingBLS12381(api)
    pr.assert_on_g2_curve(q1)
    pr.assert_on_g2_curve(q2)
    out, _ = pr.g2_add(q1, q2)
    return out


def bls_pairing_check(api, pairs):
    """0x0f: BLS12-381 pairing-product check (== 1)."""
    from gnark_tpu.std.algebra.pairing_bls12381 import PairingBLS12381
    pr = PairingBLS12381(api)
    for P, Q in pairs:
        pr.assert_on_g1(P)
        pr.assert_on_g2_curve(Q)
    pr.pairing_check(pairs)


def kzg_point_eval(api, commitment, proof_w, z_limbs, y_limbs,
                   g2_tau):
    """0x0a (EIP-4844 point evaluation): assert the KZG opening
    p(z) == y for the blob commitment, over BLS12-381.

        e(C - y*G1 + z*W, G2) * e(-W, tau*G2) == 1

    z/y are emulated fr limb lists; g2_tau the trusted-setup host G2
    point; commitment/proof emulated G1 points."""
    from gnark_tpu.std.algebra.pairing_bls12381 import (G2Point381,
                                                        PairingBLS12381)
    pr = PairingBLS12381(api)
    curve = sw.EmulatedCurve(api, BLS381_G1)
    fr = emu.EmulatedField(api, emu.BLS12_381_FR_EMU)
    z = fr.from_limb_vars(z_limbs)
    y = fr.from_limb_vars(y_limbs)

    curve.assert_on_curve(commitment)
    curve.assert_on_curve(proof_w)
    # EIP-4844 requires subgroup membership of both points (reference
    # 10-kzg_point_evaluation.go:613)
    bls_g1_assert_subgroup(api, curve, commitment)
    bls_g1_assert_subgroup(api, curve, proof_w)

    def ebits(e):
        bits = []
        for l in e.limbs:
            if isinstance(l, int):
                bits += [(l >> i) & 1 for i in range(emu.B)]
            else:
                bits += api.to_binary(l, emu.B)
        return bits

    g1_gen = (curve.f.from_const(BLS381_G1.gx),
              curve.f.from_const(BLS381_G1.gy))
    yg = curve.scalar_mul_from_bits(g1_gen, ebits(y))
    zw = curve.scalar_mul_from_bits(proof_w, ebits(z))
    a = curve.add_distinct(commitment,
                           (yg[0], curve.f.neg(yg[1])))
    a = curve.add_distinct(a, zw)
    neg_w = (proof_w[0], curve.f.neg(proof_w[1]))

    c381 = CURVES["bls12_381"]
    g2_gen = G2Point381(pr.f2.from_const(tuple(c381.g2[0])),
                        pr.f2.from_const(tuple(c381.g2[1])))
    g2_tau_v = G2Point381(pr.f2.from_const(tuple(g2_tau[0])),
                          pr.f2.from_const(tuple(g2_tau[1])))
    pr.pairing_check([(a, g2_gen), (neg_w, g2_tau_v)])


def bls_map_fp_to_g1(api, u, expected=None):
    """0x10 (EIP-2537 MAP_FP_TO_G1, reference 16-blsmaptog1.go:15):
    RFC 9380 SSWU + 11-isogeny + cofactor clearing. u is an emulated
    BLS12-381 Fp element; if `expected` (emulated G1 point) is given,
    asserts equality like the reference precompile; returns the
    mapped point."""
    from gnark_tpu.std.algebra.sswu_bls12381 import MapToG1
    m = MapToG1(api)
    res = m.map_to_g1(u)
    if expected is not None:
        m.f.assert_is_equal(res[0], expected[0])
        m.f.assert_is_equal(res[1], expected[1])
    return res


def bls_map_fp2_to_g2(api, u, expected=None):
    """0x11 (EIP-2537 MAP_FP2_TO_G2, reference 17-blsmaptog2.go:14).
    u is an emulated Fp2 pair; `expected` a G2Point381."""
    from gnark_tpu.std.algebra.sswu_bls12381 import MapToG2
    m = MapToG2(api)
    res = m.map_to_g2(u)
    if expected is not None:
        m.fe.assert_is_equal(res.x[0], expected.x[0])
        m.fe.assert_is_equal(res.x[1], expected.x[1])
        m.fe.assert_is_equal(res.y[0], expected.y[0])
        m.fe.assert_is_equal(res.y[1], expected.y[1])
    return res


def bls_g2msm(api, points, scalar_bits_list):
    """0x0e: BLS12-381 G2 MSM (offset-by-first-point ladders on the
    twist; scalars as LSB-first bit lists)."""
    from gnark_tpu.std.algebra.pairing_bls12381 import PairingBLS12381
    pr = PairingBLS12381(api)
    acc = None
    for Q, bits in zip(points, scalar_bits_list):
        pr.assert_on_g2_curve(Q)
        # double-and-add with offset-by-Q (incomplete adds; same
        # caveats as the G1 ladders)
        R = Q
        cur, _ = pr.g2_double(Q)
        n = len(bits)
        for i, b in enumerate(bits[1:], start=1):
            added, _ = pr.g2_add(R, cur)
            R = type(Q)(pr.f2.select(b, added.x, R.x),
                        pr.f2.select(b, added.y, R.y))
            if i + 1 < n:
                cur, _ = pr.g2_double(cur)
        negQ = type(Q)(Q.x, pr.f2.neg(Q.y))
        sub1, _ = pr.g2_add(R, negQ)
        R = type(Q)(pr.f2.select(bits[0], R.x, sub1.x),
                    pr.f2.select(bits[0], R.y, sub1.y))
        if acc is None:
            acc = R
        else:
            s, _ = pr.g2_add(acc, R)
            acc = s
    return acc
