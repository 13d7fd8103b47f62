"""EVM precompile gadgets (reference std/evmprecompiles).

Implemented: 0x01 ECRECOVER, 0x02 SHA256, 0x04 IDENTITY, 0x05 MODEXP,
0x06 ECADD (BN254 G1), 0x07 ECMUL, 0x08 ECPAIR (BN254 pairing check),
0x100 P256VERIFY. The BN/secp/P-256 ops run over EMULATED base fields
so they compose inside any circuit field (the reference's
file-per-precompile layout maps onto these functions).
Remaining (KZG point eval 0x0a, BLS12-381 0x0b-0x11): need the
emulated BLS12-381 tower — follow-up.
"""

from __future__ import annotations

import dataclasses

from gnark_tpu.constraint.hints import register_hint
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
    return curve.scalar_mul_bits(p, scalar_bits)


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
