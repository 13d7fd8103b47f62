"""BLS signatures (reference std/signature/bls, new in gnark v0.15).

Scheme (minimal-signature-size): sk = x, pk = [x]G2, sig = [x]H(m)
with H(m) in G1; verify e(sig, G2) == e(H(m), pk), checked as the
product e(sig, -G2) * e(H(m), pk) == 1.

Host side: keygen/sign/verify with deterministic try-and-increment
hash-to-G1 (cofactor cleared). In-circuit: verification gadgets for
  - BLS12-377 signatures inside BW6-761 circuits (native 2-chain),
  - BN254 signatures inside BN254-scalar circuits (emulated).
The message point H(m) enters the circuit as a point (public input or
host-computed constant) — in-circuit hash-to-curve is a follow-up, as
in the reference gadget's PrecomputedHash mode."""

from __future__ import annotations

import hashlib

from gnark_tpu.ec import host
from gnark_tpu.ec.curves import CURVES


# -- host scheme -------------------------------------------------------------

def hash_to_g1(curve_name: str, msg: bytes):
    """Deterministic try-and-increment + cofactor clearing."""
    c = CURVES[curve_name]
    f = c.host_fp
    p = c.fp.modulus
    ctr = 0
    while True:
        d = hashlib.sha256(b"BLS_H2C|" + curve_name.encode() + b"|"
                           + ctr.to_bytes(4, "big") + b"|" + msg).digest()
        x = int.from_bytes(d, "big") % p
        rhs = (pow(x, 3, p) + c.b) % p
        y = f.sqrt(rhs)
        if y is not None and (y * y - rhs) % p == 0:
            y = min(y, p - y)
            P = (x, y)
            P = host.ec_mul(f, P, c.h1) if c.h1 != 1 else P
            if P is not host.INF:
                return P
        ctr += 1


def keygen(curve_name: str, rng):
    c = CURVES[curve_name]
    sk = rng.randrange(1, c.fr.modulus)
    pk = host.ec_mul(c.host_g2_field, c.g2, sk)
    return sk, pk


def sign(curve_name: str, sk: int, msg: bytes):
    c = CURVES[curve_name]
    return host.ec_mul(c.host_fp, hash_to_g1(curve_name, msg), sk)


def verify(curve_name: str, pk, msg: bytes, sig) -> bool:
    from gnark_tpu.pairing import get_pairing
    c = CURVES[curve_name]
    pr = get_pairing(curve_name)
    hm = hash_to_g1(curve_name, msg)
    neg_sig = host.ec_neg(c.host_fp, sig)
    res = pr.pairing_product([(neg_sig, c.g2), (hm, pk)])
    return pr.ext.eq(res, pr.ext.one)


# -- in-circuit verification -------------------------------------------------

def assert_verify_377(api, sig_vars, pk_vars, hm_vars):
    """BLS12-377 signature verification inside a BW6-761 circuit.
    sig/hm: (x, y) G1 variables; pk: ((x0,x1),(y0,y1)) G2 variables."""
    from gnark_tpu.std.algebra.pairing_bls12377 import PairingCircuit
    from gnark_tpu.std.algebra.sw_bls12377 import G1Circuit, G2Circuit
    c = CURVES["bls12_377"]
    g1 = G1Circuit(api)
    g2 = G2Circuit(api)
    pc = PairingCircuit(api)
    g1.assert_on_curve(sig_vars)
    g1.assert_on_curve(hm_vars)
    g2.assert_on_curve(pk_vars)
    neg_sig = (sig_vars[0], api.neg(sig_vars[1]))
    pc.assert_pairing_product_is_one(
        [(neg_sig, tuple(c.g2)), (hm_vars, pk_vars)])


def assert_verify_bn254(api, sig_pt, pk_q2, hm_pt):
    """BN254 signature verification over the emulated pairing.
    sig_pt/hm_pt: emulated G1 points; pk_q2: G2Point (emulated)."""
    from gnark_tpu.std.algebra.pairing_bn254 import PairingBN254
    pr = PairingBN254(api)
    pr.assert_on_g1(sig_pt)
    pr.assert_on_g1(hm_pt)
    pr.assert_on_g2_curve(pk_q2)
    pr.assert_in_g2_subgroup(pk_q2)
    neg_sig = (sig_pt[0], pr.fe.neg(sig_pt[1]))
    from gnark_tpu.std.algebra.pairing_bn254 import FixedG2
    c = CURVES["bn254"]
    pr.pairing_check([(neg_sig, FixedG2(tuple(c.g2))),
                      (hm_pt, pk_q2)])
