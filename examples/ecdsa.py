"""ECDSA-over-secp256k1 verification inside a BN254 Groth16 circuit —
the emulated-curve flagship (reference std/signature/ecdsa +
examples). Round 5: the scalar muls ride the GLV merged-pair ladder
(sw_emulated.scalar_mul_glv), ~234k constraints for the whole
verification (was 2.57M with the plain ladder).

Run: python examples/ecdsa.py
"""

import hashlib
import random
import sys

sys.path.insert(0, "/root/repo")

from gnark_tpu import fields
from gnark_tpu.backend import groth16
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.std.algebra import sw_emulated as swe
from gnark_tpu.std.math import emulated as emu

P = swe.SECP256K1.fp.modulus
N = swe.SECP256K1.fr.modulus
G = (swe.SECP256K1.gx, swe.SECP256K1.gy)


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    if p1[0] == p2[0] and (p1[1] + p2[1]) % P == 0:
        return None
    if p1 == p2:
        lam = 3 * p1[0] * p1[0] * pow(2 * p1[1], -1, P) % P
    else:
        lam = (p2[1] - p1[1]) * pow(p2[0] - p1[0], -1, P) % P
    x = (lam * lam - p1[0] - p2[0]) % P
    return (x, (lam * (p1[0] - x) - p1[1]) % P)


def _mul(k, pt):
    r, a = None, pt
    while k:
        if k & 1:
            r = _add(r, a)
        a = _add(a, a)
        k >>= 1
    return r


def sign(priv: int, msg: bytes, rng):
    h = int.from_bytes(hashlib.sha256(msg).digest(), "big") % N
    while True:
        k = rng.randrange(1, N)
        R = _mul(k, G)
        r = R[0] % N
        if r == 0:
            continue
        s = pow(k, -1, N) * (h + r * priv) % N
        if s:
            return h, r, s


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


class EcdsaCircuit(Circuit):
    qx: list[Public]
    qy: list[Public]
    h: list[Secret]
    r: list[Secret]
    s: list[Secret]

    def __init__(self, **kw):
        for f in ("qx", "qy", "h", "r", "s"):
            setattr(self, f, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = swe.EmulatedCurve(api, swe.SECP256K1).f
        swe.ecdsa_verify(api, swe.SECP256K1,
                         (f.from_limb_vars(self.qx),
                          f.from_limb_vars(self.qy)),
                         self.h, self.r, self.s)


def main():
    rng = random.Random(42)
    priv = rng.randrange(1, N)
    pub = _mul(priv, G)
    h, r, s = sign(priv, b"gnark_tpu", rng)

    cs = compile_circuit(EcdsaCircuit(), fields.BN254_FR)
    print(f"ecdsa verify circuit: {cs.nb_constraints} constraints")

    inst = EcdsaCircuit(qx=limbs(pub[0]), qy=limbs(pub[1]),
                        h=limbs(h), r=limbs(r), s=limbs(s))
    pubv, sec = witness(inst, cs)
    pk, vk = groth16.setup(cs, "bn254", rng=random.Random(1))
    proof = groth16.prove(cs, pk, pubv, sec, rng=random.Random(2))
    ok = groth16.verify(proof, vk, pubv)
    print("verified:", ok)
    assert ok


if __name__ == "__main__":
    main()
