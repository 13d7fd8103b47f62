"""ECDSA (secp256k1) in-circuit verification vs a host-signed vector."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.algebra import sw_emulated as sw
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
P = sw.SECP256K1
RNG = random.Random(4242)

# host secp256k1
_p = P.fp.modulus
_n = P.fr.modulus
_G = (P.gx, P.gy)


def _add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    if a[0] == b[0]:
        if (a[1] + b[1]) % _p == 0:
            return None
        lam = 3 * a[0] * a[0] * pow(2 * a[1], -1, _p) % _p
    else:
        lam = (b[1] - a[1]) * pow(b[0] - a[0], -1, _p) % _p
    x = (lam * lam - a[0] - b[0]) % _p
    return (x, (lam * (a[0] - x) - a[1]) % _p)


def _mul(pt, k):
    r = None
    while k:
        if k & 1:
            r = _add(r, pt)
        pt = _add(pt, pt)
        k >>= 1
    return r


def _sign(d, h):
    while True:
        k = RNG.randrange(1, _n)
        R = _mul(_G, k)
        r = R[0] % _n
        if r == 0:
            continue
        s = (h + r * d) * pow(k, -1, _n) % _n
        if s:
            return r, s


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


class EcdsaCircuit(Circuit):
    qx: list[Public]
    qy: list[Public]
    h: list[Public]
    r: list[Secret]
    s: list[Secret]

    def __init__(self, **kw):
        for name in ("qx", "qy", "h", "r", "s"):
            setattr(self, name, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        f = emu.EmulatedField(api, P.fp)
        pub = (f.from_limb_vars(self.qx), f.from_limb_vars(self.qy))
        sw.ecdsa_verify(api, P, pub, self.h, self.r, self.s)


@pytest.mark.slow
def test_ecdsa_verify():
    """One signed vector through engine (+negative) and native solver."""
    from gnark_tpu.native import solve_native
    d = RNG.randrange(1, _n)
    Q = _mul(_G, d)
    h = RNG.randrange(1, _n)
    r, s = _sign(d, h)
    c = EcdsaCircuit()
    c.qx, c.qy = limbs(Q[0]), limbs(Q[1])
    c.h, c.r, c.s = limbs(h), limbs(r), limbs(s)
    assert is_solved(c, F)
    bad = EcdsaCircuit()
    bad.qx, bad.qy = limbs(Q[0]), limbs(Q[1])
    bad.h, bad.r, bad.s = limbs((h + 1) % _n), limbs(r), limbs(s)
    assert not is_solved(bad, F)
    cs = compile_circuit(EcdsaCircuit(), F)
    pub, sec = witness(c, cs)
    sol = solve_native(cs, pub, sec)
    assert sol.values is not None
