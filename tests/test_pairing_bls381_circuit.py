"""In-circuit emulated BLS12-381 tower + pairing vs host engines."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.ec import host
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.frontend import Circuit, Secret
from gnark_tpu.pairing.ate import get_ate
from gnark_tpu.std.algebra import fields_bn254 as ft
from gnark_tpu.std.algebra.pairing_bls12381 import (G2Point381,
                                                    PairingBLS12381,
                                                    X_SEED)
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
C381 = CURVES["bls12_381"]
P381 = ft.BLS12_381_TOWER.fp.modulus
K381 = ft.BLS12_381_TOWER.fp.k
RNG = random.Random(381)
HOST381 = ft._host_ext(ft.BLS12_381_TOWER)


def test_chain_identity_381():
    p, r, x = C381.fp.modulus, C381.fr.modulus, X_SEED
    assert r == x ** 4 - x ** 2 + 1
    assert (x - 1) ** 2 * (x + p) * (x ** 2 + p ** 2 - 1) + 3 \
        == 3 * (p ** 4 - p ** 2 + 1) // r


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(K381)]


def test_ef12_tower_381():
    a = tuple((RNG.randrange(P381), RNG.randrange(P381))
              for _ in range(6))
    b = tuple((RNG.randrange(P381), RNG.randrange(P381))
              for _ in range(6))
    want = HOST381.mul(a, b)
    inva = HOST381.inv(a)

    class C(Circuit):
        ok: Secret

        def define(self, api):
            f12 = ft.EF12(api, tower=ft.BLS12_381_TOWER)
            ea = f12.from_const(a)
            eb = f12.from_const(b)
            f12.assert_eq(f12.mul(ea, eb), f12.from_const(want))
            f12.assert_eq(f12.inv(ea), f12.from_const(inva))
            # frobenius vs host pow
            fr1 = HOST381.pow(a, P381)
            f12.assert_eq(f12.frob(ea), f12.from_const(fr1))

    assert is_solved(C(ok=1), F)


class PairCheck381(Circuit):
    """e(aP, Q) * e(-P, aQ) == 1."""
    ins: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (2 * 6 * K381)
        super().__init__(**kw)

    def define(self, api):
        pr = PairingBLS12381(api)
        fe = pr.fe
        vals = self.ins
        pairs = []
        off = 0
        for _ in range(2):
            els = [fe.from_limb_vars(vals[off + K381 * i:
                                          off + K381 * (i + 1)])
                   for i in range(6)]
            off += 6 * K381
            P = (els[0], els[1])
            Q = G2Point381((els[2], els[3]), (els[4], els[5]))
            pr.assert_on_g1(P)
            pr.assert_on_g2_curve(Q)
            pairs.append((P, Q))
        pr.pairing_check(pairs)


def _flat(P, Q):
    (x, y) = P
    (qx, qy) = Q
    return (limbs(x) + limbs(y) + limbs(qx[0]) + limbs(qx[1])
            + limbs(qy[0]) + limbs(qy[1]))


@pytest.mark.slow
def test_pairing_check_381():
    f1, f2 = C381.host_fp, C381.host_g2_field
    a = RNG.randrange(2, 1 << 40)
    aP = host.ec_mul(f1, C381.g1, a)
    nP = host.ec_neg(f1, C381.g1)
    aQ = host.ec_mul(f2, C381.g2, a)
    good = PairCheck381()
    good.ins = _flat(aP, C381.g2) + _flat(nP, aQ)
    assert is_solved(good, F)
    bad = PairCheck381()
    bad.ins = _flat(aP, C381.g2) + _flat(C381.g1, aQ)
    assert not is_solved(bad, F)


@pytest.mark.slow
def test_pair_value_bilinear():
    """GT-value bilinearity of the full pair() gadget:
    e(P, 2Q) == e(P, Q)^2 as in-circuit Fp12 values. (The host ate
    engine lives in a different-but-isomorphic tower — D-type with
    xi = (1+u)^-1 — so raw GT bytes are not comparable across engines;
    the value-level algebra is what this pins.)"""
    f2h = C381.host_g2_field
    P = host.ec_mul(C381.host_fp, C381.g1, 5)
    Q = host.ec_mul(f2h, C381.g2, 9)
    Q2 = host.ec_dbl(f2h, Q)

    class C(Circuit):
        ins: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (10 * K381)
            super().__init__(**kw)

        def define(self, api):
            pr = PairingBLS12381(api)
            fe = pr.fe
            els = [fe.from_limb_vars(self.ins[K381 * i:K381 * (i + 1)])
                   for i in range(10)]
            Pv = (els[0], els[1])
            Qv = G2Point381((els[2], els[3]), (els[4], els[5]))
            Q2v = G2Point381((els[6], els[7]), (els[8], els[9]))
            e1 = pr.pair(Pv, Qv)
            e2 = pr.pair(Pv, Q2v)
            pr.f12.assert_eq(pr.f12.sqr(e1), e2)

    inst = C()
    inst.ins = (_flat(P, Q)
                + limbs(Q2[0][0]) + limbs(Q2[0][1])
                + limbs(Q2[1][0]) + limbs(Q2[1][1]))
    assert is_solved(inst, F)
