"""In-circuit emulated BW6-761 tower + optimal-Tate pairing vs the
host mirror (std/algebra/pairing_bw6761.py).

Reference parity: std/algebra/emulated/sw_bw6761 (pairing.go optimal
Tate loop, fields_bw6761 E6)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.ec import host
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.frontend import Circuit, Secret
from gnark_tpu.pairing.tate import pow_in
from gnark_tpu.std.algebra import pairing_bw6761 as bw
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
C = CURVES["bw6_761"]
P = bw.P_MOD
K = emu.BW6_761_FP_EMU.k
RNG = random.Random(761)
EXT = bw._host_ext()


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(K)]


def test_constants():
    # omega is a cube root of unity; the combined loop scalar kills r
    assert (bw.OMEGA ** 2 + bw.OMEGA + 1) % P == 0
    lam = next(l for l in bw._sixth_roots_mod_r()
               if ((bw.X0 + 1) + l * (bw.X0 ** 3 - bw.X0 ** 2 - bw.X0))
               % bw.R_MOD == 0)
    # phi(Q) = (omega x, -y) realizes that eigenvalue on G2
    phiQ = (bw.OMEGA * C.g2[0] % P, (-C.g2[1]) % P)
    assert host.ec_mul(C.host_g2_field, C.g2, lam) == phiQ


def test_host_pair_bilinear():
    f1, f2h = C.host_fp, C.host_g2_field
    e0 = bw.host_pair(C.g1, C.g2)
    e1 = bw.host_pair(host.ec_dbl(f1, C.g1), C.g2)
    e2 = bw.host_pair(C.g1, host.ec_dbl(f2h, C.g2))
    assert e1 == e2 == pow_in(EXT, e0, 2)
    assert e0 != EXT.one


def test_ef6_tower():
    a = tuple(RNG.randrange(P) for _ in range(6))
    b = tuple(RNG.randrange(P) for _ in range(6))
    want = EXT.mul(a, b)
    inva = EXT.inv(a)
    fr1 = EXT.pow(a, P)
    fr3 = EXT.pow(a, P ** 3)

    class Tower(Circuit):
        ok: Secret

        def define(self, api):
            f6 = bw.EF6(api)
            ea = f6.from_const(a)
            eb = f6.from_const(b)
            f6.assert_eq(f6.mul(ea, eb), f6.from_const(want))
            f6.assert_eq(f6.inv(ea), f6.from_const(inva))
            f6.assert_eq(f6.frobenius(ea), f6.from_const(fr1))
            f6.assert_eq(f6.frobenius(ea, bw.FROB3),
                         f6.from_const(fr3))

    assert is_solved(Tower(ok=1), F)


@pytest.mark.slow
def test_miller_loop_matches_host():
    a = RNG.randrange(2, 1 << 30)
    P1 = host.ec_mul(C.host_fp, C.g1, a)
    Q1 = C.g2
    want = bw.host_miller_loop(P1, Q1)

    class ML(Circuit):
        ok: Secret

        def define(self, api):
            pr = bw.PairingBW6761(api)
            fe = pr.fe
            Pv = (fe.from_const(P1[0]), fe.from_const(P1[1]))
            Qv = (fe.from_const(Q1[0]), fe.from_const(Q1[1]))
            f = pr.miller_loop([(Pv, Qv)])
            pr.f6.assert_eq(f, pr.f6.from_const(want))

    assert is_solved(ML(ok=1), F)


def _flat(P1, Q1):
    return (limbs(P1[0]) + limbs(P1[1]) + limbs(Q1[0]) + limbs(Q1[1]))


class PairCheck(Circuit):
    """e(aP, Q) * e(-P, aQ) == 1."""
    ins: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (2 * 4 * K)
        super().__init__(**kw)

    def define(self, api):
        pr = bw.PairingBW6761(api)
        fe = pr.fe
        pairs = []
        off = 0
        for _ in range(2):
            els = []
            for i in range(4):
                els.append(fe.from_limb_vars(
                    self.ins[off + i * K:off + (i + 1) * K]))
            off += 4 * K
            Pv, Qv = (els[0], els[1]), (els[2], els[3])
            pr.assert_on_g1(Pv)
            pr.assert_on_g2_curve(Qv)
            pairs.append((Pv, Qv))
        pr.pairing_check(pairs)


@pytest.mark.slow
def test_pairing_check_circuit():
    f1, f2h = C.host_fp, C.host_g2_field
    a = RNG.randrange(2, 1 << 40)
    aP = host.ec_mul(f1, C.g1, a)
    nP = host.ec_neg(f1, C.g1)
    aQ = host.ec_mul(f2h, C.g2, a)
    good = PairCheck()
    good.ins = _flat(aP, C.g2) + _flat(nP, aQ)
    assert is_solved(good, F)
    bad = PairCheck()
    bad.ins = _flat(aP, C.g2) + _flat(C.g1, aQ)
    assert not is_solved(bad, F)
