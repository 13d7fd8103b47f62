"""In-circuit emulated BN254 pairing vs the host ate engine.

Reference parity: std/algebra/emulated/sw_bn254 pairing tests."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.ec import host
from gnark_tpu.ec.curves import CURVES
from gnark_tpu.frontend import Circuit, Secret
from gnark_tpu.pairing.ate import get_ate
from gnark_tpu.std.algebra import pairing_bn254 as pb
from gnark_tpu.std.algebra.pairing_bn254 import G2Point, PairingBN254
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR
C254 = CURVES["bn254"]
RNG = random.Random(99)


def limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


def flat_g1(P):
    return limbs(P[0]) + limbs(P[1])


def flat_g2(Q):
    (x0, x1), (y0, y1) = Q
    return limbs(x0) + limbs(x1) + limbs(y0) + limbs(y1)


def load_g1(fe, vals, off):
    x = fe.from_limb_vars(vals[off:off + emu.K])
    y = fe.from_limb_vars(vals[off + emu.K:off + 2 * emu.K])
    return (x, y), off + 2 * emu.K


def load_g2(fe, vals, off):
    cs = [fe.from_limb_vars(vals[off + emu.K * i:off + emu.K * (i + 1)])
          for i in range(4)]
    return G2Point((cs[0], cs[1]), (cs[2], cs[3])), off + 4 * emu.K


class MillerVsHost(Circuit):
    """miller_loop single pair == host ate miller loop value."""
    ins: list[Secret]
    out: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (6 * emu.K)
        self.out = [None] * (12 * emu.K)
        super().__init__(**kw)

    def define(self, api):
        pr = PairingBN254(api)
        P, off = load_g1(pr.fe, self.ins, 0)
        Q, off = load_g2(pr.fe, self.ins, off)
        f = pr.miller_loop([(P, Q)])
        coords = [pr.fe.from_limb_vars(
            self.out[emu.K * i:emu.K * (i + 1)]) for i in range(12)]
        pr.f12.assert_eq(f, pr.f12.from_vars(coords))


@pytest.mark.slow
def test_miller_loop_matches_host():
    ate = get_ate("bn254")
    P = host.ec_mul(C254.host_fp, C254.g1, RNG.randrange(1, 1 << 60))
    Q = host.ec_mul(C254.host_g2_field, C254.g2, RNG.randrange(1, 1 << 60))
    want = ate.miller_loop(P, Q)
    inst = MillerVsHost()
    inst.ins = flat_g1(P) + flat_g2(Q)
    outf = []
    for c0, c1 in want:
        outf += limbs(c0) + limbs(c1)
    inst.out = outf
    assert is_solved(inst, F)
    bad = MillerVsHost()
    bad.ins = inst.ins
    outb = list(outf)
    outb[0] = (outb[0] + 1) % (1 << emu.B)
    bad.out = outb
    assert not is_solved(bad, F)


class PairCheck(Circuit):
    """e(aP, Q) * e(-P, aQ) == 1 (bilinearity) as a pairing check."""
    ins: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (2 * (2 + 4) * emu.K)
        super().__init__(**kw)

    def define(self, api):
        pr = PairingBN254(api)
        P1, off = load_g1(pr.fe, self.ins, 0)
        Q1, off = load_g2(pr.fe, self.ins, off)
        P2, off = load_g1(pr.fe, self.ins, off)
        Q2, off = load_g2(pr.fe, self.ins, off)
        pr.assert_on_g1(P1)
        pr.assert_on_g1(P2)
        pr.assert_on_g2_curve(Q1)
        pr.assert_on_g2_curve(Q2)
        pr.pairing_check([(P1, Q1), (P2, Q2)])


@pytest.mark.slow
def test_pairing_check_bilinear():
    a = RNG.randrange(1, 1 << 40)
    f1, f2 = C254.host_fp, C254.host_g2_field
    aP = host.ec_mul(f1, C254.g1, a)
    nP = host.ec_neg(f1, C254.g1)
    aQ = host.ec_mul(f2, C254.g2, a)
    inst = PairCheck()
    inst.ins = flat_g1(aP) + flat_g2(C254.g2) + flat_g1(nP) + flat_g2(aQ)
    assert is_solved(inst, F)
    # tampered: e(aP,Q)*e(-P,(a+1)Q) != 1
    bad = PairCheck()
    aQ2 = host.ec_mul(f2, C254.g2, a + 1)
    bad.ins = flat_g1(aP) + flat_g2(C254.g2) + flat_g1(nP) + flat_g2(aQ2)
    assert not is_solved(bad, F)


class G2Ops(Circuit):
    """Twist arithmetic + psi + subgroup check on the generator."""
    ins: list[Secret]

    def __init__(self, **kw):
        self.ins = [None] * (4 * emu.K)
        super().__init__(**kw)

    def define(self, api):
        pr = PairingBN254(api)
        Q, _ = load_g2(pr.fe, self.ins, 0)
        pr.assert_on_g2_curve(Q)
        pr.assert_in_g2_subgroup(Q)


@pytest.mark.slow
def test_g2_subgroup_check():
    inst = G2Ops()
    inst.ins = flat_g2(C254.g2)
    assert is_solved(inst, F)


def test_g2_double_add_matches_host():
    """Fast tier: twist point ops against host Fp2 EC."""
    f2h = C254.host_g2_field
    Q = C254.g2
    Q2 = host.ec_dbl(f2h, Q)
    Q3 = host.ec_add(f2h, Q2, Q)

    class C(Circuit):
        ins: list[Secret]
        out: list[Secret]

        def __init__(self, **kw):
            self.ins = [None] * (4 * emu.K)
            self.out = [None] * (8 * emu.K)
            super().__init__(**kw)

        def define(self, api):
            pr = PairingBN254(api)
            Qv, _ = load_g2(pr.fe, self.ins, 0)
            D, _ = pr.g2_double(Qv)
            A, _ = pr.g2_add(D, Qv)
            want2, off = load_g2(pr.fe, self.out, 0)
            want3, _ = load_g2(pr.fe, self.out, off)
            pr.f2.assert_eq(D.x, want2.x)
            pr.f2.assert_eq(D.y, want2.y)
            pr.f2.assert_eq(A.x, want3.x)
            pr.f2.assert_eq(A.y, want3.y)

    inst = C()
    inst.ins = flat_g2(Q)
    inst.out = flat_g2(Q2) + flat_g2(Q3)
    assert is_solved(inst, F)
