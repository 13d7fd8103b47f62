"""GLV scalar multiplication on emulated secp256k1 (reference
std/algebra/emulated/sw_emulated/point.go scalarMulGLV + the
decomposeScalarG1 hint). Differential vs host EC math, plus the
constraint-economics bound the round-4 verdict asked for (ours within
2x of gnark's 107,536-constraint bn254/Groth16 count)."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.std.math import emulated as emu
from gnark_tpu.std.algebra import sw_emulated as swe

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


def _limbs(v):
    return [(v >> (emu.B * i)) & emu.MASK for i in range(emu.K)]


class _C(Circuit):
    s: list[Secret]
    px: list[Secret]
    py: list[Secret]
    rx: list[Public]
    ry: list[Public]

    def __init__(self, **kw):
        for f in ("s", "px", "py", "rx", "ry"):
            setattr(self, f, [None] * emu.K)
        super().__init__(**kw)

    def define(self, api):
        cur = swe.EmulatedCurve(api, swe.SECP256K1)
        f = cur.f
        pt = (f.from_limb_vars(self.px), f.from_limb_vars(self.py))
        r = cur.scalar_mul_glv(pt, self.s)
        f.assert_is_equal(r[0], f.from_limb_vars(self.rx))
        f.assert_is_equal(r[1], f.from_limb_vars(self.ry))


@pytest.fixture(scope="module")
def glv_cs():
    return compile_circuit(_C(), fields.BN254_FR)


def _check(cs, k, pt=G):
    r = _mul(k % N, pt) or (0, 0)
    c = _C(s=_limbs(k), px=_limbs(pt[0]), py=_limbs(pt[1]),
           rx=_limbs(r[0]), ry=_limbs(r[1]))
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)


def test_glv_constraint_economics(glv_cs):
    # gnark scalarMulGLV: 107,536 constraints (bn254/Groth16,
    # internal/stats); verdict bar: within 2x
    assert glv_cs.nb_constraints <= 2 * 107536, glv_cs.nb_constraints


def test_glv_random_scalars(glv_cs):
    rng = random.Random(11)
    for _ in range(2):
        _check(glv_cs, rng.randrange(1, N))


def test_glv_edge_scalars(glv_cs):
    for k in (0, 1, 2, N - 1, 12345):
        _check(glv_cs, k)


def test_glv_random_point(glv_cs):
    pt = _mul(987654321, G)
    _check(glv_cs, 0xDEADBEEF1234, pt)


def test_glv_identity_input(glv_cs):
    c = _C(s=_limbs(55), px=_limbs(0), py=_limbs(0),
           rx=_limbs(0), ry=_limbs(0))
    pub, sec = witness(c, _cs_of(glv_cs))
    solve(glv_cs, pub, sec)


def _cs_of(cs):
    return cs


def test_glv_wrong_result_rejected(glv_cs):
    r = _mul(5, G)
    c = _C(s=_limbs(5), px=_limbs(G[0]), py=_limbs(G[1]),
           rx=_limbs(r[0]), ry=_limbs((r[1] + 1) % P))
    pub, sec = witness(c, glv_cs)
    with pytest.raises(SolverError):
        solve(glv_cs, pub, sec)


def test_glv_split_host():
    rng = random.Random(5)
    for _ in range(50):
        k = rng.randrange(N)
        k1, k2 = swe.glv_split(N, swe.SECP256K1.lam, k)
        assert (k1 + k2 * swe.SECP256K1.lam - k) % N == 0
        assert abs(k1).bit_length() <= 129
        assert abs(k2).bit_length() <= 129


def test_glv_bn254_emulated():
    """GLV on the emulated BN254 G1 (the 2-cycle mirror constants) —
    used by the recursion PoK fold."""
    from gnark_tpu.ec import curves, host as ec_host

    C = curves.CURVES["bn254"]
    f1 = C.host_fp
    n = C.fr.modulus

    class Ct(Circuit):
        s: list[Secret]
        rx: list[Public]
        ry: list[Public]

        def __init__(self, **kw):
            for f in ("s", "rx", "ry"):
                setattr(self, f, [None] * emu.K)
            super().__init__(**kw)

        def define(self, api):
            cur = swe.EmulatedCurve(api, swe.BN254_SW)
            fe = cur.f
            r = cur.scalar_mul_glv(cur.generator(), self.s)
            fe.assert_is_equal(r[0], fe.from_limb_vars(self.rx))
            fe.assert_is_equal(r[1], fe.from_limb_vars(self.ry))

    cs = compile_circuit(Ct(), fields.BN254_FR)
    rng = random.Random(9)
    for k in (rng.randrange(1, n), 0, n - 1):
        r = ec_host.ec_mul(f1, C.g1, k % n)
        r = (0, 0) if r is ec_host.INF else r
        inst = Ct(s=_limbs(k), rx=_limbs(r[0]), ry=_limbs(r[1]))
        pub, sec = witness(inst, cs)
        solve(cs, pub, sec)
