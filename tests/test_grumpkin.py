"""Native grumpkin in-circuit gadget (reference
std/algebra/native/sw_grumpkin) — differential vs host EC math on the
2-cycle partner curve, inside bn254-fr circuits."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.ec import host
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.std.algebra import sw_grumpkin as gk

F = fields.BN254_FR
P = gk.P
N = gk.N
F1 = gk.CURVE.host_fp
G = gk.CURVE.g1


def _mul(k, pt=G):
    r = host.ec_mul(F1, pt, k % N)
    return (0, 0) if r is host.INF else r


def test_glv_constants():
    assert pow(gk.LAM, 3, N) == 1 and (gk.LAM ** 2 + gk.LAM + 1) % N == 0
    assert pow(gk.BETA, 3, P) == 1
    assert _mul(gk.LAM) == (gk.BETA * G[0] % P, G[1])


class _SMul(Circuit):
    s: Secret
    qx: Secret
    qy: Secret
    rx: Public
    ry: Public

    def define(self, api):
        g1 = gk.G1(api)
        r = g1.scalar_mul((self.qx, self.qy), self.s)
        api.assert_is_equal(r[0], self.rx)
        api.assert_is_equal(r[1], self.ry)


@pytest.fixture(scope="module")
def smul_cs():
    return compile_circuit(_SMul(), F)


def test_scalar_mul_constraints(smul_cs):
    # native ops: a few thousand constraints, not hundreds of thousands
    assert smul_cs.nb_constraints < 8000, smul_cs.nb_constraints


def test_scalar_mul_differential(smul_cs):
    rng = random.Random(17)
    cases = [rng.randrange(1, P) for _ in range(3)] + [0, 1, 2, P - 1]
    for s in cases:
        q = _mul(rng.randrange(1, N))
        r = _mul(s, q) if s else (0, 0)
        c = _SMul(s=s, qx=q[0], qy=q[1], rx=r[0], ry=r[1])
        pub, sec = witness(c, smul_cs)
        solve(smul_cs, pub, sec)


def test_scalar_mul_identity_input(smul_cs):
    c = _SMul(s=7, qx=0, qy=0, rx=0, ry=0)
    pub, sec = witness(c, smul_cs)
    solve(smul_cs, pub, sec)


def test_scalar_mul_wrong_rejected(smul_cs):
    r = _mul(5)
    c = _SMul(s=5, qx=G[0], qy=G[1], rx=r[0], ry=(r[1] + 1) % P)
    pub, sec = witness(c, smul_cs)
    with pytest.raises(SolverError):
        solve(smul_cs, pub, sec)


def test_add_double_unified():
    class C(Circuit):
        ax: Secret
        ay: Secret

        def define(self, api):
            g1 = gk.G1(api)
            A = (self.ax, self.ay)
            g1.assert_on_curve(A)
            # A + A (unified doubling) == double(A)
            d1 = g1.add_unified(A, A)
            d2 = g1.double(A)
            g1.assert_is_equal(d1, d2)
            # A + (-A) == identity
            z = g1.add_unified(A, g1.neg(A))
            api.assert_is_equal(z[0], 0)
            api.assert_is_equal(z[1], 0)
            # A + identity == A
            s = g1.add_unified(A, (0, 0))
            g1.assert_is_equal(s, A)
            # chord add vs host
            B = g1.double_and_add(A, g1.double(A))  # 2A + 2A = 4A? no:
            # double_and_add(A, Q) = 2A + Q with Q = 2A -> 4A
            g1.assert_is_equal(B, g1.double(g1.double(A)))

    cs = compile_circuit(C(), F)
    q = _mul(12345)
    pub, sec = witness(C(ax=q[0], ay=q[1]), cs)
    solve(cs, pub, sec)
