"""EdDSA over Baby Jubjub: host roundtrip + in-circuit verification."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.algebra import twistededwards as te
from gnark_tpu.std.signature import eddsa
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR


def test_host_sign_verify():
    a, A = eddsa.keygen(b"alice")
    msg = 123456789
    sig = eddsa.sign(a, A, msg)
    assert eddsa.host_verify(A, msg, sig)
    assert not eddsa.host_verify(A, msg + 1, sig)
    b, B = eddsa.keygen(b"bob")
    assert not eddsa.host_verify(B, msg, sig)


def test_edwards_ops():
    P = te.scalar_mul(te.GEN, 12345)
    Q = te.scalar_mul(te.GEN, 67890)
    assert te.add(P, Q) == te.scalar_mul(te.GEN, 12345 + 67890)
    assert te.add(P, (0, 1)) == P                       # identity
    negP = ((-P[0]) % te.Q, P[1])
    assert te.add(P, negP) == (0, 1)                    # inverse


class EddsaCircuit(Circuit):
    ax: Public
    ay: Public
    msg: Public
    rx: Secret
    ry: Secret
    s: Secret

    def define(self, api):
        eddsa.verify_gadget(api, (self.ax, self.ay), self.msg,
                            (self.rx, self.ry), self.s)


@pytest.fixture(scope="module")
def signed():
    a, A = eddsa.keygen(b"circuit-test")
    msg = 0xC0FFEE
    (R, S) = eddsa.sign(a, A, msg)
    return A, msg, R, S


def test_eddsa_circuit_engine(signed):
    A, msg, R, S = signed
    ok = EddsaCircuit(ax=A[0], ay=A[1], msg=msg, rx=R[0], ry=R[1], s=S)
    assert is_solved(ok, F)
    bad = EddsaCircuit(ax=A[0], ay=A[1], msg=msg + 1, rx=R[0], ry=R[1], s=S)
    assert not is_solved(bad, F)
    mall = EddsaCircuit(ax=A[0], ay=A[1], msg=msg, rx=R[0], ry=R[1],
                        s=S + te.ORDER)
    assert not is_solved(mall, F)


def test_eddsa_circuit_solver(signed):
    A, msg, R, S = signed
    cs = compile_circuit(EddsaCircuit(), F)
    pub, sec = witness(
        EddsaCircuit(ax=A[0], ay=A[1], msg=msg, rx=R[0], ry=R[1], s=S), cs)
    solve(cs, pub, sec)
    with pytest.raises(SolverError):
        pub2, sec2 = witness(
            EddsaCircuit(ax=A[0], ay=A[1], msg=msg + 1,
                         rx=R[0], ry=R[1], s=S), cs)
        solve(cs, pub2, sec2)
