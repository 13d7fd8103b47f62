"""Poseidon2 host/gadget differential tests."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.frontend.scs import SCSBuilder
from gnark_tpu.std.hash.poseidon2 import Poseidon2, Poseidon2Gadget
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR


class P2Circuit(Circuit):
    a: Secret
    b: Secret
    h: Public

    def define(self, api):
        g = Poseidon2Gadget(api)
        api.assert_is_equal(g.hash([self.a, self.b]), self.h)


@pytest.mark.parametrize("builder", [None, SCSBuilder])
def test_poseidon2_gadget_matches_host(builder):
    a, b = 1234, 56789
    h = Poseidon2().hash([a, b])
    kw = {"builder_cls": builder} if builder else {}
    cs = compile_circuit(P2Circuit(), F, **kw)
    pub, sec = witness(P2Circuit(a=a, b=b, h=h), cs)
    solve(cs, pub, sec)
    with pytest.raises(SolverError):
        pub2, sec2 = witness(P2Circuit(a=a, b=b, h=h + 1), cs)
        solve(cs, pub2, sec2)
    assert is_solved(P2Circuit(a=a, b=b, h=h), F)


def test_poseidon2_permutation_properties():
    p = Poseidon2()
    s1 = p.permute([1, 2, 3])
    s2 = p.permute([1, 2, 4])
    assert s1 != s2
    assert all(0 <= x < p.q for x in s1)
    # deterministic
    assert p.permute([1, 2, 3]) == s1
    assert p.hash([1, 2, 3]) != p.hash([1, 2])
