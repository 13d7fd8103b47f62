"""Log-derivative lookup table tests (engine + solver + commit path)."""

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.std.lookup import Table
from gnark_tpu.test_engine import is_solved

F = fields.BN254_FR

SBOX = [((7 * i + 3) ** 2) % 251 for i in range(16)]


class SboxCircuit(Circuit):
    x: Secret
    y: Public

    def define(self, api):
        t = Table(api)
        for v in SBOX:
            t.insert(v)
        out = t.lookup(self.x)[0]
        api.assert_is_equal(out, self.y)


def test_lookup_engine_and_solver():
    for x in (0, 5, 15):
        c = SboxCircuit(x=x, y=SBOX[x])
        assert is_solved(c, F)
        cs = compile_circuit(SboxCircuit(), F)
        assert len(cs.commitments) == 1
        pub, sec = witness(c, cs)
        solve(cs, pub, sec)
    assert not is_solved(SboxCircuit(x=3, y=SBOX[4]), F)


def test_lookup_out_of_range():
    assert not is_solved(SboxCircuit(x=16, y=0), F)
    cs = compile_circuit(SboxCircuit(), F)
    pub, sec = witness(SboxCircuit(x=16, y=0), cs)
    with pytest.raises((SolverError, ValueError)):
        solve(cs, pub, sec)


class MultiLookup(Circuit):
    xs: list[Secret]
    total: Public

    def __init__(self, n=4, **kw):
        self.xs = [None] * n
        super().__init__(**kw)

    def define(self, api):
        t = Table(api)
        for v in SBOX:
            t.insert(v)
        outs = t.lookup(*self.xs)
        acc = 0
        for o in outs:
            acc = api.add(acc, o)
        api.assert_is_equal(acc, self.total)


def test_lookup_many_queries():
    xs = [2, 2, 7, 15]
    total = sum(SBOX[x] for x in xs)
    c = MultiLookup()
    for i, x in enumerate(xs):
        c.xs[i] = x
    c.total = total
    assert is_solved(c, F)
    cs = compile_circuit(MultiLookup(), F)
    pub, sec = witness(c, cs)
    solve(cs, pub, sec)
    c.total = total + 1
    assert not is_solved(c, F)
