"""Standalone logderivprecomp (reference
std/internal/logderivprecomp): precomputed 2^16-row byte-function
tables, shared per builder, one membership term per query."""

import random

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import (Circuit, Public, Secret, compile_circuit,
                                witness)
from gnark_tpu.std.internal import logderivprecomp as ldp

F = fields.BN254_FR


class _Xor(Circuit):
    x: Secret
    y: Secret
    r: Public

    def define(self, api):
        t = ldp.new(api, ldp.xor_bytes, [8])
        # inputs must be range-checked by the caller (the contract)
        api.to_binary(self.x, 8)
        api.to_binary(self.y, 8)
        out = t.query(self.x, self.y)[0]
        # shared instance: second query reuses the same table
        t2 = ldp.new(api, ldp.xor_bytes, [8])
        assert t2 is t
        out2 = t2.query(self.y, self.x)[0]
        api.assert_is_equal(out, self.r)
        api.assert_is_equal(out2, self.r)


@pytest.fixture(scope="module")
def xor_cs():
    return compile_circuit(_Xor(), F)


def test_xor_table(xor_cs):
    rng = random.Random(3)
    for _ in range(3):
        x, y = rng.randrange(256), rng.randrange(256)
        pub, sec = witness(_Xor(x=x, y=y, r=x ^ y), xor_cs)
        solve(xor_cs, pub, sec)


def test_xor_wrong_rejected(xor_cs):
    pub, sec = witness(_Xor(x=3, y=5, r=7), xor_cs)
    with pytest.raises((SolverError, ValueError)):
        solve(xor_cs, pub, sec)


def test_query_marginal_cost():
    def make(n):
        class C(Circuit):
            x: Secret
            y: Secret

            def define(self, api):
                t = ldp.new(api, ldp.and_bytes, [8])
                api.to_binary(self.x, 8)
                api.to_binary(self.y, 8)
                for _ in range(n):
                    t.query(self.x, self.y)
        return compile_circuit(C(), F, check_unconstrained=False)

    c1 = make(1).nb_constraints
    c2 = make(33).nb_constraints
    marginal = (c2 - c1) / 32
    # one hint + pack + one inverse per query
    assert marginal <= 6, marginal
