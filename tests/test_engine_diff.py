"""Differential fuzzing: test engine vs builder+solver acceptance.

Mirrors the reference's strategy (test/assert_fuzz.go + tinyfield
exhaustive enumeration, SURVEY.md §4): the big-int engine and the real
constraint pipeline must accept/reject identical witness sets.
"""

import itertools

import pytest

from gnark_tpu import fields
from gnark_tpu.constraint import SolverError, solve
from gnark_tpu.frontend import Circuit, Public, Secret, compile_circuit, witness
from gnark_tpu.test_engine import is_solved

TINY = fields.TINYFIELD


class XorSelect(Circuit):
    a: Secret
    b: Secret
    c: Public

    def define(self, api):
        x = api.xor(self.a, self.b)
        s = api.select(x, api.add(self.a, 1), self.b)
        api.assert_is_equal(s, self.c)


class DivIsZero(Circuit):
    a: Secret
    b: Secret
    out: Public

    def define(self, api):
        z = api.is_zero(self.b)
        safe = api.select(z, 1, self.b)
        api.assert_is_equal(api.select(z, 0, api.div_unchecked(self.a, safe)),
                            self.out)


def _accepts_solver(circ_cls, assigned) -> bool:
    try:
        cs = compile_circuit(circ_cls(), TINY)
        pub, sec = witness(assigned, cs)
        solve(cs, pub, sec)
        return True
    except (SolverError, ValueError):
        return False


@pytest.mark.parametrize("circ_cls,nsec,npub", [(XorSelect, 2, 1),
                                                (DivIsZero, 2, 1)])
def test_engine_solver_agree_exhaustive(circ_cls, nsec, npub):
    q = TINY.modulus
    # exhaustive over a seed set (reference assert_fuzz.go: +-5, q+-3)
    seeds = list(range(4)) + [q - 1, q - 2, 7, 11]
    names = list(circ_cls.__annotations__)
    mismatches = []
    for combo in itertools.product(seeds, repeat=nsec + npub):
        assigned = circ_cls(**dict(zip(names, combo)))
        eng = is_solved(assigned, TINY)
        slv = _accepts_solver(circ_cls, assigned)
        if eng != slv:
            mismatches.append((combo, eng, slv))
    assert not mismatches, mismatches[:5]
